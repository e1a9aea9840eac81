#!/usr/bin/env python
"""Socket-tier bench CLI: DNS cache + TLS + forward proxy end-to-end
through run_http_crawl against localhost fixtures.  Prints one JSON
line; records land in BASELINE.md ("socket tier").

Usage: python scripts/bench_socket.py [--hosts 48] [--pages 16]
           [--fetchers 8] [--wait-ms 20] [--legs dns_tls,proxy]
Needs root (binds 127.0.0.1:80/443 for the dns_tls leg).
"""

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hosts", type=int, default=48)
    ap.add_argument("--pages", type=int, default=16)
    ap.add_argument("--fetchers", type=int, default=8)
    ap.add_argument("--wait-ms", type=int, default=20)
    ap.add_argument("--legs", default="dns_tls,proxy")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    from open_source_search_engine_ray.pipelines.socketbench import (
        run_socket_bench,
    )

    with tempfile.TemporaryDirectory(prefix="socketbench-") as d:
        legs = run_socket_bench(
            d,
            n_hosts=args.hosts,
            pages_per_host=args.pages,
            n_fetchers=args.fetchers,
            same_ip_wait_ms=args.wait_ms,
            legs=tuple(args.legs.split(",")),
        )
    total_docs = sum(v["docs"] for v in legs.values())
    total_sec = sum(v["sec"] for v in legs.values())
    print(
        json.dumps(
            {
                "metric": "socket_crawl_urls_per_s",
                "value": round(total_docs / total_sec, 1),
                "unit": "urls/s",
                "legs": legs,
                "hosts": args.hosts,
                "pages_per_host": args.pages,
                "n_fetchers": args.fetchers,
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
