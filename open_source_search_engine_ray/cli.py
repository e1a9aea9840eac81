"""Command-line surface (the reference's ``gb`` CLI analogue:
``gb inject <file>`` main.cpp:5204, ``gb dump`` main.cpp:1534).

    python -m open_source_search_engine_ray.cli crawl  --out DIR [--hosts N] [--resume] ...
    python -m open_source_search_engine_ray.cli inject --out DIR URL [URL...]
    python -m open_source_search_engine_ray.cli dump   --out DIR {docs,launches,urlseen,metrics}

The CLI owns its Ray session (guarded init + shutdown); library code
never calls ray.init.
"""

from __future__ import annotations

import argparse
import json
import sys


def _init_ray(num_cpus: int):
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def cmd_crawl(args) -> int:
    _init_ray(args.num_cpus)
    from .pipelines.crawl import run_crawl
    from .sources.synthweb import WebConfig
    from .state.frontier import CrawlConfig

    web = WebConfig(
        n_hosts=args.hosts, n_hubs=args.hubs, hub_pages=args.hub_pages, max_pages=args.max_pages
    )
    cfg = CrawlConfig(
        num_partitions=args.partitions,
        horizon_ms=args.horizon_ms,
        exact_urlseen=not args.bloom_only,
        wave_window_ms=args.wave_window_ms,
    )
    res = run_crawl(
        web,
        cfg,
        args.out,
        engine="ray",
        checkpoint_every=args.checkpoint_every,
        resume=args.resume,
    )
    print(json.dumps({"metrics": res.metrics, "waves": res.waves, "out": args.out}))
    # persist the launch log for `dump launches`
    import pyarrow.parquet as pq

    pq.write_table(res.launch_log, f"{args.out}/launch_log.parquet")
    import pyarrow as pa

    pq.write_table(
        pa.table(
            {
                "uh48": pa.array([u for u, _ in res.url_seen], pa.uint64()),
                "url": pa.array([x for _, x in res.url_seen], pa.string()),
            }
        ),
        f"{args.out}/url_seen.parquet",
    )
    with open(f"{args.out}/metrics.json", "w") as f:
        json.dump(res.metrics, f)
    return 0


def cmd_inject(args) -> int:
    """Add URLs to an existing crawl's frontier (reference: PageAddUrl /
    setFromAddUrl, Spider.cpp:4286).  Loads the per-partition frontier
    checkpoints, admits the URLs as isaddurl requests, and rewrites the
    checkpoints, so ``crawl --resume`` schedules them.  Pure driver-side
    work — no Ray session needed."""
    import os

    from .pipelines.crawl import _ckpt_path
    from .sources.synthweb import WebConfig, get_web
    from .stages.canonicalize import make_request_columns, split_by_partition
    from .state.frontier import FrontierCore

    manifest_path = os.path.join(args.out, "checkpoints", "MANIFEST.json")
    if not os.path.exists(manifest_path):
        print(
            json.dumps(
                {
                    "error": "no checkpoints found; run crawl with "
                    "--checkpoint-every first",
                    "out": args.out,
                }
            )
        )
        return 1
    with open(manifest_path) as f:
        manifest = json.load(f)
    P = manifest["partitions"]
    web = get_web(WebConfig(n_hosts=args.hosts))
    host_ip = {h: int(ip) for h, ip in zip(web.hosts, web.ips)}
    cols = make_request_columns(args.urls, host_ip, is_addurl=True)
    admitted = 0
    for p, sub in split_by_partition(cols, P):
        path = _ckpt_path(args.out, p)
        with open(path, "rb") as f:
            core = FrontierCore.from_checkpoint_bytes(f.read())
        admitted += core.add_requests(sub)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(core.checkpoint_bytes({"wave": manifest["wave"]}))
        os.replace(tmp, path)
    print(
        json.dumps(
            {
                "injected": int(len(cols["url"])),
                "admitted": admitted,
                "urls": list(cols["url"]),
                "note": "run crawl --resume to schedule",
            }
        )
    )
    return 0


def cmd_reindex(args) -> int:
    """Docid-based query reindex (reference PageReindex.cpp:320-395,
    ``gb`` admin /admin/reindex): select docs from the crawl's docs
    table by a URL substring query, build is_reindex SpiderRequests
    with the reference's fake-first-IP scheme, and admit them into the
    frontier checkpoints so ``crawl --resume`` respiders them.  (The
    reference's query runs over the search index; we query the docs
    table — same selection contract, no index needed.)"""
    import os

    import pyarrow.dataset as pads

    from .pipelines.crawl import _ckpt_path
    from .stages.canonicalize import make_reindex_request_cols, split_by_partition
    from .state.frontier import FrontierCore

    manifest_path = os.path.join(args.out, "checkpoints", "MANIFEST.json")
    if not os.path.exists(manifest_path):
        print(json.dumps({"error": "no checkpoints found", "out": args.out}))
        return 1
    with open(manifest_path) as f:
        manifest = json.load(f)
    docs = pads.dataset(f"{args.out}/docs", format="parquet").to_table(
        columns=["doc_id"]
    )
    urls = [u for u in docs["doc_id"].to_pylist() if args.contains in u]
    cols = make_reindex_request_cols(
        urls,
        added_time=manifest.get("now", 0) // 1000,  # sr.m_addedTime = nowGlobal
        force_delete=args.delete,
    )
    P = manifest["partitions"]
    admitted = 0
    for p, sub in split_by_partition(cols, P):
        path = _ckpt_path(args.out, p)
        with open(path, "rb") as f:
            core = FrontierCore.from_checkpoint_bytes(f.read())
        admitted += core.add_requests(sub)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(core.checkpoint_bytes({"wave": manifest["wave"]}))
        os.replace(tmp, path)
    print(
        json.dumps(
            {
                "matched_docs": len(urls),
                "requests": int(len(cols["url"])),
                "admitted": admitted,
                "note": "run crawl --resume to respider",
            }
        )
    )
    return 0


def cmd_compact(args) -> int:
    """Rdb dump/merge surface: export the live frontier (from the crawl's
    checkpoints) as an append-only LOG_COLUMNS parquet, then run the
    distributed compaction job (dedupSpiderdbList semantics,
    Spider.cpp:3714-4021) over it.  ``--raw-only`` skips the merge."""
    import os

    import pyarrow.parquet as pq

    from .pipelines.compact import compact_frontier, export_log
    from .pipelines.crawl import _ckpt_path
    from .state.frontier import FrontierCore

    manifest_path = os.path.join(args.out, "checkpoints", "MANIFEST.json")
    if not os.path.exists(manifest_path):
        print(json.dumps({"error": "no checkpoints found", "out": args.out}))
        return 1
    with open(manifest_path) as f:
        manifest = json.load(f)
    os.makedirs(args.dest, exist_ok=True)
    tables = []
    for p in range(manifest["partitions"]):
        with open(_ckpt_path(args.out, p), "rb") as f:
            tables.append(export_log(FrontierCore.from_checkpoint_bytes(f.read())))
    import pyarrow as pa

    log = pa.concat_tables(tables)
    raw_path = os.path.join(args.dest, "frontier_log.parquet")
    pq.write_table(log, raw_path)
    result = {"log_rows": log.num_rows, "raw": raw_path}
    if not args.raw_only:
        _init_ray(args.num_cpus)
        import ray.data as rd

        compacted = compact_frontier(rd.read_parquet(raw_path)).to_pandas()
        comp_path = os.path.join(args.dest, "frontier_compacted.parquet")
        pq.write_table(pa.Table.from_pandas(compacted, preserve_index=False), comp_path)
        result.update({"compacted_rows": len(compacted), "compacted": comp_path})
    print(json.dumps(result))
    return 0


def cmd_dump(args) -> int:
    import pyarrow.dataset as pads

    what = args.what
    if what == "docs":
        t = pads.dataset(f"{args.out}/docs", format="parquet").to_table()
        for r in t.to_pylist()[: args.limit]:
            print(json.dumps({"doc_id": r["doc_id"], "n_spans": len(r["spans"])}))
        print(f"# {t.num_rows} docs", file=sys.stderr)
    elif what == "launches":
        import pyarrow.parquet as pq

        t = pq.read_table(f"{args.out}/launch_log.parquet")
        for r in t.to_pylist()[: args.limit]:
            print(json.dumps(r))
        print(f"# {t.num_rows} launches", file=sys.stderr)
    elif what == "urlseen":
        import pyarrow.parquet as pq

        t = pq.read_table(f"{args.out}/url_seen.parquet")
        for r in t.to_pylist()[: args.limit]:
            print(json.dumps(r))
        print(f"# {t.num_rows} seen", file=sys.stderr)
    elif what == "metrics":
        with open(f"{args.out}/metrics.json") as f:
            print(f.read())
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="open_source_search_engine_ray")
    p.add_argument("--num-cpus", type=int, default=8)
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("crawl")
    c.add_argument("--out", required=True)
    c.add_argument("--hosts", type=int, default=50)
    c.add_argument("--hubs", type=int, default=3)
    c.add_argument("--hub-pages", type=int, default=30)
    c.add_argument("--max-pages", type=int, default=10)
    c.add_argument("--partitions", type=int, default=4)
    c.add_argument("--horizon-ms", type=int, default=600_000)
    c.add_argument("--wave-window-ms", type=int, default=1000)
    c.add_argument("--checkpoint-every", type=int, default=0)
    c.add_argument("--resume", action="store_true")
    c.add_argument("--bloom-only", action="store_true")
    c.set_defaults(fn=cmd_crawl)

    i = sub.add_parser("inject")
    i.add_argument("--out", required=True)
    i.add_argument("--hosts", type=int, default=50)
    i.add_argument("urls", nargs="+")
    i.set_defaults(fn=cmd_inject)

    r = sub.add_parser("reindex")
    r.add_argument("--out", required=True)
    r.add_argument("--contains", required=True)
    r.add_argument("--delete", action="store_true")
    r.set_defaults(fn=cmd_reindex)

    m = sub.add_parser("compact")
    m.add_argument("--out", required=True)
    m.add_argument("--dest", required=True)
    m.add_argument("--raw-only", action="store_true")
    m.set_defaults(fn=cmd_compact)

    d = sub.add_parser("dump")
    d.add_argument("--out", required=True)
    d.add_argument("what", choices=["docs", "launches", "urlseen", "metrics"])
    d.add_argument("--limit", type=int, default=20)
    d.set_defaults(fn=cmd_dump)

    args = p.parse_args(argv)
    rc = args.fn(args)
    try:
        import ray

        if ray.is_initialized():
            ray.shutdown()
    except ImportError:
        pass
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
