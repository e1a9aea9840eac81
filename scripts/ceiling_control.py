"""No-Ray ceiling control: the crawl's per-URL workload (fetch+parse+
route-payload build) under plain multiprocessing at 8(pinned) vs 32
procs — measures the box, no engine involved.

This is the control experiment behind BASELINE.md's "single-box
ceiling" analysis: it runs the exact per-URL compute of the headline
crawl (SynthWeb fetch, columnar span parse, route-back payload build)
with no Ray in the picture, so the measured 8->32 efficiency is the
host's memory-subsystem ceiling for this workload. Run on an IDLE box.
"""
import multiprocessing as mp
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def worker(args):
    wid, n_batches, pin = args
    if pin:
        os.sched_setaffinity(0, range(8))
    import numpy as np
    import pyarrow as pa

    from open_source_search_engine_ray.functions.gbhash import uh48_batch
    from open_source_search_engine_ray.pipelines.crawl import route_back_payloads
    from open_source_search_engine_ray.sources.synthweb import WebConfig, get_web
    from open_source_search_engine_ray.stages.fetch import FetchStage, ParseStage

    web_cfg = WebConfig(n_hosts=150000, n_hubs=20, hub_pages=12,
                        max_pages=4, span_scale=8)
    web = get_web(web_cfg)
    ips = {h: int(ip) for h, ip in zip(web.hosts, web.ips)}
    fs = FetchStage(web_cfg, "gigablastbot")
    ps = ParseStage(web_cfg, 16)
    out_dir = tempfile.mkdtemp(prefix=f"ctl{wid}_", dir="/dev/shm")
    os.makedirs(out_dir + "/docs", exist_ok=True)
    total = 0
    t0 = time.perf_counter()
    for b in range(n_batches):
        hostbase = (wid * 9973 + b * 131) % 140000
        urls = []
        for hh in range(hostbase, hostbase + 256):
            pc = int(web.page_counts[hh])
            for p in range(min(pc, 4)):
                urls.append(web.page_url(hh, p))
        urls = urls[:1024]
        hosts = [u.split("://", 1)[1].split("/", 1)[0] for u in urls]
        t = pa.table({
            "url": pa.array(urls), "host": pa.array(hosts),
            "uh48": pa.array(uh48_batch(urls)),
            "first_ip": pa.array([ips[h] for h in hosts], pa.int64()),
            "dom_hash32": pa.array(np.zeros(len(urls), np.int64)),
            "launch_ms": pa.array(np.full(len(urls), 1000, np.int64)),
            "wave": pa.array(np.zeros(len(urls), np.int64)),
            "hop_count": pa.array(np.zeros(len(urls), np.int64)),
            "priority": pa.array(np.zeros(len(urls), np.int64)),
            "harvest_links": pa.array(np.ones(len(urls), np.bool_)),
        })
        route_back_payloads(ps(fs(t)), out_dir)
        total += len(urls)
    return total, time.perf_counter() - t0


def run_level(nproc, pin, n_batches=6):
    with mp.Pool(nproc) as pool:
        res = pool.map(worker, [(w, n_batches, pin) for w in range(nproc)])
    tot = sum(r[0] for r in res)
    wall = max(r[1] for r in res)
    return tot / wall


if __name__ == "__main__":
    mp.set_start_method("spawn")
    # interleave legs so host drift hits both levels alike
    a8 = run_level(8, True)
    a32 = run_level(32, False)
    b8 = run_level(8, True)
    b32 = run_level(32, False)
    lo, hi = max(a8, b8), max(a32, b32)
    print(f"8 procs pinned: {a8:,.0f} / {b8:,.0f} urls/s; "
          f"32 procs: {a32:,.0f} / {b32:,.0f}")
    print(f"no-Ray workload ceiling 8->32: {hi / lo / 4:.3f}")
