"""Skew hardening (hot-hub web, adaptive winner caps) and real-clock
pacing (politeness gaps as wall-time delays)."""

import tempfile
import time
from dataclasses import replace

import numpy as np

from open_source_search_engine_ray.functions.schedule import adaptive_max_winners
from open_source_search_engine_ray.functions.urlfilter import (
    UrlFilterRule,
    default_web_rules,
)
from open_source_search_engine_ray.pipelines.crawl import run_crawl
from open_source_search_engine_ray.sources.synthweb import SynthWeb, WebConfig
from open_source_search_engine_ray.state.frontier import CrawlConfig, FrontierCore


def test_adaptive_max_winners_tiers():
    # SpiderColl.cpp:3167-3182
    assert adaptive_max_winners(1_000) == 1
    assert adaptive_max_winners(24_999) == 1
    assert adaptive_max_winners(25_000) == 400
    assert adaptive_max_winners(9_999_999) == 400
    assert adaptive_max_winners(10_000_000) == 2000


def _cols(urls, ip=7):
    from open_source_search_engine_ray.functions.gbhash import uh48_batch

    n = len(urls)
    return {
        "url": np.array(urls, dtype=object),
        "uh48": uh48_batch(urls),
        "first_ip": np.full(n, ip, dtype=np.int64),
        "host": np.array(["s.test"] * n, dtype=object),
        "dom_hash32": np.full(n, 5, dtype=np.int64),
        "site_hash32": np.full(n, 6, dtype=np.int64),
        "hop_count": np.ones(n, dtype=np.int64),
        "added_time": np.zeros(n, dtype=np.int64),
        "parent_ip": np.zeros(n, dtype=np.int64),
        "is_injecting": np.zeros(n, dtype=bool),
        "is_addurl": np.zeros(n, dtype=bool),
        "is_reindex": np.zeros(n, dtype=bool),
        "fake_first_ip": np.zeros(n, dtype=bool),
        "is_root": np.zeros(n, dtype=bool),
        "is_rssext": np.zeros(n, dtype=bool),
        "is_permalink_format": np.zeros(n, dtype=bool),
    }


def test_adaptive_caps_serialize_tiny_scans():
    """With caps on, a tiny per-IP scan keeps one winner (the reference's
    small-list doledb behavior); with caps off the full chain launches."""
    rules = tuple(replace(r, same_ip_wait_ms=0) for r in default_web_rules())
    urls = [f"http://s.test/p{i}.html" for i in range(40)]
    base = dict(num_partitions=1, rules=rules, site_list=("s.test",))
    on = FrontierCore(0, CrawlConfig(adaptive_winner_caps=True, **base))
    on.add_requests(_cols(urls))
    assert on.schedule(now_ms=1000).num_rows == 1
    off = FrontierCore(0, CrawlConfig(**base))
    off.add_requests(_cols(urls))
    assert off.schedule(now_ms=1000).num_rows > 1


def test_hot_hub_skew_engine_equals_oracle(ray_session):
    """One hub host with ~40x the pages of the rest: winner selection,
    overflow and chunked fetch fan-out stay byte-identical to the
    sequential oracle under skew."""
    web_cfg = WebConfig(n_hosts=25, n_hubs=1, hub_pages=150, max_pages=4)
    cfg = CrawlConfig(num_partitions=3, horizon_ms=2_000_000)
    o = run_crawl(web_cfg, cfg, tempfile.mkdtemp(), engine="local")
    e = run_crawl(web_cfg, cfg, tempfile.mkdtemp(), engine="ray")
    assert o.metrics["launched"] > 100
    hub_host = SynthWeb(web_cfg).hosts[0]
    log = o.launch_log.to_pandas()
    assert (log["host"] == hub_host).sum() > 50  # the hub dominates
    assert o.launch_log.to_pylist() == e.launch_log.to_pylist()
    assert o.url_seen == e.url_seen
    assert o.metrics == e.metrics


def test_real_clock_paces_politeness(ray_session):
    """real_clock=True: the driver sleeps to the next event, so per-IP
    politeness gaps are enforced in wall time (CLAUDE.md item 5)."""
    gap = 120
    rules = tuple(replace(r, same_ip_wait_ms=gap) for r in default_web_rules())
    web_cfg = WebConfig(n_hosts=4, n_hubs=1, hub_pages=5, max_pages=3)
    cfg = CrawlConfig(
        num_partitions=2,
        horizon_ms=60_000,
        rules=rules,
        real_clock=True,
        wave_window_ms=0,
    )
    t0 = time.monotonic()
    res = run_crawl(web_cfg, cfg, tempfile.mkdtemp(), engine="ray")
    wall_ms = (time.monotonic() - t0) * 1000
    log = res.launch_log.to_pandas()
    assert len(log) >= 5
    per_ip = log.groupby("first_ip")["launch_ms"].apply(
        lambda s: s.sort_values().diff().dropna().min()
    )
    # consecutive same-IP launches spaced at least the politeness gap
    assert (per_ip.dropna() >= gap).all()
    # and the crawl actually took the wall time those gaps imply
    busiest = log.groupby("first_ip").size().max()
    assert wall_ms >= (busiest - 1) * gap
