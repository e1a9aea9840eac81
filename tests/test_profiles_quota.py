"""Filter profiles (privacore/shallow, Collectiondb.cpp:1639, 2248) and
quota counting (sitepages/domainpages, SpiderColl.cpp:2754-2798) driven
through the real crawl engine."""

import tempfile

import numpy as np

from open_source_search_engine_ray.functions.urlfilter import UrlFilterRule
from open_source_search_engine_ray.pipelines.crawl import run_crawl
from open_source_search_engine_ray.sources.synthweb import SynthWeb, WebConfig
from open_source_search_engine_ray.state.frontier import CrawlConfig, FrontierCore

WEB = WebConfig(n_hosts=20, n_hubs=2, hub_pages=25, max_pages=6)


def test_shallow_profile_crawl_engine_equals_oracle(ray_session):
    """Tagged-shallow sites stop at hopcount 2 (max_spiders=0 row);
    engine and oracle agree under the shallow profile."""
    web = SynthWeb(WEB)
    lines = tuple("tag:shallow " + d for d in web.site_list())
    cfg = CrawlConfig(
        num_partitions=3, horizon_ms=800_000, site_list=lines, profile="shallow"
    )
    o = run_crawl(WEB, cfg, tempfile.mkdtemp(), engine="local")
    e = run_crawl(WEB, cfg, tempfile.mkdtemp(), engine="ray")
    assert o.launch_log.to_pylist() == e.launch_log.to_pylist()
    assert o.url_seen == e.url_seen and o.metrics == e.metrics
    log = o.launch_log.to_pandas()
    assert len(log) > 5
    assert log["hop_count"].max() <= 1  # tag:shallow && hopcount>=2 blocks
    # the same web under the web profile goes deeper
    cfg_web = CrawlConfig(
        num_partitions=3, horizon_ms=800_000, site_list=tuple(web.site_list())
    )
    w = run_crawl(WEB, cfg_web, tempfile.mkdtemp(), engine="local")
    assert w.launch_log.to_pandas()["hop_count"].max() >= 2
    assert w.metrics["launched"] > o.metrics["launched"]


def _mk_request_cols(urls, site32, dom32, hop=1):
    from open_source_search_engine_ray.functions.gbhash import uh48_batch

    n = len(urls)
    return {
        "url": np.array(urls, dtype=object),
        "uh48": uh48_batch(urls),
        "first_ip": np.full(n, 7, dtype=np.int64),
        "host": np.array(["s.test"] * n, dtype=object),
        "dom_hash32": np.full(n, dom32, dtype=np.int64),
        "site_hash32": np.full(n, site32, dtype=np.int64),
        "hop_count": np.full(n, hop, dtype=np.int64),
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


def test_sitepages_quota_blocks_after_threshold():
    """Once N pages of a site are indexed, a `sitepages>=N` max_spiders=0
    rule stops further launches for that site."""
    rules = (
        UrlFilterRule("sitepages>=3", 30, 40, max_spiders_per_rule=0),
        UrlFilterRule("default", 1, 60, 9, 7, 0),
    )
    cfg = CrawlConfig(
        num_partitions=1, rules=rules, site_list=("s.test",), verify_integrity=True
    )
    core = FrontierCore(0, cfg)
    urls = [f"http://s.test/p{i}.html" for i in range(6)]
    core.add_requests(_mk_request_cols(urls, site32=11, dom32=22))
    t = core.schedule(now_ms=1000)
    assert t.num_rows > 0
    # complete 3 of them as indexed
    done = t.to_pylist()[:3]
    core.complete(
        {
            "uh48": np.array([r["uh48"] for r in done], dtype=np.uint64),
            "first_ip": np.array([r["first_ip"] for r in done]),
            "dom_hash32": np.array([22] * 3),
            "spidered_time": np.array([2, 2, 2], dtype=np.int64),
            "download_end_ms": np.array([2000, 2000, 2000], dtype=np.int64),
            "err_code": np.zeros(3, dtype=np.int64),
            "http_status": np.full(3, 200, dtype=np.int64),
            "crawl_delay_ms": np.full(3, -1, dtype=np.int64),
            "lang": np.array(["en"] * 3, dtype=object),
            "content_hash32": np.array([5, 6, 7], dtype=np.int64),
        }
    )
    assert core.quota_site.get(11) == 3
    assert core.quota_dom.get(22) == 3
    # release the rest of the in-flight urls as errors (not indexed)
    rest = t.to_pylist()[3:]
    if rest:
        n = len(rest)
        core.complete(
            {
                "uh48": np.array([r["uh48"] for r in rest], dtype=np.uint64),
                "first_ip": np.array([r["first_ip"] for r in rest]),
                "dom_hash32": np.array([22] * n),
                "spidered_time": np.full(n, 2, dtype=np.int64),
                "download_end_ms": np.full(n, 2000, dtype=np.int64),
                "err_code": np.full(n, 3, dtype=np.int64),  # 404: not indexed
                "http_status": np.full(n, 404, dtype=np.int64),
                "crawl_delay_ms": np.full(n, -1, dtype=np.int64),
                "lang": np.array(["en"] * n, dtype=object),
                "content_hash32": np.zeros(n, dtype=np.int64),
            }
        )
    assert core.quota_site.get(11) == 3  # errors don't count
    # site hit the quota: every remaining candidate maps to the
    # max_spiders=0 row and nothing more launches
    t2 = core.schedule(now_ms=10_000_000)
    assert t2.num_rows == 0
