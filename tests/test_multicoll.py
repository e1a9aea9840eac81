"""Multi-collection round-robin (reference SpiderLoop collection
rotation / getNextCollToSpider): interleaved collections produce
exactly the results of standalone per-collection runs."""

import tempfile

from open_source_search_engine_ray.pipelines.crawl import run_crawl, run_multi_crawl
from open_source_search_engine_ray.sources.synthweb import SynthWeb, WebConfig
from open_source_search_engine_ray.state.frontier import CrawlConfig

WEB = WebConfig(n_hosts=20, n_hubs=2, hub_pages=10, max_pages=5)


def _colls():
    web = SynthWeb(WEB)
    full = tuple(web.site_list())
    return {
        # same web, different policies per collection
        "web": CrawlConfig(num_partitions=2, horizon_ms=500_000, site_list=full),
        "shallow": CrawlConfig(
            num_partitions=3,
            horizon_ms=500_000,
            site_list=tuple("tag:shallow " + d for d in full),
            profile="shallow",
        ),
        "budget": CrawlConfig(
            num_partitions=2, horizon_ms=500_000, site_list=full, max_pages=15
        ),
    }


def test_multi_equals_standalone_local():
    multi = run_multi_crawl(WEB, _colls(), tempfile.mkdtemp(), engine="local")
    for name, cfg in _colls().items():
        solo = run_crawl(WEB, cfg, tempfile.mkdtemp(), engine="local")
        assert multi[name].launch_log.to_pylist() == solo.launch_log.to_pylist(), name
        assert multi[name].url_seen == solo.url_seen, name
        assert multi[name].metrics == solo.metrics, name


def test_multi_ray_equals_local(ray_session):
    lo = run_multi_crawl(WEB, _colls(), tempfile.mkdtemp(), engine="local")
    hi = run_multi_crawl(WEB, _colls(), tempfile.mkdtemp(), engine="ray")
    for name in lo:
        assert lo[name].launch_log.to_pylist() == hi[name].launch_log.to_pylist(), name
        assert lo[name].url_seen == hi[name].url_seen, name
        assert lo[name].metrics == hi[name].metrics, name
    # the three collections genuinely differ (different policies)
    assert lo["web"].metrics["launched"] != lo["shallow"].metrics["launched"]
    # max_pages is a per-partition launch budget
    assert lo["budget"].metrics["launched"] <= 15 * 2
    assert lo["budget"].metrics["launched"] < lo["web"].metrics["launched"]
