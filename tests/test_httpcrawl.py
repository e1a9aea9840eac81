"""End-to-end real-socket crawl: FrontierCore scheduling + HttpFetchStage
politeness + real-HTML parsing against a localhost static site (the
reference's test/system httpserver crawl, test/Makefile)."""

import time

import pyarrow.dataset as pads
import pytest

from open_source_search_engine_ray.functions.urlfilter import UrlFilterRule
from open_source_search_engine_ray.pipelines.httpcrawl import run_http_crawl
from open_source_search_engine_ray.state.frontier import CrawlConfig
from open_source_search_engine_ray.testing import StaticSiteServer

SITES = {
    "a.test": {
        "/": (
            "<html><head><title>A</title></head><body>"
            "<h1>Fish &amp; chips</h1>"
            '<a href="/p1.html">one</a> <a href="/p2.html">two</a>'
            '<a href="http://b.test/">other site</a>'
            '<a href="http://deny.test/secret.html">denied</a>'
            '<a href="http://nodns.test/x.html">dead</a>'
            "</body></html>"
        ),
        "/p1.html": "<html><body><p>caf&eacute; page one</p></body></html>",
        "/p2.html": '<html><body><a href="/p1.html">back</a>page two</body></html>',
    },
    "b.test": {
        "/": '<html><body><a href="/x.html">x</a>hello b</body></html>',
        "/x.html": "<html><body>leaf</body></html>",
    },
    "cd.test": {
        "/": '<html><body><a href="/d1.html">d1</a><a href="/d2.html">d2</a></body></html>',
        "/d1.html": "<html><body>delayed one</body></html>",
        "/d2.html": "<html><body>delayed two</body></html>",
    },
    "deny.test": {"/secret.html": "<html><body>never seen</body></html>"},
}
ROBOTS = {
    "cd.test": "User-agent: *\nCrawl-delay: 0.3\n",
    "deny.test": "User-agent: *\nDisallow: /\n",
}

RULES = (UrlFilterRule("default", 50, 30.0, 9, 7, same_ip_wait_ms=100),)


@pytest.fixture(scope="module")
def crawl(ray_session, tmp_path_factory):
    srv = StaticSiteServer(SITES, ROBOTS).start()
    out = str(tmp_path_factory.mktemp("httpcrawl"))
    res = run_http_crawl(
        seeds=["http://a.test/", "http://cd.test/", "http://deny.test/secret.html"],
        resolve=srv.resolve_map(),  # nodns.test absent → DNS failure
        out_dir=out,
        cfg=CrawlConfig(num_partitions=2, horizon_ms=60_000, rules=RULES),
        n_fetchers=2,
    )
    res["server"] = srv
    yield res
    srv.stop()


def test_reachable_pages_crawled(crawl):
    docs = pads.dataset(crawl["docs_dir"], format="parquet").to_table()
    got = set(docs["doc_id"].to_pylist())
    want = {
        "http://a.test/",
        "http://a.test/p1.html",
        "http://a.test/p2.html",
        "http://b.test/",
        "http://b.test/x.html",
        "http://cd.test/",
        "http://cd.test/d1.html",
        "http://cd.test/d2.html",
    }
    assert got == want
    # every page fetched exactly once (URL-seen dedup of the /p1 dup link)
    assert docs.num_rows == len(want)


def test_robots_denied_never_hit(crawl):
    srv = crawl["server"]
    assert not any(h == "deny.test" and p != "/robots.txt" for _, h, p in srv.hits)
    assert crawl["metrics"]["errors"] >= 2  # robots denial + DNS failure


def test_politeness_gap_real_clock(crawl):
    hits = sorted(
        t for t, h, p in crawl["server"].hits if h == "cd.test" and p != "/robots.txt"
    )
    assert len(hits) == 3
    # robots Crawl-delay 0.3 s enforced on the wall clock between fetches
    gaps = [b - a for a, b in zip(hits, hits[1:])]
    assert all(g >= 0.25 for g in gaps), gaps


def test_entities_decoded_in_spans(crawl):
    docs = pads.dataset(crawl["docs_dir"], format="parquet").to_table().to_pylist()
    by_id = {d["doc_id"]: d["spans"] for d in docs}
    texts = [s["text"] for s in by_id["http://a.test/"] if s["kind"] == "text"]
    assert "Fish & chips" in texts
    p1 = [s["text"] for s in by_id["http://a.test/p1.html"] if s["kind"] == "text"]
    assert p1 == ["café page one"]


def test_url_seen_and_log(crawl):
    urls = [u for _, u in crawl["url_seen"]]
    assert len(urls) == len(set(urls))
    assert "http://nodns.test/x.html" in urls  # seen, failed at fetch
    log = crawl["launch_log"]
    assert log.num_rows == crawl["metrics"]["launched"]
    # the dead host was launched (then DNS-failed); denied was launched
    # (then robots-gated inside the fetch tier, as in Msg13)
    assert "http://nodns.test/x.html" in log["url"].to_pylist()


def test_checkpoint_resume_socket_crawl(ray_session, tmp_path):
    """Kill the socket crawl mid-run (max_waves), resume from the
    per-partition checkpoints: the final doc set and URL-seen equal an
    uninterrupted run, and post-checkpoint partial waves respider."""
    srv = StaticSiteServer(SITES, ROBOTS).start()
    try:
        cfg = CrawlConfig(num_partitions=2, horizon_ms=60_000, rules=RULES)
        seeds = ["http://a.test/", "http://cd.test/"]
        full = run_http_crawl(
            seeds, srv.resolve_map(), str(tmp_path / "full"),
            cfg=cfg, n_fetchers=2,
        )
        out = str(tmp_path / "ck")
        part = run_http_crawl(
            seeds, srv.resolve_map(), out,
            cfg=cfg, n_fetchers=2, checkpoint_every=2, max_waves=3,
        )
        import pyarrow.dataset as pads2

        partial_docs = pads2.dataset(part["docs_dir"], format="parquet").to_table()
        assert partial_docs.num_rows < 8  # genuinely interrupted
        res = run_http_crawl(
            seeds, srv.resolve_map(), out,
            cfg=cfg, n_fetchers=2, checkpoint_every=2, resume=True,
        )
        docs = pads2.dataset(res["docs_dir"], format="parquet").to_table()
        want = set(
            pads2.dataset(full["docs_dir"], format="parquet")
            .to_table()["doc_id"]
            .to_pylist()
        )
        assert set(docs["doc_id"].to_pylist()) == want
        # each page indexed exactly once despite the kill
        assert docs.num_rows == len(want)
        assert [u for _, u in res["url_seen"]] == [u for _, u in full["url_seen"]]
        # the resumed launch log covers the full history (both runs)
        assert res["launch_log"].num_rows >= full["launch_log"].num_rows
    finally:
        srv.stop()
