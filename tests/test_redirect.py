"""Simplified-redirect handling (reference EDOCSIMPLIFIEDREDIR,
XmlDoc.cpp:5621-5663: a 301 page is not indexed; its target is emitted
as the page's single outlink with the hop count preserved)."""

import tempfile

from open_source_search_engine_ray.functions.urlfilter import ERR_SIMPLIFIED_REDIR
from open_source_search_engine_ray.pipelines.crawl import run_crawl
from open_source_search_engine_ray.sources.synthweb import SynthWeb, WebConfig, fetch_url
from open_source_search_engine_ray.state.frontier import CrawlConfig

WEB = WebConfig(n_hosts=20, n_hubs=2, hub_pages=12, max_pages=6, redirect_frac=0.35)


def test_fetch_url_returns_301_with_location():
    web = SynthWeb(WEB)
    fr = fetch_url(web, f"http://{web.hosts[4]}/r0.html")
    assert fr.http_status == 301
    assert fr.err_code == ERR_SIMPLIFIED_REDIR
    assert fr.location == web.page_url(4, 0)
    assert fr.html == ""
    # alias of a nonexistent page is a plain 404
    fr2 = fetch_url(web, f"http://{web.hosts[4]}/r999.html")
    assert fr2.http_status == 404 and fr2.location == ""


def test_redirect_frac_zero_keeps_fixture_identical():
    """The guarded RNG draw: default configs must generate the exact
    same web as before the feature existed."""
    a = SynthWeb(WebConfig(n_hosts=10, seed=7))
    b = SynthWeb(WebConfig(n_hosts=10, seed=7, redirect_frac=0.0))
    for i, p in a.iter_pages():
        assert a.page_spans(i, p) == b.page_spans(i, p)


def test_redirect_crawl_engine_equals_oracle(ray_session):
    cfg = CrawlConfig(num_partitions=3, horizon_ms=800_000)
    o = run_crawl(WEB, cfg, tempfile.mkdtemp(), engine="local")
    e = run_crawl(WEB, cfg, tempfile.mkdtemp(), engine="ray")
    assert o.launch_log.to_pylist() == e.launch_log.to_pylist()
    assert o.url_seen == e.url_seen and o.metrics == e.metrics
    assert o.fetch_log == e.fetch_log

    log = o.launch_log.to_pandas()
    alias_rows = log[log["url"].str.match(r"http://[^/]+/r\d+\.html")]
    assert len(alias_rows) > 0  # some alias URLs were crawled
    web = SynthWeb(WEB)
    docs = set(o.docs_table()["doc_id"].to_pylist())
    for r in alias_rows.to_dict("records"):
        assert r["url"] not in docs  # a 301 page is never indexed
    # every alias whose fetch actually produced the 301 (i.e. not
    # robots-blocked / fail-mode hosts) got its target into URL-seen
    seen_urls = {u for (_h, u) in o.url_seen}
    redirected = {
        uh for (uh, _t, http, _err, _ec, _cd) in o.fetch_log if http == 301
    }
    checked = 0
    for r in alias_rows.to_dict("records"):
        if r["uh48"] in redirected:
            assert web.redirect_target(r["url"]) in seen_urls, r["url"]
            checked += 1
    assert checked > 0


def test_parse_stage_keeps_hop_for_redirect_target():
    """Unit check of XmlDoc.cpp:15377-15381: the redirect-target request
    carries the PARENT's hop count, not hop+1 — unless the target is a
    site root, which always resets to 0 ("if (issiteroot) m_hopCount=0"
    comes after the redirect keep and wins)."""
    import pyarrow as pa

    from open_source_search_engine_ray.functions.gbhash import uh48_batch
    from open_source_search_engine_ray.stages.fetch import FetchStage, ParseStage
    from open_source_search_engine_ray.state.frontier import LAUNCH_SCHEMA

    web = SynthWeb(WEB)

    def parse_alias(h: int, k: int) -> list[dict]:
        alias = f"http://{web.hosts[h]}/r{k}.html"
        row = {
            "url": alias, "uh48": int(uh48_batch([alias])[0]),
            "first_ip": int(web.ips[h]), "host": web.hosts[h],
            "dom_hash32": 1, "hop_count": 3, "added_time": 5,
            "priority": 47, "ufn": 3, "harvest_links": True,
            "err_count": 0, "launch_ms": 1000,
            "wave": 2, "part_id": 0, "seq": 0,
        }
        t = pa.Table.from_pylist([row], schema=LAUNCH_SCHEMA)
        recs = ParseStage(web.cfg, 4)(FetchStage(web.cfg)(t)).to_pylist()
        assert [r for r in recs if r["rec"] == "reply"][0][
            "err_code"
        ] == ERR_SIMPLIFIED_REDIR
        assert not [r for r in recs if r["rec"] == "doc"]
        return [r for r in recs if r["rec"] == "request"]

    # non-root target (host 0 /r1.html → /p1.html): parent hop preserved
    reqs = parse_alias(0, 1)
    assert len(reqs) == 1
    assert reqs[0]["url"] == web.page_url(0, 1)
    assert reqs[0]["hop_count"] == 3  # preserved, not 4

    # site-root target (host 4 /r0.html → /): root override wins → hop 0
    reqs = parse_alias(4, 0)
    assert len(reqs) == 1
    assert reqs[0]["url"] == web.page_url(4, 0)
    assert reqs[0]["is_root"] and reqs[0]["hop_count"] == 0


def test_redirect_error_reply_recorded(ray_session):
    cfg = CrawlConfig(num_partitions=2, horizon_ms=800_000)
    res = run_crawl(WEB, cfg, tempfile.mkdtemp(), engine="local")
    redirs = [x for x in res.fetch_log if x[3] == ERR_SIMPLIFIED_REDIR]
    assert len(redirs) > 0
    for (_uh, _t, http, err, _ec, _cd) in redirs:
        assert http == 301
