"""Respider unchanged-content semantics over real sockets.

Reference: a respider request carries the old doc's contentHash32 and
spidered time (XmlDoc.cpp:8157-8162); identical content →
EDOCUNCHANGED (Msg13.cpp:1434-1446 hash match, or HTTP 304 to the
conditional GET when the "use ifModifiedSince" parm is on,
Parms.cpp:8742); the reply is rewritten to a success with the old
hash/langId carried forward and the doc is recycled, not reindexed
(XmlDoc.cpp:14757,14780-14800)."""

import pyarrow.dataset as pads
import pytest

from open_source_search_engine_ray.functions.urlfilter import UrlFilterRule
from open_source_search_engine_ray.pipelines.httpcrawl import run_http_crawl
from open_source_search_engine_ray.state.frontier import CrawlConfig
from open_source_search_engine_ray.testing import StaticSiteServer

SITES = {"r.test": {"/": "<html><body>stable page</body></html>"}}

#: respider nearly immediately (freq 1e-5 days → wait_s truncates to 0)
RULES = (UrlFilterRule("default", 50, 1e-5, 9, 7, same_ip_wait_ms=200),)


def _crawl(tmp_path, srv, **fetcher_kwargs):
    return run_http_crawl(
        seeds=["http://r.test/"],
        resolve=srv.resolve_map(),
        out_dir=str(tmp_path),
        cfg=CrawlConfig(num_partitions=1, horizon_ms=2500, rules=RULES),
        n_fetchers=1,
        fetcher_kwargs=fetcher_kwargs or None,
    )


def test_content_hash_unchanged_recycles(ray_session, tmp_path):
    srv = StaticSiteServer(SITES).start()
    try:
        res = _crawl(tmp_path / "a", srv)
    finally:
        srv.stop()
    # the page was re-downloaded at least once and every respider saw
    # identical content (getContentHash32Fast match → EDOCUNCHANGED)
    page_hits = [p for _, h, p in srv.hits if p != "/robots.txt"]
    assert len(page_hits) >= 2
    assert res["metrics"]["unchanged"] >= 1
    assert res["metrics"]["unchanged"] == len(page_hits) - 1
    # recycled content: the doc is written exactly once
    docs = pads.dataset(res["docs_dir"], format="parquet").to_table()
    assert docs["doc_id"].to_pylist() == ["http://r.test/"]
    # reply state is a SUCCESS (errCode 0, "call it 200"), so the
    # errorcount>=1 rules never fire for unchanged respiders
    assert res["metrics"]["errors"] == 0


def test_if_modified_since_304(ray_session, tmp_path):
    srv = StaticSiteServer(
        SITES, last_modified="Sun, 06 Nov 1994 08:49:37 GMT"
    ).start()
    try:
        res = _crawl(
            tmp_path / "b", srv, use_if_modified_since=True
        )
    finally:
        srv.stop()
    # respiders sent the conditional GET and got 304s back
    assert len(srv.ims_hits) >= 1
    assert res["metrics"]["unchanged"] >= len(srv.ims_hits)
    assert res["metrics"]["errors"] == 0
    docs = pads.dataset(res["docs_dir"], format="parquet").to_table()
    assert docs["doc_id"].to_pylist() == ["http://r.test/"]


def test_ims_header_format():
    """HttpRequest.cpp:206-219: asctime + " UTC" with \\r\\n splice."""
    import asyncio

    from open_source_search_engine_ray.stages.httpfetch import HttpFetchStage

    captured = {}

    async def _serve():
        async def handle(reader, writer):
            captured["head"] = await reader.readuntil(b"\r\n\r\n")
            writer.write(
                b"HTTP/1.1 304 Not Modified\r\nContent-Length: 0\r\n\r\n"
            )
            await writer.drain()
            writer.close()

        srv = await asyncio.start_server(handle, "127.0.0.1", 0)
        return srv, srv.sockets[0].getsockname()[1]

    loop = asyncio.new_event_loop()
    srv, port = loop.run_until_complete(_serve())
    st = HttpFetchStage(
        resolve={"x.test": ("127.0.0.1", port)}, use_if_modified_since=True
    )

    async def go():
        return await st._download("http://x.test/", ims=784111777)

    fr = loop.run_until_complete(go())
    srv.close()
    loop.run_until_complete(srv.wait_closed())
    loop.close()
    head = captured["head"].decode("latin-1")
    assert "If-Modified-Since: Sun Nov  6 08:49:37 1994 UTC\r\n" in head
    assert fr.http_status == 304


def test_unconditional_304_is_not_unchanged():
    """ADVICE r4 regression: a 304 to an UNconditional GET (ims=0 — no
    If-Modified-Since sent, no prior reply to recycle) must stay an
    error-status reply, not EDOCUNCHANGED — the recycle rewrite would
    otherwise fabricate a success with prev_content_hash32=0 and lang
    'xx' for a document that was never fetched."""
    import asyncio

    from open_source_search_engine_ray.functions import urlfilter
    from open_source_search_engine_ray.stages.httpfetch import HttpFetchStage

    async def _serve():
        async def handle(reader, writer):
            await reader.readuntil(b"\r\n\r\n")
            writer.write(
                b"HTTP/1.1 304 Not Modified\r\nContent-Length: 0\r\n\r\n"
            )
            await writer.drain()
            writer.close()

        srv = await asyncio.start_server(handle, "127.0.0.1", 0)
        return srv, srv.sockets[0].getsockname()[1]

    loop = asyncio.new_event_loop()
    srv, port = loop.run_until_complete(_serve())
    st = HttpFetchStage(resolve={"x.test": ("127.0.0.1", port)})

    async def go():
        # _fetch_one applies the 304→EDOCUNCHANGED mapping (gated on
        # ims>0); robots.txt is served a 304 too, which _robots treats
        # as an empty-ruleset fetch failure (allow-all) — fine here.
        st._sem = asyncio.Semaphore(4)  # normally created by run()
        return await st._fetch_one("http://x.test/", "x.test", 7, ims=0)

    fr, _cd, _ok, _ms = loop.run_until_complete(go())
    srv.close()
    loop.run_until_complete(srv.wait_closed())
    loop.close()
    assert fr.http_status == 304
    assert fr.err_code != urlfilter.ERR_DOC_UNCHANGED
