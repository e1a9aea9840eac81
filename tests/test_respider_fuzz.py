"""Fuzz wave for the respider / unchanged-content recycle path (the
r4 verdict's item 10): the newest-reply state that prev_reply_state
hands to the conditional-GET tier, and the live hash-match recycle over
real sockets with MUTATING content.

Reference semantics: a respider request carries the old doc's
contentHash32 / spidered time (XmlDoc.cpp:8157-8162); identical content
→ EDOCUNCHANGED and the doc is recycled, not rewritten
(Msg13.cpp:1434-1446, XmlDoc.cpp:14757-14800)."""

import threading

import numpy as np
import pyarrow.dataset as pads
from hypothesis import given, settings
from hypothesis import strategies as st

from open_source_search_engine_ray.functions.urlfilter import UrlFilterRule
from open_source_search_engine_ray.state.frontier import CrawlConfig, FrontierCore

#: respider nearly immediately (freq 1e-5 days → wait_s truncates to 0)
RULES = (UrlFilterRule("default", 50, 1e-5, 9, 7, same_ip_wait_ms=0),)

#: (err_code, http_status) shapes a fetch tier can hand complete()
OUTCOMES = [
    (0, 200),   # success (changed or unchanged-carried-forward alike)
    (3, 404),   # permanent not-found
    (28, 500),  # tmp error (hastmperror family)
]


def _mk_request_cols(urls):
    from open_source_search_engine_ray.functions.gbhash import uh48_batch

    n = len(urls)
    return {
        "url": np.array(urls, dtype=object),
        "uh48": uh48_batch(urls),
        "first_ip": np.full(n, 7, dtype=np.int64),
        "host": np.array(["s.test"] * n, dtype=object),
        "dom_hash32": np.full(n, 22, dtype=np.int64),
        "site_hash32": np.full(n, 11, dtype=np.int64),
        "hop_count": np.full(n, 1, dtype=np.int64),
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


@settings(max_examples=40, deadline=None)
@given(st.data())
def test_prev_reply_state_matches_sequential_oracle(data):
    """Over random multi-round respider sequences (mixed success / 404 /
    tmp-error outcomes, random hashes and langs), prev_reply_state must
    equal a sequential newest-by-spidered-time oracle — the state the
    conditional-GET tier keys its recycle decision on."""
    urls = [f"http://s.test/p{i}.html" for i in range(5)]
    cfg = CrawlConfig(num_partitions=1, rules=RULES, verify_integrity=True)
    core = FrontierCore(0, cfg)
    core.add_requests(_mk_request_cols(urls))
    all_uh = _mk_request_cols(urls)["uh48"]

    oracle: dict = {}  # uh48 -> (spidered_time, hash, lang) newest-applied
    now_ms = 1_000
    tick = 1
    rounds = data.draw(st.integers(1, 5), label="rounds")
    for _ in range(rounds):
        t = core.schedule(now_ms=now_ms)
        if not t.num_rows:
            now_ms += 2_000
            continue
        rows = t.to_pylist()
        n = len(rows)
        errs, https, hashes, langs, times = [], [], [], [], []
        for r in rows:
            err, hs = data.draw(st.sampled_from(OUTCOMES), label="outcome")
            h32 = data.draw(st.integers(0, 2**31 - 1), label="hash")
            lang = data.draw(
                st.sampled_from(["en", "de", "fr", "xx"]), label="lang"
            )
            tick += 1  # strictly increasing: no newest-tie ambiguity
            errs.append(err)
            https.append(hs)
            hashes.append(h32 if err == 0 else 0)
            langs.append(lang if err == 0 else "xx")
            times.append(tick)
            prev = oracle.get(int(r["uh48"]))
            if prev is None or tick >= prev[0]:
                oracle[int(r["uh48"])] = (tick, hashes[-1], langs[-1])
        core.complete(
            {
                "uh48": np.array([r["uh48"] for r in rows], dtype=np.uint64),
                "first_ip": np.array([r["first_ip"] for r in rows]),
                "dom_hash32": np.full(n, 22, dtype=np.int64),
                "spidered_time": np.array(times, dtype=np.int64),
                "download_end_ms": np.full(n, now_ms + 50, dtype=np.int64),
                "err_code": np.array(errs, dtype=np.int64),
                "http_status": np.array(https, dtype=np.int64),
                "crawl_delay_ms": np.full(n, -1, dtype=np.int64),
                "lang": np.array(langs, dtype=object),
                "content_hash32": np.array(hashes, dtype=np.int64),
            }
        )
        # the state every FUTURE respider launch will carry
        got = core.prev_reply_state(all_uh)
        for j, u in enumerate(all_uh):
            exp = oracle.get(int(u))
            if exp is None:
                assert got["prev_spidered_time"][j] == 0
                assert got["prev_content_hash32"][j] == 0
                assert got["prev_lang"][j] == ""
            else:
                assert got["prev_spidered_time"][j] == exp[0]
                assert got["prev_content_hash32"][j] == exp[1]
                assert got["prev_lang"][j] == exp[2]
        now_ms += 2_000


def test_content_mutation_rewrites_doc_over_sockets(ray_session, tmp_path):
    """Live hash-match recycle with MUTATING content: identical
    refetches recycle (unchanged), a content change rewrites the doc;
    every page hit is accounted as exactly one doc write or one
    recycle."""
    from open_source_search_engine_ray.pipelines.httpcrawl import run_http_crawl
    from open_source_search_engine_ray.testing import StaticSiteServer

    sites = {"m.test": {"/": "<html><body>version one</body></html>"}}
    srv = StaticSiteServer(sites).start()
    flip = threading.Timer(
        1.0,
        lambda: sites["m.test"].__setitem__(
            "/", "<html><body>version two, changed</body></html>"
        ),
    )
    flip.start()
    try:
        res = run_http_crawl(
            seeds=["http://m.test/"],
            resolve=srv.resolve_map(),
            out_dir=str(tmp_path),
            cfg=CrawlConfig(
                num_partitions=1,
                horizon_ms=2500,
                rules=(
                    UrlFilterRule("default", 50, 1e-5, 9, 7, same_ip_wait_ms=150),
                ),
            ),
            n_fetchers=1,
        )
    finally:
        flip.cancel()
        srv.stop()
    page_hits = [p for _, h, p in srv.hits if p != "/robots.txt"]
    docs = pads.dataset(res["docs_dir"], format="parquet").to_table()
    n_docs = docs.num_rows
    # every doc row is the same URL (rewritten on change, recycled else)
    assert set(docs["doc_id"].to_pylist()) == {"http://m.test/"}
    assert res["metrics"]["errors"] == 0
    # accounting invariant: hits == rewrites + recycles
    assert n_docs + res["metrics"]["unchanged"] == len(page_hits)
    if n_docs >= 2:  # the mutation landed between two fetches
        texts = [
            " ".join(s["text"] for s in spans if s["kind"] == "text")
            for spans in docs["spans"].to_pylist()
        ]
        assert any("version one" in t for t in texts)
        assert any("version two" in t for t in texts)
