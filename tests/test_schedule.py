"""Winner selection, due-time, and frontier-dedup vectors
(reference SpiderColl.cpp:3107-3292, 4083-4180; Spider.cpp:3714-4021)."""

from open_source_search_engine_ray.functions.schedule import (
    Rep,
    Req,
    dedup_frontier,
    get_spider_time_ms,
    select_winners,
    winner_key,
)


def mkreq(uh48, hop=1, added=100, site=7, **kw):
    return Req(
        url=f"http://h.test/p{uh48}.html",
        uh48=uh48,
        first_ip=1,
        host="h.test",
        dom_hash32=5,
        site_hash32=site,
        hop_count=hop,
        added_time=added,
        **kw,
    )


# -- get_spider_time_ms ------------------------------------------------------


def test_spider_time_basics():
    # never downloaded, no reply → added time
    assert get_spider_time_ms(100, False, False, None, 1000, None, 7.0, None) == 100_000
    # last download gates via same-ip wait
    assert (
        get_spider_time_ms(100, False, False, 150_000, 1000, None, 7.0, None) == 151_000
    )
    # crawl delay dominates when larger
    assert (
        get_spider_time_ms(100, False, False, 150_000, 1000, 5000, 7.0, None) == 155_000
    )
    # crawl delay clamped to 60 s (SpiderColl.cpp:4123-4126)
    assert (
        get_spider_time_ms(100, False, False, 150_000, 1000, 999_000, 7.0, None)
        == 150_000 + 60_000
    )


def test_spider_time_respider_freq():
    # respider after freq days from last spidered time
    t = get_spider_time_ms(100, False, False, None, 1000, None, 2.0, 500)
    assert t == 500_000 + 2 * 86400_000
    # reindex ignores the frequency wait
    t = get_spider_time_ms(100, False, True, None, 1000, None, 2.0, 500)
    assert t == 500_000


def test_injected_first_time_uses_added_time():
    assert get_spider_time_ms(100, True, False, 90_000_000, 1000, 5000, 7.0, None) == 100_000


# -- winner selection --------------------------------------------------------


def test_winner_ordering_by_key():
    # serialization order: priority desc, hop asc, time asc, uh48 asc
    cands = [
        (mkreq(10, hop=2), 47, 1000),
        (mkreq(11, hop=0), 50, 2000),
        (mkreq(12, hop=0), 50, 1000),
        (mkreq(13, hop=1), 50, 500),
    ]
    cands.sort(key=lambda c: c[0].uh48)
    out = select_winners(cands, now_ms=0)
    assert [e.req.uh48 for e in out] == [12, 11, 13, 10]


def test_winner_dedup_same_uh48_keeps_better_key():
    cands = [
        (mkreq(5, hop=3), 20, 1000),
        (mkreq(5, hop=1), 40, 1000),
    ]
    out = select_winners(cands, now_ms=0)
    assert len(out) == 1
    assert out[0].priority == 40
    assert out[0].req.hop_count == 1


def test_winner_dedup_min_merges_hopcount():
    # worse-key duplicate still donates its lower hop count
    # (SpiderColl.cpp:3129-3148)
    cands = [
        (mkreq(5, hop=1), 20, 1000),  # low priority but low hop
        (mkreq(5, hop=4), 40, 1000),  # higher priority, higher hop
    ]
    cands.sort(key=lambda c: c[0].uh48)
    out = select_winners(cands, now_ms=0)
    assert len(out) == 1
    # second insert wins on priority but inherits min hop count=1
    assert out[0].priority == 40
    assert out[0].req.hop_count == 1


def test_winner_cap_eviction_overdue_flattening():
    # cap=2; all overdue (time < now) → times flatten to 1, priority decides
    now = 10_000_000
    cands = [
        (mkreq(1), 30, 1000),
        (mkreq(2), 20, 500),
        (mkreq(3), 40, 2000),  # evicts uh48=2 (lowest priority) despite earliest time
    ]
    out = select_winners(cands, now_ms=now, max_winners=2)
    assert sorted(e.req.uh48 for e in out) == [1, 3]
    # with now=0 (nothing overdue) raw times decide: uh48=3 (t=2000) loses
    out2 = select_winners(cands, now_ms=0, max_winners=2)
    assert sorted(e.req.uh48 for e in out2) == [1, 2]


def test_winner_key_shape():
    assert winner_key(50, 2, 1234, 99) == (205, 2, 1234, 99)
    assert winner_key(50, -1, 0, 0)[1] == 0  # hopCount -1 → 0 (Spider.cpp:1003)


# -- frontier dedup ----------------------------------------------------------


def test_dedup_replies_keep_newest():
    recs = [
        Rep(uh48=5, spidered_time=100, err_code=0, err_count=0, http_status=200, crawl_delay_ms=-1),
        Rep(uh48=5, spidered_time=300, err_code=0, err_count=0, http_status=200, crawl_delay_ms=-1),
        Rep(uh48=5, spidered_time=200, err_code=0, err_count=0, http_status=200, crawl_delay_ms=-1),
    ]
    out = dedup_frontier(recs)
    assert len(out) == 1 and out[0].spidered_time == 300


def test_dedup_requests_same_srh_lowest_hop_then_oldest():
    recs = [
        mkreq(5, hop=2, added=100),
        mkreq(5, hop=1, added=200),  # lower hop wins
        mkreq(5, hop=1, added=150),  # same hop, older added wins
        mkreq(5, hop=1, added=150),  # exact tie → first kept
    ]
    out = dedup_frontier(recs)
    assert len(out) == 1
    assert out[0].hop_count == 1 and out[0].added_time == 150


def test_dedup_different_srh_kept():
    recs = [
        mkreq(5, hop=2, site=1),
        mkreq(5, hop=2, site=2),
        mkreq(5, hop=2, is_addurl=True, site=1),  # flag salt differs
    ]
    out = dedup_frontier(recs)
    assert len(out) == 3


def test_dedup_reply_supersedes_reindex_and_fake():
    recs = [
        Rep(uh48=5, spidered_time=500, err_code=0, err_count=0, http_status=200, crawl_delay_ms=-1),
        mkreq(5, added=100, is_reindex=True),
        mkreq(5, added=100, fake_first_ip=True),
        mkreq(5, added=100),  # plain request survives
        mkreq(6, added=600, is_reindex=True),  # different uh48, no reply → kept
    ]
    out = dedup_frontier(recs)
    kinds = [(r.uh48, type(r).__name__) for r in out]
    assert kinds == [(5, "Rep"), (5, "Req"), (6, "Req")]


def test_overflow_cap_bounds_hot_ip():
    """Hot-IP overflow: once an IP has overflow_cap pending URLs, new
    admissions for it are dropped (reference SpiderColl.cpp:3319-3397)."""
    import numpy as np

    from open_source_search_engine_ray.state.frontier import CrawlConfig, FrontierCore

    cfg = CrawlConfig(num_partitions=1, overflow_cap=5, verify_integrity=False)
    core = FrontierCore(0, cfg)
    n = 20
    cols = {
        "url": np.array([f"http://hot.test/p{i}.html" for i in range(n)], dtype=object),
        "uh48": np.arange(1, n + 1, dtype=np.uint64),
        "first_ip": np.full(n, 7, dtype=np.int64),
        "host": np.array(["hot.test"] * n, dtype=object),
        "dom_hash32": np.full(n, 1, dtype=np.int64),
        "site_hash32": np.full(n, 1, dtype=np.int64),
        "hop_count": np.zeros(n, dtype=np.int64),
        "added_time": np.full(n, 100, dtype=np.int64),
        "parent_ip": np.zeros(n, dtype=np.int64),
        "is_injecting": np.zeros(n, dtype=bool),
        "is_addurl": np.zeros(n, dtype=bool),
        "is_reindex": np.zeros(n, dtype=bool),
        "fake_first_ip": np.zeros(n, dtype=bool),
        "is_root": np.zeros(n, dtype=bool),
        "is_rssext": np.zeros(n, dtype=bool),
        "is_permalink_format": np.zeros(n, dtype=bool),
    }
    core.add_requests(cols)
    assert len(core.by_ip[7]) == 5
    assert core.metrics["overflow_dropped"] == 15


def test_probable_docids():
    from open_source_search_engine_ray.functions.gbhash import (
        DOCID_MASK,
        docid_probe_range,
        hash64b,
        probable_docid_batch,
    )

    urls = ["http://a.test/", "http://b.test/x"]
    d = probable_docid_batch(urls)
    assert int(d[0]) == hash64b(urls[0]) & int(DOCID_MASK)
    lo, hi = docid_probe_range(int(d[0]))
    assert lo <= int(d[0]) <= hi and hi - lo == 63


def test_dedup_multiple_uh48_groups():
    recs = [
        Rep(uh48=1, spidered_time=10, err_code=0, err_count=0, http_status=200, crawl_delay_ms=-1),
        mkreq(1, hop=0),
        mkreq(2, hop=3),
        mkreq(2, hop=2),
        Rep(uh48=3, spidered_time=7, err_code=3, err_count=1, http_status=404, crawl_delay_ms=-1),
    ]
    out = dedup_frontier(recs)
    assert len(out) == 4
    assert out[2].hop_count == 2


def test_route_back_apply_is_token_idempotent():
    """Ray task retries re-deliver identical payload blobs; the
    content-derived token must make application exactly-once through
    every delivery surface (apply_blob, apply_pending, schedule_ipc)."""
    import pickle

    import numpy as np

    import open_source_search_engine_ray.pipelines.crawl  # attaches the methods
    from open_source_search_engine_ray.functions.gbhash import uh48_batch
    from open_source_search_engine_ray.state.frontier import CrawlConfig, FrontierCore

    urls = [f"http://h{i:04d}.test/" for i in range(5)]
    n = len(urls)
    cols = {
        "url": np.array(urls, dtype=object),
        "uh48": uh48_batch(urls),
        "first_ip": np.arange(n, dtype=np.int64) + 7,
        "host": np.array([u[7:-1] for u in urls], dtype=object),
        "dom_hash32": np.full(n, 5, dtype=np.int64),
        "site_hash32": np.full(n, 6, dtype=np.int64),
        "hop_count": np.zeros(n, dtype=np.int64),
        "added_time": np.zeros(n, dtype=np.int64),
        "parent_ip": np.zeros(n, dtype=np.int64),
        "is_injecting": np.zeros(n, dtype=bool),
        "is_addurl": np.zeros(n, dtype=bool),
        "is_reindex": np.zeros(n, dtype=bool),
        "fake_first_ip": np.zeros(n, dtype=bool),
        "is_root": np.ones(n, dtype=bool),
        "is_rssext": np.zeros(n, dtype=bool),
        "is_permalink_format": np.zeros(n, dtype=bool),
    }
    core = FrontierCore(0, CrawlConfig(num_partitions=1, verify_integrity=True))
    blob = pickle.dumps({"req_cols": cols, "req_token": "tok-1"})
    assert core.apply_blob(blob) == n
    assert core.apply_blob(blob) == 0  # retry delivery: no-op
    assert core.apply_pending([blob]) == 0  # flush path sees it too
    assert core.metrics["added"] == n
    # a different token with identical rows is treated as a new batch
    blob2 = pickle.dumps({"req_cols": cols, "req_token": "tok-2"})
    core.apply_pending([blob2])  # dup-cache absorbs the rows
    assert core.metrics["added"] == n  # still admitted exactly once
