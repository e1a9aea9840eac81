"""Wide frontier jobs: log compaction (dedupSpiderdbList as a shuffle)
and cold-start winner scanning."""

import numpy as np
import pandas as pd

from open_source_search_engine_ray.functions.schedule import Rep, Req, dedup_frontier
from open_source_search_engine_ray.pipelines.compact import (
    cold_start_schedule,
    compact_frontier,
    dedup_log_group,
    frontier_records_table,
)
from open_source_search_engine_ray.state.frontier import CrawlConfig


def _fixture_records(n=200, seed=5):
    rng = np.random.Generator(np.random.PCG64(seed))
    reqs, reps = [], []
    for i in range(n):
        uh = int(rng.integers(1, 60))
        reqs.append(
            Req(
                url=f"http://h{uh % 7}.test/p{uh}.html",
                uh48=uh,
                first_ip=100 + uh % 7,
                host=f"h{uh % 7}.test",
                dom_hash32=uh % 7,
                site_hash32=int(rng.integers(1, 3)),
                hop_count=int(rng.integers(0, 4)),
                added_time=int(rng.integers(1, 500)),
            )
        )
        if rng.random() < 0.3:
            reps.append(
                Rep(
                    uh48=uh,
                    spidered_time=int(rng.integers(1, 400)),
                    err_code=0,
                    err_count=0,
                    http_status=200,
                    crawl_delay_ms=-1,
                )
            )
    return reqs, reps


def _sequential_dedup(reqs, reps):
    recs = sorted(
        reps + reqs,
        key=lambda r: (
            r.uh48,
            isinstance(r, Req),
            r.spidered_time if isinstance(r, Rep) else 0,
            r.added_time if isinstance(r, Req) else 0,
        ),
    )
    return dedup_frontier(recs)


def _key_set(items):
    out = set()
    for x in items:
        if isinstance(x, Rep):
            out.add(("rep", x.uh48, x.spidered_time))
        else:
            out.add(("req", x.uh48, x.srh(), x.hop_count, x.added_time))
    return out


def _adversarial_fixture(n, seed):
    """Records exercising every dedup rule: flag-salted srh variants,
    reindex/fake-first-ip supersede, (hop, added, scan-pos) ties."""
    rng = np.random.Generator(np.random.PCG64(seed))
    reqs, reps = [], []
    for _ in range(n):
        uh = int(rng.integers(1, 80))
        reqs.append(
            Req(
                url=f"http://h{uh % 7}.test/p{uh}.html",
                uh48=uh,
                first_ip=100 + uh % 7,
                host=f"h{uh % 7}.test",
                dom_hash32=uh % 7,
                site_hash32=int(rng.integers(1, 4)),
                hop_count=int(rng.integers(0, 4)),
                added_time=int(rng.integers(1, 500)),
                is_injecting=bool(rng.random() < 0.1),
                is_addurl=bool(rng.random() < 0.1),
                is_reindex=bool(rng.random() < 0.2),
                fake_first_ip=bool(rng.random() < 0.2),
            )
        )
        if rng.random() < 0.5:
            reps.append(
                Rep(
                    uh48=uh,
                    spidered_time=int(rng.integers(1, 600)),
                    err_code=int(rng.integers(0, 2)),
                    err_count=0,
                    http_status=200,
                    crawl_delay_ms=-1,
                    content_hash32=int(rng.integers(0, 5)),
                )
            )
    return reqs, reps


def test_dedup_log_group_exact_vs_sequential_reduce():
    """The vectorized columnar dedup must emit the SAME rows in the SAME
    order as the sequential dedup_frontier reduce (the semantic oracle),
    across adversarial flag/tie/supersede fixtures."""
    from open_source_search_engine_ray.pipelines.compact import (
        LOG_COLUMNS,
        _rec_to_row,
    )

    for seed in range(6):
        reqs, reps = _adversarial_fixture(500, seed)
        t = frontier_records_table(reqs, reps)
        got = dedup_log_group(t.to_pandas()).reset_index(drop=True)
        recs = sorted(
            reps + reqs,
            key=lambda r: (
                r.uh48,
                isinstance(r, Req),
                r.spidered_time if isinstance(r, Rep) else 0,
                r.added_time if isinstance(r, Req) else 0,
            ),
        )
        want = pd.DataFrame([_rec_to_row(x) for x in dedup_frontier(recs)])[
            LOG_COLUMNS
        ].reset_index(drop=True)
        pd.testing.assert_frame_equal(got.astype(want.dtypes.to_dict()), want)


def test_dedup_log_group_matches_sequential():
    reqs, reps = _fixture_records()
    t = frontier_records_table(reqs, reps)
    got = dedup_log_group(t.to_pandas())
    want = _sequential_dedup(reqs, reps)
    assert len(got) == len(want)
    got_keys = set()
    for r in got.to_dict("records"):
        if r["rec"] == "reply":
            got_keys.add(("rep", r["uh48"], r["spidered_time"]))
        else:
            salt = 0
            got_keys.add(("req", r["uh48"], None, r["hop_count"], r["added_time"]))
    want_keys = {
        (k[0], k[1], None, k[3], k[4]) if k[0] == "req" else k for k in _key_set(want)
    }
    assert {(k[0], k[1]) for k in got_keys} == {(k[0], k[1]) for k in want_keys}


def test_compact_frontier_distributed(ray_session):
    import ray.data as rd

    reqs, reps = _fixture_records(400, seed=9)
    t = frontier_records_table(reqs, reps)
    ds = rd.from_arrow(t)
    out = compact_frontier(ds).to_pandas()
    want = _sequential_dedup(reqs, reps)
    assert len(out) == len(want)
    # per-uh48 survivor multiset matches
    got_by_uh = out.groupby("uh48").size().to_dict()
    want_by_uh = {}
    for x in want:
        want_by_uh[x.uh48] = want_by_uh.get(x.uh48, 0) + 1
    assert got_by_uh == want_by_uh


def test_cold_start_schedule(ray_session):
    import ray.data as rd

    reqs, _ = _fixture_records(300, seed=11)
    t = frontier_records_table(reqs, [])
    cfg = CrawlConfig(num_partitions=4, site_list=("h0.test", "h1.test", "h2.test", "h3.test", "h4.test", "h5.test", "h6.test"))
    out = cold_start_schedule(rd.from_arrow(t), cfg, now_ms=1_000_000).to_pandas()
    assert len(out) > 0
    # one launch per IP max (politeness chain window = default small)
    assert out["uh48"].is_unique
    ips = set(out["first_ip"])
    assert ips <= {100 + i for i in range(7)}
    # deterministic
    out2 = cold_start_schedule(rd.from_arrow(t), cfg, now_ms=1_000_000).to_pandas()
    pd.testing.assert_frame_equal(
        out.sort_values(["first_ip", "seq"]).reset_index(drop=True),
        out2.sort_values(["first_ip", "seq"]).reset_index(drop=True),
    )


def test_export_log_skips_force_deleted():
    """export_log must not resurrect force-deleted URLs: _delete pops the
    row_of/uh_rows index but leaves columnar store rows in place; the Rdb
    delete-key merge drops deleted records (Spider.cpp dedupSpiderdbList),
    so the export must filter to still-indexed rows and live replies."""
    from open_source_search_engine_ray.pipelines.compact import export_log
    from open_source_search_engine_ray.stages.canonicalize import (
        make_request_columns,
    )
    from open_source_search_engine_ray.state.frontier import FrontierCore

    urls = [f"http://h{i}.test/p{i}.html" for i in range(6)]
    ips = {f"h{i}.test": 100 + i for i in range(6)}
    core = FrontierCore(0, CrawlConfig(num_partitions=1))
    cols = make_request_columns(urls, ips, hop_count=1, added_time=10)
    core.add_requests(cols)
    dead = {int(cols["uh48"][1]), int(cols["uh48"][4])}
    # a reply for one deleted and one live uh48
    core.apply_reply_newest(
        Rep(uh48=int(cols["uh48"][1]), spidered_time=50, err_code=0,
            err_count=0, http_status=200, crawl_delay_ms=-1)
    )
    core.apply_reply_newest(
        Rep(uh48=int(cols["uh48"][2]), spidered_time=60, err_code=0,
            err_count=0, http_status=200, crawl_delay_ms=-1)
    )
    for u in dead:
        core._delete(u)
    t = export_log(core).to_pandas()
    exported = set(t["uh48"].astype("uint64").tolist())
    assert not (exported & dead)
    live = {int(cols["uh48"][i]) for i in (0, 2, 3, 5)}
    assert set(t[t["rec"] == "request"]["uh48"].astype("uint64")) == live
    assert set(t[t["rec"] == "reply"]["uh48"].astype("uint64")) == {
        int(cols["uh48"][2])
    }


def test_apply_replies_newest_cols_vs_sequential():
    """Columnar cold-start reply replay == per-row apply_reply_newest
    (the semantic oracle): full reply-store state equality across
    adversarial fixtures — multi-reply groups, spidered_time ties,
    err/content-hash mixes, reply-only uh48s, rss/permalink URLs."""
    from open_source_search_engine_ray.pipelines.compact import _row_to_rec
    from open_source_search_engine_ray.stages.canonicalize import (
        make_request_columns,
    )
    from open_source_search_engine_ray.state.frontier import FrontierCore

    for seed in range(4):
        rng = np.random.Generator(np.random.PCG64(seed))
        paths = ["p{}.html", "feed{}.rss", "20{:02d}/01/02/x.html", "p{}.xml"]
        urls = [
            f"http://h{i % 9}.test/" + paths[i % 4].format(i) for i in range(40)
        ]
        ips = {f"h{i}.test": 100 + i for i in range(9)}

        def build_core():
            c = FrontierCore(0, CrawlConfig(num_partitions=1))
            c.add_requests(make_request_columns(urls, ips, added_time=10))
            return c

        ref = build_core()
        uh_pool = np.concatenate(
            [np.asarray(make_request_columns(urls, ips)["uh48"]),
             rng.integers(1, 1 << 30, 10).astype(np.uint64)]  # reply-only
        )
        rows = []
        for _ in range(600):
            rows.append(
                dict(
                    rec="reply",
                    uh48=int(uh_pool[rng.integers(0, len(uh_pool))]),
                    spidered_time=int(rng.integers(1, 40)) * 86400,
                    err_code=int(rng.integers(0, 2)),
                    err_count=int(rng.integers(0, 3)),
                    http_status=200,
                    crawl_delay_ms=int(rng.integers(-1, 100)),
                    content_hash32=int(rng.integers(0, 4)),
                )
            )
        df = pd.DataFrame(rows).sort_values(
            ["uh48", "spidered_time"], kind="stable"
        )
        for r in df.to_dict("records"):
            ref.apply_reply_newest(_row_to_rec(r))
        got = build_core()
        got.apply_replies_newest_cols(
            {c: df[c].to_numpy() for c in (
                "uh48", "spidered_time", "err_code", "err_count",
                "http_status", "crawl_delay_ms", "content_hash32")}
        )
        want, have = ref.reps, got.reps
        assert set(want.row_of) == set(have.row_of)
        for u in want.row_of:
            a, b = want.get_rep(u), have.get_rep(u)
            assert a == b, (u, a, b)
