"""Wide (all-to-all) frontier jobs: log compaction and cold-start
winner scanning over a frontier *log* stored as Parquet.

In steady state the frontier lives deduped inside FrontierActors; at
10^10-URL scale the durable form is an append-only record log (requests
+ replies, the spiderdb analogue).  Two jobs operate on that log as
Ray Data pipelines:

- ``compact_frontier``: the merge-time dedup
  (``dedupSpiderdbList``, Spider.cpp:3714-4021) as a
  groupby-shuffle on a bounded uh48-hash partition key with the exact
  per-uh48 reduce inside ``map_groups``.  This is the reference's
  background Rdb merge re-expressed as a batch job over the log.

- ``cold_start_schedule``: ``populateWaitingTreeFromSpiderdb``
  (SpiderColl.cpp:1465; the 24 h full rescan, Spider.h:304-315) —
  group the whole log by IP-hash bucket and run the *actual*
  FrontierCore scheduling code per bucket, producing the same launch
  decisions the live actors would make.  Used for bootstrap after a
  filter-rule change (urlFiltersChanged, SpiderColl.h:46).

Partitioning note: the shuffle key is ``hash % N_BUCKETS`` (bounded
fan-in), never the raw uh48/IP — millions of tiny groups would pay
per-group overhead; each bucket does vectorized local group-bys.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.schedule import Rep, Req
from ..state.frontier import CrawlConfig, FrontierCore

N_BUCKETS = 256

LOG_COLUMNS = [
    "rec",  # "request" | "reply"
    "url",
    "uh48",
    "first_ip",
    "host",
    "dom_hash32",
    "site_hash32",
    "hop_count",
    "added_time",
    "parent_ip",
    "is_injecting",
    "is_addurl",
    "is_reindex",
    "fake_first_ip",
    "spidered_time",
    "err_code",
    "err_count",
    "http_status",
    "crawl_delay_ms",
    "content_hash32",
]


def _row_to_rec(r: dict):
    if r["rec"] == "reply":
        return Rep(
            uh48=int(r["uh48"]),
            spidered_time=int(r["spidered_time"]),
            err_code=int(r["err_code"]),
            err_count=int(r["err_count"]),
            http_status=int(r["http_status"]),
            crawl_delay_ms=int(r["crawl_delay_ms"]),
            content_hash32=int(r.get("content_hash32", 0) or 0),
            is_indexed=int(r["err_code"]) == 0,  # mirrors complete()
        )
    return Req(
        url=r["url"],
        uh48=int(r["uh48"]),
        first_ip=int(r["first_ip"]),
        host=r["host"],
        dom_hash32=int(r["dom_hash32"]),
        site_hash32=int(r["site_hash32"]),
        hop_count=int(r["hop_count"]),
        added_time=int(r["added_time"]),
        is_injecting=bool(r["is_injecting"]),
        is_addurl=bool(r["is_addurl"]),
        is_reindex=bool(r["is_reindex"]),
        fake_first_ip=bool(r["fake_first_ip"]),
    )


def _rec_to_row(x) -> dict:
    if isinstance(x, Rep):
        return {
            "rec": "reply",
            "uh48": x.uh48,
            "spidered_time": x.spidered_time,
            "err_code": x.err_code,
            "err_count": x.err_count,
            "http_status": x.http_status,
            "crawl_delay_ms": x.crawl_delay_ms,
            "content_hash32": x.content_hash32,
            "url": "",
            "first_ip": 0,
            "host": "",
            "dom_hash32": 0,
            "site_hash32": 0,
            "hop_count": 0,
            "added_time": 0,
            "parent_ip": 0,
            "is_injecting": False,
            "is_addurl": False,
            "is_reindex": False,
            "fake_first_ip": False,
        }
    return {
        "rec": "request",
        "uh48": x.uh48,
        "spidered_time": 0,
        "err_code": 0,
        "err_count": 0,
        "http_status": 0,
        "crawl_delay_ms": -1,
        "content_hash32": 0,
        "url": x.url,
        "first_ip": x.first_ip,
        "host": x.host,
        "dom_hash32": x.dom_hash32,
        "site_hash32": x.site_hash32,
        "hop_count": x.hop_count,
        "added_time": x.added_time,
        "parent_ip": 0,
        "is_injecting": x.is_injecting,
        "is_addurl": x.is_addurl,
        "is_reindex": x.is_reindex,
        "fake_first_ip": x.fake_first_ip,
    }


_SRH_SALTS = (
    ("is_injecting", 0x42538909),
    ("is_addurl", 0x587C5A0B),
    ("is_reindex", 0x70FB3911),
    ("fake_first_ip", 0x95B8D376),
)


def dedup_log_group(g: pd.DataFrame) -> pd.DataFrame:
    """Exact dedupSpiderdbList semantics for one uh48-hash bucket,
    as columnar numpy group ops (no per-row dataclasses — the sequential
    ``dedup_frontier`` reduce is kept in functions/schedule.py as the
    semantic oracle the tests compare against).

    Per uh48 in spiderdb key order (replies before requests,
    Spider.h:399-416): keep the newest reply (first in scan order wins
    ties); drop reindex/fake-first-ip requests superseded by a newer
    reply; keep per (uh48, srh) the request minimizing
    (hop, added_time, scan pos).  Survivors keep their scan order,
    matching the sequential reduce.

    Everything runs on extracted numpy key columns with ONE final
    frame-level take — pandas sort/reset_index on the full 20-column
    frame triggers block consolidation copies that dominated runtime.
    """
    n = len(g)
    if n == 0:
        return pd.DataFrame(columns=LOG_COLUMNS)
    uh = g["uh48"].to_numpy().astype(np.uint64)
    is_req = (g["rec"].to_numpy() == "request")
    spid = g["spidered_time"].to_numpy().astype(np.int64)
    added = g["added_time"].to_numpy().astype(np.int64)
    hop = g["hop_count"].to_numpy().astype(np.int64)
    srh = g["site_hash32"].to_numpy().astype(np.int64)
    for col, salt in _SRH_SALTS:
        srh = np.where(g[col].to_numpy().astype(bool), srh ^ salt, srh)
    srh &= 0xFFFFFFFF
    sup_flag = g["is_reindex"].to_numpy().astype(bool) | g[
        "fake_first_ip"
    ].to_numpy().astype(bool)

    # scan order = spiderdb key order (stable lexsort: last key primary)
    perm = np.lexsort((added, spid, is_req, uh))
    uh_s = uh[perm]
    req_s = is_req[perm]
    spid_s = spid[perm]
    keep = np.zeros(n, dtype=bool)  # in scan (permuted) space

    rep_pos = np.nonzero(~req_s)[0]
    if rep_pos.size:
        ruh, rst = uh_s[rep_pos], spid_s[rep_pos]
        new = np.empty(rep_pos.size, dtype=bool)
        new[0] = True
        new[1:] = ruh[1:] != ruh[:-1]
        # per-run max = last value (ascending); kept = FIRST row of the
        # max-time tie tail (ties are contiguous, stable sort)
        last = np.nonzero(np.append(new[1:], True))[0]
        gid = np.cumsum(new) - 1
        gmax = rst[last][gid]
        cand = rst == gmax
        first_cand = cand & (new | ~np.concatenate(([False], cand[:-1])))
        keep[rep_pos[first_cand]] = True

    req_pos = np.nonzero(req_s)[0]
    if req_pos.size:
        # newest kept reply per uh48 (sorted, unique) for the supersede
        # rule: binary-search instead of a hash map
        kept_rep = np.nonzero(keep)[0]
        rep_uh, rep_t = uh_s[kept_rep], spid_s[kept_rep]
        quh = uh_s[req_pos]
        if rep_uh.size:
            j = np.minimum(np.searchsorted(rep_uh, quh), rep_uh.size - 1)
            sup_t = np.where(rep_uh[j] == quh, rep_t[j], np.int64(-1))
        else:
            sup_t = np.full(quh.size, -1, dtype=np.int64)
        orig = perm[req_pos]
        superseded = (sup_t > added[orig]) & sup_flag[orig]
        live = req_pos[~superseded]
        if live.size:
            ol = perm[live]
            # lexicographic min of (hop, added, scan-pos) per (uh48, srh):
            # stable lexsort then first-per-group change detection
            order = np.lexsort((added[ol], hop[ol], srh[ol], uh_s[live]))
            luh, lsrh = uh_s[live][order], srh[ol][order]
            first = np.empty(order.size, dtype=bool)
            first[0] = True
            first[1:] = (luh[1:] != luh[:-1]) | (lsrh[1:] != lsrh[:-1])
            keep[live[order[first]]] = True

    out_idx = perm[np.nonzero(keep)[0]]
    if not out_idx.size:
        return pd.DataFrame(columns=LOG_COLUMNS)
    return g.iloc[out_idx][LOG_COLUMNS].reset_index(drop=True)


def export_log(core: FrontierCore) -> pa.Table:
    """Dump a FrontierCore's live state as LOG_COLUMNS records (the Rdb
    dump half of the dump/merge lifecycle, Rdb.cpp): every request row
    in the store plus the newest reply per uh48.  Columnar slices — no
    per-row Python.  (parent_ip is not retained per-row in the deduped
    store — inlink c-blocks live aggregated — so it exports as 0; the
    compaction/cold-start jobs do not consume it.)"""
    from ..state.frontier import (
        RQ_ADDURL,
        RQ_FAKEIP,
        RQ_INJ,
        RQ_REINDEX,
    )

    st, rp = core.store, core.reps
    n, m = st.n, rp.n
    # force-deleted URLs are unindexed (FrontierCore._delete pops the
    # row_of/uh_rows entries but leaves columnar store rows in place);
    # export only rows still indexed — the Rdb delete-key merge drops
    # deleted records (Spider.cpp dedupSpiderdbList), so an export that
    # resurrected them would diverge from the reference lifecycle
    live = np.zeros(n, dtype=bool)
    if core.row_of:
        live[np.fromiter(core.row_of.values(), np.int64, len(core.row_of))] = True
    lidx = np.nonzero(live)[0]
    n = lidx.size
    flags = st.flags[lidx]
    req = {
        "rec": np.full(n, "request", dtype=object),
        "url": st.url[lidx],
        "uh48": st.uh48[lidx],
        "first_ip": st.first_ip[lidx],
        "host": st.host[lidx],
        "dom_hash32": st.dom_hash32[lidx],
        "site_hash32": st.site_hash32[lidx],
        "hop_count": st.hop_count[lidx],
        "added_time": st.added_time[lidx],
        "parent_ip": np.zeros(n, dtype=np.int64),
        "is_injecting": (flags & RQ_INJ) != 0,
        "is_addurl": (flags & RQ_ADDURL) != 0,
        "is_reindex": (flags & RQ_REINDEX) != 0,
        "fake_first_ip": (flags & RQ_FAKEIP) != 0,
        "spidered_time": np.zeros(n, dtype=np.int64),
        "err_code": np.zeros(n, dtype=np.int64),
        "err_count": np.zeros(n, dtype=np.int64),
        "http_status": np.zeros(n, dtype=np.int64),
        "crawl_delay_ms": np.zeros(n, dtype=np.int64),
        "content_hash32": np.zeros(n, dtype=np.int64),
    }
    # replies of deleted uh48s are dropped for the same reason
    rep_keep = [
        (u, r) for u, r in rp.row_of.items() if u not in core.deleted
    ]
    m = len(rep_keep)
    uhs = np.fromiter((u for u, _ in rep_keep), np.uint64, m)
    ridx = np.fromiter((r for _, r in rep_keep), np.int64, m)
    rep = {
        "rec": np.full(m, "reply", dtype=object),
        "url": np.full(m, "", dtype=object),
        "uh48": uhs,
        "first_ip": np.zeros(m, dtype=np.int64),
        "host": np.full(m, "", dtype=object),
        "dom_hash32": np.zeros(m, dtype=np.int64),
        "site_hash32": np.zeros(m, dtype=np.int64),
        "hop_count": np.zeros(m, dtype=np.int64),
        "added_time": np.zeros(m, dtype=np.int64),
        "parent_ip": np.zeros(m, dtype=np.int64),
        "is_injecting": np.zeros(m, dtype=bool),
        "is_addurl": np.zeros(m, dtype=bool),
        "is_reindex": np.zeros(m, dtype=bool),
        "fake_first_ip": np.zeros(m, dtype=bool),
        "spidered_time": rp.spidered_time[ridx],
        "err_code": rp.err_code[ridx],
        "err_count": rp.err_count[ridx],
        "http_status": rp.http_status[ridx],
        "crawl_delay_ms": rp.crawl_delay_ms[ridx],
        "content_hash32": rp.content_hash32[ridx],
    }
    def tbl(d, k):
        arr = d[k]
        if arr.dtype == object:
            return pa.array(arr.tolist(), pa.string())
        return pa.array(arr)

    both = [
        pa.table({k: tbl(d, k) for k in LOG_COLUMNS}) for d in (req, rep) if len(d["uh48"])
    ]
    if not both:
        return pa.Table.from_pydict({k: [] for k in LOG_COLUMNS})
    return pa.concat_tables(both)


def compact_frontier(log_ds):
    """Dataset[LOG_COLUMNS] → deduped Dataset (the compaction job)."""

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df["ubucket"] = (df["uh48"].astype("uint64") % N_BUCKETS).astype("int64")
        return df

    ds = log_ds.map_batches(add_bucket, batch_format="pandas")
    return ds.groupby("ubucket").map_groups(
        lambda g: dedup_log_group(g.drop(columns=["ubucket"])), batch_format="pandas"
    )


def cold_start_schedule(log_ds, cfg: CrawlConfig, now_ms: int):
    """Full-log winner scan: one FrontierCore per IP-hash bucket runs the
    real scheduling code over that bucket's requests/replies and emits
    its launch batch."""

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df["ibucket"] = (df["first_ip"].astype("int64") % N_BUCKETS).astype("int64")
        return df

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        from dataclasses import replace

        bucket = int(g["ibucket"].iloc[0])
        # logs may carry synthetic uh48s (tests/fixtures); the url↔uh48
        # integrity gate applies to the live pipeline, not this job
        core = FrontierCore(bucket, replace(cfg, verify_integrity=False))
        reqs = g[g["rec"] == "request"]
        if len(reqs):
            cols = {
                c: reqs[c].to_numpy()
                for c in (
                    "url",
                    "first_ip",
                    "host",
                    "hop_count",
                    "parent_ip",
                )
            }
            cols["uh48"] = reqs["uh48"].to_numpy().astype(np.uint64)
            cols["dom_hash32"] = reqs["dom_hash32"].to_numpy()
            cols["site_hash32"] = reqs["site_hash32"].to_numpy()
            cols["added_time"] = reqs["added_time"].to_numpy()
            for b in ("is_injecting", "is_addurl", "is_reindex", "fake_first_ip"):
                cols[b] = reqs[b].to_numpy().astype(bool)
            # URL-derived flags are not stored in the durable log —
            # recompute them from the canonical URL (pure derivation)
            from ..stages.canonicalize import url_flag_columns

            cols.update(url_flag_columns(list(cols["url"])))
            core.add_requests(cols)
        # replay replies in spidered_time order so the pairwise
        # percentChangedPerDay derivation sees the same consecutive
        # observations the live complete() path saw; newest-reply-wins
        # keeps the final state commutative under block ordering.
        # Columnar (apply_replies_newest_cols); the per-row
        # apply_reply_newest path is kept as the test oracle.
        reps = g[g["rec"] == "reply"].sort_values(
            ["uh48", "spidered_time"], kind="stable"
        )
        if len(reps):
            core.apply_replies_newest_cols(
                {
                    c: reps[c].to_numpy()
                    for c in (
                        "uh48",
                        "spidered_time",
                        "err_code",
                        "err_count",
                        "http_status",
                        "crawl_delay_ms",
                        "content_hash32",
                    )
                }
            )
        # quota pre-count pass over the applied log (the reference's
        # m_countingPagesIndexed scan before winner selection)
        core.recount_quotas()
        t = core.schedule(now_ms)
        return t.to_pandas()

    ds = log_ds.map_batches(add_bucket, batch_format="pandas")
    return ds.groupby("ibucket").map_groups(scan, batch_format="pandas")


def frontier_records_table(reqs: list, reps: list) -> pa.Table:
    """Build a LOG_COLUMNS table from Req/Rep lists (test/fixture helper)."""
    rows = [_rec_to_row(x) for x in reqs] + [_rec_to_row(x) for x in reps]
    return pa.Table.from_pylist(rows)
