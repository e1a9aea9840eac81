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

from ..functions.schedule import Rep, Req, dedup_frontier
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


def dedup_log_group(g: pd.DataFrame) -> pd.DataFrame:
    """Exact dedupSpiderdbList semantics for one uh48-hash bucket."""
    out_frames = []
    # sort: (uh48, replies-before-requests, spidered desc stable-ish) —
    # the spiderdb key order the reference scan sees
    g = g.assign(_is_req=(g["rec"] == "request").astype(int))
    g = g.sort_values(["uh48", "_is_req", "spidered_time", "added_time"], kind="stable")
    recs = [_row_to_rec(r) for r in g.to_dict("records")]
    kept = dedup_frontier(recs)
    if kept:
        out_frames.append(pd.DataFrame([_rec_to_row(x) for x in kept]))
    if not out_frames:
        return pd.DataFrame(columns=LOG_COLUMNS)
    return pd.concat(out_frames, ignore_index=True)[LOG_COLUMNS]


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
        reps = g[g["rec"] == "reply"]
        for r in reps.to_dict("records"):
            # newest-reply-wins, mirroring FrontierCore.complete — makes
            # reply application commutative under any block/row ordering
            core.apply_reply_newest(_row_to_rec(r))
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
