"""Scheduling kernels: due-time computation, per-IP winner selection, and
merge-time frontier dedup.  Pure functions shared by the distributed
engine (inside FrontierActor / map_groups) and the sequential oracle, so
the two agree by construction; parity with the *reference* is pinned by
unit vectors in tests/test_schedule.py.
"""

from __future__ import annotations

import bisect
from dataclasses import dataclass, field, replace

MAX_WINNER_NODES = 2000  # reference Spider.h:52
CRAWL_DELAY_CLAMP_MS = 60_000  # reference SpiderColl.cpp:4123-4126


def adaptive_max_winners(scanned_bytes: int) -> int:
    """Winner-tree size by bytes scanned (SpiderColl.cpp:3167-3182):
    full 2000 only for heavy scans, 400 under 10 MB, 1 for tiny lists.
    The reference uses this to bound doledb caching; in the wave engine
    the 1-cap also serializes small IPs, so it is opt-in
    (CrawlConfig.adaptive_winner_caps)."""
    if scanned_bytes < 25_000:
        return 1
    if scanned_bytes < 10_000_000:
        return 400
    return MAX_WINNER_NODES


@dataclass
class Req:
    """One frontier SpiderRequest (reference Spider.h:481-758, columnar
    subset)."""

    url: str
    uh48: int
    first_ip: int
    host: str
    dom_hash32: int
    site_hash32: int
    hop_count: int
    added_time: int  # seconds, virtual clock
    is_injecting: bool = False
    is_addurl: bool = False
    is_reindex: bool = False
    fake_first_ip: bool = False
    discovery_time: int = 0

    def __post_init__(self):
        if self.discovery_time == 0:
            self.discovery_time = self.added_time

    @property
    def is_manualadd(self) -> bool:
        # reference ismanualadd predicate: add-url/injected requests
        return self.is_addurl or self.is_injecting

    def srh(self) -> int:
        """Flag-salted site hash for request dedup
        (reference Spider.cpp:3867-3880)."""
        h = self.site_hash32
        if self.is_injecting:
            h ^= 0x42538909
        if self.is_addurl:
            h ^= 0x587C5A0B
        if self.is_reindex:
            h ^= 0x70FB3911
        if self.fake_first_ip:
            h ^= 0x95B8D376
        return h & 0xFFFFFFFF


@dataclass
class Rep:
    """One SpiderReply (reference Spider.h:772-910, columnar subset)."""

    uh48: int
    spidered_time: int  # seconds (download end), virtual clock
    err_code: int
    err_count: int
    http_status: int
    crawl_delay_ms: int  # from robots; -1 unknown
    content_hash32: int = 0
    lang: str = "en"
    is_indexed: bool = False
    # URL-derived reply flags (the reference derives these from content,
    # XmlDoc.cpp:14744-14750; our fetch subset derives from the URL)
    is_rss: bool = False
    is_permalink: bool = False
    # pubdate: the reference hardwires 0 (XmlDoc.cpp:14746), making the
    # `age` predicate never match — kept for DSL fidelity
    pub_date: int = 0
    # Spider.h:790: percent of content changed per day between the last
    # two spiderings; the reference reply path ships it commented out, we
    # revive it from the content-hash delta (0 or 100 percent) / days
    percent_changed_per_day: float = 0.0


def get_spider_time_ms(
    added_time_s: int,
    is_injecting: bool,
    is_reindex: bool,
    last_download_ms: int | None,
    same_ip_wait_ms: int,
    crawl_delay_ms: int | None,
    spider_freq_days: float,
    last_spidered_s: int | None,
) -> int:
    """Earliest allowed fetch time in ms (reference
    SpiderColl::getSpiderTimeMS, SpiderColl.cpp:4083-4180)."""
    t = added_time_s * 1000
    if last_spidered_s is None and (is_injecting or is_reindex):
        return t
    last = last_download_ms if last_download_ms is not None else 0
    t = max(t, last + same_ip_wait_ms)
    if crawl_delay_ms is not None and crawl_delay_ms >= 0:
        t = max(t, last + min(crawl_delay_ms, CRAWL_DELAY_CLAMP_MS))
    if last_spidered_s is not None and last_spidered_s > 0:
        wait_s = int(spider_freq_days * 86400.0)
        if is_reindex:
            wait_s = 0
        t = max(t, last_spidered_s * 1000 + wait_s * 1000)
    return t


def spider_times_ms_vec(
    added_time_s,
    is_injecting,
    is_reindex,
    last_download_ms,
    same_ip_wait_ms,
    crawl_delay_ms,
    spider_freq_days,
    last_spidered_s,
):
    """Vectorized get_spider_time_ms over candidate arrays.

    ``crawl_delay_ms`` uses -1 for "unknown"; ``last_spidered_s`` uses 0
    for "never" (matching get_spider_time_ms's None).  One numpy pass
    per wave replaces a Python call per candidate."""
    import numpy as np

    added = np.asarray(added_time_s, dtype=np.int64)
    last = np.asarray(last_download_ms, dtype=np.int64)
    wait = np.asarray(same_ip_wait_ms, dtype=np.int64)
    cd = np.asarray(crawl_delay_ms, dtype=np.int64)
    freq = np.asarray(spider_freq_days, dtype=np.float64)
    spidered = np.asarray(last_spidered_s, dtype=np.int64)
    inj = np.asarray(is_injecting, dtype=bool)
    rei = np.asarray(is_reindex, dtype=bool)

    t = added * 1000
    gated = np.maximum(t, last + wait)
    has_cd = cd >= 0
    gated = np.where(
        has_cd, np.maximum(gated, last + np.minimum(cd, CRAWL_DELAY_CLAMP_MS)), gated
    )
    has_rep = spidered > 0
    wait_s = (freq * 86400.0).astype(np.int64)
    wait_s = np.where(rei, 0, wait_s)
    respider = spidered * 1000 + wait_s * 1000
    gated = np.where(has_rep, np.maximum(gated, respider), gated)
    # first-time injected/reindex requests bypass politeness gating
    # (SpiderColl.cpp:4092-4094)
    first_special = (~has_rep) & (inj | rei)
    return np.where(first_special, t, gated)


@dataclass(order=True)
class _WinnerEntry:
    key: tuple  # (255-priority, hop_count, spider_time_ms, uh48) — ascending = best first
    req: Req = field(compare=False)
    priority: int = field(compare=False, default=0)
    spider_time_ms: int = field(compare=False, default=0)


def winner_key(priority: int, hop_count: int, spider_time_ms: int, uh48: int) -> tuple:
    """Winner-tree key ordering (reference makeWinnerTreeKey,
    Spider.cpp:985-1013): smaller = higher priority, then lower hop count,
    then earlier time, then smaller uh48."""
    hc = max(0, min(hop_count, 0xFFFF))
    return (255 - priority, hc, spider_time_ms, uh48)


def select_winners(candidates, now_ms: int, max_winners: int = MAX_WINNER_NODES):
    """Per-IP top-K winner selection.

    ``candidates``: iterable of (req: Req, priority: int,
    spider_time_ms: int), MUST be pre-sorted by uh48 ascending (the
    spiderdb scan order) — eviction decisions depend on scan order exactly
    as in the reference (SpiderColl::scanListForWinners,
    SpiderColl.cpp:3107-3292).

    Returns the surviving entries sorted by winner key (the order they are
    serialized into doledb, SpiderColl.cpp:3513-3584).
    """
    tree: list[_WinnerEntry] = []  # kept sorted by key
    by_uh48: dict[int, _WinnerEntry] = {}

    for req, priority, spider_time_ms in candidates:
        wk = winner_key(priority, req.hop_count, spider_time_ms, req.uh48)

        old = by_uh48.get(req.uh48)
        if old is not None:
            # min-merge hop counts and discovery times both ways
            # (SpiderColl.cpp:3129-3148)
            hc = min(req.hop_count, old.req.hop_count)
            dt = min(req.discovery_time, old.req.discovery_time)
            old.req.hop_count = hc
            old.req.discovery_time = dt
            req = replace(req, hop_count=hc, discovery_time=dt)
            wk = winner_key(priority, hc, spider_time_ms, req.uh48)
            # keep the smaller (better) key (SpiderColl.cpp:3150-3156)
            if wk >= old.key:
                continue
            idx = bisect.bisect_left(tree, old)
            del tree[idx]
            del by_uh48[req.uh48]

        if len(tree) >= max_winners:
            tail = tree[-1]
            # overdue-flattened comparison vs the current tail
            # (SpiderColl.cpp:3186-3232)
            tm1 = 1 if spider_time_ms < now_ms else spider_time_ms
            tm2 = 1 if tail.spider_time_ms < now_ms else tail.spider_time_ms
            if tm1 > tm2:
                continue
            if tm1 == tm2:
                if priority < tail.priority:
                    continue
                if priority == tail.priority:
                    if req.hop_count > tail.key[1]:
                        continue
                    if req.hop_count == tail.key[1]:
                        if spider_time_ms >= tail.spider_time_ms:
                            continue
            # evict tail
            del by_uh48[tail.req.uh48]
            tree.pop()

        entry = _WinnerEntry(key=wk, req=req, priority=priority, spider_time_ms=spider_time_ms)
        bisect.insort(tree, entry)
        by_uh48[req.uh48] = entry

    return tree


def dedup_frontier(records):
    """Merge-time spiderdb dedup (reference dedupSpiderdbList,
    Spider.cpp:3714-4021).

    ``records``: list of Req/Rep mixed, pre-sorted by (uh48, kind) with
    replies before requests for the same uh48 (spiderdb key order: the
    isRequest bit sorts requests after replies, Spider.h:399-416).

    Keeps, per uh48: the newest reply (first wins ties); per (uh48, srh)
    request group the lowest hop count, ties → oldest added_time, further
    ties → first in scan order; requests superseded by a newer reply are
    dropped when reindex/fake-first-ip.
    """
    out = []
    cur_uh48 = None
    best_rep: Rep | None = None
    kept_reqs: list[tuple[int, int, Req]] = []  # (srh, out-index, req)

    for rec in records:
        if isinstance(rec, Rep):
            if cur_uh48 == rec.uh48 and best_rep is not None:
                if best_rep.spidered_time >= rec.spidered_time:
                    continue
                out.remove(best_rep)
            else:
                cur_uh48 = rec.uh48
                kept_reqs = []
            best_rep = rec
            out.append(rec)
            continue

        req: Req = rec
        if cur_uh48 != req.uh48:
            cur_uh48 = req.uh48
            best_rep = None
            kept_reqs = []
        if best_rep is not None and best_rep.spidered_time > req.added_time:
            if req.is_reindex or req.fake_first_ip:
                continue
        srh = req.srh()
        skip = False
        for i, (psrh, pidx, prev) in enumerate(kept_reqs):
            if psrh != srh:
                continue
            if (req.hop_count > prev.hop_count) or (
                req.hop_count == prev.hop_count and req.added_time >= prev.added_time
            ):
                skip = True
            else:
                out.remove(prev)
                del kept_reqs[i]
            break
        if skip:
            continue
        kept_reqs.append((srh, len(out), req))
        out.append(req)

    return out
