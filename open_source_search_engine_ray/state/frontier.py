"""FrontierCore — the per-partition scheduler state machine.

One instance owns one frontier partition (all IPs with
``part_of_ip(ip) == part_id``), reproducing the reference SpiderColl's
cooperating structures (SpiderColl.h:26-282) as plain dicts/heaps:

- ``requests``/``replies``     ↔ spiderdb request+reply log (deduped on
                                 add with the commutative min-(hop,added)
                                 merge — the outcome of dedupSpiderdbList,
                                 Spider.cpp:3714-4021)
- ``waiting``                  ↔ waiting tree: next eligible time per IP,
                                 exactly one entry per IP, absent while the
                                 IP has a URL in flight (doledb XOR waiting
                                 invariant, SpiderColl.cpp:1160-1168)
- ``schedule()``               ↔ populateDoledbFromWaitingTree +
                                 scanListForWinners + launch gating
                                 (SpiderColl.cpp:1812-3292,
                                 SpiderLoop.cpp:943-1072)
- ``complete()``               ↔ addSpiderReply: politeness clock + crawl
                                 delay table updates and IP re-arm
                                 (SpiderColl.cpp:612, 4098-4126)
- ``urlseen``                  ↔ dup cache (SpiderColl.cpp:845-904) with
                                 partitioned bloom segments

The class is deliberately Ray-free: the distributed engine wraps it in a
``@ray.remote`` actor (pipelines/crawl.py) and the sequential oracle
(pipelines/oracle.py) drives the same code, so engine-vs-oracle equality
tests isolate exactly the distributed machinery (shuffle, actor routing,
parallel fetch).  All cross-partition merges are commutative, so
route-back arrival order cannot change state.
"""

from __future__ import annotations

import os
import pickle
import uuid
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions import gbhash
from ..functions.schedule import (
    MAX_WINNER_NODES,
    Rep,
    Req,
    adaptive_max_winners,
    get_spider_time_ms,
    select_winners,
    spider_times_ms_vec,
)
from ..functions.urlfilter import (
    FilterProgram,
    SiteList,
    url_is_permalink_format,
    url_is_rssext,
)
from ..functions.urlnorm import get_domain
from .urlseen import UrlSeen

INF = 1 << 62


def part_of_ip(ip: int, num_partitions: int) -> int:
    """Frontier shard routing (reference: hash32h(firstIp,0x123456) shard
    map, Hostdb.cpp getShardNum + isAssignedToUs Spider.cpp:1071-1131)."""
    return int(gbhash.hash32(str(int(ip)))) % num_partitions


@dataclass
class CrawlConfig:
    num_partitions: int = 4
    horizon_ms: int = 3_600_000  # virtual round length; respiders beyond it end the round
    user_agent: str = "gigablastbot"
    site_list: tuple = ()
    rules: tuple | None = None  # None → default web profile
    exact_urlseen: bool = True
    bloom_bits: int = 1 << 20
    max_pages: int = 0  # 0 = unlimited; stop scheduling after N launches (budget)
    # hot-IP overflow cap: stop admitting new URLs for an IP once this many
    # are pending (reference: 10M-request overflow list,
    # SpiderColl.cpp:3319-3397) — bounds per-IP scan cost under skew
    overflow_cap: int = 10_000_000
    # verify url↔uh48 consistency of every batch entering the frontier
    # (catches transport corruption; cheap relative to admission work)
    verify_integrity: bool = True
    stop_after_waves: int = 0  # 0 = run to completion (test hook: simulated kill)
    fetch_concurrency: int = 4  # fetch/parse actor pool size per stage
    fetch_batch_size: int = 256
    stage_mode: str = "tasks"  # "tasks" (many small waves) | "actors" (big waves)
    # wave batching window: the virtual clock advances to min_event+window
    # each wave, so all IPs due within the window launch together.  Larger
    # windows → fewer, bigger waves (better throughput); politeness gaps are
    # still enforced in virtual ms (launch times only move later, never
    # earlier).  0 = event-at-a-time (finest granularity).
    wave_window_ms: int = 250
    # launch-log / URL-seen rows buffered in the actor before spilling a
    # parquet segment (the Rdb dump threshold analogue, Rdb.cpp dump
    # lifecycle: RAM tree bounded, disk authoritative)
    log_flush_rows: int = 32768
    # adaptive winner-tree caps by bytes scanned (2000/400/1,
    # SpiderColl.cpp:3167-3182).  Opt-in: the 1-cap for tiny scans also
    # serializes launches per wave in this engine (the reference
    # re-populates doledb continuously, we launch per wave)
    adaptive_winner_caps: bool = False
    # real-clock mode: the driver paces waves against the wall clock
    # (now = elapsed wall ms) instead of jumping the virtual clock —
    # politeness gaps become real delays
    real_clock: bool = False

    # URL-filter profile when no explicit rules are given: "web",
    # "privacore" or "shallow" (Collectiondb.cpp:1396, 1639, 2248)
    profile: str = "web"

    def filter_rules(self):
        if self.rules:
            return list(self.rules)
        from ..functions.urlfilter import PROFILES

        return PROFILES[self.profile]()


LAUNCH_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("uh48", pa.uint64()),
        ("first_ip", pa.int64()),
        ("host", pa.string()),
        ("dom_hash32", pa.int64()),
        ("hop_count", pa.int32()),
        ("added_time", pa.int64()),
        ("priority", pa.int16()),
        ("ufn", pa.int32()),
        ("harvest_links", pa.bool_()),
        ("err_count", pa.int32()),
        ("launch_ms", pa.int64()),
        ("wave", pa.int64()),
        ("part_id", pa.int32()),
        ("seq", pa.int64()),
    ]
)

REQUEST_COLS = (
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
    # URL-derived predicate flags, computed where the URL is built
    # (ParseStage workers / seed canonicalization) so the per-URL regex
    # cost runs on the wide fan-out, not on the P frontier actors
    # (reference sets them on the SpiderRequest at build time,
    # XmlDoc.cpp:15360-15400)
    "is_root",
    "is_rssext",
    "is_permalink_format",
)

REPLY_COLS = (
    "uh48",
    "first_ip",
    "dom_hash32",
    "spidered_time",
    "download_end_ms",
    "err_code",
    "http_status",
    "crawl_delay_ms",
    "lang",
    "content_hash32",
)


#: retry-dedup tokens retained per actor; Ray task retries land close in
#: time, so a bounded window gives exactly-once without unbounded growth
TOKEN_WINDOW = 4096


class FrontierCore:
    def __init__(self, part_id: int, cfg: CrawlConfig, log_dir: str | None = None):
        self.part_id = part_id
        self.cfg = cfg
        self.prog = FilterProgram(cfg.filter_rules())
        self.site_list = SiteList(cfg.site_list)
        # frontier log (deduped)
        self.requests: dict[int, dict[int, dict]] = {}  # uh48 -> srh -> req fields
        self.replies: dict[int, Rep] = {}
        self.inlinks: dict[int, set] = {}  # uh48 -> parent c-blocks (SpiderColl.cpp:2701-2742)
        self.by_ip: dict[int, set] = {}  # ip -> pending uh48s
        self.deleted: set = set()
        # scheduler state
        self.waiting: dict[int, int] = {}  # ip -> next eligible ms
        self.in_flight_ip: dict[int, int] = {}
        self.in_flight_uh48: set = set()
        self.last_download: dict[int, int] = {}  # ip -> last download end ms
        self.cd_table: dict[int, int] = {}  # dom_hash32 -> crawl delay ms
        self.urlseen = UrlSeen(cfg.bloom_bits, exact=cfg.exact_urlseen)
        # quota tables: indexed-page counts per site/domain hash, one vote
        # per uh48 (reference SpiderColl.cpp:2754-2798 m_localTable)
        self.quota_site: dict[int, int] = {}
        self.quota_dom: dict[int, int] = {}
        self.quota_counted: set = set()
        # durable logs: launch log + URL-seen report stream to parquet
        # segments under log_dir so actor RSS is bounded by the HOT
        # scheduling state, not crawl history (reference: spiderdb on
        # disk, Rdb dump/merge lifecycle).  log_dir=None (unit tests,
        # cold-start jobs) keeps everything buffered in RAM.
        self.log_dir = log_dir
        self._launch_buf: list[pa.Table] = []
        self._launch_buf_rows = 0
        self._launch_segs: list[str] = []
        self._seen_uh: list[int] = []
        self._seen_url: list[str] = []
        self._seen_segs: list[str] = []
        # idempotency: Ray task retries may re-send a batch (insertion-
        # ordered dict = bounded FIFO window)
        self.applied_tokens: dict = {}
        self.seq = 0
        self.wave = 0
        self.metrics = {"added": 0, "dup_dropped": 0, "force_deleted": 0, "launched": 0, "completed": 0, "errors": 0}

    # -- frontier writes ---------------------------------------------------

    def _apply_once(self, token) -> bool:
        """True if this batch token was already applied (a retried Ray task
        re-sending its side effects); exactly-once application makes the
        route-back stage retry-safe."""
        if token is None:
            return False
        if token in self.applied_tokens:
            return True
        self.applied_tokens[token] = None
        if len(self.applied_tokens) > TOKEN_WINDOW:
            self.applied_tokens.pop(next(iter(self.applied_tokens)))
        return False

    def add_requests(self, cols: dict, token=None) -> int:
        """Admit a batch of SpiderRequests (columnar dict of numpy arrays,
        REQUEST_COLS).  Returns number admitted."""
        n = len(cols["uh48"])
        if n == 0 or self._apply_once(token):
            return 0
        if self.cfg.verify_integrity:
            want = gbhash.uh48_batch(list(cols["url"]))
            got = np.asarray(cols["uh48"], dtype=np.uint64)
            if not (want == got).all():
                bad = int(np.nonzero(want != got)[0][0])
                raise RuntimeError(
                    f"request-cols corruption at actor-in(part {self.part_id}): "
                    f"row {bad}/{n} url={cols['url'][bad]!r} "
                    f"uh48={int(got[bad])} recomputed={int(want[bad])}"
                )
        uh = cols["uh48"].astype(np.uint64)
        hop = cols["hop_count"].astype(np.int64)
        added = cols["added_time"].astype(np.int64)
        salts = (
            np.where(cols["is_injecting"], 0x42538909, 0)
            ^ np.where(cols["is_addurl"], 0x587C5A0B, 0)
            ^ np.where(cols["is_reindex"], 0x70FB3911, 0)
            ^ np.where(cols["fake_first_ip"], 0x95B8D376, 0)
        ).astype(np.uint64)
        # dup-cache key (SpiderColl.cpp:872-889) + full hop + added_time so
        # that any two rows sharing a key are value-identical — admission
        # then cannot depend on route-back arrival order (see
        # state/urlseen.py docstring)
        dup_key = (
            uh
            ^ salts
            ^ (hop.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
            ^ (added.astype(np.uint64) * np.uint64(0xC2B2AE3D27D4EB4F))
        )
        fresh = self.urlseen.test_and_add(dup_key)
        # inlink c-block counting sees every arriving request, admitted or
        # not (commutative set union ⇒ deterministic under any ordering)
        for i in range(n):
            u48 = int(uh[i])
            if u48 not in self.deleted:
                self.inlinks.setdefault(u48, set()).add(int(cols["parent_ip"][i]) >> 8)
        admitted = 0
        for i in np.nonzero(fresh)[0]:
            u48 = int(uh[i])
            # NOTE: in-flight URLs are NOT checked here — admission must be
            # independent of completion-arrival order within a wave; the
            # scan skips in-flight uh48s instead.
            if u48 in self.deleted:
                continue
            url = cols["url"][i]
            ip = int(cols["first_ip"][i])
            pend = self.by_ip.get(ip)
            if (
                pend is not None
                and len(pend) >= self.cfg.overflow_cap
                and u48 not in pend
            ):
                # hot-IP overflow: stop harvesting new URLs for this IP
                self.metrics["overflow_dropped"] = self.metrics.get("overflow_dropped", 0) + 1
                continue
            req = {
                "url": url,
                "uh48": u48,
                "first_ip": ip,
                "host": cols["host"][i],
                "dom_hash32": int(cols["dom_hash32"][i]),
                "site_hash32": int(cols["site_hash32"][i]),
                "hop_count": int(hop[i]),
                "added_time": int(added[i]),
                "is_injecting": bool(cols["is_injecting"][i]),
                "is_addurl": bool(cols["is_addurl"][i]),
                "is_reindex": bool(cols["is_reindex"][i]),
                "fake_first_ip": bool(cols["fake_first_ip"][i]),
                "discovery_time": int(added[i]),
                # URL-derived predicate flags arrive precomputed in the
                # request columns (see REQUEST_COLS note)
                "is_root": bool(cols["is_root"][i]),
                "is_rssext": bool(cols["is_rssext"][i]),
                "is_permalink_format": bool(cols["is_permalink_format"][i]),
            }
            srh = int(salts[i] ^ np.uint64(req["site_hash32"] & 0xFFFFFFFF))
            newly_seen = u48 not in self.requests
            slot = self.requests.setdefault(u48, {})
            prev = slot.get(srh)
            if prev is None:
                slot[srh] = req
            else:
                prev["discovery_time"] = min(prev["discovery_time"], req["discovery_time"])
                # keep min (hop, added) — dedupSpiderdbList outcome
                if (req["hop_count"], req["added_time"]) < (
                    prev["hop_count"],
                    prev["added_time"],
                ):
                    req["discovery_time"] = prev["discovery_time"]
                    slot[srh] = req
                else:
                    admitted += 1  # counted, but merged away
                    continue
            if newly_seen:
                # URL-seen report entry: exactly once per uh48 (the first
                # slot creation), streamed out like the launch log
                self._seen_uh.append(u48)
                self._seen_url.append(url)
                if self.log_dir and len(self._seen_uh) >= self.cfg.log_flush_rows:
                    self._flush_seen()
            self.by_ip.setdefault(ip, set()).add(u48)
            if self.in_flight_ip.get(ip, 0) == 0:
                self.waiting[ip] = 0  # addToWaitingTree(0) — scan asap
            admitted += 1
        self.metrics["added"] += admitted
        self.metrics["dup_dropped"] += int(n - fresh.sum())
        return admitted

    # -- scheduling --------------------------------------------------------

    def next_event_ms(self) -> int:
        return min(self.waiting.values(), default=INF)

    def _candidates_for_ip(self, ip: int):
        pend = self.by_ip.get(ip)
        if not pend:
            return []
        out = []
        for u48 in pend:
            if u48 in self.in_flight_uh48 or u48 in self.deleted:
                continue
            slot = self.requests.get(u48)
            if not slot:
                continue
            # evaluate each flag-variant request; they may map to
            # different filter rows (Spider.cpp:3887-3890)
            for req in slot.values():
                out.append(req)
        return out

    def _eval_filters(self, reqs: list, now_ms: int = 0):
        n = len(reqs)
        now_s = now_ms // 1000
        c = {
            "uh48": np.fromiter((r["uh48"] for r in reqs), np.uint64, n),
            "url": np.array([r["url"] for r in reqs], dtype=object),
            "hop_count": np.fromiter((r["hop_count"] for r in reqs), np.int32, n),
            "added_time": np.fromiter((r["added_time"] for r in reqs), np.int64, n),
            "is_injecting": np.fromiter((r["is_injecting"] for r in reqs), bool, n),
            "is_reindex": np.fromiter((r["is_reindex"] for r in reqs), bool, n),
            "is_addurl": np.fromiter((r["is_addurl"] for r in reqs), bool, n),
        }
        c["is_manualadd"] = c["is_addurl"] | c["is_injecting"]
        c["is_www"] = np.fromiter((r["url"].startswith(("http://www", "https://www")) for r in reqs), bool, n)
        doms = [get_domain(r["host"]) for r in reqs]
        c["tld"] = np.array([d.rsplit(".", 1)[-1] for d in doms], dtype=object)
        c["in_sitelist"] = self.site_list.matches_batch(c["url"], np.array(doms, dtype=object))
        c["num_inlinks"] = np.fromiter(
            (min(len(self.inlinks.get(r["uh48"], ())), 255) for r in reqs), np.int32, n
        )
        had, st, ec, code, http, lang, idx = [], [], [], [], [], [], []
        rss, perm, pub, pcpd = [], [], [], []
        for r in reqs:
            rep = self.replies.get(r["uh48"])
            had.append(rep is not None)
            st.append(rep.spidered_time if rep else 0)
            ec.append(rep.err_count if rep else 0)
            code.append(rep.err_code if rep else 0)
            http.append(rep.http_status if rep else 0)
            lang.append(rep.lang if rep else "en")
            idx.append(bool(rep.is_indexed) if rep else False)
            rss.append(bool(rep.is_rss) if rep else False)
            perm.append(bool(rep.is_permalink) if rep else False)
            pub.append(rep.pub_date if rep else 0)
            pcpd.append(rep.percent_changed_per_day if rep else 0.0)
        c["had_reply"] = np.array(had)
        c["spidered_time"] = np.array(st, dtype=np.int64)
        c["err_count"] = np.array(ec, dtype=np.int32)
        c["err_code"] = np.array(code, dtype=np.int32)
        c["http_status"] = np.array(http, dtype=np.int32)
        c["lang"] = np.array(lang, dtype=object)
        c["is_indexed"] = np.array(idx)
        c["is_rss"] = np.array(rss)
        c["is_permalink"] = np.array(perm)
        c["percentchangedperday"] = np.array(pcpd, dtype=np.float64)
        pub_a = np.array(pub, dtype=np.int64)
        # pubdate age; <=0 pubdate is invalid and never matches
        c["age"] = np.where(pub_a > 0, now_s - pub_a, -1)
        # request age from discovery time (Spider.cpp:3252-3259: falls
        # back to added_time when discovery is unset)
        disc = np.fromiter(
            (r["discovery_time"] or r["added_time"] for r in reqs), np.int64, n
        )
        c["url_age"] = now_s - disc
        c["spiderwaited"] = np.where(c["had_reply"], now_s - c["spidered_time"], 0)
        # request-side URL-derived flags (stored at admission)
        c["is_root"] = np.fromiter((r.get("is_root", False) for r in reqs), bool, n)
        c["is_rssext"] = np.fromiter((r.get("is_rssext", False) for r in reqs), bool, n)
        c["is_permalink_format"] = np.fromiter(
            (r.get("is_permalink_format", False) for r in reqs), bool, n
        )
        c["is_pingserver"] = np.zeros(n, dtype=bool)  # Url.cpp:2548
        c["fake_first_ip"] = np.fromiter((r["fake_first_ip"] for r in reqs), bool, n)
        c["has_authority_inlink"] = np.zeros(n, dtype=bool)
        c["authority_inlink_valid"] = np.zeros(n, dtype=bool)
        # quota lookups (SpiderColl.cpp quotaTable by siteHash32/domHash32)
        c["sitepages"] = np.fromiter(
            (self.quota_site.get(r["site_hash32"], 0) for r in reqs), np.int64, n
        )
        c["domainpages"] = np.fromiter(
            (self.quota_dom.get(r["dom_hash32"], 0) for r in reqs), np.int64, n
        )
        c["site_tag"] = self.site_list.tags_batch(c["url"], np.array(doms, dtype=object))
        return c, self.prog.assign(c)

    def _delete(self, u48: int):
        self.deleted.add(u48)
        self.requests.pop(u48, None)
        self.metrics["force_deleted"] += 1

    def schedule(self, now_ms: int, wave_no: int | None = None) -> pa.Table:
        """Scan every due IP; launch winners; re-arm or drop waiting
        entries.  Returns the launch batch (LAUNCH_SCHEMA).

        ``wave_no``: driver-assigned wave number (keeps wave fields
        aligned across partitions even when the driver skips non-due
        partitions); defaults to the actor-local counter."""
        if wave_no is not None:
            self.wave = wave_no
        due_ips = sorted(ip for ip, t in self.waiting.items() if t <= now_ms)
        rows: list = []
        budget_hit = (
            self.cfg.max_pages and self.metrics["launched"] >= self.cfg.max_pages
        )
        # phase 1: gather candidates across ALL due IPs so filter
        # evaluation and due-time computation run as single vectorized
        # passes (per-IP numpy setup dominated the scan otherwise)
        gather: list = []
        spans: list = []  # (ip, start, end) in due order
        for ip in due_ips:
            if budget_hit:
                del self.waiting[ip]
                continue
            reqs = self._candidates_for_ip(ip)
            if not reqs:
                del self.waiting[ip]
                self.by_ip.pop(ip, None)
                continue
            spans.append((ip, len(gather), len(gather) + len(reqs)))
            gather.extend(reqs)
        if gather:
            c, ufn_all = self._eval_filters(gather, now_ms)
            nall = len(gather)
            kmax = np.maximum(ufn_all, 0)
            last_arr = np.fromiter(
                (self.last_download.get(r["first_ip"], 0) for r in gather),
                np.int64,
                nall,
            )
            cd_arr = np.fromiter(
                (self.cd_table.get(r["dom_hash32"], -1) for r in gather), np.int64, nall
            )
            stimes_all = spider_times_ms_vec(
                c["added_time"],
                c["is_injecting"],
                c["is_reindex"],
                last_arr,
                self.prog.same_ip_wait_ms[kmax],
                cd_arr,
                self.prog.spider_freq_days[kmax],
                c["spidered_time"],
            )
            forced = (ufn_all >= 0) & self.prog.force_delete[kmax]
        # phase 2: per-IP kill/winner/launch in due order (identical
        # semantics to the per-IP scan)
        for ip, start, end in spans:
            if budget_hit:
                del self.waiting[ip]
                continue
            reqs = gather[start:end]
            ufn = ufn_all[start:end]
            stimes = stimes_all[start:end]
            killed = set()
            for i in range(len(reqs)):
                if forced[start + i]:
                    killed.add(reqs[i]["uh48"])
            for u48 in killed:
                self._delete(u48)
                self.by_ip.get(ip, set()).discard(u48)
            min_future = INF
            cands = []
            for i, r in enumerate(reqs):
                if r["uh48"] in killed or ufn[i] < 0:
                    continue
                # maxSpidersPerRule == 0 blocks launching entirely
                # (populateDoledbFromWaitingTree skips such rules)
                if self.prog.max_spiders_per_rule[ufn[i]] <= 0:
                    continue
                stime = int(stimes[i])
                if stime <= now_ms:
                    cands.append((r, int(ufn[i]), stime))
                else:
                    min_future = min(min_future, stime)
            if not cands:
                if min_future == INF:
                    del self.waiting[ip]
                else:
                    self.waiting[ip] = min_future  # re-arm (SpiderColl.cpp:3483-3487)
                continue
            # spiderdb scan order; the secondary keys give flag-variant
            # requests of one uh48 a content-derived total order so
            # select_winners tie-breaks are route-back-arrival-independent
            cands.sort(
                key=lambda t: (
                    t[0]["uh48"],
                    t[0]["is_injecting"],
                    t[0]["is_addurl"],
                    t[0]["is_reindex"],
                    t[0]["fake_first_ip"],
                    t[0]["site_hash32"],
                )
            )
            if self.cfg.adaptive_winner_caps:
                scanned = sum(len(r["url"]) + 64 for r in reqs)
                max_w = adaptive_max_winners(scanned)
            else:
                max_w = MAX_WINNER_NODES
            winners = select_winners(
                (
                    (
                        Req(
                            url=r["url"],
                            uh48=r["uh48"],
                            first_ip=r["first_ip"],
                            host=r["host"],
                            dom_hash32=r["dom_hash32"],
                            site_hash32=r["site_hash32"],
                            hop_count=r["hop_count"],
                            added_time=r["added_time"],
                            is_injecting=r["is_injecting"],
                            is_addurl=r["is_addurl"],
                            is_reindex=r["is_reindex"],
                            fake_first_ip=r["fake_first_ip"],
                            discovery_time=r["discovery_time"],
                        ),
                        int(self.prog.priority[k]),
                        stime,
                    )
                    for (r, k, stime) in cands
                ),
                now_ms=now_ms,
                max_winners=max_w,
            )
            ufn_by_uh = {r["uh48"]: k for (r, k, _) in cands}
            # per-IP launch budget (SpiderLoop.cpp:943-1072): a known
            # crawl-delay forces strictly one at a time; otherwise up to
            # the rule's maxSpidersPerIp may be in flight with launches
            # spaced sameIpWait apart — we chain as many as fit in the
            # wave window
            top_k = ufn_by_uh[winners[0].req.uh48]
            gap = int(self.prog.same_ip_wait_ms[top_k])
            has_cd = any(self.cd_table.get(r["dom_hash32"], -1) >= 0 for (r, _, _) in cands)
            if has_cd:
                allowed = 1
            elif gap <= 0:
                # no crawl-delay and no sameIpWait: the whole per-IP budget
                # fits in any window (reference maxSpidersPerIp gating)
                allowed = int(self.prog.max_spiders_per_ip[top_k])
            else:
                chain = 1 + self.cfg.wave_window_ms // gap
                allowed = min(int(self.prog.max_spiders_per_ip[top_k]), int(chain))
            for li, w in enumerate(winners[:allowed]):
                r = w.req
                k = ufn_by_uh[r.uh48]
                rep = self.replies.get(r.uh48)
                rows.append(
                    {
                        "url": r.url,
                        "uh48": r.uh48,
                        "first_ip": ip,
                        "host": r.host,
                        "dom_hash32": r.dom_hash32,
                        "hop_count": r.hop_count,
                        "added_time": r.added_time,
                        "priority": w.priority,
                        "ufn": k,
                        "harvest_links": bool(self.prog.harvest_links[k]),
                        "err_count": rep.err_count if rep else 0,
                        "launch_ms": now_ms + li * gap,  # sameIpWait spacing
                        "wave": self.wave,
                        "part_id": self.part_id,
                        "seq": self.seq,
                    }
                )
                self.seq += 1
                self.in_flight_uh48.add(r.uh48)
                self.in_flight_ip[ip] = self.in_flight_ip.get(ip, 0) + 1
                self.metrics["launched"] += 1
                if self.cfg.max_pages and self.metrics["launched"] >= self.cfg.max_pages:
                    budget_hit = True
            del self.waiting[ip]  # doled XOR waiting
        self.wave += 1
        if not rows:
            return LAUNCH_SCHEMA.empty_table()
        t = pa.Table.from_pylist(rows, schema=LAUNCH_SCHEMA)
        self._launch_buf.append(t)
        self._launch_buf_rows += t.num_rows
        if self.log_dir and self._launch_buf_rows >= self.cfg.log_flush_rows:
            self._flush_launches()
        return t

    # -- completion --------------------------------------------------------

    def complete(self, cols: dict, token=None) -> int:
        """Apply a batch of fetch replies (REPLY_COLS arrays)."""
        n = len(cols["uh48"])
        if self._apply_once(token):
            return 0
        for i in range(n):
            u48 = int(cols["uh48"][i])
            ip = int(cols["first_ip"][i])
            end_ms = int(cols["download_end_ms"][i])
            self.in_flight_uh48.discard(u48)
            left = self.in_flight_ip.get(ip, 0) - 1
            if left > 0:
                self.in_flight_ip[ip] = left
            else:
                self.in_flight_ip.pop(ip, None)
            self.last_download[ip] = max(self.last_download.get(ip, 0), end_ms)
            cd = int(cols["crawl_delay_ms"][i])
            if cd >= 0:
                self.cd_table[int(cols["dom_hash32"][i])] = cd
            err = int(cols["err_code"][i])
            prev = self.replies.get(u48)
            slot = self.requests.get(u48)
            any_req = next(iter(slot.values())) if slot else None
            url = any_req["url"] if any_req else ""
            # percentChangedPerDay (Spider.h:790): content-hash delta
            # between the last two spiderings / elapsed days
            pcpd = 0.0
            st_new = int(cols["spidered_time"][i])
            ch_new = int(cols["content_hash32"][i])
            if prev is not None and prev.is_indexed and err == 0 and st_new > prev.spidered_time:
                days = (st_new - prev.spidered_time) / 86400.0
                changed = 0.0 if ch_new == prev.content_hash32 else 100.0
                pcpd = changed / days if days > 0 else 0.0
            rep = Rep(
                uh48=u48,
                spidered_time=st_new,
                err_code=err,
                err_count=(prev.err_count + 1 if prev else 1) if err else 0,
                http_status=int(cols["http_status"][i]),
                crawl_delay_ms=cd,
                content_hash32=ch_new,
                lang=cols["lang"][i],
                is_indexed=err == 0,
                is_rss=url_is_rssext(url) if url else False,
                is_permalink=url_is_permalink_format(url) if url else False,
                percent_changed_per_day=pcpd,
            )
            if prev is None or rep.spidered_time >= prev.spidered_time:
                self.replies[u48] = rep
            # quota counting: one vote per uh48 once indexed
            # (SpiderColl.cpp:2776-2798)
            if rep.is_indexed and any_req is not None and u48 not in self.quota_counted:
                self.quota_counted.add(u48)
                s32 = any_req["site_hash32"]
                d32 = any_req["dom_hash32"]
                self.quota_site[s32] = self.quota_site.get(s32, 0) + 1
                self.quota_dom[d32] = self.quota_dom.get(d32, 0) + 1
            if left <= 0:
                self.waiting[ip] = 0  # re-arm asap; next scan gates by spider time
            self.metrics["completed"] += 1
            if err:
                self.metrics["errors"] += 1
        return n

    # -- durable log segments ---------------------------------------------

    def _part_dir(self) -> str:
        d = os.path.join(self.log_dir, f"part-{self.part_id:05d}")
        os.makedirs(d, exist_ok=True)
        return d

    def _write_seg(self, t: pa.Table, name: str) -> None:
        d = self._part_dir()
        tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex}")
        pq.write_table(t, tmp)
        os.replace(tmp, os.path.join(d, name))

    def _flush_launches(self) -> None:
        if not self._launch_buf_rows:
            return
        name = f"launch-{len(self._launch_segs):06d}.parquet"
        self._write_seg(pa.concat_tables(self._launch_buf), name)
        self._launch_segs.append(name)
        self._launch_buf = []
        self._launch_buf_rows = 0

    def _flush_seen(self) -> None:
        if not self._seen_uh:
            return
        name = f"seen-{len(self._seen_segs):06d}.parquet"
        self._write_seg(
            pa.table(
                {
                    "uh48": pa.array(self._seen_uh, pa.uint64()),
                    "url": pa.array(self._seen_url, pa.string()),
                }
            ),
            name,
        )
        self._seen_segs.append(name)
        self._seen_uh = []
        self._seen_url = []

    def flush_logs(self) -> None:
        """Spill all buffered log rows to parquet segments (no-op without
        a log_dir)."""
        if self.log_dir is None:
            return
        self._flush_launches()
        self._flush_seen()

    # -- reporting / checkpoint -------------------------------------------

    def launch_log(self) -> pa.Table:
        tbls = []
        if self.log_dir is not None:
            d = self._part_dir()
            tbls = [pq.read_table(os.path.join(d, s)) for s in self._launch_segs]
        tbls += self._launch_buf
        if not tbls:
            return LAUNCH_SCHEMA.empty_table()
        return pa.concat_tables(tbls)

    def url_seen(self) -> list:
        pairs = []
        if self.log_dir is not None:
            d = self._part_dir()
            for s in self._seen_segs:
                t = pq.read_table(os.path.join(d, s))
                pairs.extend(zip(t["uh48"].to_pylist(), t["url"].to_pylist()))
        pairs.extend(zip(self._seen_uh, self._seen_url))
        return sorted(pairs)

    def fetch_log(self) -> list:
        return sorted(
            (u, r.spidered_time, r.http_status, r.err_code, r.err_count, r.crawl_delay_ms)
            for u, r in self.replies.items()
        )

    def recount_quotas(self) -> None:
        """Rebuild the quota tables from the reply log — the cold-start
        counting pass (SpiderColl.cpp:2754-2798 with
        m_countingPagesIndexed set)."""
        self.quota_site = {}
        self.quota_dom = {}
        self.quota_counted = set()
        for u48, rep in self.replies.items():
            slot = self.requests.get(u48)
            if not rep.is_indexed or not slot:
                continue
            any_req = next(iter(slot.values()))
            self.quota_counted.add(u48)
            s32 = any_req["site_hash32"]
            d32 = any_req["dom_hash32"]
            self.quota_site[s32] = self.quota_site.get(s32, 0) + 1
            self.quota_dom[d32] = self.quota_dom.get(d32, 0) + 1

    def get_metrics(self) -> dict:
        return dict(self.metrics)

    def get_wave(self) -> int:
        return self.wave

    def checkpoint_bytes(self, lineage: dict | None = None) -> bytes:
        """Delta-style checkpoint: buffered log rows are flushed to
        durable segments first, so the blob carries only hot scheduling
        state plus the segment manifest (not the crawl history)."""
        self.flush_logs()
        st = {
            "part_id": self.part_id,
            "cfg": self.cfg,
            "log_dir": self.log_dir,
            "requests": self.requests,
            "replies": self.replies,
            "inlinks": self.inlinks,
            "by_ip": self.by_ip,
            "deleted": self.deleted,
            "waiting": self.waiting,
            "in_flight_ip": self.in_flight_ip,
            "in_flight_uh48": self.in_flight_uh48,
            "last_download": self.last_download,
            "cd_table": self.cd_table,
            "quota_site": self.quota_site,
            "quota_dom": self.quota_dom,
            "quota_counted": self.quota_counted,
            "urlseen": self.urlseen.state(),
            "applied_tokens": self.applied_tokens,
            "launch_segs": self._launch_segs,
            "seen_segs": self._seen_segs,
            # only populated when log_dir is None (RAM-only cores)
            "launch_buf_ipc": [_tbl_ipc(t) for t in self._launch_buf],
            "seen_buf": (self._seen_uh, self._seen_url),
            "seq": self.seq,
            "wave": self.wave,
            "metrics": self.metrics,
            "lineage": lineage or {},
        }
        return pickle.dumps(st, protocol=pickle.HIGHEST_PROTOCOL)

    @classmethod
    def from_checkpoint_bytes(cls, blob: bytes) -> "FrontierCore":
        st = pickle.loads(blob)
        core = cls(st["part_id"], st["cfg"], log_dir=st["log_dir"])
        for k in (
            "requests",
            "replies",
            "inlinks",
            "by_ip",
            "deleted",
            "waiting",
            "in_flight_ip",
            "in_flight_uh48",
            "last_download",
            "cd_table",
            "quota_site",
            "quota_dom",
            "quota_counted",
            "applied_tokens",
            "seq",
            "wave",
            "metrics",
        ):
            setattr(core, k, st[k])
        core.urlseen = UrlSeen.from_state(st["urlseen"])
        core._launch_segs = st["launch_segs"]
        core._seen_segs = st["seen_segs"]
        core._launch_buf = [_ipc_tbl(b) for b in st["launch_buf_ipc"]]
        core._launch_buf_rows = sum(t.num_rows for t in core._launch_buf)
        core._seen_uh, core._seen_url = st["seen_buf"]
        if core.log_dir is not None:
            # prune segments written after this checkpoint (the waves that
            # produced them will be re-run)
            keep = set(core._launch_segs) | set(core._seen_segs)
            d = core._part_dir()
            for f in os.listdir(d):
                if f not in keep and (
                    f.startswith(("launch-", "seen-", ".tmp-"))
                ):
                    os.remove(os.path.join(d, f))
        return core


def _tbl_ipc(t: pa.Table) -> bytes:
    sink = pa.BufferOutputStream()
    with pa.ipc.new_stream(sink, t.schema) as w:
        w.write_table(t)
    return sink.getvalue().to_pybytes()


def _ipc_tbl(b: bytes) -> pa.Table:
    return pa.ipc.open_stream(pa.py_buffer(b)).read_all()
