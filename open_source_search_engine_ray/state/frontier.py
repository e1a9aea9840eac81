"""FrontierCore — the per-partition scheduler state machine.

One instance owns one frontier partition (all IPs with
``part_of_ip(ip) == part_id``), reproducing the reference SpiderColl's
cooperating structures (SpiderColl.h:26-282) — but stored COLUMNAR:

- ``store``/``reps``            ↔ spiderdb request+reply log (deduped on
                                  add with the commutative min-(hop,added)
                                  merge — the outcome of dedupSpiderdbList,
                                  Spider.cpp:3714-4021).  Requests and
                                  replies live in structure-of-arrays
                                  stores (numpy columns + a (uh48,srh)→row
                                  index) so admission and filter
                                  evaluation are vectorized gathers, not
                                  per-row dict builds — the per-request
                                  Python dicts were the #1 single-box
                                  scaling cost (round-2 verdict).
- ``waiting``                   ↔ waiting tree: next eligible time per IP,
                                  exactly one entry per IP, absent while the
                                  IP has a URL in flight (doledb XOR waiting
                                  invariant, SpiderColl.cpp:1160-1168)
- ``schedule()``                ↔ populateDoledbFromWaitingTree +
                                  scanListForWinners + launch gating
                                  (SpiderColl.cpp:1812-3292,
                                  SpiderLoop.cpp:943-1072)
- ``complete()``                ↔ addSpiderReply: politeness clock + crawl
                                  delay table updates and IP re-arm
                                  (SpiderColl.cpp:612, 4098-4126)
- ``urlseen``                   ↔ dup cache (SpiderColl.cpp:845-904) with
                                  partitioned bloom segments

The class is deliberately Ray-free: the distributed engine wraps it in a
``@ray.remote`` actor (pipelines/crawl.py) and the sequential oracle
(pipelines/crawl.py _LocalCrawlCtx) drives the same code, so
engine-vs-oracle equality tests isolate exactly the distributed machinery
(shuffle, actor routing, parallel fetch).  All cross-partition merges are
commutative, so route-back arrival order cannot change state.
"""

from __future__ import annotations

import os
import pickle
import uuid
from dataclasses import dataclass, replace

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions import gbhash
from ..functions.schedule import (
    MAX_WINNER_NODES,
    Rep,
    Req,
    adaptive_max_winners,
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

    # tagdb "authorityinlink" stand-in (XmlDoc.cpp:6553-6578): hosts or
    # domains whose pages count as having an authority inlink.  Empty ()
    # = no tagdb consulted, so the hasauthorityinlink predicate's
    # validity gate (Spider.cpp:2272-2276) keeps rules using it
    # unmatched — the reference behaves identically with no tag rec.
    authority_sites: tuple = ()

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
#: time, so a bounded window gives exactly-once without unbounded growth.
#: This is only the FLOOR: the live window grows with the observed
#: per-wave token volume (see _apply_once) so a single big wave can
#: never evict tokens a straggler retry might still re-send.
TOKEN_WINDOW = 4096

# request flag bits (store.flags)
RQ_INJ = 1
RQ_ADDURL = 2
RQ_REINDEX = 4
RQ_FAKEIP = 8
RQ_ROOT = 16
RQ_RSSEXT = 32
RQ_PERMFMT = 64
RQ_WWW = 128

# reply flag bits (reps.flags)
RP_INDEXED = 1
RP_RSS = 2
RP_PERMALINK = 4

_GOLD = np.uint64(0x9E3779B97F4A7C15)


def transit_ck32(urls, uh: np.ndarray) -> np.ndarray:
    """Cheap url↔uh48 transit checksum: crc32(url) XOR both uh48 halves.
    Payload builders that have already passed the FULL hash64b gate
    (verify_request_cols at routeback-out) attach this column; the
    actor-in gate then validates transit integrity at C speed instead of
    recomputing the pure-Python Gigablast hash per row (~20x cheaper,
    same crash-loudly-on-corruption property for url, uh48 or the
    checksum itself)."""
    from zlib import crc32

    n = len(urls)
    c = np.fromiter((crc32(u.encode("utf-8")) for u in urls), np.uint64, n)
    u64 = np.asarray(uh, dtype=np.uint64)
    return (c ^ (u64 & np.uint64(0xFFFFFFFF)) ^ (u64 >> np.uint64(16))).astype(
        np.int64
    )


class _ReqStore:
    """Columnar SpiderRequest storage: one row per live (uh48, srh)
    request variant.  Numpy structure-of-arrays with doubling growth;
    URL-derived columns (tld, sitelist membership/tag, www flag) are
    computed ONCE at admission so the per-wave filter evaluation is pure
    gathers (rows are rescanned every wave until launched — the
    admission-time precompute amortizes across all rescans)."""

    INT_COLS = (
        ("uh48", np.uint64),
        ("srh", np.uint64),
        ("first_ip", np.int64),
        ("dom_hash32", np.int64),
        ("site_hash32", np.int64),
        ("hop_count", np.int64),
        ("added_time", np.int64),
        ("discovery_time", np.int64),
        ("flags", np.uint8),
        ("inlink_cnt", np.int32),
        ("rep_row", np.int64),
    )
    OBJ_COLS = ("url", "host", "tld", "site_tag")
    BOOL_COLS = ("in_sitelist", "has_authority_inlink")
    _ALL = tuple(n for n, _ in INT_COLS) + OBJ_COLS + BOOL_COLS

    def __init__(self, cap: int = 1024):
        self.n = 0
        for name, dt in self.INT_COLS:
            setattr(self, name, np.zeros(cap, dtype=dt))
        for name in self.OBJ_COLS:
            setattr(self, name, np.empty(cap, dtype=object))
        for name in self.BOOL_COLS:
            setattr(self, name, np.zeros(cap, dtype=bool))

    def _cap(self) -> int:
        return len(self.uh48)

    def reserve(self, extra: int) -> None:
        need = self.n + extra
        cap = self._cap()
        if need <= cap:
            return
        while cap < need:
            cap *= 2
        for name in self._ALL:
            a = getattr(self, name)
            b = np.empty(cap, dtype=a.dtype) if a.dtype == object else np.zeros(cap, dtype=a.dtype)
            b[: self.n] = a[: self.n]
            setattr(self, name, b)

    def append_block(self, cols: dict) -> int:
        """Bulk-append rows from {col: array}; returns the first row id."""
        k = len(cols["uh48"])
        self.reserve(k)
        n0 = self.n
        for name, arr in cols.items():
            getattr(self, name)[n0 : n0 + k] = arr
        self.n += k
        return n0

    def state(self) -> dict:
        return {name: getattr(self, name)[: self.n].copy() for name in self._ALL}

    @classmethod
    def from_state(cls, st: dict) -> "_ReqStore":
        n = len(st["uh48"])
        s = cls(max(1024, n))
        for name in cls._ALL:
            if name in st:  # absent in pre-upgrade checkpoints → zeros
                getattr(s, name)[:n] = st[name]
        s.n = n
        return s


class _RepStore:
    """Columnar SpiderReply storage: at most one row per uh48 (the
    newest reply wins, mirroring addSpiderReply)."""

    INT_COLS = (
        ("spidered_time", np.int64),
        ("err_code", np.int64),
        ("err_count", np.int64),
        ("http_status", np.int64),
        ("crawl_delay_ms", np.int64),
        ("content_hash32", np.int64),
        ("pub_date", np.int64),
        ("flags", np.uint8),
    )
    FLT_COLS = (("pcpd", np.float64),)
    OBJ_COLS = ("lang",)
    _ALL = tuple(n for n, _ in INT_COLS) + tuple(n for n, _ in FLT_COLS) + OBJ_COLS

    def __init__(self, cap: int = 1024):
        self.n = 0
        self.row_of: dict[int, int] = {}  # uh48 -> row
        for name, dt in self.INT_COLS + self.FLT_COLS:
            setattr(self, name, np.zeros(cap, dtype=dt))
        for name in self.OBJ_COLS:
            setattr(self, name, np.empty(cap, dtype=object))

    def reserve(self, extra: int) -> None:
        need = self.n + extra
        cap = len(self.spidered_time)
        if need <= cap:
            return
        while cap < need:
            cap *= 2
        for name in self._ALL:
            a = getattr(self, name)
            b = np.empty(cap, dtype=a.dtype) if a.dtype == object else np.zeros(cap, dtype=a.dtype)
            b[: self.n] = a[: self.n]
            setattr(self, name, b)

    def new_row(self, u48: int) -> int:
        self.reserve(1)
        row = self.n
        self.n += 1
        self.row_of[u48] = row
        return row

    def set_row(self, row: int, rep: Rep) -> None:
        self.spidered_time[row] = rep.spidered_time
        self.err_code[row] = rep.err_code
        self.err_count[row] = rep.err_count
        self.http_status[row] = rep.http_status
        self.crawl_delay_ms[row] = rep.crawl_delay_ms
        self.content_hash32[row] = rep.content_hash32
        self.pub_date[row] = rep.pub_date
        self.pcpd[row] = rep.percent_changed_per_day
        self.lang[row] = rep.lang
        self.flags[row] = (
            (RP_INDEXED if rep.is_indexed else 0)
            | (RP_RSS if rep.is_rss else 0)
            | (RP_PERMALINK if rep.is_permalink else 0)
        )

    def get_rep(self, u48: int) -> Rep | None:
        row = self.row_of.get(u48)
        if row is None:
            return None
        fl = int(self.flags[row])
        return Rep(
            uh48=u48,
            spidered_time=int(self.spidered_time[row]),
            err_code=int(self.err_code[row]),
            err_count=int(self.err_count[row]),
            http_status=int(self.http_status[row]),
            crawl_delay_ms=int(self.crawl_delay_ms[row]),
            content_hash32=int(self.content_hash32[row]),
            lang=self.lang[row],
            is_indexed=bool(fl & RP_INDEXED),
            is_rss=bool(fl & RP_RSS),
            is_permalink=bool(fl & RP_PERMALINK),
            pub_date=int(self.pub_date[row]),
            percent_changed_per_day=float(self.pcpd[row]),
        )

    def state(self) -> dict:
        st = {name: getattr(self, name)[: self.n].copy() for name in self._ALL}
        st["row_of"] = dict(self.row_of)
        return st

    @classmethod
    def from_state(cls, st: dict) -> "_RepStore":
        n = len(st["spidered_time"])
        s = cls(max(1024, n))
        for name in cls._ALL:
            getattr(s, name)[:n] = st[name]
        s.n = n
        s.row_of = dict(st["row_of"])
        return s


class _LazyCols(dict):
    """Candidate-column dict that materializes columns on first access.
    ``FilterProgram.assign`` touches only the columns its rules
    reference, so the common web profile never pays for quota/tag/lang
    gathers (Spider.cpp's rule scan similarly reads only the fields the
    expression names)."""

    def __init__(self, providers: dict, eager: dict):
        super().__init__(eager)
        self._providers = providers

    def __missing__(self, key):
        v = self._providers[key]()
        self[key] = v
        return v


class FrontierCore:
    def __init__(self, part_id: int, cfg: CrawlConfig, log_dir: str | None = None):
        self.part_id = part_id
        self.cfg = cfg
        self.prog = FilterProgram(cfg.filter_rules())
        self.site_list = SiteList(cfg.site_list)
        # tagdb authorityinlink stand-in: host/domain membership table
        # (XmlDoc.cpp:6553-6578); validity = "a tagdb was consulted"
        self._auth_sites = frozenset(cfg.authority_sites)
        self._auth_valid = bool(self._auth_sites)
        # frontier log (deduped, columnar)
        self.store = _ReqStore()
        self.reps = _RepStore()
        self._dom_cache: dict = {}  # host -> (domain, tld) memo
        self.row_of: dict[tuple, int] = {}  # (uh48, srh) -> store row
        self.uh_rows: dict[int, int | list] = {}  # uh48 -> row | [rows]
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
        # ordered dict = bounded FIFO window).  The window is adaptive:
        # it stays ≥4x the tokens applied in the current wave and ≥8x
        # the biggest completed wave, so protocol bounds (tokens/wave =
        # P partitions x chunks x 2) can never outgrow it and evict a
        # token whose task could still be retried.
        self.applied_tokens: dict = {}
        self._token_window = TOKEN_WINDOW
        self._tokens_this_wave = 0
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
        self._tokens_this_wave += 1
        if self._tokens_this_wave * 4 > self._token_window:
            self._token_window = self._tokens_this_wave * 8
        while len(self.applied_tokens) > self._token_window:
            self.applied_tokens.pop(next(iter(self.applied_tokens)))
        return False

    def _rows_list(self, rr) -> list:
        return [rr] if isinstance(rr, int) else rr

    def add_requests(self, cols: dict, token=None) -> int:
        """Admit a batch of SpiderRequests (columnar dict of numpy arrays,
        REQUEST_COLS).  Returns number admitted.

        The per-row Python work is only the dict/set bookkeeping
        (row index, by_ip, waiting); all field storage is one bulk
        columnar append, and the URL-derived predicate inputs (tld,
        sitelist match, www) are computed here once per request
        (reference computes the analogous flags when building the
        SpiderRequest, XmlDoc.cpp:15360-15400)."""
        n = len(cols["uh48"])
        if n == 0 or self._apply_once(token):
            return 0
        urls = np.asarray(cols["url"], dtype=object)
        if self.cfg.verify_integrity:
            got = np.asarray(cols["uh48"], dtype=np.uint64)
            ck = cols.get("ck32")
            if ck is not None:
                # payload already passed the full hash64b gate at build
                # time; validate the transit leg with the cheap checksum
                want_ck = transit_ck32(urls, got)
                if not (want_ck == np.asarray(ck, dtype=np.int64)).all():
                    bad = int(
                        np.nonzero(want_ck != np.asarray(ck, dtype=np.int64))[0][0]
                    )
                    raise RuntimeError(
                        f"request-cols transit corruption at actor-in"
                        f"(part {self.part_id}): row {bad}/{n} "
                        f"url={urls[bad]!r} uh48={int(got[bad])}"
                    )
            else:
                want = gbhash.uh48_batch(list(urls))
                if not (want == got).all():
                    bad = int(np.nonzero(want != got)[0][0])
                    raise RuntimeError(
                        f"request-cols corruption at actor-in(part {self.part_id}): "
                        f"row {bad}/{n} url={urls[bad]!r} "
                        f"uh48={int(got[bad])} recomputed={int(want[bad])}"
                    )
        uh = np.asarray(cols["uh48"]).astype(np.uint64)
        hop = np.asarray(cols["hop_count"]).astype(np.int64)
        added = np.asarray(cols["added_time"]).astype(np.int64)
        ips = np.asarray(cols["first_ip"]).astype(np.int64)
        site32 = np.asarray(cols["site_hash32"]).astype(np.int64)
        dom32 = np.asarray(cols["dom_hash32"]).astype(np.int64)
        inj = np.asarray(cols["is_injecting"]).astype(bool)
        addu = np.asarray(cols["is_addurl"]).astype(bool)
        rei = np.asarray(cols["is_reindex"]).astype(bool)
        fak = np.asarray(cols["fake_first_ip"]).astype(bool)
        salts = (
            np.where(inj, 0x42538909, 0)
            ^ np.where(addu, 0x587C5A0B, 0)
            ^ np.where(rei, 0x70FB3911, 0)
            ^ np.where(fak, 0x95B8D376, 0)
        ).astype(np.uint64)
        # dup-cache key (SpiderColl.cpp:872-889) + full hop + added_time so
        # that any two rows sharing a key are value-identical — admission
        # then cannot depend on route-back arrival order (see
        # state/urlseen.py docstring)
        dup_key = (
            uh
            ^ salts
            ^ (hop.astype(np.uint64) * _GOLD)
            ^ (added.astype(np.uint64) * np.uint64(0xC2B2AE3D27D4EB4F))
        )
        fresh = self.urlseen.test_and_add(dup_key)
        # inlink c-block counting sees every arriving request, admitted or
        # not (commutative set union ⇒ deterministic under any ordering);
        # exact (uh48, c-block) pair dedup within the batch via lexsort so
        # the Python loop runs once per distinct pair
        par = np.asarray(cols["parent_ip"]).astype(np.int64) >> 8
        if n > 1:
            order = np.lexsort((par, uh))
            su, sp = uh[order], par[order]
            first = np.ones(n, dtype=bool)
            first[1:] = (su[1:] != su[:-1]) | (sp[1:] != sp[:-1])
            pair_idx = order[first]
        else:
            pair_idx = np.arange(n)
        ul_pairs = uh[pair_idx].tolist()
        pl_pairs = par[pair_idx].tolist()
        inl = self.inlinks
        for u48, cb in zip(ul_pairs, pl_pairs):
            if u48 in self.deleted:
                continue
            s = inl.get(u48)
            if s is None:
                inl[u48] = {cb}
                sz = 1
            elif cb not in s:
                s.add(cb)
                sz = len(s)
            else:
                continue
            if sz <= 255:
                rr = self.uh_rows.get(u48)
                if rr is not None:
                    if isinstance(rr, int):
                        self.store.inlink_cnt[rr] += 1
                    else:
                        for r in rr:
                            self.store.inlink_cnt[r] += 1
        fresh_idx = np.nonzero(fresh)[0]
        admitted = 0
        if len(fresh_idx):
            srh_all = salts ^ (site32.astype(np.uint64) & np.uint64(0xFFFFFFFF))
            # URL-derived columns for candidate evaluation, computed once
            # per admitted request (amortized over every wave's rescan)
            hosts_f = np.asarray(cols["host"], dtype=object)[fresh_idx]
            urls_f = urls[fresh_idx]
            nf = len(fresh_idx)
            # host → (domain, tld) memo: hosts repeat across a crawl's
            # requests far more than they vary, and get_domain's
            # registered-domain logic was a per-row hot spot; bounded so
            # a 10^10-URL frontier can't grow it without limit
            dcache = self._dom_cache
            if len(dcache) > (1 << 20):
                dcache.clear()
            doms_f = np.empty(nf, dtype=object)
            tld_f = np.empty(nf, dtype=object)
            for j, h in enumerate(hosts_f):
                v = dcache.get(h)
                if v is None:
                    d = get_domain(h)
                    v = (d, d.rsplit(".", 1)[-1])
                    dcache[h] = v
                doms_f[j], tld_f[j] = v
            in_sl_f, tag_f = self.site_list.match_and_tags_batch(urls_f, doms_f)
            if self._auth_valid:
                aset = self._auth_sites
                auth_f = np.fromiter(
                    (h in aset or d in aset for h, d in zip(hosts_f, doms_f)),
                    bool,
                    nf,
                )
            else:
                auth_f = np.zeros(nf, dtype=bool)
            www_f = np.fromiter(
                (u.startswith(("http://www", "https://www")) for u in urls_f), bool, nf
            )
            flags = (
                np.where(inj, RQ_INJ, 0)
                | np.where(addu, RQ_ADDURL, 0)
                | np.where(rei, RQ_REINDEX, 0)
                | np.where(fak, RQ_FAKEIP, 0)
                | np.where(np.asarray(cols["is_root"]).astype(bool), RQ_ROOT, 0)
                | np.where(np.asarray(cols["is_rssext"]).astype(bool), RQ_RSSEXT, 0)
                | np.where(
                    np.asarray(cols["is_permalink_format"]).astype(bool), RQ_PERMFMT, 0
                )
            ).astype(np.uint8)
            flags_f = flags[fresh_idx] | np.where(www_f, np.uint8(RQ_WWW), np.uint8(0))
            uh_f = uh[fresh_idx]
            srh_f = srh_all[fresh_idx]
            ips_f = ips[fresh_idx]
            hop_f = hop[fresh_idx]
            added_f = added[fresh_idx]
            uh_list = uh_f.tolist()
            # ---- vectorized classification: the common crawl case is a
            # brand-new uh48 on a non-overflowing IP — those rows take
            # the bulk path below (C-level dict bulk probes/updates +
            # grouped numpy appends); only merges against existing rows,
            # force-deleted uh48s, overflow-capable IPs and multi-srh
            # variants of one uh48 fall to the per-row loop (rare)
            slow = np.fromiter(
                map(self.uh_rows.__contains__, uh_list), bool, nf
            )
            if self.deleted:
                dl = self.deleted
                slow |= np.fromiter((u in dl for u in uh_list), bool, nf)
            # same uh48 under different srh within this batch (flag
            # variants, e.g. reindex) — route every copy to the loop
            o_all = np.lexsort((srh_f, uh_f))
            uo, so = uh_f[o_all], srh_f[o_all]
            gfirst = np.ones(nf, dtype=bool)
            gfirst[1:] = (uo[1:] != uo[:-1]) | (so[1:] != so[:-1])
            ufirst = np.ones(nf, dtype=bool)
            ufirst[1:] = uo[1:] != uo[:-1]
            mv = gfirst & ~ufirst  # group start whose uh48 repeats
            if mv.any():
                slow |= np.isin(uh_f, np.unique(uo[mv]))
            cap = self.cfg.overflow_cap
            uip, ucnt = np.unique(ips_f, return_counts=True)
            big = [
                v
                for v, c in zip(uip.tolist(), ucnt.tolist())
                if len(self.by_ip.get(v, ())) + c >= cap
            ]
            if big:
                slow |= np.isin(ips_f, np.asarray(big, dtype=np.int64))
            fidx = np.nonzero(~slow)[0]
            sidx = np.nonzero(slow)[0]
            st = self.store
            if len(fidx):
                # every fast row is admitted (created, or merged into the
                # row its own batch created — counted either way, like
                # the per-row loop's merge branches)
                admitted += len(fidx)
                uh_ff, srh_ff = uh_f[fidx], srh_f[fidx]
                hop_ff, added_ff = hop_f[fidx], added_f[fidx]
                # group by (uh48, srh); within a group sort by (hop,
                # added) so the group head IS the dedupSpiderdbList
                # lex-min survivor; discovery_time = group min added
                o = np.lexsort((added_ff, hop_ff, srh_ff, uh_ff))
                us, ss = uh_ff[o], srh_ff[o]
                gf = np.ones(len(o), dtype=bool)
                gf[1:] = (us[1:] != us[:-1]) | (ss[1:] != ss[:-1])
                gstart = np.nonzero(gf)[0]
                hop_g = hop_ff[o][gstart]
                added_g = added_ff[o][gstart]
                disc_g = np.minimum.reduceat(added_ff[o], gstart)
                # append order = batch order of each group's first
                # occurrence (matches the sequential loop)
                first_pos = np.minimum.reduceat(fidx[o], gstart)
                gorder = np.argsort(first_pos, kind="stable")
                fpos_g = first_pos[gorder]  # positions in fresh subset
                hop_gv = hop_g[gorder]
                added_gv = added_g[gorder]
                disc_gv = disc_g[gorder]
                G = len(fpos_g)
                n0 = st.n
                rows_new = list(range(n0, n0 + G))
                uh_ints = uh_f[fpos_g].tolist()
                srh_ints = srh_f[fpos_g].tolist()
                self.row_of.update(
                    zip(zip(uh_ints, srh_ints), rows_new)
                )
                self.uh_rows.update(zip(uh_ints, rows_new))
                self._seen_uh.extend(uh_ints)
                self._seen_url.extend(urls_f[fpos_g].tolist())
                if self.log_dir and len(self._seen_uh) >= self.cfg.log_flush_rows:
                    self._flush_seen()
                inl_cnt = np.fromiter(
                    (min(len(inl.get(u, ())), 255) for u in uh_ints),
                    np.int32,
                    G,
                )
                rep_row = np.fromiter(
                    (self.reps.row_of.get(u, -1) for u in uh_ints),
                    np.int64,
                    G,
                )
                idx = fresh_idx[fpos_g]
                st.append_block(
                    {
                        "uh48": uh_f[fpos_g],
                        "srh": srh_f[fpos_g],
                        "first_ip": ips_f[fpos_g],
                        "dom_hash32": dom32[idx],
                        "site_hash32": site32[idx],
                        "hop_count": hop_gv,
                        "added_time": added_gv,
                        "discovery_time": disc_gv,
                        "flags": flags_f[fpos_g],
                        "inlink_cnt": inl_cnt,
                        "rep_row": rep_row,
                        "url": urls_f[fpos_g],
                        "host": hosts_f[fpos_g],
                        "tld": tld_f[fpos_g],
                        "site_tag": tag_f[fpos_g],
                        "in_sitelist": in_sl_f[fpos_g],
                        "has_authority_inlink": auth_f[fpos_g],
                    }
                )
                # by_ip / waiting per DISTINCT ip (set ops are C-level)
                ip_g = ips_f[fpos_g]
                oip = np.argsort(ip_g, kind="stable")
                ips_sorted = ip_g[oip]
                uh_sorted = uh_f[fpos_g][oip].tolist()
                bnd = np.nonzero(np.diff(ips_sorted))[0] + 1
                starts = np.concatenate(([0], bnd))
                ends = np.concatenate((bnd, [G]))
                ip_vals = ips_sorted[starts].tolist()
                by_ip = self.by_ip
                infl = self.in_flight_ip
                waiting = self.waiting
                for s, e, ipv in zip(starts.tolist(), ends.tolist(), ip_vals):
                    pend = by_ip.get(ipv)
                    if pend is None:
                        by_ip[ipv] = set(uh_sorted[s:e])
                    else:
                        pend.update(uh_sorted[s:e])
                    if infl.get(ipv, 0) == 0:
                        waiting[ipv] = 0  # addToWaitingTree(0)
            if len(sidx):
                admitted += self._admit_rows_slow(
                    sidx,
                    uh_list,
                    ips_f.tolist(),
                    srh_f.tolist(),
                    hop_f.tolist(),
                    added_f.tolist(),
                    urls_f,
                    hosts_f,
                    fresh_idx,
                    dom32,
                    site32,
                    flags_f,
                    tld_f,
                    tag_f,
                    in_sl_f,
                    auth_f,
                )
        self.metrics["added"] += admitted
        self.metrics["dup_dropped"] += int(n - fresh.sum())
        return admitted

    def _admit_rows_slow(
        self,
        sidx,
        uh_l,
        ip_l,
        srh_l,
        hop_l,
        added_l,
        urls_f,
        hosts_f,
        fresh_idx,
        dom32,
        site32,
        flags_f,
        tld_f,
        tag_f,
        in_sl_f,
        auth_f,
    ) -> int:
        """Per-row admission for the rows the bulk path cannot take:
        merges against existing store rows (min-(hop,added) —
        dedupSpiderdbList), force-deleted uh48s, overflow-capable IPs
        and multi-srh flag variants.  Identical semantics to the
        pre-vectorization loop; rows created by the bulk path land in
        the plain store-merge branch because ``n0`` is captured after
        the bulk append."""
        st = self.store
        inl = self.inlinks
        cap = self.cfg.overflow_cap
        n0 = st.n
        admitted = 0
        append_src: list[int] = []  # fresh-subset position per new row
        # in-batch merges into not-yet-appended rows: q -> [hop, added, disc]
        pend_mod: dict[int, list] = {}
        for j in sidx.tolist():
            u48 = uh_l[j]
            if u48 in self.deleted:
                continue
            ip = ip_l[j]
            pend = self.by_ip.get(ip)
            if pend is not None and len(pend) >= cap and u48 not in pend:
                # hot-IP overflow: stop harvesting new URLs for this IP
                self.metrics["overflow_dropped"] = (
                    self.metrics.get("overflow_dropped", 0) + 1
                )
                continue
            key = (u48, srh_l[j])
            row = self.row_of.get(key)
            if row is None:
                newly_seen = u48 not in self.uh_rows
                row = n0 + len(append_src)
                self.row_of[key] = row
                cur = self.uh_rows.get(u48)
                if cur is None:
                    self.uh_rows[u48] = row
                elif isinstance(cur, int):
                    self.uh_rows[u48] = [cur, row]
                else:
                    cur.append(row)
                append_src.append(j)
                if newly_seen:
                    # URL-seen entry: exactly once per uh48 (first slot)
                    self._seen_uh.append(u48)
                    self._seen_url.append(urls_f[j])
                    if self.log_dir and len(self._seen_uh) >= self.cfg.log_flush_rows:
                        self._flush_seen()
            elif row >= n0:
                # merge into a row created earlier in THIS pass
                q = row - n0
                v = pend_mod.get(q)
                if v is None:
                    i0 = append_src[q]
                    v = [hop_l[i0], added_l[i0], added_l[i0]]
                    pend_mod[q] = v
                v[2] = min(v[2], added_l[j])
                # keep min (hop, added) — dedupSpiderdbList outcome
                if (hop_l[j], added_l[j]) >= (v[0], v[1]):
                    admitted += 1  # counted, but merged away
                    continue
                v[0], v[1] = hop_l[j], added_l[j]
            else:
                st.discovery_time[row] = min(
                    int(st.discovery_time[row]), added_l[j]
                )
                if (hop_l[j], added_l[j]) >= (
                    int(st.hop_count[row]),
                    int(st.added_time[row]),
                ):
                    admitted += 1  # counted, but merged away
                    continue
                st.hop_count[row] = hop_l[j]
                st.added_time[row] = added_l[j]
            if pend is None:
                self.by_ip[ip] = {u48}
            else:
                pend.add(u48)
            if self.in_flight_ip.get(ip, 0) == 0:
                self.waiting[ip] = 0  # addToWaitingTree(0) — scan asap
            admitted += 1
        if append_src:
            fpos = np.array(append_src, dtype=np.int64)
            hop_new = np.array([hop_l[j] for j in append_src], dtype=np.int64)
            added_new = np.array([added_l[j] for j in append_src], dtype=np.int64)
            disc_new = added_new.copy()
            for q, v in pend_mod.items():
                hop_new[q], added_new[q], disc_new[q] = v
            uh_ints = [uh_l[j] for j in append_src]
            inl_cnt = np.fromiter(
                (min(len(inl.get(u, ())), 255) for u in uh_ints),
                np.int32,
                len(fpos),
            )
            rep_row = np.fromiter(
                (self.reps.row_of.get(u, -1) for u in uh_ints),
                np.int64,
                len(fpos),
            )
            idx = fresh_idx[fpos]
            st.append_block(
                {
                    "uh48": np.array(uh_ints, dtype=np.uint64),
                    "srh": np.array(
                        [srh_l[j] for j in append_src], dtype=np.uint64
                    ),
                    "first_ip": np.array(
                        [ip_l[j] for j in append_src], dtype=np.int64
                    ),
                    "dom_hash32": dom32[idx],
                    "site_hash32": site32[idx],
                    "hop_count": hop_new,
                    "added_time": added_new,
                    "discovery_time": disc_new,
                    "flags": flags_f[fpos],
                    "inlink_cnt": inl_cnt,
                    "rep_row": rep_row,
                    "url": urls_f[fpos],
                    "host": hosts_f[fpos],
                    "tld": tld_f[fpos],
                    "site_tag": tag_f[fpos],
                    "in_sitelist": in_sl_f[fpos],
                    "has_authority_inlink": auth_f[fpos],
                }
            )
        return admitted

    # -- scheduling --------------------------------------------------------

    def next_event_ms(self) -> int:
        return min(self.waiting.values(), default=INF)

    def _candidate_rows(self, ip: int) -> list:
        pend = self.by_ip.get(ip)
        if not pend:
            return []
        out: list = []
        for u48 in pend:
            if u48 in self.in_flight_uh48 or u48 in self.deleted:
                continue
            rr = self.uh_rows.get(u48)
            if rr is None:
                continue
            # each flag-variant request may map to a different filter row
            # (Spider.cpp:3887-3890)
            if isinstance(rr, int):
                out.append(rr)
            else:
                out.extend(rr)
        return out

    def _eval_filters(self, rows: np.ndarray, now_ms: int = 0):
        """Candidate columns as lazy vectorized gathers over the columnar
        stores + first-match rule assignment.  Only the columns the
        compiled rule set (and the scheduler) actually touch are
        materialized."""
        st = self.store
        rp = self.reps
        n = len(rows)
        now_s = now_ms // 1000
        flags = st.flags[rows]
        rep_r = st.rep_row[rows]
        had = rep_r >= 0
        rr = np.where(had, rep_r, 0)
        any_rep = rp.n > 0 and bool(had.any())

        def rep_col(name, default, dtype):
            def f():
                if not any_rep:
                    return np.full(n, default, dtype=dtype)
                return np.where(had, getattr(rp, name)[rr], default)

            return f

        def rep_flag(bit):
            def f():
                if not any_rep:
                    return np.zeros(n, dtype=bool)
                return had & ((rp.flags[rr] & bit) != 0)

            return f

        def lang_col():
            if not any_rep:
                return np.full(n, "en", dtype=object)
            return np.where(had, rp.lang[rr], "en")

        def age_col():
            if not any_rep:
                return np.full(n, -1, dtype=np.int64)
            pub = np.where(had, rp.pub_date[rr], 0)
            # pubdate age; <=0 pubdate is invalid and never matches
            return np.where(pub > 0, now_s - pub, -1)

        def spiderwaited_col():
            return np.where(had, now_s - c["spidered_time"], 0)

        def quota_col(table, keycol):
            def f():
                keys = getattr(st, keycol)[rows].tolist()
                return np.fromiter((table.get(k, 0) for k in keys), np.int64, n)

            return f

        providers = {
            "url": lambda: st.url[rows],
            "hop_count": lambda: st.hop_count[rows],
            "is_injecting": lambda: (flags & RQ_INJ) != 0,
            "is_reindex": lambda: (flags & RQ_REINDEX) != 0,
            "is_addurl": lambda: (flags & RQ_ADDURL) != 0,
            "is_manualadd": lambda: c["is_addurl"] | c["is_injecting"],
            "is_www": lambda: (flags & RQ_WWW) != 0,
            "is_root": lambda: (flags & RQ_ROOT) != 0,
            "is_rssext": lambda: (flags & RQ_RSSEXT) != 0,
            "is_permalink_format": lambda: (flags & RQ_PERMFMT) != 0,
            "fake_first_ip": lambda: (flags & RQ_FAKEIP) != 0,
            "is_pingserver": lambda: np.zeros(n, dtype=bool),  # Url.cpp:2548
            "has_authority_inlink": lambda: st.has_authority_inlink[rows],
            "authority_inlink_valid": lambda: np.full(n, self._auth_valid),
            "tld": lambda: st.tld[rows],
            "in_sitelist": lambda: st.in_sitelist[rows],
            "site_tag": lambda: st.site_tag[rows],
            "num_inlinks": lambda: st.inlink_cnt[rows],
            "spidered_time": rep_col("spidered_time", 0, np.int64),
            "err_count": rep_col("err_count", 0, np.int64),
            "err_code": rep_col("err_code", 0, np.int64),
            "http_status": rep_col("http_status", 0, np.int64),
            "percentchangedperday": rep_col("pcpd", 0.0, np.float64),
            "is_indexed": rep_flag(RP_INDEXED),
            "is_rss": rep_flag(RP_RSS),
            "is_permalink": rep_flag(RP_PERMALINK),
            "lang": lang_col,
            "age": age_col,
            "spiderwaited": spiderwaited_col,
            # request age from discovery time (Spider.cpp:3252-3259;
            # discovery is always initialized from added_time, so the
            # reference's added_time fallback is structurally covered)
            "url_age": lambda: now_s - st.discovery_time[rows],
            "sitepages": quota_col(self.quota_site, "site_hash32"),
            "domainpages": quota_col(self.quota_dom, "dom_hash32"),
        }
        c = _LazyCols(
            providers,
            {
                "uh48": st.uh48[rows],
                "added_time": st.added_time[rows],
                "had_reply": had,
            },
        )
        return c, self.prog.assign(c)

    def _delete(self, u48: int):
        self.deleted.add(u48)
        rr = self.uh_rows.pop(u48, None)
        if rr is not None:
            for row in self._rows_list(rr):
                self.row_of.pop((u48, int(self.store.srh[row])), None)
        self.metrics["force_deleted"] += 1

    def _req_obj(self, row: int) -> Req:
        st = self.store
        fl = int(st.flags[row])
        return Req(
            url=st.url[row],
            uh48=int(st.uh48[row]),
            first_ip=int(st.first_ip[row]),
            host=st.host[row],
            dom_hash32=int(st.dom_hash32[row]),
            site_hash32=int(st.site_hash32[row]),
            hop_count=int(st.hop_count[row]),
            added_time=int(st.added_time[row]),
            is_injecting=bool(fl & RQ_INJ),
            is_addurl=bool(fl & RQ_ADDURL),
            is_reindex=bool(fl & RQ_REINDEX),
            fake_first_ip=bool(fl & RQ_FAKEIP),
            discovery_time=int(st.discovery_time[row]),
        )

    def schedule(self, now_ms: int, wave_no: int | None = None) -> pa.Table:
        """Scan every due IP; launch winners; re-arm or drop waiting
        entries.  Returns the launch batch (LAUNCH_SCHEMA).

        ``wave_no``: driver-assigned wave number (keeps wave fields
        aligned across partitions even when the driver skips non-due
        partitions); defaults to the actor-local counter."""
        if wave_no is not None:
            self.wave = wave_no
        self._tokens_this_wave = 0
        due_ips = sorted(ip for ip, t in self.waiting.items() if t <= now_ms)
        budget_hit = (
            self.cfg.max_pages and self.metrics["launched"] >= self.cfg.max_pages
        )
        # phase 1: gather candidate rows across ALL due IPs so filter
        # evaluation and due-time computation run as single vectorized
        # passes (per-IP numpy setup dominated the scan otherwise)
        gather: list = []
        spans: list = []  # (ip, start, end) in due order
        for ip in due_ips:
            if budget_hit:
                del self.waiting[ip]
                continue
            rws = self._candidate_rows(ip)
            if not rws:
                del self.waiting[ip]
                self.by_ip.pop(ip, None)
                continue
            spans.append((ip, len(gather), len(gather) + len(rws)))
            gather.extend(rws)
        st = self.store
        rp = self.reps
        # fast-path spans record ONLY their candidate-index array +
        # (position, ip, gap) metadata; all column data is gathered once
        # per wave at table-build time — the ~10 micro-gathers per span
        # dominated the scan on wide (many-due-IP) webs.  The rare exact
        # path (select_winners) still materializes per span into `mat`;
        # position arrays keep the final row order identical to the
        # sequential per-IP scan.
        fast_cand: list = []  # per-span global candidate-index arrays
        fast_meta: list = []  # per-span (pos0, nl, ip, gap)
        mat: dict[str, list] = {k: [] for k in (
            "url", "uh48", "first_ip", "host", "dom_hash32", "hop_count",
            "added_time", "priority", "ufn", "err_count", "launch_ms",
        )}
        mat_pos: list = []
        n_launch = 0
        if gather:
            rows = np.asarray(gather, dtype=np.int64)
            nall = len(rows)
            c, ufn_all = self._eval_filters(rows, now_ms)
            kmax = np.maximum(ufn_all, 0)
            last_arr = np.empty(nall, dtype=np.int64)
            for ip, s, e in spans:
                last_arr[s:e] = self.last_download.get(ip, 0)
            dom_all = st.dom_hash32[rows]
            cd_arr = np.fromiter(
                (self.cd_table.get(d, -1) for d in dom_all.tolist()), np.int64, nall
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
            # maxSpidersPerRule == 0 blocks launching entirely
            # (populateDoledbFromWaitingTree skips such rules)
            launchable = (
                (~forced) & (ufn_all >= 0) & (self.prog.max_spiders_per_rule[kmax] > 0)
            )
            is_cand = launchable & (stimes_all <= now_ms)
            fut_all = np.where(launchable & ~is_cand, stimes_all, INF)
            uh_all = st.uh48[rows]
            hop_all = st.hop_count[rows]
            prio_all = self.prog.priority[kmax].astype(np.int64)
            wk1_all = 255 - prio_all  # winner-key major component
        # phase 2: per-IP kill/winner/launch in due order (identical
        # semantics to the per-IP scan)
        for ip, s, e in spans:
            if budget_hit:
                del self.waiting[ip]
                continue
            span_uh = uh_all[s:e]
            m = is_cand[s:e]
            fu = fut_all[s:e]
            f_idx = np.nonzero(forced[s:e])[0]
            if len(f_idx):
                killed = {int(u) for u in span_uh[f_idx]}
                for u48 in killed:
                    self._delete(u48)
                    self.by_ip.get(ip, set()).discard(u48)
                kmask = np.fromiter(
                    (int(u) in killed for u in span_uh), bool, e - s
                )
                m = m & ~kmask
                fu = np.where(kmask, INF, fu)
            ci = np.nonzero(m)[0]
            if len(ci) == 0:
                mf = int(fu.min()) if e > s else INF
                if mf >= INF:
                    del self.waiting[ip]
                else:
                    self.waiting[ip] = mf  # re-arm (SpiderColl.cpp:3483-3487)
                continue
            if self.cfg.adaptive_winner_caps:
                scanned = sum(len(u) + 64 for u in st.url[rows[s:e]])
                max_w = adaptive_max_winners(scanned)
            else:
                max_w = MAX_WINNER_NODES
            cu = span_uh[ci]
            uniq = len(ci) == 1 or len(np.unique(cu)) == len(ci)
            if uniq and len(ci) <= max_w:
                # fast path: unique uh48s and no winner-tree overflow ⇒
                # select_winners degenerates to a sort by winner key
                # (keys are unique because uh48 is the tiebreaker), with
                # no merges/evictions — fully vectorized
                if len(ci) > 1:
                    hc = np.clip(hop_all[s:e][ci], 0, 0xFFFF)
                    order = np.lexsort(
                        (cu, stimes_all[s:e][ci], hc, wk1_all[s:e][ci])
                    )
                    ci = ci[order]
                k_arr = ufn_all[s:e][ci]
                top_k = int(k_arr[0])
                gap = int(self.prog.same_ip_wait_ms[top_k])
                has_cd = bool((cd_arr[s:e][ci] >= 0).any())
                if has_cd:
                    allowed = 1
                elif gap <= 0:
                    allowed = int(self.prog.max_spiders_per_ip[top_k])
                else:
                    chain = 1 + self.cfg.wave_window_ms // gap
                    allowed = min(int(self.prog.max_spiders_per_ip[top_k]), int(chain))
                take = ci[:allowed]
                nl = len(take)
                fast_cand.append(s + take)
                fast_meta.append((n_launch, nl, ip, gap))
                launched_uh = span_uh[take].tolist()
            else:
                # exact path: duplicate uh48 flag-variants or winner-tree
                # overflow — run the reference eviction algorithm on Req
                # objects (SpiderColl::scanListForWinners)
                cands = [
                    (self._req_obj(int(rows[s + i])), int(ufn_all[s + i]), int(stimes_all[s + i]))
                    for i in ci
                ]
                # spiderdb scan order; the secondary keys give flag-variant
                # requests of one uh48 a content-derived total order so
                # select_winners tie-breaks are route-back-arrival-independent
                cands.sort(
                    key=lambda t: (
                        t[0].uh48,
                        t[0].is_injecting,
                        t[0].is_addurl,
                        t[0].is_reindex,
                        t[0].fake_first_ip,
                        t[0].site_hash32,
                    )
                )
                winners = select_winners(
                    (
                        (r, int(self.prog.priority[k]), stime)
                        for (r, k, stime) in cands
                    ),
                    now_ms=now_ms,
                    max_winners=max_w,
                )
                ufn_by_uh = {r.uh48: k for (r, k, _) in cands}
                top_k = ufn_by_uh[winners[0].req.uh48]
                gap = int(self.prog.same_ip_wait_ms[top_k])
                has_cd = bool((cd_arr[s:e][ci] >= 0).any())
                if has_cd:
                    allowed = 1
                elif gap <= 0:
                    allowed = int(self.prog.max_spiders_per_ip[top_k])
                else:
                    chain = 1 + self.cfg.wave_window_ms // gap
                    allowed = min(int(self.prog.max_spiders_per_ip[top_k]), int(chain))
                ws = winners[:allowed]
                nl = len(ws)
                mat["url"].append(np.array([w.req.url for w in ws], dtype=object))
                mat["uh48"].append(np.array([w.req.uh48 for w in ws], dtype=np.uint64))
                mat["first_ip"].append(np.full(nl, ip, dtype=np.int64))
                mat["host"].append(np.array([w.req.host for w in ws], dtype=object))
                mat["dom_hash32"].append(
                    np.array([w.req.dom_hash32 for w in ws], dtype=np.int64)
                )
                mat["hop_count"].append(
                    np.array([w.req.hop_count for w in ws], dtype=np.int64)
                )
                mat["added_time"].append(
                    np.array([w.req.added_time for w in ws], dtype=np.int64)
                )
                mat["priority"].append(
                    np.array([w.priority for w in ws], dtype=np.int64)
                )
                k_take = np.array([ufn_by_uh[w.req.uh48] for w in ws], dtype=np.int64)
                mat["ufn"].append(k_take)
                ecs = []
                for w in ws:
                    rrow = rp.row_of.get(w.req.uh48)
                    ecs.append(int(rp.err_count[rrow]) if rrow is not None else 0)
                mat["err_count"].append(np.array(ecs, dtype=np.int64))
                mat["launch_ms"].append(
                    now_ms + np.arange(nl, dtype=np.int64) * gap
                )
                mat_pos.append(np.arange(n_launch, n_launch + nl, dtype=np.int64))
                launched_uh = [w.req.uh48 for w in ws]
            # per-IP launch budget bookkeeping (SpiderLoop.cpp:943-1072)
            self.in_flight_uh48.update(launched_uh)
            self.in_flight_ip[ip] = self.in_flight_ip.get(ip, 0) + nl
            self.metrics["launched"] += nl
            n_launch += nl
            if self.cfg.max_pages and self.metrics["launched"] >= self.cfg.max_pages:
                budget_hit = True
            del self.waiting[ip]  # doled XOR waiting
        self.wave += 1
        if not n_launch:
            return LAUNCH_SCHEMA.empty_table()
        # one bulk gather for ALL fast-path spans of the wave
        if fast_cand:
            cf = np.concatenate(fast_cand)
            gf = rows[cf]
            nf_l = len(cf)
            pos_f = np.empty(nf_l, dtype=np.int64)
            ip_f = np.empty(nf_l, dtype=np.int64)
            lm_f = np.empty(nf_l, dtype=np.int64)
            o = 0
            for pos0, nl, ip, gap in fast_meta:
                pos_f[o : o + nl] = np.arange(pos0, pos0 + nl)
                ip_f[o : o + nl] = ip
                lm_f[o : o + nl] = now_ms + np.arange(nl, dtype=np.int64) * gap
                o += nl
            rrr = st.rep_row[gf]
            if rp.n:
                ec_f = np.where(
                    rrr >= 0, rp.err_count[np.where(rrr >= 0, rrr, 0)], 0
                ).astype(np.int64)
            else:
                ec_f = np.zeros(nf_l, dtype=np.int64)
            fast_data = {
                "url": st.url[gf],
                "uh48": st.uh48[gf],
                "first_ip": ip_f,
                "host": st.host[gf],
                "dom_hash32": st.dom_hash32[gf].astype(np.int64),
                "hop_count": st.hop_count[gf].astype(np.int64),
                "added_time": st.added_time[gf].astype(np.int64),
                "priority": prio_all[cf],
                "ufn": ufn_all[cf].astype(np.int64),
                "err_count": ec_f,
                "launch_ms": lm_f,
            }
        else:
            pos_f = np.empty(0, dtype=np.int64)
            fast_data = None
        if not mat_pos and fast_data is not None:
            # no exact-path spans: fast rows are already in final order
            cols_out = fast_data
        else:
            pos_x = (
                np.concatenate(mat_pos) if mat_pos else np.empty(0, dtype=np.int64)
            )
            dtypes = {
                "url": object,
                "uh48": np.uint64,
                "host": object,
            }
            cols_out = {}
            for k in mat:
                out = np.empty(n_launch, dtype=dtypes.get(k, np.int64))
                if fast_data is not None:
                    out[pos_f] = fast_data[k]
                if mat_pos:
                    out[pos_x] = np.concatenate(mat[k]).astype(
                        dtypes.get(k, np.int64), copy=False
                    )
                cols_out[k] = out
        ufn_cat = cols_out["ufn"]
        seqs = np.arange(self.seq, self.seq + n_launch, dtype=np.int64)
        self.seq += n_launch
        t = pa.table(
            {
                "url": pa.array(cols_out["url"].tolist(), pa.string()),
                "uh48": pa.array(cols_out["uh48"], pa.uint64()),
                "first_ip": pa.array(cols_out["first_ip"], pa.int64()),
                "host": pa.array(cols_out["host"].tolist(), pa.string()),
                "dom_hash32": pa.array(cols_out["dom_hash32"], pa.int64()),
                "hop_count": pa.array(
                    cols_out["hop_count"].astype(np.int32), pa.int32()
                ),
                "added_time": pa.array(cols_out["added_time"], pa.int64()),
                "priority": pa.array(
                    cols_out["priority"].astype(np.int16), pa.int16()
                ),
                "ufn": pa.array(ufn_cat.astype(np.int32), pa.int32()),
                "harvest_links": pa.array(self.prog.harvest_links[ufn_cat]),
                "err_count": pa.array(
                    cols_out["err_count"].astype(np.int32), pa.int32()
                ),
                "launch_ms": pa.array(cols_out["launch_ms"], pa.int64()),
                "wave": pa.array(np.full(n_launch, self.wave - 1, dtype=np.int64)),
                "part_id": pa.array(
                    np.full(n_launch, self.part_id, dtype=np.int32), pa.int32()
                ),
                "seq": pa.array(seqs, pa.int64()),
            },
            schema=LAUNCH_SCHEMA,
        )
        self._launch_buf.append(t)
        self._launch_buf_rows += t.num_rows
        if self.log_dir and self._launch_buf_rows >= self.cfg.log_flush_rows:
            self._flush_launches()
        return t

    def prev_reply_state(self, uh48s) -> dict:
        """Newest-reply columns for a batch of uh48s (0/"" where no
        reply yet): the old-doc state a respider request carries so the
        fetch tier can detect unchanged content — the reference fills
        Msg13Request.m_contentHash32 and m_ifModifiedSince from the old
        doc (XmlDoc.cpp:8157-8162, 10823)."""
        rp = self.reps
        rows = np.fromiter(
            (rp.row_of.get(int(u), -1) for u in uh48s), np.int64, len(uh48s)
        )
        hit = rows >= 0
        out = {
            "prev_spidered_time": np.zeros(len(rows), dtype=np.int64),
            "prev_content_hash32": np.zeros(len(rows), dtype=np.int64),
            "prev_lang": np.full(len(rows), "", dtype=object),
        }
        if hit.any():
            r = rows[hit]
            out["prev_spidered_time"][hit] = rp.spidered_time[r]
            out["prev_content_hash32"][hit] = rp.content_hash32[r]
            out["prev_lang"][hit] = rp.lang[r]
        return out

    # -- completion --------------------------------------------------------

    def complete(self, cols: dict, token=None) -> int:
        """Apply a batch of fetch replies (REPLY_COLS arrays)."""
        n = len(cols["uh48"])
        if self._apply_once(token):
            return 0
        uhs = np.asarray(cols["uh48"]).astype(np.uint64).tolist()
        ips = np.asarray(cols["first_ip"]).astype(np.int64).tolist()
        ends = np.asarray(cols["download_end_ms"]).astype(np.int64).tolist()
        cds = np.asarray(cols["crawl_delay_ms"]).astype(np.int64).tolist()
        errs = np.asarray(cols["err_code"]).astype(np.int64).tolist()
        sts = np.asarray(cols["spidered_time"]).astype(np.int64).tolist()
        chs = np.asarray(cols["content_hash32"]).astype(np.int64).tolist()
        https = np.asarray(cols["http_status"]).astype(np.int64).tolist()
        doms = np.asarray(cols["dom_hash32"]).astype(np.int64).tolist()
        langs = list(cols["lang"])
        st = self.store
        rp = self.reps
        for i in range(n):
            u48 = uhs[i]
            ip = ips[i]
            end_ms = ends[i]
            self.in_flight_uh48.discard(u48)
            left = self.in_flight_ip.get(ip, 0) - 1
            if left > 0:
                self.in_flight_ip[ip] = left
            else:
                self.in_flight_ip.pop(ip, None)
            self.last_download[ip] = max(self.last_download.get(ip, 0), end_ms)
            cd = cds[i]
            if cd >= 0:
                self.cd_table[doms[i]] = cd
            err = errs[i]
            prow = rp.row_of.get(u48)
            rqr = self.uh_rows.get(u48)
            if rqr is not None:
                r0 = rqr if isinstance(rqr, int) else rqr[0]
                fl0 = int(st.flags[r0])
            else:
                r0 = None
                fl0 = 0
            # percentChangedPerDay (Spider.h:790): content-hash delta
            # between the last two spiderings / elapsed days
            pcpd = 0.0
            st_new = sts[i]
            ch_new = chs[i]
            if prow is not None:
                prev_st = int(rp.spidered_time[prow])
                prev_indexed = bool(rp.flags[prow] & RP_INDEXED)
                prev_errcnt = int(rp.err_count[prow])
                prev_ch = int(rp.content_hash32[prow])
                if prev_indexed and err == 0 and st_new > prev_st:
                    days = (st_new - prev_st) / 86400.0
                    changed = 0.0 if ch_new == prev_ch else 100.0
                    pcpd = changed / days if days > 0 else 0.0
            rep = Rep(
                uh48=u48,
                spidered_time=st_new,
                err_code=err,
                err_count=(prev_errcnt + 1 if prow is not None else 1) if err else 0,
                http_status=https[i],
                crawl_delay_ms=cd,
                content_hash32=ch_new,
                lang=langs[i],
                is_indexed=err == 0,
                # URL-derived reply flags come from the request row's
                # stored predicate flags (same url_is_rssext /
                # url_is_permalink_format, computed once on the parse
                # fan-out) — not recomputed per reply
                is_rss=bool(fl0 & RQ_RSSEXT),
                is_permalink=bool(fl0 & RQ_PERMFMT),
                percent_changed_per_day=pcpd,
            )
            if prow is None:
                prow = rp.new_row(u48)
                rp.set_row(prow, rep)
                if rqr is not None:
                    for r in self._rows_list(rqr):
                        st.rep_row[r] = prow
            elif rep.spidered_time >= int(rp.spidered_time[prow]):
                rp.set_row(prow, rep)
            # quota counting: one vote per uh48 once indexed
            # (SpiderColl.cpp:2776-2798)
            if rep.is_indexed and r0 is not None and u48 not in self.quota_counted:
                self.quota_counted.add(u48)
                s32 = int(st.site_hash32[r0])
                d32 = int(st.dom_hash32[r0])
                self.quota_site[s32] = self.quota_site.get(s32, 0) + 1
                self.quota_dom[d32] = self.quota_dom.get(d32, 0) + 1
            if left <= 0:
                self.waiting[ip] = 0  # re-arm asap; next scan gates by spider time
            self.metrics["completed"] += 1
            if err:
                self.metrics["errors"] += 1
        return n

    def apply_reply_newest(self, rep: Rep, derive: bool = True) -> None:
        """Store a reply record with newest-wins semantics (the
        commutative form of complete()'s reply application) WITHOUT the
        politeness/in-flight side effects — used by cold-start log
        replays (pipelines/compact.py).

        ``derive``: recompute the reply fields complete() derives live —
        is_rss/is_permalink from the request URL, and
        percentChangedPerDay from the previously applied reply (callers
        replay the log in spidered_time order, so consecutive
        applications see the same pairs the live path saw)."""
        rp = self.reps
        prow = rp.row_of.get(rep.uh48)
        if derive:
            rqr = self.uh_rows.get(rep.uh48)
            url = ""
            if rqr is not None:
                r0 = rqr if isinstance(rqr, int) else rqr[0]
                url = self.store.url[r0]
            pcpd = 0.0
            if prow is not None:
                prev_st = int(rp.spidered_time[prow])
                if (
                    bool(rp.flags[prow] & RP_INDEXED)
                    and rep.err_code == 0
                    and rep.spidered_time > prev_st
                ):
                    days = (rep.spidered_time - prev_st) / 86400.0
                    changed = (
                        0.0
                        if rep.content_hash32 == int(rp.content_hash32[prow])
                        else 100.0
                    )
                    pcpd = changed / days if days > 0 else 0.0
            rep = replace(
                rep,
                is_rss=url_is_rssext(url) if url else False,
                is_permalink=url_is_permalink_format(url) if url else False,
                percent_changed_per_day=pcpd,
            )
        if prow is None:
            prow = rp.new_row(rep.uh48)
            rp.set_row(prow, rep)
            rqr = self.uh_rows.get(rep.uh48)
            if rqr is not None:
                for r in self._rows_list(rqr):
                    self.store.rep_row[r] = prow
        elif rep.spidered_time >= int(rp.spidered_time[prow]):
            rp.set_row(prow, rep)

    def apply_replies_newest_cols(self, cols: dict) -> None:
        """Columnar form of :meth:`apply_reply_newest` for cold-start log
        replays: input arrays MUST be sorted by (uh48, spidered_time),
        stable.  Only the LAST reply per uh48 survives (newest wins), and
        its percentChangedPerDay is derived from the immediately
        preceding sorted row — exactly the pair the sequential replay
        would have stored just before it.  is_rss/is_permalink come from
        the request row's stored URL-predicate flags (same derivation as
        ``complete()``); equality with the per-row path is pinned in
        tests/test_compact.py.

        Replaces the per-row ``to_dict("records")`` loop in
        cold_start_schedule (reference scale: the ~10.8 GB spiderdb
        rescan, Spider.h:308-311)."""
        uh = np.asarray(cols["uh48"]).astype(np.uint64)
        n = len(uh)
        if not n:
            return
        st_t = np.asarray(cols["spidered_time"]).astype(np.int64)
        err = np.asarray(cols["err_code"]).astype(np.int64)
        ecnt = np.asarray(cols["err_count"]).astype(np.int64)
        hst = np.asarray(cols["http_status"]).astype(np.int64)
        cdm = np.asarray(cols["crawl_delay_ms"]).astype(np.int64)
        ch = np.asarray(cols["content_hash32"]).astype(np.int64)
        last = np.ones(n, dtype=bool)
        last[:-1] = uh[1:] != uh[:-1]
        first = np.ones(n, dtype=bool)
        first[1:] = uh[1:] != uh[:-1]
        w = np.nonzero(last)[0]  # winning (final) row per distinct uh48
        m = len(w)
        # pcpd of the winning application: prev stored == previous sorted
        # row of the same group (Spider.h:790 pairwise derivation)
        pcpd = np.zeros(m, dtype=np.float64)
        hp = np.nonzero(~first[w])[0]  # winners with a predecessor
        if len(hp):
            pw = w[hp]
            pp = pw - 1
            ok = (err[pp] == 0) & (err[pw] == 0) & (st_t[pw] > st_t[pp])
            days = (st_t[pw] - st_t[pp]).astype(np.float64) / 86400.0
            changed = np.where(ch[pw] != ch[pp], 100.0, 0.0)
            with np.errstate(divide="ignore", invalid="ignore"):
                v = np.where(days > 0, changed / days, 0.0)
            pcpd[hp] = np.where(ok, v, 0.0)
        rp = self.reps
        st = self.store
        # allocate/locate target rows (per-DISTINCT dict work only)
        rows = np.empty(m, dtype=np.int64)
        stale = []  # j where an existing newer reply must be kept
        row_of = rp.row_of
        nxt = rp.n
        fl0 = np.zeros(m, dtype=np.int64)
        uhw = uh[w].tolist()
        stw = st_t[w]
        for j, u in enumerate(uhw):
            r = row_of.get(u)
            if r is None:
                r = nxt
                nxt += 1
                row_of[u] = r
                rqr = self.uh_rows.get(u)
                if rqr is not None:
                    for rr in self._rows_list(rqr):
                        st.rep_row[rr] = r
            elif int(stw[j]) < int(rp.spidered_time[r]):
                stale.append(j)
            rqr = self.uh_rows.get(u)
            if rqr is not None:
                r0 = rqr if isinstance(rqr, int) else rqr[0]
                fl0[j] = int(st.flags[r0])
            rows[j] = r
        rp.reserve(nxt - rp.n)
        rp.n = nxt
        if stale:
            keep = np.ones(m, dtype=bool)
            keep[stale] = False
            w, rows, pcpd, fl0 = w[keep], rows[keep], pcpd[keep], fl0[keep]
        rp.spidered_time[rows] = st_t[w]
        rp.err_code[rows] = err[w]
        rp.err_count[rows] = ecnt[w]
        rp.http_status[rows] = hst[w]
        rp.crawl_delay_ms[rows] = cdm[w]
        rp.content_hash32[rows] = ch[w]
        rp.pub_date[rows] = 0
        rp.pcpd[rows] = pcpd
        rp.lang[rows] = "en"  # log replies carry no lang (Rep default)
        rp.flags[rows] = (
            np.where(err[w] == 0, RP_INDEXED, 0)
            | np.where(fl0 & RQ_RSSEXT, RP_RSS, 0)
            | np.where(fl0 & RQ_PERMFMT, RP_PERMALINK, 0)
        ).astype(np.uint8)

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
        rp = self.reps
        return sorted(
            (
                u,
                int(rp.spidered_time[r]),
                int(rp.http_status[r]),
                int(rp.err_code[r]),
                int(rp.err_count[r]),
                int(rp.crawl_delay_ms[r]),
            )
            for u, r in rp.row_of.items()
        )

    def fetch_log_table(self) -> pa.Table:
        """Hot latest-reply state as a columnar table (one row per
        crawled uh48) — the streamed form of :meth:`fetch_log`."""
        rp = self.reps
        m = len(rp.row_of)
        uh = np.fromiter(rp.row_of.keys(), np.uint64, m)
        rows = np.fromiter(rp.row_of.values(), np.int64, m)
        return pa.table(
            {
                "uh48": pa.array(uh, pa.uint64()),
                "spidered_time": pa.array(rp.spidered_time[rows]),
                "http_status": pa.array(rp.http_status[rows]),
                "err_code": pa.array(rp.err_code[rows]),
                "err_count": pa.array(rp.err_count[rows]),
                "crawl_delay_ms": pa.array(rp.crawl_delay_ms[rows]),
            }
        )

    def flush_fetch_log(self) -> bool:
        """Snapshot the latest-reply state to a parquet segment in the
        part dir (finalize-time; overwrites — it is derived state, not an
        append log).  Keeps the per-URL fetch log off the driver: at
        10^10 crawled URLs the old gather-to-a-python-list form OOMs at
        finalize.  Returns False when no log_dir is configured (unit
        tests) so the caller falls back to the eager list."""
        if self.log_dir is None:
            return False
        self._write_seg(self.fetch_log_table(), "fetchlog-000000.parquet")
        return True

    def recount_quotas(self) -> None:
        """Rebuild the quota tables from the reply log — the cold-start
        counting pass (SpiderColl.cpp:2754-2798 with
        m_countingPagesIndexed set)."""
        self.quota_site = {}
        self.quota_dom = {}
        self.quota_counted = set()
        st = self.store
        for u48, row in self.reps.row_of.items():
            if not (self.reps.flags[row] & RP_INDEXED):
                continue
            rqr = self.uh_rows.get(u48)
            if rqr is None:
                continue
            r0 = rqr if isinstance(rqr, int) else rqr[0]
            self.quota_counted.add(u48)
            s32 = int(st.site_hash32[r0])
            d32 = int(st.dom_hash32[r0])
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
            "store": self.store.state(),
            "reps": self.reps.state(),
            "row_of": self.row_of,
            "uh_rows": self.uh_rows,
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
        if "store" not in st or "row_of" not in st:
            # pre-columnar (dict-based requests/replies) checkpoint format:
            # fail with a versioned message instead of a KeyError mid-resume
            raise RuntimeError(
                "checkpoint was written by a pre-columnar FrontierCore "
                "(missing 'store'/'row_of'); this version cannot resume it — "
                "restart the crawl from seeds (delete the out dir's "
                "checkpoints/) or resume with the version that wrote it"
            )
        core = cls(st["part_id"], st["cfg"], log_dir=st["log_dir"])
        for k in (
            "row_of",
            "uh_rows",
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
        core._token_window = max(TOKEN_WINDOW, 2 * len(core.applied_tokens))
        core.store = _ReqStore.from_state(st["store"])
        core.reps = _RepStore.from_state(st["reps"])
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
