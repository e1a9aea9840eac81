"""FetchStage + ParseStage: the actor-pool map_batches stages.

FetchStage ↔ Msg13::getDoc (Msg13.cpp:125-765): robots gate (cached per
host, 24 h TTL in the reference, Msg13.cpp:477-494), then the download.
In this sandbox the "network" is the procedural SynthWeb; a production
deployment replaces ``fetch_url`` with an async HTTP client and keeps
the batch contract identical.

ParseStage ↔ XmlDoc's parse chain (Xml/Words/Links,
XmlDoc.cpp:3244-3938) + reply/outlink assembly
(XmlDoc.cpp:14548-15520): emits one unified record batch holding doc
rows (span sequences), the SpiderReply, and admitted outlink
SpiderRequests, each tagged with its target frontier partition.

Both are callable classes: constructed once per actor
(``map_batches(Cls, concurrency=N)``), so robots caches, compiled
regexes, and the SynthWeb config live per-actor, not per-batch.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

from ..functions import gbhash, urlfilter
from ..functions.robots import parse_robots
from ..functions.urlnorm import (
    canonicalize,
    get_domain,
    get_path_with_query,
    outlink_check,
)
from ..functions.urlfilter import (
    url_is_permalink_format,
    url_is_root,
    url_is_rssext,
)
from ..sources.synthweb import (
    SynthWeb,
    WebConfig,
    fetch_url,
    get_web,
    parse_html_into,
)
from ..state.frontier import part_of_ip
from .canonicalize import resolve_ip


def _url_flags(url: str) -> tuple:
    """URL-derived predicate flags (XmlDoc.cpp:15360-15400) — computed
    here on the parse fan-out so the frontier actors don't pay the
    per-URL regex cost at admission."""
    return (url_is_root(url), url_is_rssext(url), url_is_permalink_format(url))

SPAN_TYPE = pa.list_(
    pa.struct(
        [
            ("kind", pa.string()),
            ("text", pa.string()),
            ("media_ref", pa.string()),
            ("offset", pa.int32()),
        ]
    )
)

FETCH_OUT_FIELDS = [
    ("http_status", pa.int32()),
    ("err_code", pa.int32()),
    ("crawl_delay_ms", pa.int64()),
    ("download_end_ms", pa.int64()),
    ("robots_allowed", pa.bool_()),
    ("html", pa.string()),
    ("redir_location", pa.string()),
]

# unified parse-output schema; rec ∈ {doc, reply, request}
RECORD_SCHEMA = pa.schema(
    [
        ("rec", pa.string()),
        ("part", pa.int32()),
        # request fields
        ("url", pa.string()),
        ("uh48", pa.uint64()),
        ("first_ip", pa.int64()),
        ("host", pa.string()),
        ("dom_hash32", pa.int64()),
        ("site_hash32", pa.int64()),
        ("hop_count", pa.int32()),
        ("added_time", pa.int64()),
        ("parent_ip", pa.int64()),
        ("is_injecting", pa.bool_()),
        ("is_addurl", pa.bool_()),
        ("is_reindex", pa.bool_()),
        ("fake_first_ip", pa.bool_()),
        ("is_root", pa.bool_()),
        ("is_rssext", pa.bool_()),
        ("is_permalink_format", pa.bool_()),
        # reply fields
        ("spidered_time", pa.int64()),
        ("download_end_ms", pa.int64()),
        ("err_code", pa.int32()),
        ("http_status", pa.int32()),
        ("crawl_delay_ms", pa.int64()),
        ("lang", pa.string()),
        ("content_hash32", pa.int64()),
        # doc fields
        ("doc_id", pa.string()),
        ("spans", SPAN_TYPE),
        ("wave", pa.int64()),
    ]
)


class FetchStage:
    def __init__(self, web_cfg: WebConfig, user_agent: str = "gigablastbot"):
        self.web = get_web(web_cfg)
        self.ua = user_agent
        self._robots_cache: dict = {}  # host -> RobotsPolicy

    def _policy(self, host: str, robots_txt: str):
        pol = self._robots_cache.get(host)
        if pol is None:
            pol = parse_robots(robots_txt, self.ua)
            self._robots_cache[host] = pol
        return pol

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        urls = batch["url"].to_pylist()
        launch_ms = batch["launch_ms"].to_numpy()
        status = np.zeros(n, dtype=np.int32)
        err = np.zeros(n, dtype=np.int32)
        cd = np.full(n, -1, dtype=np.int64)
        end = np.zeros(n, dtype=np.int64)
        allowed = np.zeros(n, dtype=bool)
        htmls: list[str] = []
        locs: list[str] = []
        hosts = batch["host"].to_pylist()
        # in-flight identical-request dedup (Msg13.cpp:596-616
        # wait-in-line): concurrent identical URLs in one batch share a
        # single download; each row still gets its own timing/reply
        inflight: dict[str, object] = {}
        for i, u in enumerate(urls):
            fr = inflight.get(u)
            if fr is None:
                fr = fetch_url(self.web, u)
                inflight[u] = fr
            pol = self._policy(hosts[i], fr.robots_txt)
            cd[i] = pol.crawl_delay_ms
            ok = pol.is_allowed(get_path_with_query(u))
            allowed[i] = ok
            if not ok:
                # robots denial = error reply (reference: EDOCDISALLOWED →
                # error path, XmlDoc.cpp:7115-7360)
                err[i] = urlfilter.ERR_ROBOTS_DENIED
                status[i] = 0
                end[i] = launch_ms[i] + fr.latency_ms  # robots fetch cost
                htmls.append("")
                locs.append("")
                continue
            status[i] = fr.http_status
            err[i] = fr.err_code
            end[i] = launch_ms[i] + fr.latency_ms
            htmls.append(fr.html)
            locs.append(fr.location)
        out = batch
        for name, arr in [
            ("http_status", pa.array(status)),
            ("err_code", pa.array(err)),
            ("crawl_delay_ms", pa.array(cd)),
            ("download_end_ms", pa.array(end)),
            ("robots_allowed", pa.array(allowed)),
            ("html", pa.array(htmls, pa.string())),
            ("redir_location", pa.array(locs, pa.string())),
        ]:
            out = out.append_column(name, arr)
        return out


def _part_vec(ips: np.ndarray, P: int) -> np.ndarray:
    """Vectorized part_of_ip: one hash per UNIQUE ip, gathered back."""
    ips = np.asarray(ips, dtype=np.int64)
    if ips.size == 0:
        return np.empty(0, dtype=np.int32)
    uniq, inv = np.unique(ips, return_inverse=True)
    lut = np.fromiter((part_of_ip(int(ip), P) for ip in uniq), np.int32, len(uniq))
    return lut[inv]


def _crc32_col(col, n: int) -> np.ndarray:
    """crc32 of each row of an Arrow string column, read zero-copy off
    the utf-8 data buffer (identical to ``crc32(s.encode())`` but
    without materializing a bytes copy per row; empty rows hash to 0)."""
    out = np.zeros(n, np.int64)
    pos = 0
    crc = zlib.crc32
    chunks = col.chunks if isinstance(col, pa.ChunkedArray) else [col]
    for chunk in chunks:
        m = len(chunk)
        if m == 0:
            continue
        bufs = chunk.buffers()
        wid = 8 if pa.types.is_large_string(chunk.type) else 4
        dt = np.int64 if wid == 8 else np.int32
        off = np.frombuffer(bufs[1], dt, m + 1, chunk.offset * wid)
        mv = memoryview(bufs[2])
        for i in range(m):
            a, b = off[i], off[i + 1]
            if b > a:
                out[pos + i] = crc(mv[a:b])
        pos += m
    return out


def _records(n: int, **cols) -> pa.Table:
    """Columnar RECORD_SCHEMA builder: absent fields become nulls (the
    same shape ``Table.from_pylist`` produced for missing keys)."""
    arrays = []
    for f in RECORD_SCHEMA:
        v = cols.get(f.name)
        if v is None:
            arrays.append(pa.nulls(n, f.type))
        elif isinstance(v, (pa.Array, pa.ChunkedArray)):
            arrays.append(v)
        elif isinstance(v, str):
            arrays.append(pa.array([v] * n, f.type))
        else:
            arrays.append(pa.array(v, f.type))
    return pa.Table.from_arrays(arrays, schema=RECORD_SCHEMA)


class ParseStage:
    """Columnar parse/reply/outlink assembly.  Per-row Python work is
    only what is inherently per-string (parse_html, canonicalize); all
    hashing, partition routing, and record assembly are batch
    operations (reference outlink batch: XmlDoc.cpp:15007-15520)."""

    #: bound on the per-actor outlink memo (cleared when full); pure
    #: canonicalize/filter results, so caching cannot change output
    LINK_CACHE_MAX = 1 << 19

    def __init__(self, web_cfg: WebConfig, num_partitions: int):
        self.web = get_web(web_cfg)
        self.host_ip = {h: int(ip) for h, ip in zip(self.web.hosts, self.web.ips)}
        self.P = num_partitions
        # raw absolute outlink -> (canonical|None, host|None): outlinks
        # repeat heavily across pages (hub/nav links), and for absolute
        # URLs canonicalization is base-independent
        self._link_cache: dict = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return RECORD_SCHEMA.empty_table()
        uh = batch["uh48"].to_numpy()
        first_ip = batch["first_ip"].to_numpy()
        dom32 = batch["dom_hash32"].to_numpy()
        end_ms = batch["download_end_ms"].to_numpy()
        err = batch["err_code"].to_numpy()
        status = batch["http_status"].to_numpy()
        cdel = batch["crawl_delay_ms"].to_numpy()
        wave = batch["wave"].to_numpy()
        hop = batch["hop_count"].to_numpy()
        harvest = batch["harvest_links"].to_numpy(zero_copy_only=False)
        urls = batch["url"].to_pylist()
        htmls = batch["html"].to_pylist()
        end_s = end_ms // 1000
        part = _part_vec(first_ip, self.P)

        # one reply per input row (hash32_batch yields 0 for html == "")
        reply = _records(
            n,
            rec="reply",
            part=part,
            uh48=uh,
            first_ip=first_ip,
            dom_hash32=dom32,
            spidered_time=end_s,
            download_end_ms=end_ms,
            err_code=err,
            http_status=status,
            crawl_delay_ms=cdel,
            lang="en",
            # crc32 (zlib, C): the content hash only needs change
            # detection (dedup / percentChangedPerDay), and the
            # table-gather hash64b costs ~24 bytes of memory traffic per
            # input byte — the hash32 family is already a documented
            # divergence from the reference (gbhash.hash32_batch doc).
            # Hashed straight off the Arrow utf-8 buffer: equals
            # crc32(h.encode()) without the per-row str→bytes copy
            content_hash32=_crc32_col(batch["html"], n),
            wave=wave,
        )

        # docs: span sequences for the 200-OK rows, assembled directly
        # as Arrow list<struct> children (no per-span dicts in the hot
        # path; parse_html_into appends straight into the flat children)
        ok_idx = np.nonzero((err == 0) & (status == 200))[0]
        flat_k: list[str] = []
        flat_t: list[str] = []
        flat_r: list[str] = []
        fk, ft, fr = flat_k.append, flat_t.append, flat_r.append
        lens = np.fromiter(
            (parse_html_into(htmls[i], fk, ft, fr) for i in ok_idx),
            np.int64,
            len(ok_idx),
        )
        offsets = np.zeros(len(ok_idx) + 1, np.int32)
        np.cumsum(lens, out=offsets[1:])
        flat_struct = pa.StructArray.from_arrays(
            [
                pa.array(flat_k, pa.string()),
                pa.array(flat_t, pa.string()),
                pa.array(flat_r, pa.string()),
                pa.array(
                    np.concatenate([np.arange(ln, dtype=np.int32) for ln in lens])
                    if len(lens)
                    else np.empty(0, np.int32),
                    pa.int32(),
                ),
            ],
            ["kind", "text", "media_ref", "offset"],
        )
        doc = _records(
            len(ok_idx),
            rec="doc",
            part=part[ok_idx],
            doc_id=[urls[i] for i in ok_idx],
            uh48=uh[ok_idx],
            spans=pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), flat_struct),
            wave=wave[ok_idx],
        )

        # outlinks: gather (raw link, source row) over all harvested pages
        link_raw: list[str] = []
        link_src: list[int] = []
        # hop override per gathered link: -1 = parent hop + 1 (normal
        # outlink); a redirect target keeps the PARENT's hop count
        # (XmlDoc.cpp:15377-15380 "keep hopcount the same for redirs")
        link_hop: list[int] = []
        redirs = (
            batch["redir_location"].to_pylist()
            if "redir_location" in batch.column_names
            else [""] * n
        )
        for i in range(n):
            if redirs[i]:
                # EDOCSIMPLIFIEDREDIR: the target is the page's single
                # "link" regardless of the harvest flag
                # (XmlDoc.cpp:3989-3993 pretend-it-is-a-link)
                link_raw.append(redirs[i])
                link_src.append(int(i))
                link_hop.append(int(hop[i]))
        for di, i in enumerate(ok_idx):
            if not harvest[i]:
                continue
            a, b = int(offsets[di]), int(offsets[di + 1])
            for k, r in zip(flat_k[a:b], flat_r[a:b]):
                if k == "link":
                    link_raw.append(r)
                    link_src.append(int(i))
                    link_hop.append(-1)
        # canonicalize + outlink filter (same order make_request_columns
        # applied per page), then per-page uh48 dedup
        # (XmlDoc.cpp:15263-15272)
        kept_urls: list[str] = []
        kept_src: list[int] = []
        kept_hop: list[int] = []
        kept_hosts: list[str] = []
        kept_flags: list[tuple] = []  # (is_root, is_rssext, is_permalink_format)
        cache = self._link_cache
        for u, s, h in zip(link_raw, link_src, link_hop):
            if u.startswith(("http://", "https://")):
                ent = cache.get(u)
                if ent is None:
                    c = canonicalize(u)
                    if c is None:
                        ent = (None, None, None)
                    else:
                        ent = (c, outlink_check(c), _url_flags(c))
                    if len(cache) >= self.LINK_CACHE_MAX:
                        cache.clear()
                    cache[u] = ent
                c, host, flags = ent
            else:
                # relative link: memoize on (resolution context, link) —
                # root-relative links need only scheme://host, others the
                # full base (urljoin directory semantics)
                base = urls[s]
                if u.startswith("/"):
                    sp = base.split("/", 3)
                    ctx = "/".join(sp[:3]) if len(sp) >= 3 else base
                else:
                    ctx = base
                key = ctx + "\0" + u
                ent = cache.get(key)
                if ent is None:
                    c = canonicalize(u, base=base)
                    if c is None:
                        ent = (None, None, None)
                    else:
                        ent = (c, outlink_check(c), _url_flags(c))
                    if len(cache) >= self.LINK_CACHE_MAX:
                        cache.clear()
                    cache[key] = ent
                c, host, flags = ent
            # host is None when the canonical form fails the pure filter;
            # the self-link drop (XmlDoc.cpp:15458) stays outside the memo
            if host is not None and c != urls[s]:
                kept_urls.append(c)
                kept_src.append(s)
                kept_hop.append(h)
                kept_hosts.append(host)
                kept_flags.append(flags)
        uh_l = gbhash.uh48_batch(kept_urls)
        sel: list[int] = []
        cur_src = -1
        seen_page: set = set()
        for j in range(len(kept_urls)):
            if kept_src[j] != cur_src:
                cur_src = kept_src[j]
                seen_page = set()
            u48 = int(uh_l[j])
            if u48 in seen_page:
                continue
            seen_page.add(u48)
            sel.append(j)
        r_urls = [kept_urls[j] for j in sel]
        r_src = np.fromiter((kept_src[j] for j in sel), np.int64, len(sel))
        r_hop_ovr = np.fromiter((kept_hop[j] for j in sel), np.int64, len(sel))
        hosts = [kept_hosts[j] for j in sel]
        domains = [get_domain(h) for h in hosts]
        ips = np.fromiter(
            (resolve_ip(h, self.host_ip) for h in hosts), np.int64, len(hosts)
        )
        nz = len(sel)
        req = _records(
            nz,
            rec="request",
            part=_part_vec(ips, self.P),
            url=r_urls,
            uh48=uh_l[sel] if nz else np.empty(0, np.uint64),
            first_ip=ips,
            host=hosts,
            dom_hash32=gbhash.hash32_batch(domains).astype(np.int64),
            site_hash32=gbhash.hash32_batch(hosts).astype(np.int64),
            # redirect keeps parent hop (XmlDoc.cpp:15377-15380); a site
            # root always resets to 0 and wins over the redir keep
            # (XmlDoc.cpp:15381 "if (issiteroot) ksr.m_hopCount = 0")
            hop_count=np.where(
                np.fromiter((kept_flags[j][0] for j in sel), bool, nz),
                0,
                np.where(r_hop_ovr >= 0, r_hop_ovr, hop[r_src] + 1),
            ).astype(np.int32),
            added_time=end_s[r_src],
            parent_ip=first_ip[r_src],
            is_injecting=np.zeros(nz, bool),
            is_addurl=np.zeros(nz, bool),
            is_reindex=np.zeros(nz, bool),
            fake_first_ip=np.zeros(nz, bool),
            is_root=np.fromiter((kept_flags[j][0] for j in sel), bool, nz),
            is_rssext=np.fromiter((kept_flags[j][1] for j in sel), bool, nz),
            is_permalink_format=np.fromiter(
                (kept_flags[j][2] for j in sel), bool, nz
            ),
            wave=wave[r_src],
        )
        return pa.concat_tables([reply, doc, req])


# ---------------------------------------------------------------------------
# task-mode wrappers: plain functions for map_batches that reuse a cached
# per-worker-process stage instance.  A politeness-bound crawl produces many
# small waves; spinning an actor pool per wave costs more than the work, so
# small waves run as stateless tasks with this cache while large waves use
# the actor-pool classes above (CrawlConfig.stage_mode).
# ---------------------------------------------------------------------------

from functools import lru_cache


@lru_cache(maxsize=4)
def _cached_fetch(web_cfg: WebConfig, ua: str) -> FetchStage:
    return FetchStage(web_cfg, ua)


@lru_cache(maxsize=4)
def _cached_parse(web_cfg: WebConfig, P: int) -> ParseStage:
    return ParseStage(web_cfg, P)


def fetch_batch(batch: pa.Table, *, web_cfg: WebConfig, user_agent: str) -> pa.Table:
    return _cached_fetch(web_cfg, user_agent)(batch)


def parse_batch(batch: pa.Table, *, web_cfg: WebConfig, num_partitions: int) -> pa.Table:
    return _cached_parse(web_cfg, num_partitions)(batch)
