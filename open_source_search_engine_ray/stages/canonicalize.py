"""Canonicalize + hash + route: the stateless front of the frontier.

Turns raw URL strings into frontier SpiderRequest columns
(REQUEST_COLS): canonical url, uh48, host/domain hashes, first_ip (via
the host→IP resolver), partition id.  Reference flow:
``updateSiteListBuf``/``setFromAddUrl`` building SpiderRequests
(Spider.cpp:1659-2016, 4286) and the outlink batch at
XmlDoc.cpp:15007-15520.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions import gbhash
from ..functions.urlfilter import (
    url_is_permalink_format,
    url_is_root,
    url_is_rssext,
)
from ..functions.urlnorm import canonicalize, get_domain, get_host
from ..state.frontier import part_of_ip


def url_flag_columns(urls) -> dict:
    """The URL-derived predicate flag columns of REQUEST_COLS, computed
    at request-build time (XmlDoc.cpp:15360-15400) so the regex cost
    runs on the wide fan-out instead of the frontier actors."""
    n = len(urls)
    return {
        "is_root": np.fromiter((url_is_root(u) for u in urls), bool, n),
        "is_rssext": np.fromiter((url_is_rssext(u) for u in urls), bool, n),
        "is_permalink_format": np.fromiter(
            (url_is_permalink_format(u) for u in urls), bool, n
        ),
    }


def resolve_ip(host: str, host_ip: dict) -> int:
    """Host→first-IP resolution (reference: tagdb firstip tag else DNS,
    XmlDoc.cpp:6553-6578).  Unknown hosts get a deterministic pseudo-IP
    derived from the host hash (they will DNS-fail at fetch, producing
    the same retry/delete semantics as the reference's EDNSTIMEDOUT
    path)."""
    ip = host_ip.get(host)
    if ip is not None:
        return int(ip)
    return 0x7F000000 + (gbhash.hash32(host) & 0xFFFFFF)


def make_request_columns(
    raw_urls,
    host_ip: dict,
    bases=None,
    hop_count=0,
    added_time=0,
    parent_ip=0,
    is_addurl=False,
    is_injecting=False,
    drop=None,
):
    """Build REQUEST_COLS numpy dict from raw URL strings; returns
    (cols, part_ids).  ``drop``: optional predicate(url_canonical) to
    reject rows (outlink filter is applied by the caller)."""
    canon = []
    for i, u in enumerate(raw_urls):
        b = bases[i] if bases is not None else None
        c = canonicalize(u, base=b)
        canon.append(c)
    keep = [i for i, c in enumerate(canon) if c is not None and (drop is None or not drop(c))]
    urls = [canon[i] for i in keep]
    n = len(urls)
    hosts = [get_host(u) for u in urls]
    domains = [get_domain(h) for h in hosts]
    uh = gbhash.uh48_batch(urls)
    hop_arr = (
        np.asarray(hop_count)[keep]
        if np.ndim(hop_count)
        else np.full(n, hop_count, dtype=np.int64)
    )
    added_arr = (
        np.asarray(added_time)[keep]
        if np.ndim(added_time)
        else np.full(n, added_time, dtype=np.int64)
    )
    parent_arr = (
        np.asarray(parent_ip)[keep]
        if np.ndim(parent_ip)
        else np.full(n, parent_ip, dtype=np.int64)
    )
    ips = np.fromiter((resolve_ip(h, host_ip) for h in hosts), np.int64, n)
    cols = {
        "url": np.array(urls, dtype=object),
        "uh48": uh,
        "first_ip": ips,
        "host": np.array(hosts, dtype=object),
        "dom_hash32": gbhash.hash32_batch(domains).astype(np.int64),
        "site_hash32": gbhash.hash32_batch(hosts).astype(np.int64),
        "hop_count": hop_arr.astype(np.int32),
        "added_time": added_arr,
        "parent_ip": parent_arr,
        "is_injecting": np.full(n, is_injecting, dtype=bool),
        "is_addurl": np.full(n, is_addurl, dtype=bool),
        "is_reindex": np.zeros(n, dtype=bool),
        "fake_first_ip": np.zeros(n, dtype=bool),
        **url_flag_columns(urls),
    }
    # uh48 was just computed from these urls (this IS the origin); the
    # transit checksum lets the actor-in integrity gate run at C speed
    from ..state.frontier import transit_ck32

    cols["ck32"] = transit_ck32(cols["url"], cols["uh48"])
    return cols


def make_reindex_request_cols(urls, added_time=0, force_delete=False) -> dict:
    """Docid-based reindex requests from a docs-table query result
    (reference PageReindex.cpp:320-395; the ``isdocidbased`` predicate,
    Spider.cpp:2380-2385, maps to is_reindex).

    Each URL becomes a SpiderRequest with ``is_reindex`` and a FAKE
    ``first_ip`` derived from the probable docid exactly as the
    reference does: delete flavor → ``docid & 0xffff`` (up to 64k
    politeness keys, deliberately bounded so huge reindexes don't
    stress the wait trees); reindex flavor → bits 6-13
    (``(docid & 0xffff) >> 6 & 0xff``) so same-domain requests co-locate
    on one shard; 0 is remapped to 1.  ``hop_count`` is -1
    (PageReindex.cpp:378).

    Divergence (documented): the reference stores the decimal docid as
    the request URL (``m_urlIsDocId``) and resolves the title rec at
    spider time; our docs table carries the URL directly, so we keep it
    in the request — the scheduled fetch and the final frontier state
    are identical.  Duplicate docids collapse to one request
    (PageReindex's ``dt`` dedup table).
    """
    from ..functions.gbhash import probable_docid_batch

    canon = [canonicalize(u) for u in urls]
    canon = [c for c in canon if c is not None]
    seen: set = set()
    keep: list[str] = []
    docids: list[int] = []
    if canon:
        dids = probable_docid_batch(canon)
        for u, d in zip(canon, dids.tolist()):
            if d in seen:
                continue
            seen.add(d)
            keep.append(u)
            docids.append(d)
    n = len(keep)
    fip = np.array(docids, dtype=np.uint64) & np.uint64(0xFFFF)
    if not force_delete:
        fip = (fip >> np.uint64(6)) & np.uint64(0xFF)
    fip = np.where(fip == 0, np.uint64(1), fip).astype(np.int64)
    hosts = [get_host(u) for u in keep]
    domains = [get_domain(h) for h in hosts]
    cols = {
        "url": np.array(keep, dtype=object),
        "uh48": gbhash.uh48_batch(keep),
        "first_ip": fip,
        "host": np.array(hosts, dtype=object),
        "dom_hash32": gbhash.hash32_batch(domains).astype(np.int64),
        "site_hash32": gbhash.hash32_batch(hosts).astype(np.int64),
        "hop_count": np.full(n, -1, dtype=np.int32),
        "added_time": np.full(n, added_time, dtype=np.int64),
        "parent_ip": np.zeros(n, dtype=np.int64),
        "is_injecting": np.zeros(n, dtype=bool),
        "is_addurl": np.zeros(n, dtype=bool),
        "is_reindex": np.ones(n, dtype=bool),
        "fake_first_ip": np.ones(n, dtype=bool),
        **url_flag_columns(keep),
    }
    from ..state.frontier import transit_ck32

    cols["ck32"] = transit_ck32(cols["url"], cols["uh48"])
    return cols


def request_cols_to_table(cols: dict) -> pa.Table:
    return pa.table({k: pa.array(v.tolist() if v.dtype == object else v) for k, v in cols.items()})


def split_by_partition(cols: dict, num_partitions: int):
    """Yield (part_id, cols-subset) — the groupby-shuffle key
    (SURVEY §7.3: politeness domain → exactly one actor)."""
    parts = np.fromiter(
        (part_of_ip(ip, num_partitions) for ip in cols["first_ip"]),
        np.int32,
        len(cols["first_ip"]),
    )
    for p in np.unique(parts):
        idx = np.nonzero(parts == p)[0]
        yield int(p), {k: v[idx] for k, v in cols.items()}
