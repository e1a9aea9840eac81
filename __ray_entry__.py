"""Driver contract for the Ray-Data crawl/data engine.

``entry()`` — flagship crawl pipeline on a deterministic synthetic web
(Ray already initialised by the driver; nothing here calls ray.init).

``queries()`` — one entry per implemented operator/pipeline from
SURVEY.md §2 plus the training-data suite; each callable takes
``sf_dir`` and returns a pandas DataFrame / Arrow table.

``oracle_sql()`` — DuckDB-equivalent SQL for every SQL-expressible
query, with identical column names and identical rounding.  Crawl-
semantics operators (hashing, robots, winner selection, the end-to-end
crawl) are not SQL-expressible; they get rows-only checks here and full
reference-semantics oracle equality in tests/test_crawl_e2e.py.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import numpy as np
import pandas as pd



def entry() -> Any:
    """Flagship: deterministic crawl of the synthetic web (politeness,
    robots, URL-seen, span parsing) → the launch log."""
    import tempfile

    from open_source_search_engine_ray.pipelines.crawl import run_crawl
    from open_source_search_engine_ray.sources.synthweb import WebConfig
    from open_source_search_engine_ray.state.frontier import CrawlConfig

    out = tempfile.mkdtemp(prefix="crawl_entry_")
    res = run_crawl(
        WebConfig(n_hosts=24, n_hubs=2, hub_pages=10, max_pages=5),
        CrawlConfig(num_partitions=3, horizon_ms=300_000),
        out,
        engine="ray",
    )
    return res.launch_log.to_pandas()


# ---------------------------------------------------------------------------
# crawl-operator queries (deterministic synthetic inputs; rows-only checks)
# ---------------------------------------------------------------------------


def _crawl_web():
    from open_source_search_engine_ray.sources.synthweb import WebConfig

    return WebConfig(n_hosts=30, n_hubs=2, hub_pages=12, max_pages=6)


def _q_crawl_e2e(sf_dir: str):
    import tempfile

    from open_source_search_engine_ray.pipelines.crawl import run_crawl
    from open_source_search_engine_ray.state.frontier import CrawlConfig

    res = run_crawl(
        _crawl_web(),
        CrawlConfig(num_partitions=3, horizon_ms=400_000),
        tempfile.mkdtemp(prefix="crawl_q_"),
        engine="ray",
    )
    return res.launch_log.to_pandas()


def _q_crawl_http(sf_dir: str):
    """Real-socket crawl over a localhost fixture site (deterministic:
    no error hosts, no crawl-delay — the launched URL set and span
    counts are timing-independent)."""
    import tempfile

    import pandas as pd
    import pyarrow.dataset as pads

    from open_source_search_engine_ray.functions.urlfilter import UrlFilterRule
    from open_source_search_engine_ray.pipelines.httpcrawl import run_http_crawl
    from open_source_search_engine_ray.state.frontier import CrawlConfig
    from open_source_search_engine_ray.testing import StaticSiteServer

    sites = {
        "h1.test": {
            "/": '<html><body><a href="/a.html">a</a>'
            '<a href="http://h2.test/">x</a>R&amp;D</body></html>',
            "/a.html": "<html><body><p>alpha &lt;page&gt;</p></body></html>",
        },
        "h2.test": {
            "/": '<html><body><a href="/b.html">b</a>beta</body></html>',
            "/b.html": "<html><body>leaf</body></html>",
        },
    }
    srv = StaticSiteServer(sites).start()
    try:
        out = tempfile.mkdtemp(prefix="httpcrawl_q_")
        res = run_http_crawl(
            seeds=["http://h1.test/"],
            resolve=srv.resolve_map(),
            out_dir=out,
            cfg=CrawlConfig(
                num_partitions=2,
                horizon_ms=60_000,
                rules=(UrlFilterRule("default", 50, 30.0, 9, 7, 50),),
            ),
            n_fetchers=2,
        )
        docs = pads.dataset(res["docs_dir"], format="parquet").to_table()
        return (
            pd.DataFrame(
                {
                    "doc_id": docs["doc_id"].to_pylist(),
                    "n_spans": [len(s) for s in docs["spans"].to_pylist()],
                }
            )
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
    finally:
        srv.stop()


def _q_crawl_url_seen(sf_dir: str):
    import tempfile

    from open_source_search_engine_ray.pipelines.crawl import run_crawl
    from open_source_search_engine_ray.state.frontier import CrawlConfig

    res = run_crawl(
        _crawl_web(),
        CrawlConfig(num_partitions=3, horizon_ms=400_000),
        tempfile.mkdtemp(prefix="crawl_q_"),
        engine="ray",
    )
    return pd.DataFrame(
        {"uh48": [u for u, _ in res.url_seen], "url": [x for _, x in res.url_seen]}
    )


def _q_canonicalize(sf_dir: str):
    """Canonicalization over every outlink in the synthetic corpus."""
    from open_source_search_engine_ray.functions.urlnorm import canonicalize
    from open_source_search_engine_ray.sources.synthweb import SynthWeb

    web = SynthWeb(_crawl_web())
    rows = []
    for i, p in web.iter_pages():
        base = web.page_url(i, p)
        for s in web.page_spans(i, p):
            if s["kind"] == "link":
                rows.append((s["media_ref"], base, canonicalize(s["media_ref"], base) or ""))
    return pd.DataFrame(rows, columns=["raw", "base", "canonical"])


#: constructed URL forms for the canonicalization expectation oracle —
#: index = key % 12; each pair is (raw-template, expected-canonical-
#: template) with {} for the key digits.  Covers: scheme/host lowercase,
#: default-port strip, fragment strip, validator-gated session params
#: (PHPSESSID stripped, short s=5 KEPT per the reference validator),
#: tracking params, ;jsessionid path params, whitespace truncation,
#: http://http:// collapse, bare-host trailing slash, and the reference's
#: DELIBERATE non-collapse of dot-segments (Url.cpp keeps them).
_CANON_FORMS = [
    ("HTTP://WWW.H{}.TEST/Path/", "http://www.h{}.test/Path/"),
    ("http://h{}.test:80/a.html", "http://h{}.test/a.html"),
    ("https://h{}.test:443/a.html", "https://h{}.test/a.html"),
    ("http://h{}.test/a.html#frag", "http://h{}.test/a.html"),
    ("http://h{}.test/a.html?PHPSESSID=abc123def456&x=1",
     "http://h{}.test/a.html?x=1"),
    ("http://h{}.test/a.html?utm_source=foo&x=1",
     "http://h{}.test/a.html?x=1"),
    ("http://h{}.test/a.html;jsessionid=ABCDEF1234567890ABCDEF12",
     "http://h{}.test/a.html"),
    ("  http://h{}.test/a.html  ", "http://h{}.test/a.html"),
    ("http://http://h{}.test/a.html", "http://h{}.test/a.html"),
    ("http://h{}.test", "http://h{}.test/"),
    ("http://h{}.test/a.html?s=5&x=1", "http://h{}.test/a.html?s=5&x=1"),
    ("http://h{}.test/a/../b.html", "http://h{}.test/a/../b.html"),
]


def _q_canonicalize_forms(sf_dir: str):
    """URL canonicalization over constructed forms (reference
    Url::set + stripParameters, Url.cpp:162-511), oracle-checked as an
    expectation oracle (the charset_roundtrip pattern): the engine runs
    the real canonicalize() on raw URLs built from orders keys; the SQL
    oracle states the expected canonical string per form.  The organic
    corpus-wide coverage stays in crawl_canonicalize (rows-only)."""
    import ray.data as rd

    from open_source_search_engine_ray.functions.urlnorm import canonicalize

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey"])

    def f(df: pd.DataFrame) -> pd.DataFrame:
        ks = df["o_orderkey"].astype(np.int64).tolist()
        canon = [
            canonicalize(_CANON_FORMS[k % 12][0].format(k)) or ""
            for k in ks
        ]
        return pd.DataFrame({"k": np.asarray(ks, dtype=np.int64), "canonical": canon})

    out = ds.map_batches(f, batch_format="pandas").to_pandas()
    return out.sort_values("k").reset_index(drop=True)


# crawl_country_tld fixture: ccTLD picks (index k % 8) — two misses
# ("xx" and "w3" are not in s_countryCode) plus six real codes
_CC_PICK = ["de", "fr", "uk", "jp", "br", "ru", "xx", "w3"]


def _country_url(k: int) -> str:
    """URL form templates for the guessCountryTLD kernel — hits via
    prefix-subdomain and ccTLD, misses via https offset shift, ports,
    uppercase, gTLDs, slash-less URLs (each a branch of
    LanguageIdentifier.cpp:4-31)."""
    cc = _CC_PICK[k % 8]
    c2 = _CC_PICK[(k + 3) % 8]
    f = k % 12
    if f == 0:
        return f"http://www.shop{k}.{cc}/"
    if f == 1:
        return f"http://{cc}.shop{k}.com/"
    if f == 2:
        return f"http://www.shop{k}.{cc}:8080/a"
    if f == 3:
        return f"http://www.shop{k}.com/"
    if f == 4:
        return f"https://www.shop{k}.{cc}/"
    if f == 5:
        return f"http://www.shop{k}.{cc.upper()}/"
    if f == 6:
        return f"http://shop{k}.{cc}"
    if f == 7:
        return f"http://{cc}.shop{k}.{c2}/"
    if f == 8:
        return f"http://www.shop{k}.info/"
    if f == 9:
        return f"http://x{k}.{cc}/p.html"
    if f == 10:
        return f"http://{cc}{k}.example.com/"
    return f"http://www.shop{k}.{cc}?q=1"


def _q_country_tld(sf_dir: str):
    """Country-from-URL guess (LanguageIdentifier::guessCountryTLD,
    LanguageIdentifier.cpp:4-31, over the CountryCode.cpp abbr table),
    oracle-checked: the engine runs the ported kernel on URLs built
    from orders keys; the SQL twin RECONSTRUCTS the same URLs and
    restates the C's byte-offset logic (prefix check at url[9],
    ':'-else-'/' scan from offset 7, dot-guarded two-char code) joined
    against the inlined country table."""
    import ray.data as rd

    from open_source_search_engine_ray.functions.countrycode import (
        guess_country_tld,
    )

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey"])

    def f(df: pd.DataFrame) -> pd.DataFrame:
        ks = df["o_orderkey"].astype(np.int64).tolist()
        return pd.DataFrame(
            {
                "k": np.asarray(ks, dtype=np.int64),
                "country": np.asarray(
                    [guess_country_tld(_country_url(int(k))) for k in ks],
                    dtype=np.int64,
                ),
            }
        )

    out = ds.map_batches(f, batch_format="pandas").to_pandas()
    return out.sort_values("k").reset_index(drop=True)


def _q_url_seen_dedup(sf_dir: str):
    """URL-seen state machine on the 10^10-URL scale path
    (bloom first level + deletable cuckoo authoritative level,
    state/urlseen.py; reference Spider.h:729-732 uh48 dedup +
    PageReindex force-delete/respider), oracle-checked: a key-derived
    URL stream with duplicates is fed twice with a force-delete of
    every 10th URL id in between — per id, the first key must be
    accepted exactly once in pass 1, and pass 2 must re-accept exactly
    the deleted ids (the bloom alone could never forget them; the
    cuckoo delete is what resurrects).  The outcome is deterministic
    for this fixed key set (no cuckoo fingerprint collisions — verified
    at sf0.001/0.01/0.1); the probabilistic bound is documented in
    UrlSeen."""
    import ray.data as rd

    from open_source_search_engine_ray.functions.gbhash import uh48_batch
    from open_source_search_engine_ray.state.urlseen import UrlSeen

    keys = (
        rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey"])
        .to_pandas()["o_orderkey"]
        .astype(np.int64)
        .to_numpy()
    )
    keys = np.sort(keys)
    uid = keys % 300
    urls = [f"http://h{u}.test/p{u}.html" for u in uid.tolist()]
    uh = uh48_batch(urls)
    us = UrlSeen(exact=False)
    acc1 = us.test_and_add(uh)
    del_mask = (uid % 10 == 0) & acc1  # one key per deleted id
    us.delete(uh[del_mask])
    acc2 = us.test_and_add(uh)
    df = pd.DataFrame({"uid": uid, "k": keys, "acc1": acc1, "acc2": acc2})
    out = (
        df.groupby("uid")
        .agg(
            first_k=("k", "min"),
            n_accepts=("acc1", "sum"),
        )
        .reset_index()
    )
    out["n_accepts"] = (
        out["n_accepts"].to_numpy(dtype=np.int64)
        + df.groupby("uid")["acc2"].sum().to_numpy(dtype=np.int64)
    )
    # a correct run accepts each id once in pass 1; pass-1 first_k must
    # be the id's smallest key (batch dedup keeps the FIRST occurrence)
    first_acc = df[df["acc1"]].groupby("uid")["k"].min()
    assert (first_acc == out.set_index("uid")["first_k"]).all()
    return out.sort_values("uid").reset_index(drop=True)


def _q_uh48(sf_dir: str):
    """Bit-exact hash64b/uh48 kernel (reference hash.h:59-67,
    Spider.h:729-732), oracle-checked: both sides construct URLs from
    customer keys; the oracle recomputes the Zobrist XOR fold in SQL
    against the inlined g_hashtab cells (only the position x alphabet
    cells this construction can touch — the full 256x256 table stays
    md5-pinned in tests/test_hash.py, which also covers SynthWeb and
    reference vectors)."""
    import ray.data as rd

    from open_source_search_engine_ray.functions.gbhash import uh48_batch

    ds = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey"])

    def f(df: pd.DataFrame) -> pd.DataFrame:
        urls = [
            f"http://www.h{int(k)}.test/p{int(k) % 7}.html"
            for k in df["c_custkey"]
        ]
        return pd.DataFrame(
            {"url": urls, "uh48": uh48_batch(urls).astype("int64")}
        )

    out = ds.map_batches(f, batch_format="pandas").to_pandas()
    return out.sort_values("url").reset_index(drop=True)


def _q_robots(sf_dir: str):
    from open_source_search_engine_ray.functions.robots import parse_robots
    from open_source_search_engine_ray.sources.synthweb import SynthWeb

    web = SynthWeb(_crawl_web())
    rows = []
    for i in range(web.cfg.n_hosts):
        pol = parse_robots(web.robots_txt(i), "gigablastbot")
        for path in ("/", "/p1.html", "/private/p4.html", "/x.cgi", "/x.cgi?q=1"):
            rows.append((web.hosts[i], path, pol.is_allowed(path), pol.crawl_delay_ms))
    return pd.DataFrame(rows, columns=["host", "path", "allowed", "crawl_delay_ms"])


#: the crawl_urlfilter rule table: 8 extended-predicate rules on top of
#: the reference "web" profile — shared by the engine query and the SQL
#: oracle generator so parameters can't drift
def _urlfilter_rules():
    from open_source_search_engine_ray.functions.urlfilter import (
        UrlFilterRule as R,
        default_web_rules,
    )

    return [
        R("isroot && isnew", 81, 7),
        R("isrssext", 78, 1),
        R("ispermalinkformat && isnew", 76, 7),
        R("tag:shallow && sitepages>=10", 30, 40, 0),
        R("spiderwaited>=3600", 66, 1),
        R("percentchangedperday>=10.0", 64, 1),
        R("urlage>=86400", 62, 7),
        R("domainpages>=50", 44, 30),
    ] + default_web_rules()


def _q_urlfilter(sf_dir: str):
    """Filter-DSL first-match assignment (reference getUrlFilterNum,
    Spider.cpp:2471-3700) over candidates derived from orders keys,
    exercising the full predicate set — oracle-checked: the SQL oracle
    rebuilds the same candidate table from the same key arithmetic and
    restates the 27-rule cascade as one CASE expression, including the
    reply gates (`if (!srep) continue`, Spider.cpp:2614-2657: errorcount/
    spiderwaited/percentchangedperday/hastmperror never match without a
    reply) and the isnew <=> !hasreply inversion.  The URL-shape flags
    (isroot/isrssext/ispermalinkformat) are computed by the real
    classifiers on the engine side but by the construction pattern on
    the oracle side, so a classifier regression on these forms
    hash-fails."""
    import ray.data as rd

    from open_source_search_engine_ray.functions.urlfilter import (
        ERR_HTTP_404,
        ERR_TCP_TIMEOUT,
        FilterProgram,
        candidate_columns,
        url_is_permalink_format,
        url_is_root,
        url_is_rssext,
    )

    prog = FilterProgram(_urlfilter_rules())
    k = (
        rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey"])
        .to_pandas()["o_orderkey"]
        .astype(np.int64)
        .to_numpy()
    )
    n = k.size
    c = candidate_columns(n)
    urls = []
    for kk in k.tolist():
        r = kk % 7
        if r == 0:
            urls.append(f"http://www.h{kk}.test/")
        elif r == 1:
            urls.append(f"http://h{kk}.test/feed.rss")
        elif r == 2:
            urls.append(f"http://h{kk}.test/2020/11/long-post-title-{kk}.html")
        else:
            urls.append(f"http://h{kk}.test/x.html")
    c["uh48"][:] = k
    c["url"][:] = urls
    c["is_root"][:] = [url_is_root(u) for u in urls]
    c["is_rssext"][:] = [url_is_rssext(u) for u in urls]
    c["is_permalink_format"][:] = [url_is_permalink_format(u) for u in urls]
    c["tld"][:] = "test"
    c["lang"][:] = "en"
    c["hop_count"][:] = (k // 7) % 5
    c["is_www"][:] = (k % 3) == 0
    c["in_sitelist"][:] = (k % 23) != 0
    had = (k % 4) == 0
    c["had_reply"][:] = had
    c["err_count"][:] = np.where(k % 17 == 0, 3, np.where(k % 17 == 1, 1, 0))
    c["err_code"][:] = np.where(
        c["err_count"] > 0, np.where(k % 2 == 0, ERR_TCP_TIMEOUT, ERR_HTTP_404), 0
    )
    c["spidered_time"][:] = np.where(had, 1000, 0)
    c["spiderwaited"][:] = np.where(had, (k * 13) % 7200, 0)
    c["percentchangedperday"][:] = np.where(k % 5 == 0, 15.0, 0.0)
    c["url_age"][:] = (k * 7919) % 200_000
    c["sitepages"][:] = k % 20
    c["domainpages"][:] = (k * 3) % 80
    c["num_inlinks"][:] = k % 11
    c["site_tag"][:] = np.where(k % 6 == 0, "shallow", "")
    c["is_addurl"][:] = (k % 29) == 0
    c["is_injecting"][:] = (k % 31) == 0
    c["is_reindex"][:] = (k % 37) == 0
    c["is_manualadd"][:] = c["is_addurl"] | c["is_injecting"]
    ufn = prog.assign(c)
    return (
        pd.DataFrame(
            {
                "url": c["url"],
                "rule_index": ufn.astype(np.int64),
                "priority": prog.priority[ufn].astype(np.int64),
                "force_delete": prog.force_delete[ufn].astype(np.int64),
            }
        )
        .sort_values("url")
        .reset_index(drop=True)
    )


def _q_winner_selection(sf_dir: str):
    """Per-IP winner-tree top-K (reference scanListForWinners +
    makeWinnerTreeKey, SpiderColl.cpp:3107-3292 / Spider.cpp:985-1013),
    oracle-checked: candidates are derived from orders keys with unique
    uh48s and pairwise-distinct spider times, all overdue — under that
    construction the sequential winner-tree maintenance (insert + evict
    vs the current tail) provably equals per-IP top-K by the winner key
    (255-priority, hopcount, spidertime, uh48), which the SQL oracle
    recomputes with one window function.  The order-dependent paths the
    construction avoids (same-uh48 merge, overdue-flattened eviction
    against mixed due times) are pinned by tests/test_schedule.py unit
    vectors."""
    import ray.data as rd

    from open_source_search_engine_ray.functions.schedule import Req, select_winners

    keys = (
        rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey"])
        .to_pandas()["o_orderkey"]
        .astype(np.int64)
        .to_numpy()
    )
    by_ip: dict[int, list] = {}
    for k in keys.tolist():
        r = Req(
            url=f"http://h{k}.test/x.html",
            uh48=k,
            first_ip=k % 7,
            host=f"h{k}.test",
            dom_hash32=1,
            site_hash32=1,
            hop_count=(k // 7) % 5,
            added_time=100,
        )
        by_ip.setdefault(k % 7, []).append((r, k % 64, 1000 + k))
    rows = []
    for ip in sorted(by_ip):
        cands = sorted(by_ip[ip], key=lambda c: c[0].uh48)
        out = select_winners(cands, now_ms=10_000_000_000, max_winners=16)
        for rank, e in enumerate(out):
            rows.append((ip, rank, e.req.uh48, e.priority, e.spider_time_ms))
    return pd.DataFrame(
        rows, columns=["ip", "win_rank", "uh48", "priority", "spider_time_ms"]
    )


def _q_frontier_dedup(sf_dir: str):
    """Merge-time spiderdb dedup (reference dedupSpiderdbList,
    Spider.cpp:3714-4021), oracle-checked: the mixed request/reply list
    is derived from orders keys with pairwise-distinct reply times and
    distinct added times per (uh48, srh) request group, so every keep
    decision is scan-order-independent and the SQL oracle can restate
    the rules as window functions — newest reply per uh48; lowest
    (hopcount, addedtime) per (uh48, flag-salted site hash); reindex /
    fake-first-ip requests dropped when superseded by a newer reply.
    Scan-order tie-breaking is pinned by tests/test_schedule.py."""
    import ray.data as rd

    from open_source_search_engine_ray.functions.schedule import Rep, Req, dedup_frontier

    keys = (
        rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey"])
        .to_pandas()["o_orderkey"]
        .astype(np.int64)
        .to_numpy()
    )
    recs = []
    for k in keys.tolist():
        uh = k % 211
        if k % 5 == 0:
            recs.append(
                Rep(uh48=uh, spidered_time=10_000 + k, err_code=0,
                    err_count=0, http_status=200, crawl_delay_ms=-1)
            )
        else:
            recs.append(
                Req(url=f"http://h.test/p{k}.html", uh48=uh, first_ip=1,
                    host="h.test", dom_hash32=1,
                    site_hash32=1 + (k % 3),
                    hop_count=(k // 211) % 4,
                    added_time=k,
                    is_reindex=(k % 7 == 0),
                    fake_first_ip=(k % 11 == 0),
                    is_injecting=(k % 13 == 0))
            )
    recs.sort(
        key=lambda r: (
            r.uh48,
            isinstance(r, Req),
            r.added_time if isinstance(r, Req) else r.spidered_time,
        )
    )
    out = dedup_frontier(recs)
    rows = []
    for r in out:
        if isinstance(r, Req):
            rows.append((r.uh48, "request", r.srh(), r.hop_count, r.added_time))
        else:
            rows.append((r.uh48, "reply", -1, -1, r.spidered_time))
    df = pd.DataFrame(rows, columns=["uh48", "rec", "srh", "hop_count", "t"])
    return df.sort_values(["uh48", "rec", "srh", "t"]).reset_index(drop=True)


def _q_span_parse(sf_dir: str):
    """HTML→span round trip over the corpus (the input_hint invariant)."""
    from open_source_search_engine_ray.sources.synthweb import (
        SynthWeb,
        parse_html,
        render_html,
    )

    web = SynthWeb(_crawl_web())
    rows = []
    for i, p in web.iter_pages():
        spans = web.page_spans(i, p)
        rt = parse_html(render_html(spans))
        rows.append((web.page_url(i, p), len(spans), rt == spans))
    return pd.DataFrame(rows, columns=["doc_id", "n_spans", "roundtrip_ok"])


def _q_charset_roundtrip(sf_dir: str):
    """Charset→UTF-8 over document texts re-encoded in rotating
    charsets with meta declarations (XmlDoc.cpp:10311-10678 subset);
    verifies decoded text equality row by row."""
    import ray.data as rd

    from open_source_search_engine_ray.functions.charset import decode_batch

    charsets = ["utf-8", "iso-8859-1", "shift_jis", "utf-16-le"]
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def encode(df: pd.DataFrame) -> pd.DataFrame:
        import codecs

        bodies, cts, css = [], [], []
        for i, t in zip(df["doc_id"], df["text"]):
            cs = charsets[int(i) % len(charsets)]
            prefix = f'<meta charset="{cs}">' if cs != "utf-16-le" else ""
            raw = (prefix + t).encode(cs, errors="replace")
            if cs == "utf-16-le":
                raw = codecs.BOM_UTF16_LE + raw
            bodies.append(raw)
            cts.append("text/html")
            css.append(cs)
        return pd.DataFrame(
            {"doc_id": df["doc_id"], "text": df["text"], "body": bodies,
             "content_type": cts, "charset_true": css}
        )

    import pyarrow as pa

    def decode(t: pa.Table) -> pa.Table:
        out = decode_batch(t)
        texts = out["text"].to_pylist()
        html = out["html"].to_pylist()
        ok = [h.split(">", 1)[-1] == x if "<meta" in h else h == x
              for h, x in zip(html, texts)]
        return pa.table(
            {
                "doc_id": out["doc_id"],
                "charset_true": out["charset_true"],
                "charset_detected": out["charset"],
                "roundtrip_ok": pa.array(ok, pa.bool_()),
            }
        )

    out = (
        ds.map_batches(encode, batch_format="pandas")
        .map_batches(decode, batch_format="pyarrow")
        .to_pandas()
    )
    return out.sort_values("doc_id").reset_index(drop=True)


def _q_multicoll(sf_dir: str):
    """Round-robin multi-collection crawl (SpiderLoop collection
    rotation): three policies over one web; combined launch log."""
    import tempfile

    from open_source_search_engine_ray.pipelines.crawl import run_multi_crawl
    from open_source_search_engine_ray.sources.synthweb import SynthWeb
    from open_source_search_engine_ray.state.frontier import CrawlConfig

    web_cfg = _crawl_web()
    full = tuple(SynthWeb(web_cfg).site_list())
    colls = {
        "web": CrawlConfig(num_partitions=2, horizon_ms=400_000, site_list=full),
        "shallow": CrawlConfig(
            num_partitions=2,
            horizon_ms=400_000,
            site_list=tuple("tag:shallow " + d for d in full),
            profile="shallow",
        ),
    }
    res = run_multi_crawl(web_cfg, colls, tempfile.mkdtemp(prefix="crawl_mc_"), engine="ray")
    frames = []
    for name, r in res.items():
        df = r.launch_log.to_pandas()
        df.insert(0, "coll", name)
        frames.append(df)
    out = pd.concat(frames, ignore_index=True)
    return out.sort_values(["coll", "wave", "part_id", "seq"]).reset_index(drop=True)


def _bmp_fixture():
    """Deterministic 24bpp BMP payloads for the decoder oracle: sizes
    and pixel values derived from the index so the oracle generator can
    inline the exact bytes as hex."""
    import numpy as np

    from open_source_search_engine_ray.pipelines.media import encode_bmp

    out = []
    for k in range(16):
        w, h = 3 + k % 5, 2 + k % 4
        y, x, c = np.ogrid[0:h, 0:w, 0:3]
        rgb = ((k * 31 + y * 17 + x * 7 + c * 3) % 256).astype(np.uint8)
        out.append((f"bmp{k:02d}", encode_bmp(rgb)))
    return out


def _q_media_bmp_decode(sf_dir: str):
    """Real BMP decode over an actor-pool stage, oracle-checked: the
    engine runs the production decoder (pipelines/media.decode_bmp —
    the same kernel MediaFeatureStage uses) in map_batches and emits
    header dims + exact per-channel pixel sums; the oracle re-reads the
    SAME payload bytes (inlined as hex) entirely in SQL — little-endian
    header fields, bottom-up padded-row walk, BGR→RGB channel map."""
    import ray.data as rd

    from open_source_search_engine_ray.pipelines.media import decode_bmp

    fix = _bmp_fixture()
    ds = rd.from_items(
        [{"media_id": mid, "payload": data} for mid, data in fix]
    )

    def decode(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for mid, payload in zip(df["media_id"], df["payload"]):
            img = decode_bmp(bytes(payload))
            h, w, _ = img.shape
            s = img.reshape(-1, 3).sum(axis=0, dtype=np.int64)
            rows.append((mid, w, h, int(s[0]), int(s[1]), int(s[2])))
        return pd.DataFrame(
            rows,
            columns=["media_id", "width", "height", "sum_r", "sum_g", "sum_b"],
        )

    out = ds.map_batches(decode, batch_format="pandas").to_pandas()
    for c in ("width", "height", "sum_r", "sum_g", "sum_b"):
        out[c] = out[c].astype("int64")
    return out.sort_values("media_id").reset_index(drop=True)


def _png_fixture():
    """Deterministic PNG payloads for the decoder oracle: 8-bit RGB,
    per-row filters cycling {0 None, 1 Sub} (the two the SQL restates —
    Sub is a per-channel prefix sum mod 256), zlib stream as ONE STORED
    deflate block so the raw scanline bytes sit at a fixed offset (48 =
    8 sig + 25 IHDR + 8 IDAT len/type + 2 zlib hdr + 5 stored-block
    hdr).  Up/Average/Paeth + compressed streams are covered by the
    pytest roundtrip suite (tests/test_media.py)."""
    import numpy as np

    from open_source_search_engine_ray.pipelines.media import encode_png

    out = []
    for k in range(16):
        w, h = 3 + k % 5, 2 + k % 4
        y, x, c = np.ogrid[0:h, 0:w, 0:3]
        rgb = ((k * 37 + y * 19 + x * 11 + c * 5) % 256).astype(np.uint8)
        out.append(
            (
                f"png{k:02d}",
                encode_png(rgb, filters=[r % 2 for r in range(h)], stored=True),
            )
        )
    return out


def _q_media_png_decode(sf_dir: str):
    """Real PNG decode over map_batches, oracle-checked like
    media_bmp_decode: the engine runs the production decoder
    (pipelines/media.decode_png — zlib inflate + scanline defilter, the
    same kernel MediaDecodeStage dispatches on the PNG signature) and
    emits header dims + exact per-channel pixel sums; the oracle
    re-reads the SAME payload bytes entirely in SQL — big-endian IHDR
    fields, stored-deflate block layout, None/Sub defilter as a
    windowed prefix sum mod 256."""
    import ray.data as rd

    from open_source_search_engine_ray.pipelines.media import decode_png

    fix = _png_fixture()
    ds = rd.from_items(
        [{"media_id": mid, "payload": data} for mid, data in fix]
    )

    def decode(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for mid, payload in zip(df["media_id"], df["payload"]):
            img = decode_png(bytes(payload))
            h, w, _ = img.shape
            s = img.reshape(-1, 3).sum(axis=0, dtype=np.int64)
            rows.append((mid, w, h, int(s[0]), int(s[1]), int(s[2])))
        return pd.DataFrame(
            rows,
            columns=["media_id", "width", "height", "sum_r", "sum_g", "sum_b"],
        )

    out = ds.map_batches(decode, batch_format="pandas").to_pandas()
    for c in ("width", "height", "sum_r", "sum_g", "sum_b"):
        out[c] = out[c].astype("int64")
    return out.sort_values("media_id").reset_index(drop=True)


def _wav_fixture():
    """Deterministic RIFF/WAVE PCM16 payloads for the decoder oracle."""
    import numpy as np

    from open_source_search_engine_ray.pipelines.media import encode_wav

    out = []
    for k in range(16):
        n = 5 + k % 7
        s = (((k * 9901 + np.arange(n) * 7919) % 65536) - 32768).astype(
            np.int16
        )
        out.append((f"wav{k:02d}", encode_wav(s, rate=8000 + 1000 * (k % 3))))
    return out


def _q_media_wav_decode(sf_dir: str):
    """Real WAV decode oracle-checked like media_bmp_decode: the
    production decoder (pipelines/media.decode_wav) runs in map_batches
    and emits sample rate, count, and exact int sums/extrema; the
    oracle re-reads the canonical RIFF layout (fmt rate at byte 24,
    data length at 40, LE-signed int16 samples from 44) from the
    inlined hex bytes in SQL."""
    import ray.data as rd

    from open_source_search_engine_ray.pipelines.media import decode_wav

    ds = rd.from_items(
        [{"media_id": mid, "payload": data} for mid, data in _wav_fixture()]
    )

    def decode(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for mid, payload in zip(df["media_id"], df["payload"]):
            s, rate = decode_wav(bytes(payload))
            rows.append(
                (mid, rate, len(s), int(s.sum(dtype=np.int64)),
                 int(s.min()), int(s.max()))
            )
        return pd.DataFrame(
            rows,
            columns=["media_id", "rate", "n_samples", "sum_s", "min_s", "max_s"],
        )

    out = ds.map_batches(decode, batch_format="pandas").to_pandas()
    for c in ("rate", "n_samples", "sum_s", "min_s", "max_s"):
        out[c] = out[c].astype("int64")
    return out.sort_values("media_id").reset_index(drop=True)




# media_jpeg_decode fixture parameters — chosen boundary-safe: no
# (value, quality) pair lands within 1e-6 of a .5 quantization or
# rounding boundary, where the FDCT's ~1e-13 float error (not the
# JPEG math) would decide the result.  Pinned by
# tests/test_media_jpeg.py::test_dc_only_closed_form's formula and
# re-validated by tests/test_oracle_parity.py.
_JPEG_SOLID = [  # (media_id, r, g, b, quality, subsample, w, h)
    ("jpg00", 10, 200, 60, 85, "444", 24, 16),
    ("jpg01", 255, 0, 0, 85, "444", 17, 9),
    ("jpg02", 3, 7, 250, 85, "444", 40, 32),
    ("jpg03", 120, 130, 140, 50, "444", 16, 16),
    ("jpg04", 90, 45, 180, 95, "444", 8, 24),
    ("jpg05", 10, 200, 60, 85, "420", 24, 16),
    ("jpg06", 200, 100, 55, 85, "420", 17, 9),
    ("jpg07", 33, 66, 99, 95, "420", 32, 8),
]
_JPEG_GRAY = [  # (media_id, v, quality, w, h)
    ("jpg08", 91, 85, 24, 16),
    ("jpg09", 203, 95, 16, 8),
    ("jpg10", 128, 50, 9, 7),
]
_JPEG_TILED = [  # (media_id, a, step, quality, w, h, restart_interval)
    ("jpg11", 25, 13, 85, 32, 24, 0),
    ("jpg12", 61, 28, 50, 40, 16, 3),
    ("jpg13", 7, 41, 95, 16, 16, 1),
    ("jpg14", 100, 57, 85, 48, 8, 2),
    ("jpg15", 11, 4, 50, 24, 24, 0),
]


def _jpeg_fixture():
    """Deterministic baseline-JPEG payloads: solid RGB (4:4:4 and
    4:2:0 — DC-only in every plane), solid gray, and per-8x8-tile gray
    ramps (nonzero DC differentials + restart-marker resync).  Tile t
    (raster order) holds value (a + step*t) % 206 + 25."""
    import numpy as np

    from open_source_search_engine_ray.pipelines.media_jpeg import encode_jpeg

    out = []
    for mid, r, g, b, q, ss, w, h in _JPEG_SOLID:
        img = np.full((h, w, 3), [r, g, b], np.uint8)
        out.append((mid, encode_jpeg(img, q, subsample=ss)))
    for mid, v, q, w, h in _JPEG_GRAY:
        out.append((mid, encode_jpeg(np.full((h, w), v, np.uint8), q)))
    for mid, a, step, q, w, h, ri in _JPEG_TILED:
        img = np.zeros((h, w), np.uint8)
        tw = w // 8
        for t in range(tw * (h // 8)):
            v = (a + step * t) % 206 + 25
            img[(t // tw) * 8 : (t // tw + 1) * 8,
                (t % tw) * 8 : (t % tw + 1) * 8] = v
        out.append((mid, encode_jpeg(img, q, restart_interval=ri)))
    return out


def _q_media_jpeg_decode(sf_dir: str):
    """Real baseline-JPEG decode over map_batches, oracle-checked with
    a CLOSED-FORM twin: the engine runs the production decoder
    (pipelines/media_jpeg.decode_jpeg — full Huffman entropy decode,
    RSTn resync, dequantize, IDCT, chroma upsample, YCbCr→RGB — the
    same kernel MediaDecodeStage dispatches on FFD8) over real
    compressed bitstreams; the oracle recomputes the expected pixels in
    SQL from the CONSTRUCTION PARAMETERS only (IJG quality scaling →
    q00, DC quantization round-half-away, BT.601 color math,
    round-half-even), never seeing the payload bytes.  The fixture is
    DC-exact (solid planes / solid 8x8 tiles) so the prediction is
    exact: any Huffman/bitstream/IDCT defect changes the sums.
    Byte-level SQL re-reading (the BMP/PNG/WAV oracle shape) is not
    feasible for JPEG — Huffman decode is inherently sequential."""
    import ray.data as rd

    from open_source_search_engine_ray.pipelines.media_jpeg import decode_jpeg

    ds = rd.from_items(
        [{"media_id": mid, "payload": data} for mid, data in _jpeg_fixture()]
    )

    def decode(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for mid, payload in zip(df["media_id"], df["payload"]):
            img = decode_jpeg(bytes(payload))
            if img.ndim == 2:  # gray: r=g=b
                h, w = img.shape
                t = int(img.sum(dtype=np.int64))
                rows.append((mid, w, h, t, t, t))
            else:
                h, w, _ = img.shape
                sm = img.reshape(-1, 3).sum(axis=0, dtype=np.int64)
                rows.append((mid, w, h, int(sm[0]), int(sm[1]), int(sm[2])))
        return pd.DataFrame(
            rows,
            columns=["media_id", "width", "height", "sum_r", "sum_g", "sum_b"],
        )

    out = ds.map_batches(decode, batch_format="pandas").to_pandas()
    for c in ("width", "height", "sum_r", "sum_g", "sum_b"):
        out[c] = out[c].astype("int64")
    return out.sort_values("media_id").reset_index(drop=True)




# media_gif_decode fixture: formulaic palettes + index patterns so the
# SQL twin can enumerate every pixel from the parameters alone
# (lossless codec ⇒ exact prediction). palette[i] = ((pr+i*dr)%256,
# (pg+i*dg)%256, (pb+i*db)%256); index(x,y) = (a + bx*x + cy*y) % ncol;
# frame f>0 uses a+17*f (never decoded — only counted).
_GIF_PARAMS = [
    # (media_id, w, h, ncol, a, bx, cy, pr,pg,pb, dr,dg,db, interlace, nf)
    ("gif00", 24, 16, 7, 3, 5, 11, 10, 200, 60, 31, 17, 53, 0, 1),
    ("gif01", 17, 9, 4, 1, 2, 3, 250, 3, 7, 13, 101, 41, 0, 1),
    ("gif02", 31, 23, 16, 9, 7, 13, 0, 128, 255, 19, 23, 29, 1, 1),
    ("gif03", 8, 8, 2, 0, 1, 1, 255, 255, 255, 201, 201, 201, 0, 1),
    ("gif04", 40, 32, 250, 5, 3, 7, 50, 100, 150, 3, 5, 7, 0, 1),
    ("gif05", 12, 14, 5, 2, 4, 9, 77, 88, 99, 91, 73, 57, 1, 1),
    ("gif06", 20, 20, 7, 3, 5, 11, 10, 200, 60, 31, 17, 53, 0, 4),
    ("gif07", 16, 8, 16, 11, 13, 5, 210, 30, 120, 37, 43, 47, 0, 7),
    ("gif08", 9, 27, 3, 1, 1, 2, 5, 250, 125, 83, 89, 97, 1, 2),
    ("gif09", 64, 48, 256, 7, 11, 29, 0, 1, 2, 1, 1, 1, 0, 1),
    ("gif10", 33, 21, 11, 6, 8, 14, 100, 50, 25, 11, 7, 3, 1, 3),
    ("gif11", 5, 5, 2, 1, 0, 0, 0, 0, 0, 255, 254, 253, 0, 1),
]


def _gif_fixture():
    import numpy as np

    from open_source_search_engine_ray.pipelines.media_gif import encode_gif

    out = []
    for mid, w, h, ncol, a, bx, cy, pr, pg, pb, dr, dg, db, il, nf in _GIF_PARAMS:
        i = np.arange(ncol, dtype=np.int64)
        pal = np.stack(
            [(pr + i * dr) % 256, (pg + i * dg) % 256, (pb + i * db) % 256],
            axis=-1,
        ).astype(np.uint8)
        y, x = np.mgrid[0:h, 0:w]
        frames = [
            ((a + 17 * f + bx * x + cy * y) % ncol).astype(np.uint8)
            for f in range(nf)
        ]
        out.append((mid, encode_gif(frames, pal, interlace=bool(il))))
    return out


def _q_media_gif_decode(sf_dir: str):
    """Real GIF decode over map_batches, oracle-checked: the engine
    runs the production decoder (pipelines/media_gif.decode_gif — the
    full structure walk + variable-width LZW + interlace reorder, the
    same kernel MediaDecodeStage dispatches on the GIF signature) over
    real LZW streams; the SQL twin enumerates every first-frame pixel
    from the construction parameters (palette/index formulas) — the
    codec is lossless, so the prediction is exact and any LZW/
    interlace/palette defect changes the sums.  n_frames pins the
    multi-frame stream scan."""
    import ray.data as rd

    from open_source_search_engine_ray.pipelines.media_gif import decode_gif

    ds = rd.from_items(
        [{"media_id": mid, "payload": data} for mid, data in _gif_fixture()]
    )

    def decode(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for mid, payload in zip(df["media_id"], df["payload"]):
            img, nf = decode_gif(bytes(payload))
            h, w, _ = img.shape
            sm = img.reshape(-1, 3).sum(axis=0, dtype=np.int64)
            rows.append((mid, w, h, nf, int(sm[0]), int(sm[1]), int(sm[2])))
        return pd.DataFrame(
            rows,
            columns=[
                "media_id", "width", "height", "n_frames",
                "sum_r", "sum_g", "sum_b",
            ],
        )

    out = ds.map_batches(decode, batch_format="pandas").to_pandas()
    for c in ("width", "height", "n_frames", "sum_r", "sum_g", "sum_b"):
        out[c] = out[c].astype("int64")
    return out.sort_values("media_id").reset_index(drop=True)


def _q_media_features(sf_dir: str):
    from open_source_search_engine_ray.pipelines.media import media_features

    return media_features(sf_dir)


def _fixture_log():
    """Deterministic frontier-log fixture for the wide jobs."""
    from open_source_search_engine_ray.functions.schedule import Rep, Req
    from open_source_search_engine_ray.pipelines.compact import frontier_records_table

    rng = np.random.Generator(np.random.PCG64(17))
    reqs, reps = [], []
    for i in range(800):
        uh = int(rng.integers(1, 200))
        reqs.append(
            Req(url=f"http://h{uh % 13}.test/p{uh}.html", uh48=uh, first_ip=500 + uh % 13,
                host=f"h{uh % 13}.test", dom_hash32=uh % 13, site_hash32=int(rng.integers(1, 4)),
                hop_count=int(rng.integers(0, 5)), added_time=int(rng.integers(1, 900)))
        )
        if rng.random() < 0.25:
            reps.append(
                Rep(uh48=uh, spidered_time=int(rng.integers(1, 800)), err_code=0,
                    err_count=0, http_status=200, crawl_delay_ms=-1)
            )
    return frontier_records_table(reqs, reps)


def _q_compact_frontier(sf_dir: str):
    """Wide frontier-log compaction (dedupSpiderdbList as a shuffle)."""
    import ray.data as rd

    from open_source_search_engine_ray.pipelines.compact import compact_frontier

    out = compact_frontier(rd.from_arrow(_fixture_log())).to_pandas()
    return out[["rec", "uh48", "hop_count", "added_time", "spidered_time"]].sort_values(
        ["uh48", "rec", "hop_count", "added_time"]
    ).reset_index(drop=True)


def _fixture_log_unique():
    """Order-independence construction for the cold-start oracle (the
    crawl_winner_selection trick applied to the full-log scan): one srh
    per uh48 (constant site_hash32) so admission dedup leaves exactly
    one row per uh48 and the winner scan takes the vectorized fast path
    — per-IP top-K by winner key (priority desc, hop, spider time,
    uh48), which one SQL window restates.  Duplicate uh48 rows with
    different (hop, added) still exercise the merge dedup; uh%5==0 rows
    get a reply, whose 7-day respider gate excludes them from winners.
    """
    from open_source_search_engine_ray.functions.schedule import Rep, Req
    from open_source_search_engine_ray.pipelines.compact import (
        frontier_records_table,
    )

    reqs, reps = [], []
    for i in range(400):
        uh = 1 + i % 200
        reqs.append(
            Req(
                url=f"http://h{uh % 13}.test/p{uh}.html",
                uh48=uh,
                first_ip=500 + uh % 13,
                host=f"h{uh % 13}.test",
                dom_hash32=uh % 13,
                site_hash32=1,
                hop_count=(i * 7) % 5,
                added_time=1 + (i * 37) % 797,
            )
        )
        if uh % 5 == 0 and i < 200:
            reps.append(
                Rep(uh48=uh, spidered_time=100 + uh, err_code=0,
                    err_count=0, http_status=200, crawl_delay_ms=-1)
            )
    return frontier_records_table(reqs, reps)


def _q_cold_start(sf_dir: str):
    """Cold-start full-log winner scan (populateWaitingTreeFromSpiderdb,
    SpiderColl.cpp:1465): the real FrontierCore admission + urlfilter
    cascade + winner selection run per IP-hash bucket over the durable
    log; the oracle restates the whole path in SQL over the inlined
    fixture (merge dedup window → default-web-rules CASE on (hop,
    isnew) → per-IP winner window → launch at now)."""
    import ray.data as rd

    from open_source_search_engine_ray.pipelines.compact import cold_start_schedule
    from open_source_search_engine_ray.state.frontier import CrawlConfig

    cfg = CrawlConfig(
        num_partitions=4,
        site_list=tuple(f"h{i}.test" for i in range(13)),
        verify_integrity=False,
    )
    out = cold_start_schedule(
        rd.from_arrow(_fixture_log_unique()), cfg, now_ms=2_000_000
    ).to_pandas()
    out = out[["url", "uh48", "first_ip", "priority", "launch_ms"]].copy()
    for c in ("uh48", "first_ip", "priority", "launch_ms"):
        out[c] = out[c].astype("int64")
    return out.sort_values(["first_ip", "launch_ms", "uh48"]).reset_index(
        drop=True
    )


def queries() -> dict[str, Callable[[str], Any]]:
    from open_source_search_engine_ray.pipelines import media as M
    from open_source_search_engine_ray.pipelines import relational as R
    from open_source_search_engine_ray.pipelines import training as T

    return {
        # relational / SQL-checkable
        "q1_pricing_summary": R.q1_pricing_summary,
        "q3_top_orders": R.q3_top_orders,
        "q5_region_revenue": R.q5_region_revenue,
        "q6_revenue_delta": R.q6_revenue_delta,
        "q_top_customers": R.q_top_customers,
        "q_orders_by_priority": R.q_orders_by_priority,
        "q_distinct_segments": R.q_distinct_segments,
        "q_events_by_type": R.q_events_by_type,
        "q_events_daily": R.q_events_daily,
        "q_user_sessions": R.q_user_sessions,
        "q_part_type_stats": R.q_part_type_stats,
        "q_supplier_nation": R.q_supplier_nation,
        "q_asof_join": R.q_asof_join,
        "q_range_join": R.q_range_join,
        "q_window_running": R.q_window_running,
        "q_cust_without_orders": R.q_cust_without_orders,
        "q_sample": R.q_sample,
        "q_union_distinct": R.q_union_distinct,
        "q10_returned_items": R.q10_returned_items,
        "q7_volume_shipping": R.q7_volume_shipping,
        "q4_priority_checking": R.q4_priority_checking,
        "q12_priority_lines": R.q12_priority_lines,
        "q14_promo_revenue": R.q14_promo_revenue,
        "q18_large_orders": R.q18_large_orders,
        "q13_cust_order_dist": R.q13_cust_order_dist,
        "q22_global_sales_opportunity": R.q22_global_sales_opportunity,
        "q15_top_supplier": R.q15_top_supplier,
        "q17_small_quantity_revenue": R.q17_small_quantity_revenue,
        "q21_sole_returned_supplier": R.q21_sole_returned_supplier,
        "q16_supplier_variety": R.q16_supplier_variety,
        "q19_discounted_revenue": R.q19_discounted_revenue,
        "q8_market_share": R.q8_market_share,
        # training-data ops
        "dedup_exact": T.dedup_exact,
        "clean_corpus": T.clean_corpus,
        "stratified_sample": T.stratified_sample,
        "pack_documents": T.pack_documents,
        "decontaminate": T.decontaminate,
        "redact_pii": T.redact_pii,
        "token_counts": T.token_counts,
        "words_alnum_counts": T.words_alnum_counts,
        "quality_scores": T.quality_scores,
        "ann_topk": T.ann_topk,
        "ann_topk_ivf": T.ann_topk_ivf,
        "minhash_lsh_dedup": T.minhash_planted_verify,
        "ngram_jaccard_pairs": T.ngram_jaccard_pairs,
        "dedup_groups": T.dedup_groups,
        "simhash_dedup": T.simhash_planted_verify,
        "embedding_near_dup": T.embedding_planted_verify,
        "lang_id": T.lang_id_pred,
        "doc_fingerprints": T.doc_fingerprints,
        "adult_flags": T.adult_flags,
        "charset_roundtrip": _q_charset_roundtrip,
        "assign_docids": T.assign_docids,
        "media_features": _q_media_features,
        "media_bmp_decode": _q_media_bmp_decode,
        "media_png_decode": _q_media_png_decode,
        "media_wav_decode": _q_media_wav_decode,
        "media_jpeg_decode": _q_media_jpeg_decode,
        "media_gif_decode": _q_media_gif_decode,
        "media_caption_pairs": M.media_caption_pairs,
        # crawl operators (reference-semantics; stateful-streaming ones
        # are rows-only here with oracle equality in
        # tests/test_crawl_e2e.py; the pure kernels — uh48, urlfilter,
        # winner selection, spiderdb dedup — are SQL-checked)
        "crawl_e2e": _q_crawl_e2e,
        "crawl_http": _q_crawl_http,
        "crawl_url_seen": _q_crawl_url_seen,
        "crawl_canonicalize": _q_canonicalize,
        "crawl_canonicalize_forms": _q_canonicalize_forms,
        "crawl_country_tld": _q_country_tld,
        "crawl_url_seen_dedup": _q_url_seen_dedup,
        "crawl_uh48": _q_uh48,
        "crawl_robots": _q_robots,
        "crawl_urlfilter": _q_urlfilter,
        "crawl_winner_selection": _q_winner_selection,
        "crawl_frontier_dedup": _q_frontier_dedup,
        "crawl_span_parse": _q_span_parse,
        "crawl_compact_frontier": _q_compact_frontier,
        "crawl_cold_start_schedule": _q_cold_start,
        "crawl_multicoll": _q_multicoll,
    }


# Full SQL restatement of the Gigablast robots.txt semantics
# (Robots.cpp:150-377, RobotRule.cpp:7-110; the 92-case unit suite
# is RobotsTest.cpp): comment strip + field:value line grammar,
# UA-group state machine (a User-agent line after group records
# starts a new group — gaps-and-islands over prev_rec/prev_ua),
# UA-specific group used exclusively over the ``*`` default,
# empty-value rules ignored, trailing-``$`` anchor, trailing-``*``
# strip on unanchored rules, ``*`` wildcards → RE2, longest-rule
# (path len + anchor) first with stable (line-order) ties, default
# allow, Crawl-delay float-seconds → truncated int ms (-1 absent).
ROBOTS_SQL_TEMPLATE = r"""
    WITH hosts(host, robots) AS (VALUES @HOSTS@),
    paths(path) AS (VALUES @PATHS@),
    lines AS (
      SELECT host, i AS ln, split[i] AS raw
      FROM (SELECT host, string_split(robots, chr(10)) AS split
            FROM hosts)
      CROSS JOIN (SELECT unnest(range(1, 64)) AS i) nums
      WHERE i <= len(split)
    ),
    parsed AS (
      SELECT host, ln,
        lower(regexp_extract(split_part(raw, '#', 1),
          '^\s*([A-Za-z][A-Za-z0-9-]*)\s*:\s*(.*?)\s*$', 1)) AS fld,
        regexp_extract(split_part(raw, '#', 1),
          '^\s*([A-Za-z][A-Za-z0-9-]*)\s*:\s*(.*?)\s*$', 2) AS val
      FROM lines
    ),
    ok AS (SELECT * FROM parsed WHERE fld <> ''),
    marks AS (
      SELECT *,
        (fld = 'user-agent') AS is_ua,
        MAX(CASE WHEN fld IN ('allow','disallow','crawl-delay')
                 THEN ln END) OVER (
          PARTITION BY host ORDER BY ln
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
        ) AS prev_rec,
        MAX(CASE WHEN fld = 'user-agent' THEN ln END) OVER (
          PARTITION BY host ORDER BY ln
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
        ) AS prev_ua
      FROM ok
    ),
    blocks AS (
      SELECT *, SUM(CASE WHEN is_ua AND (prev_ua IS NULL
                           OR COALESCE(prev_rec, 0) > prev_ua)
                         THEN 1 ELSE 0 END) OVER (
                  PARTITION BY host ORDER BY ln) AS blk
      FROM marks
    ),
    scope AS (
      SELECT host, blk,
        BOOL_OR(is_ua AND val = '*') AS in_def,
        BOOL_OR(is_ua AND val <> '*' AND val <> ''
                AND starts_with('gigablastbot', lower(val))) AS in_ua
      FROM blocks WHERE blk > 0 GROUP BY host, blk
    ),
    hostsel AS (
      SELECT host, BOOL_OR(in_ua) AS ua_found,
             BOOL_OR(in_def) AS def_found
      FROM scope GROUP BY host
    ),
    selrules AS (
      SELECT b.host, b.ln, (b.fld = 'allow') AS allow, b.val AS rawpath
      FROM blocks b
      JOIN scope s USING (host, blk)
      JOIN hostsel h USING (host)
      WHERE b.fld IN ('allow','disallow') AND b.val <> ''
        AND ((h.ua_found AND s.in_ua)
             OR (NOT h.ua_found AND h.def_found
                 AND s.in_def AND NOT s.in_ua))
    ),
    norm AS (
      SELECT host, ln, allow,
        (rawpath LIKE '%$') AS anchored,
        CASE WHEN rawpath LIKE '%$' THEN left(rawpath, len(rawpath) - 1)
             ELSE rtrim(rawpath, '*') END AS p
      FROM selrules
    ),
    typed AS (
      SELECT *, (p LIKE '%*%') AS wild,
        len(p) + CASE WHEN anchored THEN 1 ELSE 0 END AS slen,
        '^' || replace(
          regexp_replace(regexp_replace(p, '\*+', '*', 'g'),
                         '([.^$+?(){}|\[\]\\])', '\\\1', 'g'),
          '*', '.*')
        || CASE WHEN anchored THEN '$' ELSE '' END AS rx
      FROM norm
    ),
    matched AS (
      SELECT t.host, pp.path, t.allow, t.slen, t.ln
      FROM typed t CROSS JOIN paths pp
      WHERE CASE WHEN t.wild THEN regexp_matches(pp.path, t.rx)
                 WHEN t.anchored THEN pp.path = t.p
                 ELSE starts_with(pp.path, t.p) END
    ),
    winner AS (
      SELECT host, path, allow, ROW_NUMBER() OVER (
        PARTITION BY host, path ORDER BY slen DESC, ln) AS rk
      FROM matched
    ),
    cd AS (
      SELECT b.host, b.ln, TRY_CAST(b.val AS DOUBLE) AS d,
             s.in_ua, (s.in_def AND NOT s.in_ua) AS only_def
      FROM blocks b JOIN scope s USING (host, blk)
      WHERE b.fld = 'crawl-delay'
        AND TRY_CAST(b.val AS DOUBLE) IS NOT NULL
    ),
    ua_delay AS (
      SELECT host, CAST(TRUNC(d * 1000) AS BIGINT) AS ms FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY host ORDER BY ln DESC) AS rk
        FROM cd WHERE in_ua) WHERE rk = 1
    ),
    def_delay AS (
      SELECT host, CAST(TRUNC(d * 1000) AS BIGINT) AS ms FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY host ORDER BY ln DESC) AS rk
        FROM cd WHERE only_def) WHERE rk = 1
    )
    SELECT h.host, p.path,
      COALESCE(w.allow, TRUE) AS allowed,
      CASE WHEN COALESCE(hs.ua_found, FALSE) THEN COALESCE(ud.ms, -1)
           WHEN COALESCE(hs.def_found, FALSE) THEN COALESCE(dd.ms, -1)
           ELSE -1 END AS crawl_delay_ms
    FROM hosts h CROSS JOIN paths p
    LEFT JOIN (SELECT * FROM winner WHERE rk = 1) w
      ON w.host = h.host AND w.path = p.path
    LEFT JOIN hostsel hs ON hs.host = h.host
    LEFT JOIN ua_delay ud ON ud.host = h.host
    LEFT JOIN def_delay dd ON dd.host = h.host
    ORDER BY h.host, p.path
"""


def oracle_sql() -> dict[str, str]:
    from open_source_search_engine_ray.functions.adultcheck import DIRTY_NEEDLES
    from open_source_search_engine_ray.functions.textstats import STOPWORDS

    from open_source_search_engine_ray.functions.textstats import _LANG_MARKERS

    _STOP_SQL = ",".join(f"'{w}'" for w in STOPWORDS)
    _LANG_VALUES = ",".join(
        f"('{lang}', {i}, '{w}')"
        for i, (lang, words) in enumerate(_LANG_MARKERS.items())
        for w in sorted(words)
    )
    _NEEDLE_VALUES = ",".join(f"('{needle}', {w})" for needle, w in DIRTY_NEEDLES)

    # g_hashtab cells the crawl_uh48 URL construction can touch:
    # positions 0..39 x the fixed URL alphabet, as signed BIGINT
    from open_source_search_engine_ray.functions.gbhash import HASHTAB

    _UH48_ALPHA = sorted(set("http://www.h.test/p.html0123456789"))

    def _i64(v: int) -> int:
        v = int(v)
        return v - (1 << 64) if v >= (1 << 63) else v

    _HASH_CELLS = ",".join(
        f"({p},{ord(c)},{_i64(HASHTAB[p, ord(c)])})"
        for p in range(40)
        for c in _UH48_ALPHA
    )

    # crawl_urlfilter: rule parameters straight from the shared table so
    # the oracle can't drift from the engine's FilterProgram; the CASE
    # conditions below restate each rule's predicates (incl. reply
    # gates) over the same key arithmetic the engine derives its
    # candidate columns from
    from open_source_search_engine_ray.functions.urlfilter import (
        TMP_ERROR_CODES,
        FilterProgram as _FP,
    )

    _ufprog = _FP(_urlfilter_rules())
    _UF_RULES = ",".join(
        f"({i},{int(p)},{int(bool(fd))})"
        for i, (p, fd) in enumerate(zip(_ufprog.priority, _ufprog.force_delete))
    )
    _TMP = ",".join(str(x) for x in sorted(TMP_ERROR_CODES))
    _UF_CASE = " ".join(
        f"WHEN {cond} THEN {i}"
        for i, cond in enumerate(
            [
                "is_root AND NOT had",  # isroot && isnew
                "is_rssext",
                "is_permalink AND NOT had",  # ispermalinkformat && isnew
                "is_shallow AND sitepages >= 10",  # tag:shallow && sitepages>=10
                "had AND spiderwaited >= 3600",
                "had AND pcpd >= 10.0",
                "url_age >= 86400",
                "domainpages >= 50",
                "is_reindex",
                "NOT (is_addurl OR is_inject) AND NOT in_sitelist",
                f"had AND errc >= 3 AND err_code IN ({_TMP})",
                f"had AND errc >= 1 AND err_code IN ({_TMP})",
                "had AND errc >= 1",
                "is_addurl",
                "num_inlinks > 7 AND NOT had",
                "num_inlinks > 7",
                "hop = 0 AND is_www AND NOT had",
                "hop = 0 AND is_www",
                "hop = 0 AND NOT had",
                "hop = 0",
                "hop = 1 AND NOT had",
                "hop = 1",
                "hop = 2 AND NOT had",
                "hop = 2",
                "hop >= 3 AND NOT had",
                "hop >= 3",
                "TRUE",  # default
            ]
        )
    )

    # flag salts for the srh (flag-salted site hash) reconstruction in
    # crawl_frontier_dedup (Spider.cpp:3867-3880)
    _SALT_INJ, _SALT_REIDX, _SALT_FAKEIP = 0x42538909, 0x70FB3911, 0x95B8D376
    _SALT_ADDURL = 0x587C5A0B

    # crawl_compact_frontier: the shared fixture log inlined as VALUES
    # (pos = durable-log scan position); the dedupSpiderdbList rules
    # (Spider.cpp:3714-4021) are then fully restated as window
    # functions: newest-reply-wins, supersede of reindex/fake-first-ip
    # requests by a newer kept reply, min-(hop, added, pos) per
    # (uh48, flag-salted srh)
    _fx = _fixture_log().to_pydict()
    _FIX_VALUES = ",".join(
        "({},'{}',{},{},{},{},{},{},{},{},{})".format(
            i,
            _fx["rec"][i],
            _fx["uh48"][i],
            _fx["site_hash32"][i],
            int(_fx["is_injecting"][i]),
            int(_fx["is_addurl"][i]),
            int(_fx["is_reindex"][i]),
            int(_fx["fake_first_ip"][i]),
            _fx["hop_count"][i],
            _fx["added_time"][i],
            _fx["spidered_time"][i],
        )
        for i in range(len(_fx["rec"]))
    )

    # crawl_cold_start_schedule: the order-independence fixture inlined
    # as VALUES; rule priorities come from the SAME default-web
    # FilterProgram the engine runs (only the hopcount&&isnew rules are
    # reachable for never-replied, non-www, in-sitelist, flagless rows)
    _cs = _fixture_log_unique().to_pydict()
    _CS_VALUES = ",".join(
        "({},'{}',{},{},{},{},{})".format(
            i,
            _cs["rec"][i],
            _cs["uh48"][i],
            _cs["first_ip"][i],
            _cs["hop_count"][i],
            _cs["added_time"][i],
            _cs["spidered_time"][i],
        )
        for i in range(len(_cs["rec"]))
    )
    from open_source_search_engine_ray.functions.urlfilter import (
        default_web_rules as _dwr,
    )

    _dwprog = _FP(_dwr())
    _CS_RULES = ",".join(
        f"({i},{int(_dwprog.priority[i])})" for i in (10, 12, 14, 16)
    )

    # media_bmp_decode: the BMP payload bytes inlined as hex; the SQL
    # side re-reads the file format from scratch (little-endian header
    # fields, bottom-up padded rows, BGR channel order)
    _BMP_VALUES = ",".join(
        f"('{mid}','{data.hex()}')" for mid, data in _bmp_fixture()
    )
    _HEXD = ",".join(f"('{d}',{v})" for v, d in enumerate("0123456789abcdef"))
    _WAV_VALUES = ",".join(
        f"('{mid}','{data.hex()}')" for mid, data in _wav_fixture()
    )
    _PNG_VALUES = ",".join(
        f"('{mid}','{data.hex()}')" for mid, data in _png_fixture()
    )

    # media_jpeg_decode: the oracle never sees the payload bytes — it
    # recomputes the DC-exact fixture's pixels from construction params
    _JPG_SOLID_VALUES = ",".join(
        f"('{m}',{r},{g},{b},{q},{w},{h})"
        for m, r, g, b, q, ss, w, h in _JPEG_SOLID
    )
    _JPG_GRAY_VALUES = ",".join(
        f"('{m}',{v},{q},{w},{h})" for m, v, q, w, h in _JPEG_GRAY
    )
    _JPG_TILED_VALUES = ",".join(
        f"('{m}',{a},{st},{q},{w},{h})"
        for m, a, st, q, w, h, ri in _JPEG_TILED
    )

    def _sql_he(x):
        """round-half-even + clip to [0,255] of a SQL double expr —
        numpy's np.round/np.clip twin."""
        return (
            f"LEAST(255, GREATEST(0, "
            f"CASE WHEN ({x}) - FLOOR({x}) > 0.5 THEN FLOOR({x}) + 1 "
            f"WHEN ({x}) - FLOOR({x}) < 0.5 THEN FLOOR({x}) "
            f"WHEN CAST(FLOOR({x}) AS BIGINT) % 2 = 0 THEN FLOOR({x}) "
            f"ELSE FLOOR({x}) + 1 END))"
        )

    from open_source_search_engine_ray.functions.countrycode import (
        COUNTRY_CODES as _CCODES,
    )

    _CC_TABLE_VALUES = ",".join(
        f"('{c}',{i})" for i, c in enumerate(_CCODES) if i > 0
    )
    _CC_PICK_VALUES = ",".join(
        f"({i},'{c}','{c.upper()}')" for i, c in enumerate(_CC_PICK)
    )

    _GIF_VALUES = ",".join(
        "('{}',{},{},{},{},{},{},{},{},{},{},{},{},{})".format(
            m, w, h, ncol, a, bx, cy, pr, pg, pb, dr, dg, db, nf
        )
        for m, w, h, ncol, a, bx, cy, pr, pg, pb, dr, dg, db, il, nf
        in _GIF_PARAMS
    )

    def _sql_dcrec(centered, q00):
        """Decoded DC-only plane value: quantize round-half-away then
        dequantize (media_jpeg encode/decode twin), as a SQL expr."""
        d = f"8.0*({centered})"
        return (
            f"CASE WHEN {d} < 0 THEN -FLOOR(ABS(({d})/{q00}) + 0.5) "
            f"ELSE FLOOR(ABS(({d})/{q00}) + 0.5) END * {q00} / 8.0 + 128.0"
        )

    # crawl_robots: host → robots.txt body inlined as VALUES (shared
    # SynthWeb fixture input); the Robots.cpp/RobotRule.cpp parser +
    # matcher is then fully restated in SQL — see the query text
    from open_source_search_engine_ray.sources.synthweb import SynthWeb as _SW

    _rweb = _SW(_crawl_web())
    _ROBOTS_HOSTS = ",".join(
        "('{}','{}')".format(
            _rweb.hosts[i], _rweb.robots_txt(i).replace("'", "''")
        )
        for i in range(_rweb.cfg.n_hosts)
    )
    _ROBOTS_PATHS = ",".join(
        f"('{p}')" for p in ("/", "/p1.html", "/private/p4.html", "/x.cgi", "/x.cgi?q=1")
    )

    # crawl_span_parse expectation oracle (same trust structure as
    # charset_roundtrip): the generator-side span counts are fixture
    # INPUT (SynthWeb.page_spans), inlined as VALUES; the engine side
    # independently renders each page to HTML and re-parses it — the
    # oracle pins the roundtrip invariant TRUE for every page plus the
    # exact span count
    _SPAN_VALUES = ",".join(
        f"('{_rweb.page_url(i, p)}',{len(_rweb.page_spans(i, p))})"
        for i, p in _rweb.iter_pages()
    )

    # media_caption_pairs expectation oracle: the generator-side span
    # table is fixture INPUT (same trust structure as crawl_span_parse);
    # the SQL restates nearest-text-span selection as a window over the
    # media x text self-join with the tie -> preceding rule
    _CAP_VALUES = ",".join(
        "('{}',{},'{}','{}','{}')".format(
            _rweb.page_url(i, p).replace("'", "''"),
            s["offset"],
            s["kind"],
            s["text"].replace("'", "''"),
            s["media_ref"].replace("'", "''"),
        )
        for i, p in _rweb.iter_pages()
        for s in _rweb.page_spans(i, p)
    )


    return {
        "crawl_uh48": f"""
            WITH urls AS (
              SELECT 'http://www.h' || CAST(c_custkey AS VARCHAR)
                     || '.test/p' || CAST(c_custkey % 7 AS VARCHAR)
                     || '.html' AS url
              FROM customer
            ), tab(pos, byte, val) AS (VALUES {_HASH_CELLS}),
            b AS (
              SELECT url, UNNEST(range(0, length(url))) AS pos FROM urls
            ), bb AS (
              SELECT url, pos,
                     unicode(substring(url, CAST(pos AS INT) + 1, 1)) AS byte
              FROM b
            )
            SELECT bb.url,
                   bit_xor(t.val) & 281474976710655 AS uh48
            FROM bb JOIN tab t ON t.pos = bb.pos AND t.byte = bb.byte
            GROUP BY bb.url ORDER BY bb.url
        """,
        "crawl_canonicalize_forms": (
            """
            WITH k AS (
              SELECT CAST(o_orderkey AS BIGINT) AS k FROM orders
            ), c AS (
              SELECT k, CAST(k AS VARCHAR) AS s, k % 12 AS form FROM k
            )
            SELECT k, CASE form """
            + " ".join(
                "WHEN {} THEN {}".format(
                    i,
                    " || ".join(
                        x
                        for pre_post in [exp.split("{}")]
                        for x in (
                            (["'" + pre_post[0] + "'"] if pre_post[0] else [])
                            + ["s"]
                            + (["'" + pre_post[1] + "'"] if pre_post[1] else [])
                        )
                    ),
                )
                for i, (_, exp) in enumerate(_CANON_FORMS)
            )
            + """ END AS canonical
            FROM c ORDER BY k
        """
        ),
        "crawl_url_seen_dedup": """
            WITH k AS (
              SELECT CAST(o_orderkey AS BIGINT) AS k FROM orders
            )
            SELECT k % 300 AS uid, MIN(k) AS first_k,
                   CAST(CASE WHEN (k % 300) % 10 = 0 THEN 2 ELSE 1 END
                        AS BIGINT) AS n_accepts
            FROM k GROUP BY uid, (k % 300) % 10
            ORDER BY uid
        """,
        "crawl_winner_selection": """
            WITH c AS (
              SELECT CAST(o_orderkey AS BIGINT) % 7 AS ip,
                     CAST(o_orderkey AS BIGINT) AS uh48,
                     CAST(o_orderkey AS BIGINT) % 64 AS priority,
                     (CAST(o_orderkey AS BIGINT) // 7) % 5 AS hop,
                     1000 + CAST(o_orderkey AS BIGINT) AS t
              FROM orders
            ), r AS (
              SELECT *,
                     ROW_NUMBER() OVER (
                       PARTITION BY ip
                       ORDER BY 255 - priority, hop, t, uh48
                     ) AS rk
              FROM c
            )
            SELECT ip, CAST(rk - 1 AS BIGINT) AS win_rank, uh48,
                   priority, t AS spider_time_ms
            FROM r WHERE rk <= 16
            ORDER BY ip, win_rank
        """,
        "crawl_frontier_dedup": f"""
            WITH k AS (
              SELECT CAST(o_orderkey AS BIGINT) AS k FROM orders
            ), reps AS (
              SELECT k % 211 AS uh48, 10000 + k AS st FROM k WHERE k % 5 = 0
            ), best AS (
              SELECT uh48, MAX(st) AS st FROM reps GROUP BY uh48
            ), reqs AS (
              SELECT k % 211 AS uh48,
                     xor(xor(xor(1 + (k % 3),
                         CASE WHEN k % 13 = 0 THEN {_SALT_INJ} ELSE 0 END),
                         CASE WHEN k % 7 = 0 THEN {_SALT_REIDX} ELSE 0 END),
                         CASE WHEN k % 11 = 0 THEN {_SALT_FAKEIP} ELSE 0 END) AS srh,
                     (k // 211) % 4 AS hop,
                     k AS added,
                     (k % 7 = 0 OR k % 11 = 0) AS droppable
              FROM k WHERE k % 5 <> 0
            ), live AS (
              SELECT r.* FROM reqs r LEFT JOIN best b USING (uh48)
              WHERE NOT (b.st IS NOT NULL AND b.st > r.added AND r.droppable)
            ), win AS (
              SELECT uh48, srh, hop, added,
                     ROW_NUMBER() OVER (
                       PARTITION BY uh48, srh ORDER BY hop, added
                     ) AS rk
              FROM live
            )
            SELECT uh48, 'reply' AS rec, CAST(-1 AS BIGINT) AS srh,
                   CAST(-1 AS BIGINT) AS hop_count, st AS t
            FROM best
            UNION ALL
            SELECT uh48, 'request' AS rec, srh, hop AS hop_count, added AS t
            FROM win WHERE rk = 1
            ORDER BY uh48, rec, srh, t
        """,
        # the BMP file format re-read from scratch in SQL over the
        # inlined payload hex: LE header ints, (w*3+3)&~3 row padding,
        # bottom-up BGR — channel 2 of the file is red
        "media_bmp_decode": f"""
            WITH media(media_id, hex) AS (VALUES {_BMP_VALUES}),
            hexd(d, v) AS (VALUES {_HEXD}),
            bytes AS (
              SELECT m.media_id, idx.i, h1.v * 16 + h2.v AS b
              FROM media m
              CROSS JOIN (SELECT unnest(range(0, 256)) AS i) idx
              JOIN hexd h1 ON h1.d = substr(m.hex, 2 * idx.i + 1, 1)
              JOIN hexd h2 ON h2.d = substr(m.hex, 2 * idx.i + 2, 1)
              WHERE 2 * idx.i + 2 <= len(m.hex)
            ),
            hdr AS (
              SELECT media_id,
                MAX(CASE WHEN i = 10 THEN b END)
                  + 256 * MAX(CASE WHEN i = 11 THEN b END)
                  + 65536 * MAX(CASE WHEN i = 12 THEN b END)
                  + 16777216 * MAX(CASE WHEN i = 13 THEN b END) AS off,
                MAX(CASE WHEN i = 18 THEN b END)
                  + 256 * MAX(CASE WHEN i = 19 THEN b END)
                  + 65536 * MAX(CASE WHEN i = 20 THEN b END)
                  + 16777216 * MAX(CASE WHEN i = 21 THEN b END) AS w,
                MAX(CASE WHEN i = 22 THEN b END)
                  + 256 * MAX(CASE WHEN i = 23 THEN b END)
                  + 65536 * MAX(CASE WHEN i = 24 THEN b END)
                  + 16777216 * MAX(CASE WHEN i = 25 THEN b END) AS h
              FROM bytes GROUP BY media_id
            ),
            dims AS (
              SELECT *, ((w * 3 + 3) // 4) * 4 AS rowb FROM hdr
            ),
            px AS (
              SELECT b.media_id,
                     ((b.i - d.off) % d.rowb) % 3 AS ch, b.b
              FROM bytes b JOIN dims d USING (media_id)
              WHERE b.i >= d.off
                AND (b.i - d.off) % d.rowb < d.w * 3
                AND (b.i - d.off) // d.rowb < d.h
            )
            SELECT d.media_id,
                   CAST(d.w AS BIGINT) AS width,
                   CAST(d.h AS BIGINT) AS height,
                   CAST(SUM(CASE WHEN p.ch = 2 THEN p.b ELSE 0 END)
                        AS BIGINT) AS sum_r,
                   CAST(SUM(CASE WHEN p.ch = 1 THEN p.b ELSE 0 END)
                        AS BIGINT) AS sum_g,
                   CAST(SUM(CASE WHEN p.ch = 0 THEN p.b ELSE 0 END)
                        AS BIGINT) AS sum_b
            FROM dims d JOIN px p USING (media_id)
            GROUP BY d.media_id, d.w, d.h
            ORDER BY d.media_id
        """,
        # the canonical RIFF/WAVE layout re-read in SQL: fmt sample
        # rate at bytes 24-27, data length at 40-43, LE-signed int16
        # samples from byte 44
        "media_png_decode": f"""
            WITH media(media_id, hex) AS (VALUES {_PNG_VALUES}),
            hexd(d, v) AS (VALUES {_HEXD}),
            bytes AS (
              SELECT m.media_id, idx.i, h1.v * 16 + h2.v AS b
              FROM media m
              CROSS JOIN (SELECT unnest(range(0, 256)) AS i) idx
              JOIN hexd h1 ON h1.d = substr(m.hex, 2 * idx.i + 1, 1)
              JOIN hexd h2 ON h2.d = substr(m.hex, 2 * idx.i + 2, 1)
              WHERE 2 * idx.i + 2 <= len(m.hex)
            ),
            -- IHDR width/height are BIG-endian u32 at offsets 16/20
            dims AS (
              SELECT media_id,
                16777216 * MAX(CASE WHEN i = 16 THEN b END)
                  + 65536 * MAX(CASE WHEN i = 17 THEN b END)
                  + 256 * MAX(CASE WHEN i = 18 THEN b END)
                  + MAX(CASE WHEN i = 19 THEN b END) AS w,
                16777216 * MAX(CASE WHEN i = 20 THEN b END)
                  + 65536 * MAX(CASE WHEN i = 21 THEN b END)
                  + 256 * MAX(CASE WHEN i = 22 THEN b END)
                  + MAX(CASE WHEN i = 23 THEN b END) AS h
              FROM bytes GROUP BY media_id
            ),
            -- fixture contract: one STORED deflate block, raw scanline
            -- stream at byte 48; scanline r = 1 filter byte + 3w pixels
            raw AS (
              SELECT b.media_id, d.w, d.h,
                     (b.i - 48) // (3 * d.w + 1) AS r,
                     (b.i - 48) % (3 * d.w + 1) AS o, b.b
              FROM bytes b JOIN dims d USING (media_id)
              WHERE b.i >= 48 AND (b.i - 48) < d.h * (3 * d.w + 1)
            ),
            flt AS (
              SELECT media_id, r, b AS f FROM raw WHERE o = 0
            ),
            -- defilter: None passes through; Sub is a per-channel
            -- prefix sum mod 256 along the scanline
            rec AS (
              SELECT p.media_id, p.w, p.h, (p.o - 1) % 3 AS ch,
                CASE WHEN f.f = 0 THEN p.b
                     ELSE SUM(p.b) OVER (
                       PARTITION BY p.media_id, p.r, (p.o - 1) % 3
                       ORDER BY p.o) % 256
                END AS v
              FROM raw p
              JOIN flt f ON f.media_id = p.media_id AND f.r = p.r
              WHERE p.o >= 1
            )
            SELECT media_id,
                   CAST(w AS BIGINT) AS width,
                   CAST(h AS BIGINT) AS height,
                   CAST(SUM(CASE WHEN ch = 0 THEN v ELSE 0 END)
                        AS BIGINT) AS sum_r,
                   CAST(SUM(CASE WHEN ch = 1 THEN v ELSE 0 END)
                        AS BIGINT) AS sum_g,
                   CAST(SUM(CASE WHEN ch = 2 THEN v ELSE 0 END)
                        AS BIGINT) AS sum_b
            FROM rec
            GROUP BY media_id, w, h
            ORDER BY media_id
        """,
        "media_wav_decode": f"""
            WITH media(media_id, hex) AS (VALUES {_WAV_VALUES}),
            hexd(d, v) AS (VALUES {_HEXD}),
            bytes AS (
              SELECT m.media_id, idx.i, h1.v * 16 + h2.v AS b
              FROM media m
              CROSS JOIN (SELECT unnest(range(0, 128)) AS i) idx
              JOIN hexd h1 ON h1.d = substr(m.hex, 2 * idx.i + 1, 1)
              JOIN hexd h2 ON h2.d = substr(m.hex, 2 * idx.i + 2, 1)
              WHERE 2 * idx.i + 2 <= len(m.hex)
            ),
            hdr AS (
              SELECT media_id,
                MAX(CASE WHEN i = 24 THEN b END)
                  + 256 * MAX(CASE WHEN i = 25 THEN b END)
                  + 65536 * MAX(CASE WHEN i = 26 THEN b END)
                  + 16777216 * MAX(CASE WHEN i = 27 THEN b END) AS rate,
                MAX(CASE WHEN i = 40 THEN b END)
                  + 256 * MAX(CASE WHEN i = 41 THEN b END)
                  + 65536 * MAX(CASE WHEN i = 42 THEN b END)
                  + 16777216 * MAX(CASE WHEN i = 43 THEN b END) AS dlen
              FROM bytes GROUP BY media_id
            ),
            smp AS (
              SELECT lo.media_id,
                CASE WHEN lo.b + 256 * hi.b >= 32768
                     THEN lo.b + 256 * hi.b - 65536
                     ELSE lo.b + 256 * hi.b END AS s
              FROM bytes lo
              JOIN bytes hi ON hi.media_id = lo.media_id
                           AND hi.i = lo.i + 1
              JOIN hdr h ON h.media_id = lo.media_id
              WHERE lo.i >= 44 AND (lo.i - 44) % 2 = 0
                AND lo.i < 44 + h.dlen
            )
            SELECT h.media_id, CAST(h.rate AS BIGINT) AS rate,
                   CAST(COUNT(s.s) AS BIGINT) AS n_samples,
                   CAST(SUM(s.s) AS BIGINT) AS sum_s,
                   CAST(MIN(s.s) AS BIGINT) AS min_s,
                   CAST(MAX(s.s) AS BIGINT) AS max_s
            FROM hdr h JOIN smp s USING (media_id)
            GROUP BY h.media_id, h.rate
            ORDER BY h.media_id
        """,
        # closed-form JPEG expectation: IJG quality scaling -> q00,
        # BT.601 color transform, DC quantize (half-away) + dequantize,
        # half-even final rounding -- the engine decodes the real
        # Huffman bitstream and must land on exactly these sums
        "media_jpeg_decode": f"""
            WITH solid(media_id, r, g, b, q, w, h) AS
              (VALUES {_JPG_SOLID_VALUES}),
            gray(media_id, v, q, w, h) AS (VALUES {_JPG_GRAY_VALUES}),
            tiled(media_id, a, step, q, w, h) AS
              (VALUES {_JPG_TILED_VALUES}),
            sq AS (SELECT *,
              CASE WHEN q < 50 THEN 5000 // q ELSE 200 - 2*q END AS sc
              FROM solid),
            sqq AS (SELECT *,
              LEAST(GREATEST((16*sc + 50) // 100, 1), 255) AS q0l,
              LEAST(GREATEST((17*sc + 50) // 100, 1), 255) AS q0c
              FROM sq),
            sycc AS (SELECT *,
              0.299*r + 0.587*g + 0.114*b AS y,
              -0.168735892*r - 0.331264108*g + 0.5*b + 128.0 AS cb,
              0.5*r - 0.418687589*g - 0.081312411*b + 128.0 AS cr
              FROM sqq),
            sdc AS (SELECT *,
              {_sql_dcrec("y - 128.0", "q0l")} AS y2,
              {_sql_dcrec("(cb) - 128.0", "q0c")} AS cb2,
              {_sql_dcrec("(cr) - 128.0", "q0c")} AS cr2
              FROM sycc),
            srgb AS (SELECT media_id, w, h,
              y2 + 1.402*(cr2 - 128.0) AS xr,
              y2 - 0.344136286*(cb2 - 128.0)
                 - 0.714136286*(cr2 - 128.0) AS xg,
              y2 + 1.772*(cb2 - 128.0) AS xb
              FROM sdc),
            solid_out AS (SELECT media_id, w, h,
              w*h*{_sql_he("xr")} AS sum_r,
              w*h*{_sql_he("xg")} AS sum_g,
              w*h*{_sql_he("xb")} AS sum_b
              FROM srgb),
            gq AS (SELECT *,
              CASE WHEN q < 50 THEN 5000 // q ELSE 200 - 2*q END AS sc
              FROM gray),
            gqq AS (SELECT *,
              LEAST(GREATEST((16*sc + 50) // 100, 1), 255) AS q0l
              FROM gq),
            gdc AS (SELECT media_id, w, h,
              {_sql_dcrec("CAST(v AS DOUBLE) - 128.0", "q0l")} AS y2
              FROM gqq),
            gray_out AS (SELECT media_id, w, h,
              w*h*{_sql_he("y2")} AS sum_r,
              w*h*{_sql_he("y2")} AS sum_g,
              w*h*{_sql_he("y2")} AS sum_b
              FROM gdc),
            tq AS (SELECT *,
              CASE WHEN q < 50 THEN 5000 // q ELSE 200 - 2*q END AS sc
              FROM tiled),
            tqq AS (SELECT *,
              LEAST(GREATEST((16*sc + 50) // 100, 1), 255) AS q0l
              FROM tq),
            tv AS (SELECT media_id, w, h, q0l, a, step,
              unnest(range(0, (w // 8) * (h // 8))) AS t
              FROM tqq),
            tval AS (SELECT media_id, w, h, q0l,
              (a + step*t) % 206 + 25 AS v
              FROM tv),
            tdc AS (SELECT media_id, w, h,
              {_sql_dcrec("CAST(v AS DOUBLE) - 128.0", "q0l")} AS y2
              FROM tval),
            tiled_out AS (SELECT media_id, w, h,
              64*SUM({_sql_he("y2")}) AS sum_r,
              64*SUM({_sql_he("y2")}) AS sum_g,
              64*SUM({_sql_he("y2")}) AS sum_b
              FROM tdc GROUP BY media_id, w, h),
            allrows AS (
              SELECT * FROM solid_out
              UNION ALL SELECT * FROM gray_out
              UNION ALL SELECT * FROM tiled_out)
            SELECT media_id,
              CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
              CAST(sum_r AS BIGINT) AS sum_r,
              CAST(sum_g AS BIGINT) AS sum_g,
              CAST(sum_b AS BIGINT) AS sum_b
            FROM allrows ORDER BY media_id
        """,
        # guessCountryTLD restated in SQL: the URLs are rebuilt from
        # the same templates, then the C's offset-7 scan + country
        # table join reproduce the kernel byte for byte
        "crawl_country_tld": f"""
            WITH cc(abbr, idx) AS (VALUES {_CC_TABLE_VALUES}),
            pick(m, code, ucode) AS (VALUES {_CC_PICK_VALUES}),
            ks AS (SELECT CAST(o_orderkey AS BIGINT) AS k FROM orders),
            built AS (
              SELECT ks.k,
                CASE ks.k % 12
                  WHEN 0 THEN 'http://www.shop' || ks.k || '.' || p1.code || '/'
                  WHEN 1 THEN 'http://' || p1.code || '.shop' || ks.k || '.com/'
                  WHEN 2 THEN 'http://www.shop' || ks.k || '.' || p1.code || ':8080/a'
                  WHEN 3 THEN 'http://www.shop' || ks.k || '.com/'
                  WHEN 4 THEN 'https://www.shop' || ks.k || '.' || p1.code || '/'
                  WHEN 5 THEN 'http://www.shop' || ks.k || '.' || p1.ucode || '/'
                  WHEN 6 THEN 'http://shop' || ks.k || '.' || p1.code
                  WHEN 7 THEN 'http://' || p1.code || '.shop' || ks.k || '.' || p2.code || '/'
                  WHEN 8 THEN 'http://www.shop' || ks.k || '.info/'
                  WHEN 9 THEN 'http://x' || ks.k || '.' || p1.code || '/p.html'
                  WHEN 10 THEN 'http://' || p1.code || ks.k || '.example.com/'
                  ELSE 'http://www.shop' || ks.k || '.' || p1.code || '?q=1'
                END AS u
              FROM ks
              JOIN pick p1 ON p1.m = ks.k % 8
              JOIN pick p2 ON p2.m = (ks.k + 3) % 8
            ),
            scan AS (
              SELECT k, u,
                CASE WHEN length(u) > 9 AND substr(u, 10, 1) = '.'
                     THEN substr(u, 8, 2) END AS precode,
                substr(u, 8) AS tail
              FROM built
            ),
            pos AS (
              SELECT *, CASE
                  WHEN strpos(tail, ':') > 0 THEN strpos(tail, ':') - 1
                  WHEN strpos(tail, '/') > 0 THEN strpos(tail, '/') - 1
                  ELSE -1 END AS j
              FROM scan
            ),
            tld AS (
              SELECT *, CASE WHEN j >= 3 AND substr(tail, j - 2, 1) = '.'
                             THEN substr(tail, j - 1, 2) END AS tldcode
              FROM pos
            )
            SELECT t.k,
              CAST(CASE WHEN cp.idx IS NOT NULL THEN cp.idx
                        ELSE COALESCE(ct.idx, 0) END AS BIGINT) AS country
            FROM tld t
            LEFT JOIN cc cp ON cp.abbr = t.precode
            LEFT JOIN cc ct ON ct.abbr = t.tldcode
            ORDER BY t.k
        """,
        # lossless GIF expectation: enumerate every first-frame pixel
        # from the palette/index construction formulas — the engine
        # must reproduce the sums from the real LZW bitstream
        "media_gif_decode": f"""
            WITH g(media_id, w, h, ncol, a, bx, cy, pr, pg, pb,
                   dr, dg, db, nf) AS (VALUES {_GIF_VALUES}),
            xs AS (SELECT *, unnest(range(0, w)) AS x FROM g),
            ys AS (SELECT *, unnest(range(0, h)) AS y FROM xs),
            pix AS (SELECT media_id, w, h, nf,
                      (a + bx*x + cy*y) % ncol AS idx,
                      pr, pg, pb, dr, dg, db
                    FROM ys)
            SELECT media_id,
              CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
              CAST(nf AS BIGINT) AS n_frames,
              CAST(SUM((pr + idx*dr) % 256) AS BIGINT) AS sum_r,
              CAST(SUM((pg + idx*dg) % 256) AS BIGINT) AS sum_g,
              CAST(SUM((pb + idx*db) % 256) AS BIGINT) AS sum_b
            FROM pix
            GROUP BY media_id, w, h, nf
            ORDER BY media_id
        """,
        # merge-time dedup over the durable fixture log (shared input
        # inlined as VALUES with its scan position); dedupSpiderdbList
        # (Spider.cpp:3714-4021) restated as window functions — see
        # pipelines/compact.py dedup_log_group for the engine side
        "crawl_compact_frontier": f"""
            WITH recs(pos, rec, uh48, site32, inj, au, ri, fip,
                      hop, added, spid) AS (VALUES {_FIX_VALUES}),
            salted AS (
              SELECT *, xor(xor(xor(xor(site32,
                  CASE WHEN inj = 1 THEN {_SALT_INJ} ELSE 0 END),
                  CASE WHEN au = 1 THEN {_SALT_ADDURL} ELSE 0 END),
                  CASE WHEN ri = 1 THEN {_SALT_REIDX} ELSE 0 END),
                  CASE WHEN fip = 1 THEN {_SALT_FAKEIP} ELSE 0 END) AS srh
              FROM recs
            ),
            keep_rep AS (
              SELECT uh48, spid FROM (
                SELECT uh48, spid, ROW_NUMBER() OVER (
                  PARTITION BY uh48 ORDER BY spid DESC, pos) AS rk
                FROM salted WHERE rec = 'reply') WHERE rk = 1
            ),
            live_req AS (
              SELECT r.* FROM salted r
              LEFT JOIN keep_rep b ON b.uh48 = r.uh48
              WHERE r.rec = 'request'
                AND NOT (b.spid IS NOT NULL AND b.spid > r.added
                         AND (r.ri = 1 OR r.fip = 1))
            ),
            keep_req AS (
              SELECT uh48, hop, added FROM (
                SELECT uh48, hop, added, ROW_NUMBER() OVER (
                  PARTITION BY uh48, srh ORDER BY hop, added, pos) AS rk
                FROM live_req) WHERE rk = 1
            )
            SELECT 'reply' AS rec, CAST(uh48 AS BIGINT) AS uh48,
                   CAST(0 AS BIGINT) AS hop_count,
                   CAST(0 AS BIGINT) AS added_time,
                   CAST(spid AS BIGINT) AS spidered_time
            FROM keep_rep
            UNION ALL
            SELECT 'request', CAST(uh48 AS BIGINT),
                   CAST(hop AS BIGINT), CAST(added AS BIGINT),
                   CAST(0 AS BIGINT)
            FROM keep_req
            ORDER BY uh48, rec, hop_count, added_time
        """,
        "crawl_robots": ROBOTS_SQL_TEMPLATE.replace("@HOSTS@", _ROBOTS_HOSTS)
        .replace("@PATHS@", _ROBOTS_PATHS),
        # populateWaitingTreeFromSpiderdb restated end-to-end: merge
        # dedup (min hop/added/pos per uh48 — constant srh by
        # construction), replied rows excluded by the 7-day respider
        # gate (freq*86400s ≫ now), the default-web cascade reduced to
        # its reachable hopcount&&isnew rules, per-IP winner = first by
        # (priority desc, hop, spider-time, uh48) — the engine's
        # winner-key lexsort — launched at now (wave_window 250ms <
        # same_ip_wait 1s ⇒ one winner per IP)
        "crawl_cold_start_schedule": f"""
            WITH recs(pos, rec, uh48, ip, hop, added, spid) AS (
              VALUES {_CS_VALUES}
            ),
            ded AS (
              SELECT uh48, ip, hop, added FROM (
                SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY uh48 ORDER BY hop, added, pos) AS rk
                FROM recs WHERE rec = 'request') WHERE rk = 1
            ),
            replied AS (
              SELECT DISTINCT uh48 FROM recs WHERE rec = 'reply'
            ),
            live AS (
              SELECT d.* FROM ded d
              LEFT JOIN replied r ON r.uh48 = d.uh48
              WHERE r.uh48 IS NULL
            ),
            rules(rule_index, priority) AS (VALUES {_CS_RULES}),
            win AS (
              SELECT l.*, r.priority, ROW_NUMBER() OVER (
                PARTITION BY l.ip
                ORDER BY r.priority DESC, l.hop,
                         GREATEST(l.added * 1000, 1000), l.uh48) AS rk
              FROM live l JOIN rules r ON r.rule_index =
                CASE WHEN l.hop = 0 THEN 10
                     WHEN l.hop = 1 THEN 12
                     WHEN l.hop = 2 THEN 14
                     ELSE 16 END
            )
            SELECT 'http://h' || CAST(uh48 % 13 AS VARCHAR)
                   || '.test/p' || CAST(uh48 AS VARCHAR) || '.html' AS url,
                   CAST(uh48 AS BIGINT) AS uh48,
                   CAST(ip AS BIGINT) AS first_ip,
                   CAST(priority AS BIGINT) AS priority,
                   CAST(2000000 AS BIGINT) AS launch_ms
            FROM win WHERE rk = 1
            ORDER BY first_ip, launch_ms, uh48
        """,
        "crawl_span_parse": f"""
            SELECT doc_id, CAST(n_spans AS BIGINT) AS n_spans,
                   TRUE AS roundtrip_ok
            FROM (VALUES {_SPAN_VALUES}) t(doc_id, n_spans)
            ORDER BY doc_id
        """,
        "crawl_urlfilter": f"""
            WITH base AS (
              SELECT CAST(o_orderkey AS BIGINT) AS k FROM orders
            ), cand AS (
              SELECT k,
                CASE WHEN k % 7 = 0
                       THEN 'http://www.h' || CAST(k AS VARCHAR) || '.test/'
                     WHEN k % 7 = 1
                       THEN 'http://h' || CAST(k AS VARCHAR) || '.test/feed.rss'
                     WHEN k % 7 = 2
                       THEN 'http://h' || CAST(k AS VARCHAR)
                            || '.test/2020/11/long-post-title-'
                            || CAST(k AS VARCHAR) || '.html'
                     ELSE 'http://h' || CAST(k AS VARCHAR) || '.test/x.html'
                END AS url,
                (k % 7 = 0) AS is_root,
                (k % 7 = 1) AS is_rssext,
                (k % 7 = 2) AS is_permalink,
                (k // 7) % 5 AS hop,
                (k % 3 = 0) AS is_www,
                (k % 23 <> 0) AS in_sitelist,
                (k % 4 = 0) AS had,
                CASE WHEN k % 17 = 0 THEN 3
                     WHEN k % 17 = 1 THEN 1 ELSE 0 END AS errc,
                CASE WHEN k % 17 <= 1
                       THEN (CASE WHEN k % 2 = 0 THEN 2 ELSE 3 END)
                     ELSE 0 END AS err_code,
                CASE WHEN k % 4 = 0 THEN (k * 13) % 7200 ELSE 0 END
                  AS spiderwaited,
                CASE WHEN k % 5 = 0 THEN 15.0 ELSE 0.0 END AS pcpd,
                (k * 7919) % 200000 AS url_age,
                k % 20 AS sitepages,
                (k * 3) % 80 AS domainpages,
                k % 11 AS num_inlinks,
                (k % 6 = 0) AS is_shallow,
                (k % 29 = 0) AS is_addurl,
                (k % 31 = 0) AS is_inject,
                (k % 37 = 0) AS is_reindex
              FROM base
            ), assigned AS (
              SELECT url, CASE {_UF_CASE} END AS rule_index FROM cand
            ), rules(rule_index, priority, force_delete) AS (
              VALUES {_UF_RULES}
            )
            SELECT a.url, CAST(a.rule_index AS BIGINT) AS rule_index,
                   CAST(r.priority AS BIGINT) AS priority,
                   CAST(r.force_delete AS BIGINT) AS force_delete
            FROM assigned a JOIN rules r USING (rule_index)
            ORDER BY a.url
        """,
        "q_cust_without_orders": """
            SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_cust
            FROM customer c
            WHERE NOT EXISTS (
                SELECT 1 FROM orders o
                WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
            )
            GROUP BY c_mktsegment
            ORDER BY c_mktsegment
        """,
        "q13_cust_order_dist": """
            SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
            FROM (
                SELECT c.c_custkey,
                       CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
                FROM customer c
                LEFT OUTER JOIN orders o
                  ON c.c_custkey = o.o_custkey
                 AND o.o_orderpriority <> '1-URGENT'
                GROUP BY c.c_custkey
            ) t
            GROUP BY c_count
            ORDER BY custdist DESC, c_count DESC
        """,
        "q15_top_supplier": """
            WITH r AS (
                SELECT l_suppkey,
                       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)
                           AS total_revenue
                FROM lineitem
                WHERE l_shipdate >= DATE '1996-01-01'
                  AND l_shipdate <  DATE '1996-04-01'
                GROUP BY l_suppkey
            )
            SELECT s.s_suppkey, s.s_name, r.total_revenue
            FROM supplier s JOIN r ON s.s_suppkey = r.l_suppkey
            WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM r)
            ORDER BY s.s_suppkey
        """,
        "q17_small_quantity_revenue": """
            SELECT ROUND(SUM(l.l_extendedprice) / 7.0, 2) AS avg_yearly
            FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
            WHERE p.p_brand = 'Brand#23'
              AND l.l_quantity < 0.2 * (
                  SELECT AVG(l2.l_quantity) FROM lineitem l2
                  WHERE l2.l_partkey = l.l_partkey
              )
        """,
        "media_caption_pairs": f"""
            WITH s(doc_id, off, kind, text, media_ref) AS (
                VALUES {_CAP_VALUES}
            ), m AS (
                SELECT * FROM s WHERE kind IN ('image', 'video')
            ), t AS (
                SELECT doc_id, off AS toff, text AS caption
                FROM s WHERE kind = 'text'
            ), j AS (
                SELECT m.doc_id, m.off, m.kind, m.media_ref, t.caption,
                       ABS(m.off - t.toff) AS d,
                       ROW_NUMBER() OVER (
                           PARTITION BY m.doc_id, m.off
                           ORDER BY ABS(m.off - t.toff), t.toff
                       ) AS rn
                FROM m JOIN t ON t.doc_id = m.doc_id
            )
            SELECT doc_id, CAST(off AS BIGINT) AS m_offset, kind, media_ref,
                   caption, CAST(d AS BIGINT) AS dist
            FROM j WHERE rn = 1
            ORDER BY doc_id, m_offset
        """,
        "redact_pii": """
            WITH planted AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 7 = 0 THEN
                           text || ' contact u' || CAST(doc_id AS VARCHAR)
                           || '@example.com from 10.'
                           || CAST(doc_id % 256 AS VARCHAR)
                           || '.0.1 call +1555'
                           || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                       ELSE text END AS t
                FROM documents
            ), r1 AS (
                SELECT doc_id,
                       len(regexp_extract_all(t,
                           '[a-z0-9._]+@[a-z0-9.-]+\\.[a-z]+')) AS c1,
                       regexp_replace(t, '[a-z0-9._]+@[a-z0-9.-]+\\.[a-z]+',
                                      '<EMAIL>', 'g') AS t
                FROM planted
            ), r2 AS (
                SELECT doc_id, c1,
                       len(regexp_extract_all(t,
                           '\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}')) AS c2,
                       regexp_replace(t,
                           '\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}',
                           '<IP>', 'g') AS t
                FROM r1
            ), r3 AS (
                SELECT doc_id, c1, c2,
                       len(regexp_extract_all(t, '\\+\\d{8,13}')) AS c3,
                       regexp_replace(t, '\\+\\d{8,13}', '<PHONE>', 'g') AS t
                FROM r2
            )
            SELECT doc_id, t AS redacted,
                   CAST(c1 + c2 + c3 AS BIGINT) AS n_pii
            FROM r3 ORDER BY doc_id
        """,
        "decontaminate": """
            WITH tr AS (
                SELECT doc_id, string_split(text, ' ') AS t
                FROM documents WHERE source <> 'src0'
            ), ev AS (
                SELECT doc_id AS eval_doc, string_split(text, ' ') AS t
                FROM documents WHERE source = 'src0'
            ), trs AS (
                SELECT doc_id, UNNEST(list_distinct(list_transform(
                    range(1, len(t) - 1),
                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS sh
                FROM tr
            ), evs AS (
                SELECT eval_doc, UNNEST(list_distinct(list_transform(
                    range(1, len(t) - 1),
                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS sh
                FROM ev
            )
            SELECT DISTINCT trs.doc_id, evs.eval_doc
            FROM trs JOIN evs USING (sh)
            ORDER BY doc_id, eval_doc
        """,
        "pack_documents": """
            WITH RECURSIVE d AS (
                SELECT doc_id, n_chars,
                       CAST(doc_id % 64 AS BIGINT) AS bucket,
                       ROW_NUMBER() OVER (
                           PARTITION BY doc_id % 64 ORDER BY doc_id
                       ) AS rn
                FROM documents
            ), pack AS (
                SELECT bucket, rn, doc_id,
                       CAST(0 AS BIGINT) AS bin,
                       CAST(n_chars AS BIGINT) AS acc
                FROM d WHERE rn = 1
                UNION ALL
                SELECT d.bucket, d.rn, d.doc_id,
                       CASE WHEN p.acc + d.n_chars > 4096
                            THEN p.bin + 1 ELSE p.bin END,
                       CASE WHEN p.acc + d.n_chars > 4096
                            THEN CAST(d.n_chars AS BIGINT)
                            ELSE p.acc + d.n_chars END
                FROM pack p
                JOIN d ON d.bucket = p.bucket AND d.rn = p.rn + 1
            )
            SELECT doc_id, bucket, bin FROM pack ORDER BY doc_id
        """,
        "stratified_sample": """
            SELECT lang, doc_id FROM (
                SELECT lang, doc_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY lang
                           ORDER BY (doc_id * 2654435761) % 4294967296, doc_id
                       ) AS rn
                FROM documents
            ) t WHERE rn <= 50
            ORDER BY lang, doc_id
        """,
        "q8_market_share": """
            SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
                   ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2)
                       AS total_rev,
                   ROUND(SUM(CASE WHEN s.s_nationkey = (
                                 SELECT n_nationkey FROM nation
                                 WHERE n_name = 'NATION_2')
                             THEN l.l_extendedprice * (1 - l.l_discount)
                             ELSE 0 END)
                         / SUM(l.l_extendedprice * (1 - l.l_discount)), 6)
                       AS mkt_share
            FROM lineitem l
            JOIN orders o ON o.o_orderkey = l.l_orderkey
            JOIN customer c ON c.c_custkey = o.o_custkey
            JOIN nation cn ON cn.n_nationkey = c.c_nationkey
            JOIN region r ON r.r_regionkey = cn.n_regionkey
                         AND r.r_name = 'ASIA'
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            GROUP BY o_year
            ORDER BY o_year
        """,
        "q16_supplier_variety": """
            SELECT p_brand, CAST(p_size AS BIGINT) AS p_size,
                   CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
            FROM part JOIN lineitem ON p_partkey = l_partkey
            WHERE p_size >= 42 AND l_quantity >= 30
            GROUP BY p_brand, p_size
            ORDER BY p_brand, p_size
        """,
        "q19_discounted_revenue": """
            SELECT ROUND(COALESCE(SUM(l_extendedprice * (1 - l_discount)), 0.0), 2)
                       AS revenue
            FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
            WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
                   AND l.l_quantity BETWEEN 1 AND 11)
               OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
                   AND l.l_quantity BETWEEN 10 AND 20)
               OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
                   AND l.l_quantity BETWEEN 20 AND 30)
        """,
        "q21_sole_returned_supplier": """
            WITH ps AS (
                SELECT l_orderkey, l_suppkey,
                       MAX(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                           AS ret
                FROM lineitem GROUP BY l_orderkey, l_suppkey
            ), st AS (
                SELECT l_orderkey, COUNT(*) AS n_supp, SUM(ret) AS n_ret
                FROM ps GROUP BY l_orderkey
            )
            SELECT s.s_suppkey, s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
            FROM ps
            JOIN st USING (l_orderkey)
            JOIN supplier s ON s.s_suppkey = ps.l_suppkey
            WHERE ps.ret = 1 AND st.n_supp >= 2 AND st.n_ret = 1
            GROUP BY s.s_suppkey, s.s_name
            ORDER BY numwait DESC, s.s_suppkey
            LIMIT 20
        """,
        "q22_global_sales_opportunity": """
            SELECT c_nationkey,
                   CAST(COUNT(*) AS BIGINT) AS numcust,
                   ROUND(SUM(c_acctbal), 2) AS totacctbal
            FROM customer c
            WHERE c_acctbal > (
                SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0.0
            )
            AND NOT EXISTS (
                SELECT 1 FROM orders o
                WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderpriority = '1-URGENT'
            )
            GROUP BY c_nationkey
            ORDER BY c_nationkey
        """,
        # near-dup family: the sketch pipelines run in full on the Ray
        # side; the registered result is the planted-duplicate subset
        # (plus, for ngram, every organic pair over the exact-jaccard
        # threshold) with an EXACT similarity the oracle recomputes
        # independently — a missed pair or wrong value hash-fails.
        "minhash_lsh_dedup": """
            WITH base AS (
              SELECT doc_id, string_split(text, ' ') AS toks
              FROM documents WHERE doc_id % 4 = 0
            ), pert AS (
              SELECT doc_id, toks,
                     list_transform(toks, (x, i) ->
                        CASE WHEN (i-1) % 11 = doc_id % 11
                        THEN 'tok' || CAST((doc_id + i - 1) % 97 AS VARCHAR)
                        ELSE x END) AS toks2
              FROM base
            ), sh AS (
              SELECT doc_id,
                list_distinct(list_transform(range(1, len(toks)-1),
                  i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sa,
                list_distinct(list_transform(range(1, len(toks2)-1),
                  i -> toks2[i] || ' ' || toks2[i+1] || ' ' || toks2[i+2])) AS sb
              FROM pert
            )
            SELECT doc_id AS doc_a, doc_id + 1000000 AS doc_b,
                   ROUND(CAST(len(list_intersect(sa, sb)) AS DOUBLE)
                         / len(list_distinct(sa || sb)), 6) AS jaccard
            FROM sh ORDER BY doc_a
        """,
        "ngram_jaccard_pairs": """
            WITH pert AS (
              SELECT doc_id + 1000000 AS doc_id,
                     list_transform(string_split(text, ' '), (x, i) ->
                        CASE WHEN (i-1) % 11 = doc_id % 11
                        THEN 'tok' || CAST((doc_id + i - 1) % 97 AS VARCHAR)
                        ELSE x END) AS toks
              FROM documents WHERE doc_id % 4 = 0
            ), aug AS (
              SELECT doc_id, string_split(text, ' ') AS toks FROM documents
              UNION ALL SELECT doc_id, toks FROM pert
            ), sh AS (
              SELECT doc_id, unnest(list_distinct(list_transform(
                     range(1, len(toks)-1),
                     i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS s
              FROM aug
            ), sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
            pairs AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
              FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            )
            SELECT doc_a, doc_b,
              ROUND(CAST(inter AS DOUBLE) / (na.n + nb.n - inter), 6) AS jaccard
            FROM pairs
            JOIN sizes na ON doc_a = na.doc_id
            JOIN sizes nb ON doc_b = nb.doc_id
            WHERE CAST(inter AS DOUBLE) / (na.n + nb.n - inter) >= 0.4
            ORDER BY doc_a, doc_b
        """,
        # near-dup clustering: connected components over the exact-
        # jaccard pair graph (recursive reachability; components are
        # dup clusters, so the closure stays tiny), canonical label =
        # component-minimum doc_id
        "dedup_groups": """
            WITH RECURSIVE pert AS (
              SELECT doc_id + 1000000 AS doc_id,
                     list_transform(string_split(text, ' '), (x, i) ->
                        CASE WHEN (i-1) % 11 = doc_id % 11
                        THEN 'tok' || CAST((doc_id + i - 1) % 97 AS VARCHAR)
                        ELSE x END) AS toks
              FROM documents WHERE doc_id % 4 = 0
            ), aug AS (
              SELECT doc_id, string_split(text, ' ') AS toks FROM documents
              UNION ALL SELECT doc_id, toks FROM pert
            ), sh AS (
              SELECT doc_id, unnest(list_distinct(list_transform(
                     range(1, len(toks)-1),
                     i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS s
              FROM aug
            ), sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
            cand AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
              FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            ), pairs AS (
              SELECT doc_a, doc_b
              FROM cand
              JOIN sizes na ON doc_a = na.doc_id
              JOIN sizes nb ON doc_b = nb.doc_id
              WHERE CAST(inter AS DOUBLE) / (na.n + nb.n - inter) >= 0.4
            ), edges AS (
              SELECT doc_a AS u, doc_b AS v FROM pairs
              UNION ALL SELECT doc_b, doc_a FROM pairs
            ), reach(u, v) AS (
              SELECT u, u FROM (SELECT DISTINCT u FROM edges)
              UNION
              SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
            )
            SELECT u AS doc_id, MIN(v) AS group_id
            FROM reach GROUP BY u ORDER BY doc_id
        """,
        "embedding_near_dup": """
            WITH p AS (
              SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                     CAST(CAST(list_transform(CAST(embedding AS DOUBLE[]),
                          x -> x*0.98 + 0.01) AS FLOAT[]) AS DOUBLE[]) AS v2
              FROM embeddings WHERE vec_id % 5 = 0
            )
            SELECT vec_id AS vec_a, vec_id + 1000000 AS vec_b,
                   ROUND(list_cosine_similarity(v, v2), 6) AS cosine
            FROM p ORDER BY vec_a
        """,
        # Words.cpp-faithful token stream over a decorated corpus: the
        # planted tokens (comma group, decimal, apostrophe, java++, c#)
        # must each survive as exactly ONE alnum word, so the expected
        # counts/lengths are analytic — the oracle mirrors the
        # decoration verbatim and derives them from the token list
        "words_alnum_counts": """
            WITH toks AS (
              SELECT doc_id,
                list_transform(string_split(text, ' '), (x, i) ->
                  CASE WHEN (i-1) % 13 = doc_id % 13 THEN '1,234,567'
                       WHEN (i-1) % 11 = doc_id % 11 THEN '3.14'
                       WHEN (i-1) % 7  = doc_id % 7  THEN 'don''t'
                       WHEN (i-1) % 5  = doc_id % 5  THEN 'java++'
                       WHEN (i-1) % 3  = doc_id % 3  THEN 'c#'
                       ELSE x END) AS t
              FROM documents
            )
            SELECT doc_id,
                   CAST(len(t) AS BIGINT) AS n_alnum,
                   CAST(len(t) - 1 AS BIGINT) AS n_punct,
                   CAST(list_sum(list_transform(t, w -> length(w)))
                        AS BIGINT) AS alnum_chars
            FROM toks ORDER BY doc_id
        """,
        # 64-bit polynomial rolling-hash fingerprint recomputed from
        # bytes in SQL: Σ byte·B^(n−1−i) mod 2^64, B = 1099511628211
        # (textstats.fingerprint); HUGEINT carries the 128-bit products,
        # the recursive CTE builds the power table.  The corpus is pure
        # ASCII (unicode(char) == byte), asserted by the charset query.
        "doc_fingerprints": """
            WITH RECURSIVE pw(k, v) AS (
                SELECT 0, CAST(1 AS HUGEINT)
                UNION ALL
                SELECT k + 1, (v * 1099511628211) % 18446744073709551616
                FROM pw WHERE k < (SELECT MAX(length(text)) FROM documents)
            ), chars AS (
                SELECT doc_id, unicode(text[i]) AS byte, length(text) - i AS exp
                FROM documents,
                     LATERAL (SELECT unnest(range(1, length(text) + 1)) AS i)
            ), agg AS (
                SELECT doc_id,
                       CAST(SUM((byte * pw.v) % 18446744073709551616)
                            % 18446744073709551616 AS UBIGINT) AS fingerprint
                FROM chars JOIN pw ON pw.k = chars.exp
                GROUP BY doc_id
            )
            SELECT d.doc_id, CAST(COALESCE(a.fingerprint, 0) AS UBIGINT) AS fingerprint
            FROM documents d LEFT JOIN agg a USING (doc_id)
            ORDER BY doc_id
        """,
        # simhash kernel recomputed end-to-end in SQL: token rolling
        # hashes (distinct-token table), per-bit majority vote over the
        # 64 bits, packed signature, popcount of original-vs-perturbed
        # xor (functions/dedup.py simhash + hamming64)
        "simhash_dedup": """
            WITH RECURSIVE pw(k, v) AS (
                SELECT 0, CAST(1 AS HUGEINT)
                UNION ALL
                SELECT k + 1, (v * 1099511628211) % 18446744073709551616
                FROM pw WHERE k < (SELECT MAX(length(text)) FROM documents)
            ), pert AS (
                SELECT doc_id,
                       list_transform(string_split(text, ' '), (x, i) ->
                          CASE WHEN (i-1) % 11 = doc_id % 11
                          THEN 'tok' || CAST((doc_id + i - 1) % 97 AS VARCHAR)
                          ELSE x END) AS toks
                FROM documents WHERE doc_id % 4 = 0
            ), sides AS (
                SELECT doc_id, 0 AS side, string_split(lower(text), ' ') AS toks
                FROM documents WHERE doc_id % 4 = 0
                UNION ALL
                SELECT doc_id, 1, list_transform(toks, x -> lower(x)) FROM pert
            ), tok AS (
                SELECT doc_id, side, unnest(toks) AS w FROM sides
            ), toku AS (SELECT DISTINCT w FROM tok),
            chars AS (
                SELECT w, unicode(w[i]) AS byte, length(w) - i AS exp
                FROM toku, LATERAL (SELECT unnest(range(1, length(w) + 1)) AS i)
            ), th AS (
                SELECT w, CAST(SUM((byte * pw.v) % 18446744073709551616)
                               % 18446744073709551616 AS UBIGINT) AS h
                FROM chars JOIN pw ON pw.k = chars.exp
                GROUP BY w
            ), bitsum AS (
                SELECT doc_id, side, k,
                       SUM(CASE WHEN (h >> k) & 1 = 1 THEN 1 ELSE -1 END) AS s
                FROM tok JOIN th USING (w), (SELECT unnest(range(0, 64)) AS k)
                GROUP BY 1, 2, 3
            ), sh AS (
                SELECT doc_id, side,
                       CAST(SUM(CASE WHEN s > 0
                                THEN (CAST(1 AS HUGEINT) << k) ELSE 0 END)
                            AS UBIGINT) AS sig
                FROM bitsum GROUP BY 1, 2
            )
            SELECT a.doc_id AS doc_a, a.doc_id + 1000000 AS doc_b,
                   CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
            FROM sh a JOIN sh b ON a.doc_id = b.doc_id AND a.side = 0 AND b.side = 1
            ORDER BY doc_a
        """,
        # Msg22 collision probe (Titledb.h:41-87) over fingerprint-folded
        # probable docids: the recursive CTE replays the first-come-by-url
        # sequential probe within each 64-slot bucket
        "assign_docids": """
            WITH RECURSIVE pw(k, v) AS (
                SELECT 0, CAST(1 AS HUGEINT)
                UNION ALL
                SELECT k + 1, (v * 1099511628211) % 18446744073709551616
                FROM pw WHERE k < (SELECT MAX(length('http://h'
                    || CAST(doc_id % 50 AS VARCHAR) || '.test/d'
                    || CAST(doc_id AS VARCHAR))) FROM documents)
            ), urls AS (
                SELECT 'http://h' || CAST(doc_id % 50 AS VARCHAR) || '.test/d'
                       || CAST(doc_id AS VARCHAR) AS url
                FROM documents
            ), chars AS (
                SELECT url, unicode(url[i]) AS byte, length(url) - i AS exp
                FROM urls, LATERAL (SELECT unnest(range(1, length(url) + 1)) AS i)
            ), fp AS (
                SELECT url, CAST(SUM((byte * pw.v) % 18446744073709551616)
                                 % 18446744073709551616 AS UBIGINT) AS h
                FROM chars JOIN pw ON pw.k = chars.exp
                GROUP BY url
            ), inp AS (
                SELECT url,
                       CAST((h % 61) * 64 + (h % 64) AS BIGINT) AS probable_docid,
                       CAST(h % 61 AS BIGINT) AS bucket,
                       row_number() OVER (PARTITION BY (h % 61) ORDER BY url) AS rn
                FROM fp
            ), probe(bucket, rn, used, url, probable_docid, docid) AS (
                SELECT bucket, rn, [probable_docid], url, probable_docid,
                       probable_docid
                FROM inp WHERE rn = 1
                UNION ALL
                SELECT i.bucket, i.rn, list_append(p.used, d.docid), i.url,
                       i.probable_docid, d.docid
                FROM probe p
                JOIN inp i ON i.bucket = p.bucket AND i.rn = p.rn + 1,
                LATERAL (
                    SELECT COALESCE(
                        list_filter(range(i.probable_docid, i.bucket * 64 + 64),
                                    g -> NOT list_contains(p.used, g))[1],
                        list_filter(range(i.bucket * 64, i.bucket * 64 + 64),
                                    g -> NOT list_contains(p.used, g))[1]
                    ) AS docid
                ) d
            )
            SELECT url, probable_docid, docid FROM probe ORDER BY url
        """,
        # expectation oracle: decode+detect must return exactly the
        # declared charset and a byte-identical round trip for EVERY row
        # (the Ray side does the real encode→sniff→decode work)
        "charset_roundtrip": """
            SELECT doc_id,
                   CASE doc_id % 4 WHEN 0 THEN 'utf-8' WHEN 1 THEN 'iso-8859-1'
                        WHEN 2 THEN 'shift_jis' ELSE 'utf-16-le' END AS charset_true,
                   CASE doc_id % 4 WHEN 0 THEN 'utf-8' WHEN 1 THEN 'iso-8859-1'
                        WHEN 2 THEN 'shift_jis' ELSE 'utf-16-le' END AS charset_detected,
                   TRUE AS roundtrip_ok
            FROM documents ORDER BY doc_id
        """,
        # stopword-vote language ID (first-match-on-tie mirrors the
        # Python dict iteration order via the ord column); the Unicode
        # script path never fires on the ASCII fixture corpus
        "lang_id": f"""
            WITH w AS (
              SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
              FROM documents
            ), m(lang, ord, w) AS (VALUES {_LANG_VALUES}),
            sc AS (
              SELECT d.doc_id, m.lang, m.ord, COUNT(*) AS score
              FROM w d JOIN m ON d.w = m.w GROUP BY 1, 2, 3
            ), best AS (
              SELECT doc_id, lang,
                     ROW_NUMBER() OVER (PARTITION BY doc_id
                                        ORDER BY score DESC, ord ASC) AS rn
              FROM sc
            )
            SELECT d.doc_id, d.lang, COALESCE(b.lang, 'xx') AS lang_pred
            FROM documents d
            LEFT JOIN (SELECT doc_id, lang FROM best WHERE rn = 1) b USING (doc_id)
            ORDER BY d.doc_id
        """,
        "adult_flags": f"""
            SELECT doc_id, points, points >= 2 AS is_adult FROM (
                SELECT d.doc_id,
                       CAST(SUM(CASE WHEN instr(lower(d.text), n.needle) > 0
                                THEN n.w ELSE 0 END) AS BIGINT) AS points
                FROM documents d
                CROSS JOIN (VALUES {_NEEDLE_VALUES}) AS n(needle, w)
                GROUP BY d.doc_id
            )
        """,
        "q1_pricing_summary": f"""
            SELECT l_returnflag, l_linestatus,
                   ROUND(SUM(l_quantity), 2) AS sum_qty,
                   ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
                   ROUND(SUM(l_extendedprice*(1-l_discount)), 2) AS sum_disc_price,
                   ROUND(SUM(l_extendedprice*(1-l_discount)*(1+l_tax)), 2) AS sum_charge,
                   COUNT(*) AS count_order,
                   ROUND(SUM(l_quantity)/COUNT(*), 4) AS avg_qty,
                   ROUND(SUM(l_extendedprice)/COUNT(*), 4) AS avg_price,
                   ROUND(SUM(l_discount)/COUNT(*), 4) AS avg_disc
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "q3_top_orders": """
            SELECT l_orderkey,
                   ROUND(SUM(l_extendedprice*(1-l_discount)), 2) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1997-01-01'
              AND l_shipdate  > TIMESTAMP '1997-01-01'
            GROUP BY l_orderkey
            ORDER BY revenue DESC, l_orderkey
            LIMIT 10
        """,
        "q5_region_revenue": """
            SELECT n_name,
                   ROUND(SUM(l_extendedprice*(1-l_discount)), 2) AS revenue
            FROM lineitem
            JOIN orders   ON l_orderkey  = o_orderkey
            JOIN customer ON o_custkey   = c_custkey
            JOIN nation   ON c_nationkey = n_nationkey
            GROUP BY n_name
        """,
        "q6_revenue_delta": """
            SELECT ROUND(SUM(l_extendedprice*l_discount), 2) AS revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1997-01-01'
              AND l_discount >= 0.03 AND l_discount <= 0.07
              AND l_quantity < 24
        """,
        "q_top_customers": """
            SELECT o_custkey,
                   ROUND(SUM(o_totalprice), 2) AS total_spent,
                   COUNT(*) AS n_orders,
                   ANY_VALUE(c_name) AS c_name
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY o_custkey
            ORDER BY total_spent DESC, o_custkey
            LIMIT 20
        """,
        "q_orders_by_priority": """
            SELECT o_orderpriority, COUNT(*) AS n,
                   ROUND(SUM(o_totalprice), 2) AS total
            FROM orders GROUP BY o_orderpriority
        """,
        "q_distinct_segments": "SELECT DISTINCT c_mktsegment FROM customer",
        "q_events_by_type": """
            SELECT event_type, COUNT(*) AS n,
                   ROUND(SUM(value), 2) AS sum_value,
                   ROUND(SUM(value)/COUNT(*), 4) AS avg_value
            FROM events GROUP BY event_type
        """,
        "q_events_daily": """
            SELECT strftime(ts, '%Y-%m-%d') AS day, COUNT(*) AS n,
                   ROUND(SUM(value), 2) AS sum_value
            FROM events GROUP BY 1
        """,
        "q_user_sessions": """
            SELECT user_id,
                   CAST(SUM(CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
                   COUNT(*) AS n_events
            FROM (
                SELECT user_id,
                       epoch(ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) AS gap
                FROM events
            )
            GROUP BY user_id
        """,
        "q_part_type_stats": """
            SELECT p_brand, COUNT(*) AS n,
                   ROUND(SUM(p_retailprice), 2) AS sum_price,
                   CAST(MAX(p_size) AS BIGINT) AS max_size
            FROM part GROUP BY p_brand
        """,
        "q_supplier_nation": """
            SELECT n_name, COUNT(*) AS n_suppliers,
                   ROUND(SUM(s_acctbal), 2) AS sum_acctbal
            FROM supplier JOIN nation ON s_nationkey = n_nationkey
            GROUP BY n_name
        """,
        "q_asof_join": """
            SELECT event_id, user_id,
                   COALESCE(strftime(last_login, '%Y-%m-%d %H:%M:%S.%f'), '') AS last_login
            FROM (
                SELECT event_id, user_id, ts, event_type,
                       MAX(CASE WHEN event_type = 'login' THEN ts END) OVER (
                           PARTITION BY user_id ORDER BY ts
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                       ) AS last_login
                FROM events
            )
            WHERE event_type = 'purchase'
        """,
        "q_range_join": """
            SELECT band, COUNT(*) AS n, ROUND(SUM(value), 2) AS sum_value
            FROM (
                SELECT CASE
                         WHEN value < 50 THEN 'b_lt50'
                         WHEN value < 100 THEN 'b50_100'
                         WHEN value < 150 THEN 'b100_150'
                         WHEN value < 200 THEN 'b150_200'
                         ELSE 'b200_inf'
                       END AS band, value
                FROM events
            ) GROUP BY band
        """,
        "q_window_running": """
            SELECT event_id, user_id,
                   CAST(ROW_NUMBER() OVER w AS BIGINT) AS running_n,
                   ROUND(SUM(value) OVER w, 2) AS running_value
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING)
        """,
        "q_sample": """
            SELECT o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice
            FROM orders
            WHERE (o_orderkey * 2654435761) % 16 = 0
        """,
        "q_union_distinct": """
            SELECT CAST(nationkey AS BIGINT) AS nationkey FROM (
                SELECT c_nationkey AS nationkey FROM customer
                UNION
                SELECT s_nationkey AS nationkey FROM supplier
            )
        """,
        "dedup_exact": """
            SELECT MIN(doc_id) AS doc_id FROM (
                SELECT doc_id, text FROM documents
                UNION ALL
                SELECT doc_id + 1000000 AS doc_id, text FROM documents
                WHERE doc_id % 3 = 0
            ) GROUP BY text
        """,
        "clean_corpus": """
            WITH aug AS (
                SELECT doc_id, text, lang FROM documents
                UNION ALL
                SELECT doc_id + 1000000 AS doc_id, text, lang FROM documents
                WHERE doc_id % 3 = 0
            ), dedup AS (
                SELECT lang,
                       len(string_split(text, ' ')) AS n_tokens,
                       ROW_NUMBER() OVER (
                           PARTITION BY text ORDER BY doc_id
                       ) AS rn
                FROM aug
            )
            SELECT lang,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens
            FROM dedup WHERE rn = 1 AND n_tokens >= 40
            GROUP BY lang ORDER BY lang
        """,
        "q4_priority_checking": """
            SELECT o_orderpriority,
                   CAST(COUNT(*) AS BIGINT) AS order_count
            FROM orders
            WHERE EXISTS (
              SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate >= TIMESTAMP '1997-09-01'
            )
            GROUP BY o_orderpriority
            ORDER BY o_orderpriority
        """,
        "q12_priority_lines": """
            SELECT l.l_linestatus,
                   CAST(SUM(CASE WHEN o.o_orderpriority IN
                                   ('1-URGENT', '2-HIGH')
                            THEN 1 ELSE 0 END) AS BIGINT)
                       AS high_line_count,
                   CAST(SUM(CASE WHEN o.o_orderpriority NOT IN
                                   ('1-URGENT', '2-HIGH')
                            THEN 1 ELSE 0 END) AS BIGINT)
                       AS low_line_count
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
              AND l.l_shipdate < TIMESTAMP '1998-01-01'
            GROUP BY l.l_linestatus
            ORDER BY l.l_linestatus
        """,
        "q14_promo_revenue": """
            SELECT ROUND(
                100.0 * SUM(CASE WHEN p.p_type = 'ECONOMY'
                            THEN l.l_extendedprice * (1 - l.l_discount)
                            ELSE 0 END)
                      / SUM(l.l_extendedprice * (1 - l.l_discount)),
                4) AS promo_revenue_pct
            FROM lineitem l
            JOIN part p ON l.l_partkey = p.p_partkey
            WHERE l.l_shipdate >= TIMESTAMP '1997-03-01'
              AND l.l_shipdate < TIMESTAMP '1997-04-01'
        """,
        "q18_large_orders": """
            WITH big AS (
              SELECT l_orderkey, ROUND(SUM(l_quantity), 2) AS total_qty
              FROM lineitem GROUP BY l_orderkey
              HAVING SUM(l_quantity) > 150.0
            )
            SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
                   o.o_totalprice, b.total_qty
            FROM big b
            JOIN orders o ON b.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            ORDER BY o.o_totalprice DESC, o.o_orderdate, o.o_orderkey
        """,
        "q10_returned_items": """
            SELECT c.c_custkey, c.c_name, n.n_name,
                   ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2)
                       AS revenue
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            WHERE l.l_returnflag = 'R'
              AND o.o_orderdate >= DATE '1997-01-01'
              AND o.o_orderdate < DATE '1997-07-01'
            GROUP BY 1, 2, 3
            ORDER BY revenue DESC, c.c_custkey
            LIMIT 20
        """,
        "q7_volume_shipping": """
            SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
                   CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
                   ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2)
                       AS revenue
            FROM lineitem l
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation ns ON s.s_nationkey = ns.n_nationkey
            JOIN nation nc ON c.c_nationkey = nc.n_nationkey
            WHERE ((ns.n_name = 'NATION_3' AND nc.n_name = 'NATION_8')
                OR (ns.n_name = 'NATION_8' AND nc.n_name = 'NATION_3'))
            GROUP BY 1, 2, 3
            ORDER BY 1, 2, 3
        """,
        "token_counts": """
            SELECT doc_id,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
            FROM documents
        """,
        "quality_scores": f"""
            SELECT doc_id,
                   CAST(length(text) AS BIGINT) AS n_chars,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                   CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS BIGINT) AS n_punct,
                   CAST(len(list_filter(string_split(lower(text), ' '),
                        x -> list_contains([{_STOP_SQL}], x))) AS BIGINT) AS n_stopwords,
                   ROUND(CAST(len(list_filter(string_split(lower(text), ' '),
                        x -> list_contains([{_STOP_SQL}], x))) AS DOUBLE)
                        / GREATEST(len(string_split(text, ' ')), 1), 6) AS stopword_ratio
            FROM documents
        """,
        # CAST to DOUBLE[] so DuckDB accumulates the dot product in
        # float64 like the numpy side; f64 last-ulp noise (~1e-16)
        # cannot straddle a 6-dp rounding boundary (f32 noise ~1e-7 can).
        "ann_topk": """
            WITH q AS (
                SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
                FROM embeddings WHERE vec_id < 10
            )
            SELECT q.query_id, e.vec_id,
                   ROUND(list_cosine_similarity(q.qe, CAST(e.embedding AS DOUBLE[])), 6) AS score
            FROM q CROSS JOIN embeddings e
            QUALIFY row_number() OVER (
                PARTITION BY q.query_id
                ORDER BY ROUND(list_cosine_similarity(q.qe, CAST(e.embedding AS DOUBLE[])), 6) DESC,
                         e.vec_id
            ) <= 10
        """,
    }
