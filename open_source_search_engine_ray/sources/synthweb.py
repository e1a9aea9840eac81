"""Deterministic synthetic web: the crawl engine's input fixture.

Mirrors the reference's test strategy (test/system/ serves a synthetic web
through a local httpserver; html/test.warc.gz is a canned corpus): a seeded
host graph with Zipf-ish outdegree, hub hosts for skew, shared IPs for
per-IP politeness, robots.txt variants, latency + failure modes, and a
fixed fraction of duplicate URLs via non-canonical spellings to exercise
URL-seen (FIXTURES.md §1-§3).

Everything is *procedural*: page content is recomputed from
``(seed, host_idx, page_idx)`` alone, so the fetch stage needs only the
small host-config table (broadcast via ``ray.put``) — no corpus shipping.
That is the property that lets the same fetch stage scale to a 10^10-URL
frontier: a real deployment swaps ``fetch_url`` for an HTTP client and
keeps every other stage unchanged.

HTML round-trip: ``render_html(spans)`` → ``parse_html`` reproduces the
span sequence (kind, text, media_ref, offset) exactly — the per-row
invariant from BASELINE.json's input_hint.
"""

from __future__ import annotations

import hashlib
import re
from dataclasses import dataclass

import numpy as np

from ..functions.urlnorm import canonicalize

USER_AGENT = "gigablastbot"

_WORDS = (
    "data crawl spider frontier ray arrow lance shard queue host page link "
    "media image video robot delay fetch parse index hash bloom filter "
    "priority wave politeness seed graph zipf hub skew"
).split()


def _rng(*key) -> np.random.Generator:
    h = hashlib.sha256(("|".join(map(str, key))).encode()).digest()
    return np.random.Generator(np.random.PCG64(int.from_bytes(h[:8], "little")))


_ROBOTS_TEMPLATES = [
    # plain allow-all (no groups)
    "",
    # default group, disallow a subtree + wildcard + anchor
    (
        "User-agent: *\n"
        "Disallow: /private/\n"
        "Disallow: /*.cgi$\n"
        "Allow: /private/ok.html\n"
    ),
    # UA-specific group overrides default (reference Robots.cpp:330-346)
    (
        "User-agent: *\n"
        "Disallow: /\n"
        f"User-agent: {USER_AGENT}\n"
        "Disallow: /private/\n"
        "Crawl-delay: 0.5\n"
    ),
    # crawl-delay only
    "User-agent: *\nCrawl-delay: 2\n",
    # blocked entirely
    "User-agent: *\nDisallow: /\n",
    # crawl-delay above the 60 s clamp (SpiderColl.cpp:4123-4126)
    "User-agent: *\nCrawl-delay: 120\n",
]
# template index per host-mod; most hosts allow-all
_ROBOTS_PICK = [0, 0, 0, 1, 0, 0, 2, 0, 0, 3, 0, 0, 0, 1, 0, 0, 0, 4, 0, 5]

_FAIL_PICK = ["", "", "", "", "", "", "", "", "", "", "", "", "", "dns", "", "", "", "", "http_500", ""]


@dataclass(frozen=True)
class WebConfig:
    n_hosts: int = 50
    n_hubs: int = 3
    hub_pages: int = 60
    max_pages: int = 12
    seed: int = 42
    dup_link_frac: float = 0.15
    cross_host_frac: float = 0.45
    span_scale: int = 1  # multiply spans per page (bench: realistic page sizes)
    # fraction of links that point at a 301 alias (/r{p}.html → canonical
    # page); 0.0 keeps the RNG stream — and thus every fixture — identical
    redirect_frac: float = 0.0

    def scaled(self) -> "WebConfig":
        return self


def get_web(cfg: WebConfig) -> "SynthWeb":
    """Process-wide memoized SynthWeb (the simulated network is static
    infrastructure — table construction for a 150k-host web costs ~4 s
    and must not be re-billed to every crawl in the same process; the
    workers' `_cached_fetch` already memoizes the same way)."""
    web = _WEB_CACHE.get(cfg)
    if web is None:
        web = SynthWeb(cfg)
        if len(_WEB_CACHE) >= 4:
            _WEB_CACHE.pop(next(iter(_WEB_CACHE)))
        _WEB_CACHE[cfg] = web
    return web


_WEB_CACHE: dict = {}


class SynthWeb:
    """Procedural synthetic web. All methods are pure given the config."""

    def __init__(self, cfg: WebConfig = WebConfig()):
        self.cfg = cfg
        n = cfg.n_hosts
        self.hosts = [self.host_name(i) for i in range(n)]
        self._host_idx = {h: i for i, h in enumerate(self.hosts)}
        # several hosts share an IP (per-IP politeness, Spider.h:142-153)
        self.ips = np.array(
            [0x0A000000 + (i if i % 7 else i // 2) for i in range(n)], dtype=np.int64
        )
        self.page_counts = np.array([self._page_count(i) for i in range(n)], dtype=np.int64)

    # -- host-level config ------------------------------------------------
    def host_name(self, i: int) -> str:
        return f"www.h{i:04d}.test" if i % 5 else f"h{i:04d}.test"

    def _page_count(self, i: int) -> int:
        if i < self.cfg.n_hubs:
            return self.cfg.hub_pages
        r = _rng(self.cfg.seed, "pages", i)
        return int(r.integers(1, self.cfg.max_pages + 1))

    def robots_txt(self, i: int) -> str:
        return _ROBOTS_TEMPLATES[_ROBOTS_PICK[i % len(_ROBOTS_PICK)]]

    def latency_ms(self, i: int) -> int:
        return int(20 + (i * 37) % 180)

    def fail_mode(self, i: int) -> str:
        return _FAIL_PICK[i % len(_FAIL_PICK)]

    def host_table(self) -> dict:
        """Columnar host metadata (FIXTURES.md §2) — the only broadcast."""
        n = self.cfg.n_hosts
        return {
            "host": np.array(self.hosts, dtype=object),
            "ip": self.ips.copy(),
            "robots_txt": np.array([self.robots_txt(i) for i in range(n)], dtype=object),
            "latency_ms": np.array([self.latency_ms(i) for i in range(n)], dtype=np.int64),
            "fail_mode": np.array([self.fail_mode(i) for i in range(n)], dtype=object),
            "n_pages": self.page_counts.copy(),
        }

    # -- page-level content ----------------------------------------------
    def page_url(self, host_i: int, page_i: int) -> str:
        host = self.hosts[host_i]
        if page_i == 0:
            return f"http://{host}/"
        if page_i % 9 == 4:
            return f"http://{host}/private/p{page_i}.html"
        return f"http://{host}/p{page_i}.html"

    def redirect_target(self, url: str) -> str | None:
        """Canonical target when ``url`` is a /r{p}.html 301 alias of an
        existing page, else None."""
        m = re.match(r"https?://([^/:]+)(?::\d+)?/r(\d+)\.html$", url)
        if not m:
            return None
        i = self._host_idx.get(m.group(1))
        p = int(m.group(2))
        if i is None or p >= self.page_counts[i]:
            return None
        return self.page_url(i, p)

    def url_to_page(self, url: str):
        """Inverse of page_url for canonical URLs → (host_i, page_i) or None."""
        m = re.match(r"https?://([^/:]+)(?::\d+)?(/[^?#]*)", url)
        if not m:
            return None
        host, path = m.group(1), m.group(2)
        i = self._host_idx.get(host)
        if i is None:
            return None
        if path == "/":
            return (i, 0)
        pm = re.match(r"^(?:/private)?/p(\d+)\.html$", path)
        if not pm:
            return None
        p = int(pm.group(1))
        if p >= self.page_counts[i]:
            return None
        return (i, p)

    # span-kind thresholds: text < .45 <= link < .80 <= image < .92 <= video
    _KIND_EDGES = np.array([0.45, 0.80, 0.92])

    def page_spans(self, host_i: int, page_i: int) -> list:
        """The span sequence for a page: list of dicts
        (kind, text, media_ref, offset) in ascending offset order.
        All RNG draws are batched (one Generator call per column, not per
        span) — page generation is the simulated network and must not
        drown the engine cost it exists to exercise."""
        cfg = self.cfg
        r = _rng(cfg.seed, "page", host_i, page_i)
        n_spans = int(r.integers(3, 21)) * cfg.span_scale
        kinds = np.searchsorted(self._KIND_EDGES, r.random(n_spans), side="right")
        n_text = int((kinds == 0).sum())
        wc = r.integers(3, 12, size=n_text)
        word_idx = r.integers(0, len(_WORDS), size=int(wc.sum()))
        w_off = np.concatenate(([0], np.cumsum(wc)))
        n_link = int((kinds == 1).sum())
        anchor_idx = r.integers(0, len(_WORDS), size=2 * n_link)
        targets = self._link_targets(r, host_i, n_link)
        n_img = int((kinds == 2).sum())
        img_id = r.integers(0, 50, size=n_img)
        img_alt = r.integers(0, 9, size=n_img)
        n_vid = int((kinds == 3).sum())
        vid_id = r.integers(0, 20, size=n_vid)
        vid_alt = r.integers(0, 9, size=n_vid)
        host = self.hosts[host_i]
        spans = []
        it = ic = ii = iv = 0
        for off in range(n_spans):
            k = kinds[off]
            if k == 0:
                a, b = w_off[it], w_off[it + 1]
                it += 1
                spans.append(
                    {
                        "kind": "text",
                        "text": " ".join(_WORDS[j] for j in word_idx[a:b]),
                        "media_ref": "",
                        "offset": off,
                    }
                )
            elif k == 1:
                txt = _WORDS[anchor_idx[2 * ic]] + " " + _WORDS[anchor_idx[2 * ic + 1]]
                spans.append(
                    {"kind": "link", "text": txt, "media_ref": targets[ic], "offset": off}
                )
                ic += 1
            elif k == 2:
                spans.append(
                    {
                        "kind": "image",
                        "text": "alt " + str(int(img_alt[ii])),
                        "media_ref": f"http://{host}/img{int(img_id[ii])}.jpg",
                        "offset": off,
                    }
                )
                ii += 1
            else:
                spans.append(
                    {
                        "kind": "video",
                        "text": "clip " + str(int(vid_alt[iv])),
                        "media_ref": f"http://{host}/vid{int(vid_id[iv])}.mp4",
                        "offset": off,
                    }
                )
                iv += 1
        return spans

    def page_html(self, host_i: int, page_i: int, title: str = "") -> str:
        """Fused page renderer: byte-identical to
        ``render_html(self.page_spans(host_i, page_i), title)`` (pinned
        in tests/test_synthweb.py) but skips the span-dict layer — the
        simulated network is the hot loop of every chunk task, and the
        per-span dict assembly plus the second render walk were ~1/3 of
        its cost.  RNG draw order matches :meth:`page_spans` exactly, so
        the web graph is unchanged.  ``_esc`` is skipped for text built
        from ``_WORDS`` / fixed templates (no escapable chars by
        construction); link targets keep it (session-id variants carry
        ``&``-free queries today, but the escape is part of the HTML
        contract)."""
        cfg = self.cfg
        r = _rng(cfg.seed, "page", host_i, page_i)
        n_spans = int(r.integers(3, 21)) * cfg.span_scale
        kinds = np.searchsorted(self._KIND_EDGES, r.random(n_spans), side="right")
        n_text = int((kinds == 0).sum())
        wc = r.integers(3, 12, size=n_text)
        word_idx = r.integers(0, len(_WORDS), size=int(wc.sum()))
        w_off = np.concatenate(([0], np.cumsum(wc))).tolist()
        n_link = int((kinds == 1).sum())
        anchor_idx = r.integers(0, len(_WORDS), size=2 * n_link).tolist()
        targets = self._link_targets(r, host_i, n_link)
        n_img = int((kinds == 2).sum())
        img_id = r.integers(0, 50, size=n_img).tolist()
        img_alt = r.integers(0, 9, size=n_img).tolist()
        n_vid = int((kinds == 3).sum())
        vid_id = r.integers(0, 20, size=n_vid).tolist()
        vid_alt = r.integers(0, 9, size=n_vid).tolist()
        host = self.hosts[host_i]
        wl = word_idx.tolist()
        parts = [f"<html><head><title>{_esc(title)}</title></head><body>"]
        it = ic = ii = iv = 0
        for k in kinds.tolist():
            if k == 0:
                a, b = w_off[it], w_off[it + 1]
                it += 1
                parts.append("<p>")
                parts.append(" ".join([_WORDS[j] for j in wl[a:b]]))
                parts.append("</p>")
            elif k == 1:
                parts.append('<a href="')
                parts.append(_esc(targets[ic]))
                parts.append('">')
                parts.append(_WORDS[anchor_idx[2 * ic]])
                parts.append(" ")
                parts.append(_WORDS[anchor_idx[2 * ic + 1]])
                parts.append("</a>")
                ic += 1
            elif k == 2:
                parts.append(
                    f'<img src="http://{host}/img{img_id[ii]}.jpg" alt="alt {img_alt[ii]}">'
                )
                ii += 1
            else:
                parts.append(
                    f'<video src="http://{host}/vid{vid_id[iv]}.mp4">clip {vid_alt[iv]}</video>'
                )
                iv += 1
        parts.append("</body></html>")
        return "".join(parts)

    def _link_targets(self, r: np.random.Generator, host_i: int, n: int) -> list:
        """All link targets for one page, with batched draws.  Same
        distributions as of old: Zipf-ish hub bias for cross-host links,
        dup_link_frac non-canonical spellings, redirect_frac 301 aliases
        (guarded draw: redirect_frac == 0 must not consume RNG state, so
        default fixtures are independent of the redirect feature)."""
        cfg = self.cfg
        if n == 0:
            return []
        cross = r.random(n) < cfg.cross_host_frac
        tgt_host = np.full(n, host_i, dtype=np.int64)
        n_cross = int(cross.sum())
        if n_cross:
            z = r.zipf(1.4, size=n_cross).astype(np.int64) - 1
            tgt_host[cross] = np.minimum(z, cfg.n_hosts - 1)
        # uniform page pick per target host (r.random < 1.0 so the floor
        # stays strictly below the page count)
        tgt_page = (r.random(n) * self.page_counts[tgt_host]).astype(np.int64)
        redir = (
            r.random(n) < cfg.redirect_frac
            if cfg.redirect_frac > 0
            else np.zeros(n, dtype=bool)
        )
        dup = r.random(n) < cfg.dup_link_frac
        variants = r.integers(0, 5, size=n)
        sess = r.integers(0, 1 << 30, size=n)
        frag = r.integers(0, 9, size=n)
        out = []
        for i in range(n):
            h, p = int(tgt_host[i]), int(tgt_page[i])
            if redir[i]:
                out.append(f"http://{self.hosts[h]}/r{p}.html")
                continue
            url = self.page_url(h, p)
            if not dup[i]:
                out.append(url)
                continue
            # non-canonical spelling of the same target (URL-seen exercise)
            v = int(variants[i])
            hostpart, _, path = url[7:].partition("/")
            if v == 0:
                out.append(url + "?PHPSESSID=" + format(int(sess[i]), "x"))
            elif v == 1:
                out.append(url + "#frag" + str(int(frag[i])))
            elif v == 2:
                out.append("http://" + hostpart.upper() + "/" + path)
            elif v == 3:
                out.append("http://" + hostpart + ":80/" + path)
            elif h == host_i:
                # relative form — only meaningful for same-host targets
                out.append("/" + path)
            else:
                out.append(url)
        return out

    # -- all-pages iterators (fixture materialization) --------------------
    def iter_pages(self):
        for i in range(self.cfg.n_hosts):
            for p in range(int(self.page_counts[i])):
                yield i, p

    def total_pages(self) -> int:
        return int(self.page_counts.sum())

    def documents_table(self):
        """Materialize the full corpus in the input_hint shape:
        (doc_id:string, spans:list<struct<kind,text,media_ref,offset>>)."""
        import pyarrow as pa

        doc_ids, spans = [], []
        for i, p in self.iter_pages():
            doc_ids.append(self.page_url(i, p))
            spans.append(self.page_spans(i, p))
        span_type = pa.list_(
            pa.struct(
                [
                    ("kind", pa.string()),
                    ("text", pa.string()),
                    ("media_ref", pa.string()),
                    ("offset", pa.int32()),
                ]
            )
        )
        return pa.table(
            {"doc_id": pa.array(doc_ids, pa.string()), "spans": pa.array(spans, span_type)}
        )

    def seeds(self) -> list:
        """Seed URLs: roots of every 3rd host, mixed spellings
        (FIXTURES.md §3).  Stride 3 is coprime with the robots-template
        period so seeds land on hosts with disallow rules, UA-specific
        groups, crawl-delays, and failure modes."""
        out = []
        for i in range(0, self.cfg.n_hosts, 3):
            u = self.page_url(i, 0)
            if i % 8 == 4:
                u = u.rstrip("/").upper() + "/"  # non-canonical spelling
            out.append(u)
        return out

    def site_list(self) -> list:
        """Site-list lines: all fixture domains except every 17th host
        (exercises the '!insitelist → force delete' rule)."""
        lines = []
        for i in range(self.cfg.n_hosts):
            if i % 17 == 13:
                continue
            host = self.hosts[i]
            dom = host[4:] if host.startswith("www.") else host
            lines.append(dom)
        return lines


# ---------------------------------------------------------------------------
# HTML render / parse — the spans ↔ HTML round trip
# ---------------------------------------------------------------------------

_ESC = {"&": "&amp;", "<": "&lt;", ">": "&gt;", '"': "&quot;"}
_UNESC = {v: k for k, v in _ESC.items()}


def _esc(s: str) -> str:
    # & first so later replacements' own '&' survives (equivalent to a
    # single-pass alternation; fast path: fixture text rarely needs it)
    if "&" in s or "<" in s or ">" in s or '"' in s:
        return (
            s.replace("&", "&amp;")
            .replace("<", "&lt;")
            .replace(">", "&gt;")
            .replace('"', "&quot;")
        )
    return s


def _unesc(s: str) -> str:
    # &amp; last (single-pass-equivalent: the other replacements insert
    # only non-entity single chars, so they cannot create a new '&amp;')
    if "&" not in s:
        return s
    return (
        s.replace("&lt;", "<")
        .replace("&gt;", ">")
        .replace("&quot;", '"')
        .replace("&amp;", "&")
    )


def render_html(spans, title: str = "") -> str:
    """Serialize a span sequence to HTML (spans must be offset-ordered)."""
    parts = [f"<html><head><title>{_esc(title)}</title></head><body>"]
    for s in spans:
        k = s["kind"]
        if k == "text":
            parts.append(f"<p>{_esc(s['text'])}</p>")
        elif k == "link":
            parts.append(f'<a href="{_esc(s["media_ref"])}">{_esc(s["text"])}</a>')
        elif k == "image":
            parts.append(f'<img src="{_esc(s["media_ref"])}" alt="{_esc(s["text"])}">')
        elif k == "video":
            parts.append(f'<video src="{_esc(s["media_ref"])}">{_esc(s["text"])}</video>')
    parts.append("</body></html>")
    return "".join(parts)


_NODE = re.compile(
    # one-char discriminator groups (p/a/i/v) let findall() name the
    # matched alternative without Match objects — a literal char group
    # is non-empty iff its alternative matched, unlike content groups
    # which are "" both when unmatched and when matched-empty
    r"<(p)>(.*?)</p>"
    r'|<(a) href="([^"]*)">(.*?)</a>'
    r'|<(i)mg src="([^"]*)" alt="([^"]*)">'
    r'|<(v)ideo src="([^"]*)">(.*?)</video>',
    re.S,
)


def parse_html_columnar(html: str) -> tuple:
    """Parse HTML into parallel span columns (kinds, texts, media_refs)
    — offset is the list index.  The engine-side equivalent of the
    reference's Xml/Words/Links node extraction (Xml.cpp,
    XmlDoc.cpp:15227-15258) for the fixture's HTML subset; columnar so
    the hot parse path builds Arrow children directly instead of one
    dict per span."""
    kinds: list = []
    texts: list = []
    refs: list = []
    parse_html_into(html, kinds.append, texts.append, refs.append)
    return kinds, texts, refs


def parse_html_into(html: str, ka, ta, ra) -> int:
    """Accumulator form of :func:`parse_html_columnar`: appends each
    span's kind/text/media_ref through the three append callables and
    returns the span count.  Lets a batch parser build ONE flat column
    per field across many pages (Arrow list<struct> children) without
    per-page intermediate lists + a second flattening walk."""
    n = 0
    # findall() returns C-built tuples (no Match objects / .group calls
    # in the hot loop); groups 0-indexed: p=0, ptext=1, a=2, href=3,
    # anchor=4, i=5, imgsrc=6, alt=7, v=8, vsrc=9, vtext=10
    for tup in _NODE.findall(html):
        if tup[0]:
            ka("text")
            ta(_unesc(tup[1]))
            ra("")
        elif tup[2]:
            ka("link")
            ta(_unesc(tup[4]))
            ra(_unesc(tup[3]))
        elif tup[5]:
            ka("image")
            ta(_unesc(tup[7]))
            ra(_unesc(tup[6]))
        else:
            ka("video")
            ta(_unesc(tup[10]))
            ra(_unesc(tup[9]))
        n += 1
    return n


def parse_html(html: str) -> list:
    """Row form of ``parse_html_columnar``: list of span dicts
    (kind, text, media_ref, offset)."""
    kinds, texts, refs = parse_html_columnar(html)
    return [
        {"kind": k, "text": t, "media_ref": r, "offset": i}
        for i, (k, t, r) in enumerate(zip(kinds, texts, refs))
    ]


# ---------------------------------------------------------------------------
# Fetch simulation
# ---------------------------------------------------------------------------


@dataclass
class FetchResult:
    url: str
    http_status: int
    err_code: int  # urlfilter.ERR_* vocabulary
    html: str
    latency_ms: int
    robots_txt: str  # body served for this host ("" = none)
    location: str = ""  # 30x Location header


def fetch_url(web: SynthWeb, url: str) -> FetchResult:
    """Simulate one HTTP fetch against the synthetic web.  Deterministic;
    robots gating is NOT applied here (the scheduler owns it, as in the
    reference where Msg13 checks robots before the GET,
    XmlDoc.cpp:7115-7360)."""
    from ..functions import urlfilter as uf

    loc = web.url_to_page(canonicalize(url) or url)
    m = re.match(r"https?://([^/:]+)", url)
    host = m.group(1).lower() if m else ""
    hi = web._host_idx.get(host)
    if hi is None:
        return FetchResult(url, 0, uf.ERR_DNS, "", 50, "")
    fail = web.fail_mode(hi)
    lat = web.latency_ms(hi)
    robots = web.robots_txt(hi)
    if fail == "dns":
        return FetchResult(url, 0, uf.ERR_DNS, "", lat, robots)
    if fail == "tcp_timeout":
        return FetchResult(url, 0, uf.ERR_TCP_TIMEOUT, "", lat, robots)
    if fail == "http_500":
        return FetchResult(url, 500, uf.ERR_HTTP_500, "", lat, robots)
    target = web.redirect_target(url)
    if target is not None:
        # simplified 301: not indexed; the target is emitted as the
        # page's single outlink (XmlDoc.cpp:3989-3993, 5657)
        return FetchResult(url, 301, uf.ERR_SIMPLIFIED_REDIR, "", lat, robots, location=target)
    if loc is None:
        return FetchResult(url, 404, uf.ERR_HTTP_404, "", lat, robots)
    return FetchResult(
        url, 200, uf.ERR_NONE, web.page_html(*loc, title=url), lat, robots
    )
