"""URL canonicalization + decomposition, mirroring the subset of
Gigablast's ``Url::set`` (reference: Url.cpp:794-2298) that the synthetic
fixtures exercise.

Canonical form drives ``uh48`` and therefore crawl ordering *and* the
URL-seen set, so the engine and the pure-Python oracle share exactly this
code.  The ported subset (each item has a reference anchor):

- leading/trailing whitespace + control-char strip        (Url.cpp:814-840)
- default scheme ``http://`` when missing                 (Url.cpp:882-905)
- scheme + host lowercased                                (Url.cpp:997-1010)
- non-ASCII hosts punycoded (IDNA)                        (Url.cpp:964-1005, Punycode.cpp)
- fragment (``#...``) stripped ("stripPound")             (Url.cpp:853-867)
- default port stripped (``:80`` http / ``:443`` https)   (Url.cpp:1095-1118)
- relative URLs resolved against the base URL             (Url.cpp:43-137)
- ``www.`` added for naked domains when ``add_www``       (Url.cpp:1223-1236)
- session-id / tracker params stripped ("stripParams"):
  PHPSESSID, jsessionid (incl. path ``;jsessionid=...``), osCsid, XTCsid,
  CFID, CFTOKEN, sid, session_id, sessionid                (Url.cpp:347-790)
- empty query (bare ``?``) dropped; path defaults to ``/``
- non-ASCII path/query chars percent-encoded as uppercase UTF-8 %XX
  (Url.cpp:967-990 → urlEncode, fctypes.cpp:932-980; existing %xx
  escapes pass through untouched, as in the reference)

Not ported (documented divergence, fixtures avoid them): ``..`` path
folding subtleties for malformed paths, the versioned
``stripParametersv122`` variants, mid-URL whitespace truncation (we
strip whitespace instead of truncating at it).
"""

from __future__ import annotations

import re
from urllib.parse import urljoin, urlsplit, urlunsplit

import numpy as np

# session-id query parameters stripped by the reference's UrlParser
# component matchers (Url.cpp:347-790); matched case-insensitively.
SESSION_PARAMS = frozenset(
    {
        "phpsessid",
        "jsessionid",
        "oscsid",
        "xtcsid",
        "cfid",
        "cftoken",
        "sid",
        "session_id",
        "sessionid",
    }
)

_JSESSIONID_PATH = re.compile(r";jsessionid=[^;?#/]*", re.IGNORECASE)
_WS = re.compile(r"[\s\x00-\x1f]+")

MAX_URL_LEN = 1024  # reference Url.h:9

# fast path: URLs matching this are provably already canonical (lowercase
# scheme+host, no port/query/fragment/escapes/path-session-ids), so
# canonicalize(u) == u and the urllib machinery can be skipped.  This is
# a pure optimization — the slow path gives identical results.
_CANONICAL_RX = re.compile(r"^https?://[a-z0-9\-]+(?:\.[a-z0-9\-]+)+/[A-Za-z0-9._~/\-]*$")

# media/binary extensions excluded from the frontier
# (reference: Url.cpp:1575-1741 s_badExtensions + wmv/mp4 additions at 1766,
# consumed by the outlink filter at XmlDoc.cpp:15293-15303)
MEDIA_EXTENSIONS = frozenset(
    """ai aif aifc aiff avi bin bmp bz2 gif gtar gz jpe jpeg jpg mid midi mov
    movie mp2 mp3 mpe mpeg mpg mpga pbm pdb pgm png pnm ppm qt ra ram ras rgb
    rm rpm deb snd swf tar tif tiff wav xbm zip wmv mp4 webm ogg ogv flv
    mkv""".split()
)
SCRIPT_EXTENSIONS = frozenset({"js", "css"})
JSON_EXTENSIONS = frozenset({"json"})

# reference: isTLDInPrivacoreBlacklist (Url.cpp) — we keep a tiny fixture
# blacklist with the same semantics (drop outlinks whose TLD is listed)
TLD_BLACKLIST = frozenset({"xxx", "adult"})


def canonicalize(url: str, base: str | None = None, add_www: bool = False) -> str | None:
    """Return the canonical form of ``url`` (resolved against ``base``), or
    None if the result is not a fetchable http(s) URL."""
    if url is None:
        return None
    if not add_www and len(url) <= MAX_URL_LEN and _CANONICAL_RX.match(url):
        return url  # already canonical (see _CANONICAL_RX)
    # strip embedded/leading/trailing whitespace + control chars
    # (reference strips \r\n\t and leading junk, Url.cpp:814-840)
    u = _WS.sub("", url)
    if not u:
        return None
    if base:
        u = urljoin(base, u)
    if "://" not in u:
        if u.startswith("//"):
            u = "http:" + u
        elif re.match(r"^[A-Za-z][A-Za-z0-9+.\-]*:", u):
            return None  # non-http scheme (javascript:, mailto:, ...)
        else:
            u = "http://" + u
    try:
        parts = urlsplit(u)
        port = parts.port
    except ValueError:
        return None
    scheme = parts.scheme.lower()
    if scheme not in ("http", "https"):
        return None
    host = parts.hostname
    if not host:
        return None
    if parts.netloc.startswith("["):
        return None  # IPv6 literals are not crawlable hosts here
    host = host.lower().rstrip(".")
    try:
        host.encode("ascii")
    except UnicodeEncodeError:
        try:
            host = host.encode("idna").decode("ascii")
        except UnicodeError:
            return None
    default_port = 80 if scheme == "http" else 443
    netloc = host if (port is None or port == default_port) else f"{host}:{port}"
    if add_www and "." in host and _registered_domain(host) == host:
        netloc = "www." + netloc
    path = parts.path or "/"
    path = _JSESSIONID_PATH.sub("", path)
    if not path.startswith("/"):
        path = "/" + path
    query = _strip_session_params(parts.query)
    path = _encode_non_ascii(path)
    query = _encode_non_ascii(query)
    out = urlunsplit((scheme, netloc, path, query, ""))
    if len(out) > MAX_URL_LEN:
        return None  # reference MAX_URL_LEN (Url.h:9)
    return out


def _encode_non_ascii(s: str) -> str:
    """Percent-encode non-ASCII chars as uppercase UTF-8 %XX
    (urlEncode, fctypes.cpp:932-980); ASCII — including existing %xx
    escapes — passes through unchanged."""
    if s.isascii():
        return s
    return "".join(
        c if ord(c) < 128 else "".join(f"%{b:02X}" for b in c.encode("utf-8"))
        for c in s
    )


def _strip_session_params(query: str) -> str:
    if not query:
        return ""
    kept = [
        kv
        for kv in query.split("&")
        if kv and kv.split("=", 1)[0].lower() not in SESSION_PARAMS
    ]
    return "&".join(kept)


# minimal multi-label public suffixes the fixtures/tests use; real
# deployments would ship the full PSL as a broadcast artifact
_MULTI_SUFFIXES = frozenset({"co.uk", "ac.uk", "com.au", "co.jp", "com.br"})


def get_host(url: str) -> str:
    h = urlsplit(url).hostname or ""
    return h.lower()


def _registered_domain(host: str) -> str:
    labels = host.split(".")
    if len(labels) <= 2:
        return host
    if ".".join(labels[-2:]) in _MULTI_SUFFIXES:
        return ".".join(labels[-3:])
    return ".".join(labels[-2:])


def get_domain(url_or_host: str) -> str:
    host = url_or_host if "://" not in url_or_host else get_host(url_or_host)
    return _registered_domain(host.lower())


def get_tld(url_or_host: str) -> str:
    d = get_domain(url_or_host)
    return d.rsplit(".", 1)[-1] if "." in d else d


def is_www(url: str) -> bool:
    """reference Spider.cpp:2753-2780 — literal 'www' prefix on the host."""
    return get_host(url).startswith("www")


def get_path_with_query(url: str) -> str:
    p = urlsplit(url)
    path = p.path or "/"
    return path + (("?" + p.query) if p.query else "")


def get_extension(url: str) -> str:
    path = urlsplit(url).path
    last = path.rsplit("/", 1)[-1]
    if "." not in last:
        return ""
    return last.rsplit(".", 1)[-1].lower()


def outlink_check(url: str) -> str | None:
    """Source-independent part of the outlink admission filter
    (reference: XmlDoc.cpp:15275-15311): returns the URL's host when it
    passes, else None.  Drops non-http(s), tiny hostnames (<=2 chars),
    media/script/json extensions, and blacklisted TLDs.  Pure in ``url``,
    so callers may cache the result per URL string."""
    if not url.startswith(("http://", "https://")):
        return None
    host = get_host(url)
    if len(host) <= 2:
        return None
    ext = get_extension(url)
    if ext in MEDIA_EXTENSIONS or ext in SCRIPT_EXTENSIONS or ext in JSON_EXTENSIONS:
        return None
    if get_tld(host) in TLD_BLACKLIST:
        return None
    return host


def outlink_ok(url: str, source_url: str | None = None) -> bool:
    """Frontier admission filter for one outlink: ``outlink_check`` plus
    the self-link drop (XmlDoc.cpp:15458)."""
    if source_url is not None and url == source_url:
        return False
    return outlink_check(url) is not None


def canonicalize_batch(urls, bases=None, add_www: bool = False) -> list:
    """Batch canonicalization. Returns a list with None for rejects.

    String canonicalization is inherently per-string work; this keeps the
    Python-level loop out of callers and is the single place to optimize
    (the regex/urllib costs dominate, not the loop).
    """
    if bases is None:
        return [canonicalize(u, None, add_www) for u in urls]
    return [canonicalize(u, b, add_www) for u, b in zip(urls, bases)]


def hosts_batch(urls) -> np.ndarray:
    return np.array([get_host(u) for u in urls], dtype=object)
