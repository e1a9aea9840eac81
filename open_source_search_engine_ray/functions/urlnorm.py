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
folding subtleties for malformed paths and the LEGACY v122 param-strip
variants (``stripParametersv122`` applies only to titledbVersion ≤ 122
records; this engine models the modern UrlParser path, ported further
down).  Mid-URL whitespace now TRUNCATES there (Url.cpp:992-994) and
``http://http://`` collapses (Url.cpp:1012-1017).
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
_WS = re.compile(r"[\s\x00-\x1f]")
_LEAD_WS = re.compile(r"^[\s\x00-\x1f]+")

MAX_URL_LEN = 1024  # reference Url.h:9

# fast path: URLs matching this are provably already canonical (lowercase
# scheme+host, no port/query/fragment/escapes/path-session-ids), so
# canonicalize(u) == u and the urllib machinery can be skipped.  This is
# a pure optimization — the slow path gives identical results.
_CANONICAL_RX = re.compile(r"^https?://[a-z0-9\-]+(?:\.[a-z0-9\-]+)+/[A-Za-z0-9._~/\-]*$")
# Post-IDNA ASCII host must stay within the hostname charset
# (Url.cpp:964-1005 charset walk); nameprep can otherwise smuggle
# whitespace into a punycoded label.
_HOST_CHARSET_RX = re.compile(r"[a-z0-9.\-]+")
# URLs whose PATH could carry a strippable session-id pair must take the
# slow path so /CFID/123 and /cfid/123 canonicalize identically
_PATH_SESSION_RISK = re.compile(
    r"(?i)oscsid|oscadminid|xtcsid|cftoken|cfid|phpsessid|jsessionid|saplb_"
)

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


def canonicalize(
    url: str,
    base: str | None = None,
    add_www: bool = False,
    titledb_version: int = 128,
) -> str | None:
    """Return the canonical form of ``url`` (resolved against ``base``), or
    None if the result is not a fetchable http(s) URL.

    ``titledb_version`` mirrors Url::set's gate (Url.cpp:1048-1062):
    <= 122 applies the legacy single-pass ``strip_parameters_v122``
    instead of the modern UrlParser strip — used when reading
    legacy-version records."""
    if url is None:
        return None
    if (
        not add_www
        and len(url) <= MAX_URL_LEN
        and _CANONICAL_RX.match(url)
        and not _PATH_SESSION_RISK.search(url)
    ):
        return url  # already canonical (see _CANONICAL_RX)
    # leading whitespace/control junk stripped, then TRUNCATE at the
    # first internal whitespace (Url.cpp:992-994: the copy loop breaks
    # on is_wspace_a), and collapse the common http://http:// mistake
    # (Url.cpp:1012-1017)
    u = _LEAD_WS.sub("", url)
    m = _WS.search(u)
    if m:
        u = u[: m.start()]
    while len(u) > 14 and u[:14].lower() == "http://http://":
        u = u[7:]
    if not u:
        return None
    if base:
        try:
            u = urljoin(base, u)
        except ValueError:
            return None  # e.g. "http://[" — invalid IPv6 netloc raises
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
    if "[" in parts.netloc or "]" in parts.netloc:
        # IPv6 literals are not crawlable hosts here; brackets anywhere
        # else in the netloc (e.g. "www.[::1]") are malformed — urllib
        # would otherwise yield a bare unbracketed v6 "host" that fails
        # re-canonicalization (hypothesis-found)
        return None
    host = host.lower().rstrip(".")
    if not host:
        return None  # e.g. "//.." resolves to a dots-only host
    try:
        host.encode("ascii")
    except UnicodeEncodeError:
        try:
            host = host.encode("idna").decode("ascii")
        except UnicodeError:
            return None
        # Nameprep can map chars to SPACE or other junk INSIDE the
        # punycoded label (e.g. U+00A8 -> " ̈" -> "xn-- -ccb"), breaking
        # idempotence: a later whitespace-truncation pass would mangle
        # the re-canonicalized form into a different identity
        # (hypothesis-found).  Url.cpp's host charset walk
        # (Url.cpp:964-1005) rejects such hosts; mirror it here.
        if not _HOST_CHARSET_RX.fullmatch(host):
            return None
    default_port = 80 if scheme == "http" else 443
    netloc = host if (port is None or port == default_port) else f"{host}:{port}"
    if add_www and "." in host and _registered_domain(host) == host:
        netloc = "www." + netloc
    path = parts.path or "/"
    if titledb_version <= 122:
        # legacy single-pass strip over path+query (Url.cpp:1048-1051)
        pq = path + ("?" + parts.query if parts.query else "")
        pq = strip_parameters_v122(pq)
        path, _, query = pq.partition("?")
        path = path or "/"
    else:
        path = strip_path_params(path)
        query = strip_parameters(parts.query, _registered_domain(host))
    if not path.startswith("/"):
        path = "/" + path
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


# ---------------------------------------------------------------------------
# UrlParser::stripParameters port (the modern titledbVersion>122 path:
# Url.cpp:347-790 with UrlComponent validator semantics,
# UrlComponent.cpp:152-251).  Each rule is (key, partial, case_sensitive,
# validators); a validator is (min_len, max_len, allow_empty, allow_bits,
# mandatory_bits) with the reference's bit meanings.  A param is removed
# when its key matches and ANY validator accepts its value.
# ---------------------------------------------------------------------------

A_DIGIT, A_HEX, A_ALPHA, A_ALPHA_LO, A_ALPHA_UP, A_PUNCT = 1, 2, 4, 8, 16, 32
M_DIGIT, M_ALPHA_HEX, M_ALPHA, M_ALPHA_LO, M_ALPHA_UP, M_PUNCT = 1, 2, 4, 8, 16, 32
_DEFAULT_V = (0, 0, True, 0, 0)  # s_defaultParamValidator (Url.cpp:355)
_PUNCT_SET = frozenset("!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~")


def _validate(value: str, spec: tuple) -> bool:
    """UrlComponent::Validator::isValid (UrlComponent.cpp:152-251)."""
    mn, mx, allow_empty, allow, mandatory = spec
    n = len(value)
    if n == 0 and allow_empty:
        return True
    if (mn and n < mn) or (mx and mx < n):
        return False
    if allow == 0 and mandatory == 0:
        return True
    has_alpha = hex_lo = hex_up = nohex_lo = nohex_up = has_digit = has_punct = False
    for c in value:
        if c.isascii() and c.isalpha():
            has_alpha = True
            if "a" <= c <= "f":
                hex_lo = True
            elif "A" <= c <= "F":
                hex_up = True
            elif c.islower():
                nohex_lo = True
            else:
                nohex_up = True
        elif c.isdigit() and c.isascii():
            has_digit = True
        elif c in _PUNCT_SET:
            has_punct = True
    ok = True
    if allow:
        allow_alpha = bool(allow & (A_HEX | A_ALPHA | A_ALPHA_LO | A_ALPHA_UP))
        ok = not (
            (not allow_alpha and has_alpha)
            or (not allow & (A_ALPHA | A_ALPHA_LO) and nohex_lo)
            or (not allow & (A_ALPHA | A_ALPHA_UP) and nohex_up)
            or (not allow_alpha and (hex_lo or hex_up))
            or (not allow & (A_DIGIT | A_HEX) and has_digit)
            or (not allow & A_PUNCT and has_punct)
        )
    if ok and mandatory:
        ok = (
            (not mandatory & (M_ALPHA_HEX | M_ALPHA | M_ALPHA_LO | M_ALPHA_UP) or has_alpha)
            and (not mandatory & M_ALPHA_LO or hex_lo or nohex_lo)
            and (not mandatory & M_ALPHA_UP or hex_up or nohex_up)
            and (not mandatory & M_ALPHA_HEX or hex_lo or hex_up)
            and (not mandatory & M_DIGIT or has_digit)
            and (not mandatory & M_PUNCT or has_punct)
        )
    return ok


# session-id query rules, reference order (Url.cpp:369-646)
_QUERY_RULES = (
    ("oscsid", False, False, (_DEFAULT_V,)),
    ("oscadminid", False, False, (_DEFAULT_V,)),
    ("XTCsid", False, True, (_DEFAULT_V,)),
    ("cftoken", False, False, (_DEFAULT_V,)),
    ("cfid", False, False, (_DEFAULT_V,)),
    ("cftokenpass", False, False, (_DEFAULT_V,)),
    ("atl_token", False, False, ((65, 0, True, 0, 0), (40, 40, True, A_HEX, 0), (10, 10, True, A_ALPHA | A_DIGIT, 0))),
    # psession/POSTNUKESID keep the reference's 3-positional Validator
    # calls, whose third arg lands in allowEmpty (faithful, bug included)
    ("psession", False, False, ((24, 0, True, 0, 0),)),
    ("postnukesid", False, False, ((16, 32, True, 0, 0),)),
    ("galileosession", False, False, ((19, 19, False, 0, 0),)),
    ("jsessionid", True, False, ((20, 0, True, 0, 0),)),
    ("phpsessid", True, False, (_DEFAULT_V,)),
    ("auth_sess", False, False, ((26, 32, True, A_DIGIT | A_ALPHA, 0),)),
    ("ps_sess_id", False, False, ((32, 32, True, A_HEX, 0),)),
    ("mysid", False, False, ((32, 32, False, A_HEX, 0), (22, 22, False, 0, M_ALPHA), (8, 8, False, A_ALPHA, 0))),
    ("sid", False, False, (
        (30, 0, False, 0, 0),
        (26, 26, False, A_ALPHA | A_DIGIT, 0),
        (6, 6, False, A_ALPHA | A_DIGIT, M_ALPHA_LO | M_ALPHA_UP),
        (6, 6, False, A_ALPHA | A_DIGIT, M_ALPHA_LO | M_DIGIT),
        (6, 6, False, A_ALPHA | A_DIGIT, M_ALPHA_UP | M_DIGIT),
    )),
    ("ses", False, False, (
        (34, 34, False, A_ALPHA | A_DIGIT, M_ALPHA | M_DIGIT),
        (32, 32, False, A_HEX, 0),
        (26, 26, False, A_ALPHA | A_DIGIT, M_ALPHA | M_DIGIT),
    )),
    ("s", False, False, ((40, 40, False, A_HEX, M_ALPHA_HEX), (32, 32, False, A_HEX, M_ALPHA_HEX))),
    ("session_id", False, False, ((16, 0, False, 0, M_ALPHA),)),
    ("sessionid", False, False, ((20, 0, False, 0, M_ALPHA),)),
    ("sessid", True, False, (
        (52, 52, False, A_ALPHA | A_DIGIT, M_ALPHA | M_DIGIT),
        (40, 40, False, A_HEX, M_ALPHA_HEX),
        (32, 32, False, A_HEX, M_ALPHA_HEX),
        (26, 26, False, A_ALPHA | A_DIGIT, M_ALPHA | M_DIGIT),
    )),
    ("session", False, False, ((20, 0, False, 0, M_ALPHA | M_DIGIT),)),
    ("sess", False, False, ((20, 0, False, A_ALPHA | A_DIGIT, 0),)),
    ("ts", False, False, ((13, 13, False, A_DIGIT, 0),)),
    ("trk", False, False, ((0, 0, False, 0, M_ALPHA | M_PUNCT),)),
)

# unconditional tracking params (Url.cpp:663-719, 744)
_TRACKING_PARAMS = frozenset(
    {
        "elqtrackid", "elq", "elqcampaignid", "elqaid", "elqat", "elq_mid",
        "elq_cid", "elq2",
        "utm_source", "utm_medium", "utm_term", "utm_content", "utm_campaign",
        "utm_hp_ref", "utm_rid", "gclid", "gclsrc",
        "pk_campaign", "pk_kwd", "pk_source", "pk_medium", "pk_keyword",
        "pk_content", "pk_cid",
        "owa_medium", "owa_source", "owa_campaign", "owa_ad", "owa_ad_type",
        "wt.mc_id", "mc_cid", "mc_eid", "mkt_tok", "partnerref",
    }
)

_AMAZON_PARAMS = frozenset({"tag", "coliid", "colid", "ref"})
_EBAY_PARAMS = frozenset({"icep_ff3", "pub", "toolid", "campid", "customid", "afepn", "pid"})


def strip_parameters(query: str, domain: str = "") -> str:
    """Query-string half of stripParameters (Url.cpp:347-790)."""
    if not query:
        return ""
    # the reference's UrlParser splits query params on both '&' and ';'
    # (UrlComponent separators) and preserves each param's separator
    pieces = re.split(r"([&;])", query)
    params = []  # [raw, key_raw, key_lower, value, deleted, leading_sep]
    for i in range(0, len(pieces), 2):
        raw = pieces[i]
        if not raw:
            continue
        k, _, v = raw.partition("=")
        params.append([raw, k, k.lower(), v, False, pieces[i - 1] if i else ""])
    for key, partial, case, validators in _QUERY_RULES:
        for p in params:
            if p[4]:
                continue
            pk = p[1] if case else p[2]
            kk = key if case else key.lower()
            if (kk in pk) if partial else (pk == kk):
                if any(_validate(p[3], v) for v in validators):
                    p[4] = True
    # apache dir-sort ?C=N;O=A (Url.cpp:627-661)
    live = [p for p in params if not p[4]]
    if len(live) <= 2:
        for p in live:
            if p[1] == "C" and p[3] in ("", "N", "M", "S", "D"):
                p[4] = True
            elif p[1] == "O" and p[3] in ("", "A", "D"):
                p[4] = True
    for p in params:
        if not p[4] and p[2] in _TRACKING_PARAMS:
            p[4] = True
        # "who" (Url.cpp:727-741): r,-prefixed ≤130 or any ≥130
        if not p[4] and p[2] == "who":
            if (len(p[3]) <= 130 and p[3].startswith("r,")) or len(p[3]) >= 130:
                p[4] = True
    if domain:
        if domain.startswith("amazon."):
            for p in params:
                if p[2] in _AMAZON_PARAMS:
                    p[4] = True
        elif domain.startswith("ebay."):
            for p in params:
                if p[2] in _EBAY_PARAMS:
                    p[4] = True
    live = [p for p in params if not p[4]]
    out = []
    for j, p in enumerate(live):
        if j:
            out.append(p[5] or "&")
        out.append(p[0])
    return "".join(out)


# ---------------------------------------------------------------------------
# LEGACY stripParametersv122 port (Url.cpp:162-345): the single-pass
# strip applied to titledbVersion <= 122 records (Url.cpp:1048-1051).
# One matched parameter is removed per call, chosen by a fixed priority
# ladder; unlike the modern UrlParser path there is no re-scan.  Kept
# for reading legacy-version records; the engine's canonical form uses
# the modern path (canonicalize(titledb_version=128) default).
# ---------------------------------------------------------------------------

# (needle, skip_len, case_insensitive, needs_session_id_value) in the
# exact ladder order of Url.cpp:176-293; the duplicate osCsid/XTCsid
# block at Url.cpp:212-220 is omitted (it can never match when the
# first one failed — same needles, same guard)
_V122_LADDER = (
    ("PHPSESSID=", 10, True, False),
    ("SID=", 4, False, False),
    ("osCsid=", 7, False, True),
    ("XTCsid=", 7, False, True),
    ("osCsid/", 7, False, True),
    ("sid=", 4, False, True),
    ("jsessionid=", 11, True, False),
    ("vbsessid=", 9, True, False),
    ("asesessid=", 10, True, False),
    ("nlsessid=", 9, True, False),
    ("psession=", 9, True, False),
    ("session_id=", 11, True, False),
    ("sessionid=", 10, True, False),
    ("sessid=", 7, True, False),
    ("session=", 8, True, False),
    ("session/", 8, True, False),
    ("POSTNUKESID=", 12, True, False),
    ("auth_sess=", 10, True, False),
    ("mysid=", 6, True, False),
    ("oscsid=", 7, True, False),
    ("cg_sess=", 8, True, False),
    ("galileoSession", 14, True, False),
    ("sess=", 5, True, False),
    (".php?s=", 0, False, False),  # special: 32-hex value (Url.cpp:246-263)
    ("SES=", 4, False, False),
    ("elq=", 4, True, False),
    ("elqat=", 6, True, False),
    ("elqaid=", 7, True, False),
    ("elq_mid=", 8, True, False),
    ("elqTrackId=", 11, True, False),
    ("utm_term=", 9, True, False),
    ("utm_hp_ref=", 11, True, False),
    ("utm_source=", 11, True, False),
    ("utm_medium=", 11, True, False),
    ("utm_content=", 12, True, False),
    ("utm_campaign=", 13, True, False),
    ("pk_kwd=", 7, True, False),
    ("pk_source=", 10, True, False),
    ("pk_medium=", 10, True, False),
    ("pk_campaign=", 12, True, False),
    ("trk=", 4, True, False),
    ("promoid=", 8, True, False),
    ("promCode=", 9, True, False),
    ("promoCode=", 10, True, False),
    ("partnerref=", 11, True, False),
)

_HEX_LO = frozenset("0123456789abcdef")


def _v122_is_session_id(tail: str) -> bool:
    """isSessionId (Url.cpp:141-160): the REST OF THE URL from the value
    start must be lowercase-hex, >= 12 chars, with at least one a-f."""
    count = 0
    nonnum = 0
    for c in tail:
        count += 1
        if c.isdigit():
            continue
        nonnum += 1
        if c not in _HEX_LO:
            return False
    return nonnum > 0 and count >= 12


def strip_parameters_v122(s: str) -> str:
    """One pass of the legacy session-id/tracker strip
    (stripParametersv122, Url.cpp:162-345) over a full URL string."""
    # p = first '?' or ';' (Url.cpp:172-179)
    qpos = len(s)
    for i, c in enumerate(s):
        if c in "?;":
            qpos = i
            break
    if qpos == len(s):
        return s
    sl = s.lower()
    tt = -1
    x = 0
    for needle, skip, ci, need_sess in _V122_LADDER:
        if needle == ".php?s=":
            # strstr(p-4, ".php?s=") then require 32 lowercase-hex chars
            j = s.find(".php?s=", max(qpos - 4, 0))
            if j >= 0:
                val = s[j + 7 :]
                k = 0
                while k < len(val) and val[k] in _HEX_LO:
                    k += 1
                if k >= 32:
                    tt, x = j + 5, 2
                    break
            continue
        hay = sl if ci else s
        pat = needle.lower() if ci else needle
        j = hay.find(pat, qpos)
        if j < 0:
            continue
        if need_sess and not _v122_is_session_id(s[j + skip :]):
            continue
        tt, x = j, skip
        break
    if tt < 0:
        return s
    # no alnum immediately before (prevents "DAVESID=" — Url.cpp:297-300)
    if tt > 0 and s[tt - 1].isascii() and s[tt - 1].isalnum():
        return s
    a = tt
    b = a + x
    # back up to the owning separator (Url.cpp:309-311)
    while a > 0 and s[a - 1] not in "?&/;":
        a -= 1
    if a < len(s) and s[a] == "?":
        a += 1  # keep the '?'
    if a > 0 and s[a - 1] == ";":
        a -= 1  # back up over the matrix-param semicolon
    # advance over the value (Url.cpp:320-321)
    while b < len(s) and s[b] not in "&?;":
        b += 1
    # session id itself must be >= 5 chars (Url.cpp:324-326)
    if b - (tt + x) < 5:
        return s
    if b < len(s) and s[b] in "&;":
        b += 1
    out = s[:a] + s[b:]
    # trailing '?' / '&' / ';' backs off (Url.cpp:337-339)
    return out.rstrip("?&;")


# path-param (;key=value) rules: jsessionid (MATCH_PARTIAL, ≥20),
# CFID/CFTOKEN (default), saplb_* (prefix) — Url.cpp:428-441, 450-456
_PATHPARAM_RULES = (
    ("jsessionid", True, ((20, 0, True, 0, 0),)),
    ("cftoken", False, (_DEFAULT_V,)),
    ("cfid", False, (_DEFAULT_V,)),
    ("saplb_", True, (_DEFAULT_V,)),
)

# /name/value/ path-segment pairs (removePath calls)
_PATHPAIR_RULES = (
    ("oscsid", ((32, 32, True, A_HEX, 0), (26, 26, True, A_DIGIT | A_ALPHA, 0))),
    ("oscadminid", ((32, 32, True, A_HEX, 0), (26, 26, True, A_DIGIT | A_ALPHA, 0))),
    ("xtcsid", ((26, 52, True, A_DIGIT | A_ALPHA, 0),)),
    ("cftoken", ((52, 52, True, 0, 0), (10, 14, True, 0, M_PUNCT), (6, 0, True, A_DIGIT, 0))),
    ("cfid", ((0, 0, True, A_DIGIT, 0),)),
    ("jsessionid", ((32, 32, False, A_HEX, 0),)),
    ("phpsessid", ((26, 32, False, A_ALPHA | A_DIGIT, 0),)),
)


def strip_path_params(path: str) -> str:
    """Path half of stripParameters: ``;key=value`` matrix params and
    ``/name/value/`` segment pairs."""
    if ";" in path:
        segs = path.split(";")
        kept = [segs[0]]
        for seg in segs[1:]:
            k, sep, v = seg.partition("=")
            kl = k.lower()
            dropped = False
            for key, partial, validators in _PATHPARAM_RULES:
                if (key in kl) if partial else (kl == key):
                    if any(_validate(v, vv) for vv in validators):
                        dropped = True
                        break
            if not dropped:
                kept.append(seg)
        path = ";".join(kept)
    if "/" in path[1:]:
        parts = path.split("/")
        out = []
        i = 0
        while i < len(parts):
            pl = parts[i].lower()
            hit = None
            for key, validators in _PATHPAIR_RULES:
                if pl == key and i + 1 < len(parts):
                    if any(_validate(parts[i + 1], vv) for vv in validators):
                        hit = key
                        break
            if hit is not None:
                i += 2  # drop name + value segments
            else:
                out.append(parts[i])
                i += 1
        path = "/".join(out)
        if not path.startswith("/"):
            path = "/" + path
    return path or "/"


def _strip_session_params(query: str, domain: str = "") -> str:
    return strip_parameters(query, domain)


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
