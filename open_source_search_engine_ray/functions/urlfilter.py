"""The URL-filter rule DSL: compile + vectorized first-match evaluation.

Mirrors ``getUrlFilterNum`` (reference: Spider.cpp:2202-3703).  A filter
table is an ordered list of rules; each rule's ``expression`` is an
``&&``-conjunction of predicates, optionally ``!``-negated; the first rule
whose every predicate passes wins and its parameter columns (priority,
spider frequency, per-IP caps, force-delete, harvest-links) apply
(Spider.cpp:2255-2268 for ``!``/val handling; ``default`` always matches,
Spider.cpp:2790-2800).

Implemented predicates (reference line in Spider.cpp):
  boolean — hasreply 2290, hastmperror 2318 (tmp error set 2333-2344),
  isinjected 2362, isdocidbased 2380 (maps to m_isPageReindex),
  isreindex 2399, insitelist 2418, isaddurl 2456, ismanualadd 2474,
  isroot 2504, isindexed 2543, ispingserver 2574 (Url::isPingServer
  is hardwired false, Url.cpp:2548), isfakeip 2592, isrss 2608
  (reply-gated), isrssext 2632, ispermalink 2651 (reply-gated),
  ispermalinkformat 2678 (URL-format guess, Linkdb.cpp:4734-4886),
  hasauthorityinlink 2270 (validity-gated; we never carry authority
  info so rules using it never match, like a request with
  m_hasAuthorityInlinkValid=0), isnewrequest 2698, isnew 2729,
  iswww 2753;
  numeric (==,!=,<,>,<=,>=) — sitepages 2949 / domainpages 2991
  (quota tables, SpiderColl.cpp:2754-2798), hopcount ~3178,
  lastspidertime 3204, urlage 3245 (discovery-time age), errorcount
  3281, errorcode 3316, numinlinks 3350, spiderwaited 3426,
  percentchangedperday 3463 (float), httpstatus 3496, age 3527
  (pubdate age; pubdate<=0 never matches — the reference also ships
  pubdate hardwired 0, XmlDoc.cpp:14746);
  string — tld 3041, lang 3112 (comma lists), tag:NAME (site-list
  pattern tag, Spider.cpp:1771-1831), ^prefix 3563, $suffix 3600,
  bare substring 3642; default.

Evaluation is vectorized: each predicate produces a boolean numpy mask
over the candidate batch; rules are applied in order with first-match-wins
masking (the "compile for speed" plan sketched at Spider.cpp:2244-2251,
realized here).

The default table is the transcription of the "web" profile
(Collectiondb.cpp:1396-1622).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import numpy as np

# temporary-error codes (reference Spider.cpp:2333-2344); our engine's
# err_code vocabulary uses small ints mapped from fixture fail modes
TMP_ERRORS = frozenset({"dns", "tcp_timeout", "net_unreach"})
# numeric codes used in reply records
ERR_NONE = 0
ERR_DNS = 1
ERR_TCP_TIMEOUT = 2
ERR_HTTP_404 = 3
ERR_HTTP_500 = 4
ERR_ROBOTS_DENIED = 5
ERR_SIMPLIFIED_REDIR = 6  # reference EDOCSIMPLIFIEDREDIR (permanent)
# real-socket fetch tier (stages/httpfetch.py) additions:
ERR_NET_UNREACH = 7  # ENETUNREACH / EHOSTUNREACH / conn refused — tmp
ERR_CONN_RESET = 8  # ECONNRESET — ban signal, NOT in the tmp set
ERR_TLS = 9  # TLS handshake / cert failure — permanent (ESSLERROR is
# not in the reference tmp set; the https error path Msg13.cpp:1621-1623
# reports it as a hard error)
ERR_DOC_UNCHANGED = 10  # reference EDOCUNCHANGED (Errno.h:75): respider
# found identical content (hash match, Msg13.cpp:1434-1446; or an HTTP
# 304 to If-Modified-Since).  Explicitly NOT a tmp error
# (Spider.cpp:2330-2333), and the reply it produces is rewritten to a
# SUCCESS (errCode 0, errCount 0, http 200, content hash carried
# forward — XmlDoc.cpp:14780-14791); the code exists only between the
# fetch tier and the reply builder.
# (reference tmp set Spider.cpp:2333-2344: EDNSTIMEDOUT, ETCPTIMEDOUT,
# EDNSDEAD, EBADIP, ENOMEM, ENETUNREACH, EHOSTUNREACH — ECONNRESET is
# deliberately absent there; it feeds ipWasBanned instead)
TMP_ERROR_CODES = frozenset({ERR_DNS, ERR_TCP_TIMEOUT, ERR_NET_UNREACH})


@dataclass(frozen=True)
class UrlFilterRule:
    expression: str
    priority: int
    spider_freq_days: float
    max_spiders_per_rule: int = 9
    max_spiders_per_ip: int = 7
    same_ip_wait_ms: int = 1000
    force_delete: bool = False
    harvest_links: bool = True


def default_web_rules() -> list:
    """The reference "web" URL-filter profile, row for row
    (Collectiondb.cpp:1396-1622)."""
    R = UrlFilterRule
    return [
        R("isreindex", 80, 0, 99, 1, 1000),
        R("!ismanualadd && !insitelist", 100, 0, 99, 1, 1000, force_delete=True),
        R("errorcount>=3 && hastmperror", 100, 1, 1, 1, 1000, force_delete=True),
        R("errorcount>=1 && hastmperror", 45, 1, 1, 1, 1000),
        R("errorcount>=1", 2, 5, 1, 1, 1000, force_delete=True),
        R("isaddurl", 85, 7, 99, 7, 1000),
        R("numinlinks>7 && isnew", 52, 7, 9, 7, 1000),
        R("numinlinks>7", 51, 7, 9, 7, 1000),
        R("hopcount==0 && iswww && isnew", 50, 7, 9, 7, 1000),
        R("hopcount==0 && iswww", 48, 7.0, 9, 7, 1000),
        R("hopcount==0 && isnew", 49, 7.0, 9, 7, 1000),
        R("hopcount==0", 47, 10.0, 9, 7, 1000),
        R("hopcount==1 && isnew", 40, 20.0, 9, 7, 1000),
        R("hopcount==1", 39, 20.0, 9, 7, 1000),
        R("hopcount==2 && isnew", 30, 40, 9, 7, 1000),
        R("hopcount==2", 29, 40, 9, 7, 1000),
        R("hopcount>=3 && isnew", 20, 60, 9, 7, 1000),
        R("hopcount>=3", 19, 60, 9, 7, 1000),
        R("default", 1, 60, 9, 7, 1000),
    ]


#: reference Domains.cpp:99
PRIVACORE_BLACKLISTED_TLD = "bn,cn,id,in,hk,jp,kh,kr,lk,mm,my,ph,pk,pw,ru,sg,th,tw,ua,vn"
#: reference Collectiondb.cpp:1640
PRIVACORE_LANG_WHITELIST = (
    "xx,en,bg,sr,ca,cs,da,et,fi,fr,de,el,hu,is,ga,it,lv,lt,lb,nl,pl,pt,ro,es,sv,no,vv"
)


def privacore_rules() -> list:
    """The "privacore" URL-filter profile, row for row
    (Collectiondb.cpp:1639-1840 rebuildPrivacoreRules)."""
    R = UrlFilterRule
    return [
        R("isreindex", 80, 0, 99, 1, 1000),
        R(f"lang!={PRIVACORE_LANG_WHITELIST}", 100, 0, 99, 1, 1000,
          force_delete=True, harvest_links=False),
        R(f"tld=={PRIVACORE_BLACKLISTED_TLD}", 100, 0, 99, 1, 1000,
          force_delete=True, harvest_links=False),
        R("errorcount>=3 && !hastmperror", 100, 0, 99, 1, 1000,
          force_delete=True, harvest_links=False),
        R("errorcount>=3 && hastmperror", 45, 3, 1, 1, 1000),
        R("errorcount>=1 && hastmperror", 45, 1, 1, 1, 1000),
        R("isaddurl", 85, 7, 99, 7, 1000),
        R("hopcount==0 && iswww && isnew", 50, 7, 9, 7, 1000),
        R("hopcount==0 && iswww", 48, 7.0, 9, 7, 1000),
        R("hopcount==0 && isnew", 18, 7.0, 9, 7, 1000),
        R("hopcount==0", 17, 10.0, 9, 7, 1000),
        R("hopcount==1 && isnew", 16, 20.0, 9, 7, 1000),
        R("hopcount==1", 15, 20.0, 9, 7, 1000),
        R("hopcount==2 && isnew", 14, 40, 9, 7, 1000),
        R("hopcount==2", 13, 40, 9, 7, 1000),
        R("hopcount>=3 && isnew", 12, 60, 9, 7, 1000),
        R("hopcount>=3", 11, 60, 9, 7, 1000),
        R("default", 1, 60, 9, 7, 1000),
    ]


def shallow_rules() -> list:
    """The "shallow" URL-filter profile, row for row
    (Collectiondb.cpp:2248-2440 rebuildShallowRules): sites tagged
    ``shallow`` in the site list stop at hopcount 2 or 10 indexed pages
    (max_spiders_per_rule=0 = never launch)."""
    R = UrlFilterRule
    return [
        R("isreindex", 80, 0, 99, 1, 1000),
        R("!ismanualadd && !insitelist", 100, 0, 99, 1, 1000, force_delete=True),
        R("errorcount>=3 && hastmperror", 100, 1, 1, 1, 1000, force_delete=True),
        R("errorcount>=1 && hastmperror", 45, 1, 1, 1, 1000),
        R("isaddurl", 85, 7, 99, 7, 1000),
        R("tag:shallow && hopcount>=2", 30, 40, 0, 7, 1000),
        R("tag:shallow && sitepages>=10", 30, 40, 0, 7, 1000),
        R("hopcount==0 && iswww && isnew", 50, 7, 9, 7, 1000),
        R("hopcount==0 && iswww", 48, 7.0, 9, 7, 1000),
        R("hopcount==0 && isnew", 49, 7.0, 9, 7, 1000),
        R("hopcount==0", 47, 10.0, 9, 7, 1000),
        R("hopcount==1 && isnew", 40, 20.0, 9, 7, 1000),
        R("hopcount==1", 39, 20.0, 9, 7, 1000),
        R("hopcount==2 && isnew", 30, 40, 9, 7, 1000),
        R("hopcount==2", 29, 40, 9, 7, 1000),
        R("hopcount>=3 && isnew", 22, 60, 9, 7, 1000),
        R("hopcount>=3", 21, 60, 9, 7, 1000),
        R("default", 1, 60, 9, 7, 1000),
    ]


PROFILES = {
    "web": default_web_rules,
    "privacore": privacore_rules,
    "shallow": shallow_rules,
}


_NUM_PRED = re.compile(
    r"^(hopcount|lastspidertime|errorcount|errorcode|numinlinks|httpstatus"
    r"|urlage|sitepages|domainpages|spiderwaited|age)\s*(==|!=|<=|>=|<|>)\s*(-?\d+)$"
)
_FLOAT_PRED = re.compile(
    r"^(percentchangedperday)\s*(==|!=|<=|>=|<|>)\s*(-?\d+(?:\.\d+)?)$"
)
_STR_PRED = re.compile(r"^(tld|lang)\s*(==|!=)\s*([\w,.\-]+)$")
_TAG_PRED = re.compile(r"^tag:([\w\-]+)$")

_BOOL_FIELDS = {
    "hasreply": "had_reply",
    "isinjected": "is_injecting",
    "isreindex": "is_reindex",
    "isdocidbased": "is_reindex",  # Spider.cpp:2385 maps it to m_isPageReindex
    "insitelist": "in_sitelist",
    "isaddurl": "is_addurl",
    "ismanualadd": "is_manualadd",
    "isindexed": "is_indexed",
    "isnew": "had_reply",  # inverted below (isnew ⇔ !hadReply, Spider.cpp:2729-2751)
    "iswww": "is_www",
    "isroot": "is_root",
    "ispingserver": "is_pingserver",
    "isfakeip": "fake_first_ip",
    "isrssext": "is_rssext",
    "ispermalinkformat": "is_permalink_format",
}

#: reply-gated booleans: without a SpiderReply the rule cannot match
#: (Spider.cpp:2614, 2657 — `if ( ! srep ) continue`)
_REPLY_BOOL_FIELDS = {"isrss": "is_rss", "ispermalink": "is_permalink"}

_NUM_FIELDS = {
    "hopcount": "hop_count",
    "lastspidertime": "spidered_time",
    "errorcount": "err_count",
    "errorcode": "err_code",
    "numinlinks": "num_inlinks",
    "httpstatus": "http_status",
    "urlage": "url_age",
    "sitepages": "sitepages",
    "domainpages": "domainpages",
    "spiderwaited": "spiderwaited",
    "age": "age",
}

#: numeric predicates that require a reply (reference: `if (!srep) continue`
#: at Spider.cpp:3290, 3325, 3436, 3507, 3213)
_REPLY_NUM_FIELDS = {"spidered_time", "http_status", "err_count", "err_code", "spiderwaited"}

_OPS = {
    "==": np.equal,
    "!=": np.not_equal,
    "<": np.less,
    ">": np.greater,
    "<=": np.less_equal,
    ">=": np.greater_equal,
}


def _compile_predicate(token: str):
    """Compile one predicate token → fn(cand: dict[str, ndarray]) -> bool mask."""
    token = token.strip()
    neg = token.startswith("!")
    if neg:
        token = token[1:].strip()

    if token == "default":
        return lambda c: np.ones(len(c["uh48"]), dtype=bool)

    if token in _BOOL_FIELDS:
        fld = _BOOL_FIELDS[token]
        invert = (token == "isnew") ^ neg

        def boolpred(c, fld=fld, invert=invert):
            v = c[fld].astype(bool)
            return ~v if invert else v

        # hastmperror/hasreply-likes that require a reply implicitly handle
        # it because the fields default falsy with no reply
        return boolpred

    if token == "hastmperror":
        def tmppred(c, neg=neg):
            ec = c["err_code"]
            m = c["had_reply"].astype(bool) & (
                np.isin(ec, list(TMP_ERROR_CODES))
            )
            return ~m if neg else m

        return tmppred

    if token == "isnewrequest":
        # request added after last reply (Spider.cpp:2698-2727)
        def newreq(c, neg=neg):
            m = (~c["had_reply"].astype(bool)) | (c["added_time"] > c["spidered_time"])
            return ~m if neg else m

        return newreq

    if token in _REPLY_BOOL_FIELDS:
        fld = _REPLY_BOOL_FIELDS[token]

        def replyboolpred(c, fld=fld, neg=neg):
            v = c[fld].astype(bool)
            return c["had_reply"].astype(bool) & (~v if neg else v)

        return replyboolpred

    if token == "hasauthorityinlink":
        # validity-gated (Spider.cpp:2272-2276): we never carry inlink
        # authority info, so the gate keeps any rule using it unmatched
        def authpred(c, neg=neg):
            v = c["has_authority_inlink"].astype(bool)
            return c["authority_inlink_valid"].astype(bool) & (~v if neg else v)

        return authpred

    m = _TAG_PRED.match(token)
    if m:
        name = m.group(1)

        def tagpred(c, name=name, neg=neg):
            col = c["site_tag"]
            r = np.fromiter((t == name for t in col), dtype=bool, count=len(col))
            return ~r if neg else r

        return tagpred

    m = _NUM_PRED.match(token) or _FLOAT_PRED.match(token)
    if m:
        fld = _NUM_FIELDS.get(m.group(1), "percentchangedperday")
        op = _OPS[m.group(2)]
        rhs = float(m.group(3)) if fld == "percentchangedperday" else int(m.group(3))

        def numpred(c, fld=fld, op=op, rhs=rhs, neg=neg):
            r = op(c[fld], rhs)
            # reply-based numeric predicates never match without a reply
            if fld in _REPLY_NUM_FIELDS or fld == "percentchangedperday":
                r = r & c["had_reply"].astype(bool)
            if fld == "age":
                # invalid pubdate age never matches (Spider.cpp:3538-3541)
                r = r & (c["age"] > 0)
            return ~r if neg else r

        return numpred

    m = _STR_PRED.match(token)
    if m:
        fld, op, vals = m.group(1), m.group(2), set(m.group(3).split(","))

        def strpred(c, fld=fld, vals=vals, eq=(op == "=="), neg=neg):
            col = c[fld]
            r = np.fromiter((x in vals for x in col), dtype=bool, count=len(col))
            if not eq:
                r = ~r
            return ~r if neg else r

        return strpred

    if token.startswith("^"):
        pref = token[1:]

        def prefpred(c, pref=pref, neg=neg):
            col = c["url"]
            r = np.fromiter((u.startswith(pref) for u in col), dtype=bool, count=len(col))
            return ~r if neg else r

        return prefpred

    if token.startswith("$"):
        suf = token[1:]

        def sufpred(c, suf=suf, neg=neg):
            col = c["url"]
            r = np.fromiter((u.endswith(suf) for u in col), dtype=bool, count=len(col))
            return ~r if neg else r

        return sufpred

    # bare substring (Spider.cpp:3642-3696)
    sub = token

    def subpred(c, sub=sub, neg=neg):
        col = c["url"]
        r = np.fromiter((sub in u for u in col), dtype=bool, count=len(col))
        return ~r if neg else r

    subpred.is_substring_fallback = True
    return subpred


def lint_rules(rules) -> list:
    """Flag rule tokens that silently compile to URL-substring patterns
    but look like mistyped predicates.

    The substring fallback is reference behavior (unknown tokens are URL
    patterns, Spider.cpp:3642-3696), so it is not an error — but a typo
    like ``hopcountt>=1`` matching URLs *containing that text* is almost
    never what the rule author meant.  Returns human-readable warnings;
    empty list = clean."""
    warnings = []
    ops = ("==", "!=", ">=", "<=", ">", "<")
    for r in rules:
        for tok in r.expression.split("&&"):
            t = tok.strip().lstrip("!").strip()
            if not t:
                continue
            p = _compile_predicate(tok)
            if getattr(p, "is_substring_fallback", False) and (
                any(op in t for op in ops) or t.startswith("tag:")
            ):
                warnings.append(
                    f"rule {r.expression!r}: token {t!r} compiles to a "
                    "URL-substring pattern (Spider.cpp:3642) — looks like "
                    "a mistyped predicate"
                )
    return warnings


class FilterProgram:
    """A compiled rule table. ``assign`` returns the first-match rule index
    per candidate plus convenient per-row parameter lookups."""

    def __init__(self, rules):
        self.rules = list(rules)
        self._compiled = [
            [_compile_predicate(tok) for tok in r.expression.split("&&")]
            for r in self.rules
        ]
        self.priority = np.array([r.priority for r in self.rules], dtype=np.int16)
        self.spider_freq_days = np.array(
            [r.spider_freq_days for r in self.rules], dtype=np.float64
        )
        self.max_spiders_per_rule = np.array(
            [r.max_spiders_per_rule for r in self.rules], dtype=np.int32
        )
        self.max_spiders_per_ip = np.array(
            [r.max_spiders_per_ip for r in self.rules], dtype=np.int32
        )
        self.same_ip_wait_ms = np.array(
            [r.same_ip_wait_ms for r in self.rules], dtype=np.int64
        )
        self.force_delete = np.array([r.force_delete for r in self.rules], dtype=bool)
        self.harvest_links = np.array([r.harvest_links for r in self.rules], dtype=bool)

    def assign(self, cand: dict) -> np.ndarray:
        """First-match rule index per candidate (−1 if nothing matches,
        mirroring Spider.cpp:3700)."""
        n = len(cand["uh48"])
        out = np.full(n, -1, dtype=np.int32)
        unassigned = np.ones(n, dtype=bool)
        for i, preds in enumerate(self._compiled):
            if not unassigned.any():
                break
            m = unassigned.copy()
            for p in preds:
                sub = p(cand)
                m &= sub
                if not m.any():
                    break
            out[m] = i
            unassigned &= ~m
        return out


_ROOT_RE = re.compile(r"^https?://[^/]+/?$")
_PERM_EXCLUDE = (
    "/tag/", "/category", "/cat_", "/cat/", "forum", "thread",
    "/search.", "/search/", "/comment.html", "/comments/", "/trackback",
    "/profile.", "/archives.", "_archive.",
)


def url_is_root(url: str) -> bool:
    """Root check (Spider.cpp:2504-2520 scan: nothing after the first
    path slash)."""
    return bool(_ROOT_RE.match(url))


def url_is_rssext(url: str) -> bool:
    """Request-side RSS guess by extension (Sections.cpp:109-111;
    XmlDoc.cpp:15341-15349 sets m_isRSSExt for .rss/.xml/.atom outlink
    extensions, case-insensitive)."""
    path = url.split("://", 1)[-1]
    path = path.split("?", 1)[0].lower()
    return path.endswith((".rss", ".xml", ".atom"))


def url_is_permalink_format(url: str) -> bool:
    """URL-format permalink guess (Linkdb.cpp:4734-4886 with links=NULL:
    the format core + the main path-exclusion substrings; the long tail
    of link-graph checks needs page content the request side lacks)."""
    if url_is_rssext(url) or url_is_root(url):
        return False
    rest = url.split("://", 1)[-1]
    host, _, pathq = rest.partition("/")
    pathq = "/" + pathq
    if host.startswith("feedproxy.") or rest.startswith("feeds.feedburner.com/~"):
        return True
    path, _, query = pathq.partition("?")
    # ?m=<yyyymm> blog archive pages are never permalinks (Linkdb.cpp:4901)
    if query.startswith("m=") and query[2:8].isdigit():
        n = int(query[2:8])
        if 199000 < n < 205000:
            return False
    hasp = query.startswith("p=") and len(query) > 2 and query[2].isdigit()
    # >=3 consecutive digits anywhere in path+query (Linkdb.cpp:4810-4854)
    dcount = 0
    found3 = False
    for ch in pathq:
        if ch.isdigit():
            dcount += 1
            if dcount >= 3:
                found3 = True
                break
        else:
            dcount = 0
    # >=2 hyphens/underscores within a single path component
    hcount = 0
    found2 = False
    for ch in path:
        if ch == "/":
            hcount = 0
        elif ch in "-_":
            hcount += 1
            if hcount >= 2:
                found2 = True
                break
    if not hasp and not found3 and not found2:
        return False
    low = path.lower()
    if any(s in low for s in _PERM_EXCLUDE):
        return False
    lowq = rest.lower()
    for cgi in ("cat=", "tag=", "tags="):
        i = lowq.find(cgi)
        if i > 0 and not lowq[i - 1].isalpha():
            return False
    return True


def candidate_columns(n: int) -> dict:
    """Zeroed candidate-field template for ``FilterProgram.assign``."""
    return {
        "uh48": np.zeros(n, dtype=np.uint64),
        "url": np.empty(n, dtype=object),
        "hop_count": np.zeros(n, dtype=np.int32),
        "added_time": np.zeros(n, dtype=np.int64),
        "had_reply": np.zeros(n, dtype=bool),
        "spidered_time": np.zeros(n, dtype=np.int64),
        "err_count": np.zeros(n, dtype=np.int32),
        "err_code": np.zeros(n, dtype=np.int32),
        "http_status": np.zeros(n, dtype=np.int32),
        "num_inlinks": np.zeros(n, dtype=np.int32),
        "url_age": np.zeros(n, dtype=np.int64),
        "is_injecting": np.zeros(n, dtype=bool),
        "is_reindex": np.zeros(n, dtype=bool),
        "is_addurl": np.zeros(n, dtype=bool),
        "is_manualadd": np.zeros(n, dtype=bool),
        "in_sitelist": np.zeros(n, dtype=bool),
        "is_indexed": np.zeros(n, dtype=bool),
        "is_www": np.zeros(n, dtype=bool),
        "tld": np.empty(n, dtype=object),
        "lang": np.empty(n, dtype=object),
        # extended predicate inputs
        "is_root": np.zeros(n, dtype=bool),
        "is_pingserver": np.zeros(n, dtype=bool),  # Url.cpp:2548: always false
        "fake_first_ip": np.zeros(n, dtype=bool),
        "is_rssext": np.zeros(n, dtype=bool),
        "is_permalink_format": np.zeros(n, dtype=bool),
        "is_rss": np.zeros(n, dtype=bool),
        "is_permalink": np.zeros(n, dtype=bool),
        "has_authority_inlink": np.zeros(n, dtype=bool),
        "authority_inlink_valid": np.zeros(n, dtype=bool),
        "sitepages": np.zeros(n, dtype=np.int64),
        "domainpages": np.zeros(n, dtype=np.int64),
        "spiderwaited": np.zeros(n, dtype=np.int64),
        "age": np.full(n, -1, dtype=np.int64),
        "percentchangedperday": np.zeros(n, dtype=np.float64),
        "site_tag": np.full(n, "", dtype=object),
    }


# ---------------------------------------------------------------------------
# site-list matching (reference: updateSiteListBuf/getMatchingUrlPattern,
# Spider.cpp:1659-2196)
# ---------------------------------------------------------------------------


class SiteList:
    """Compiled site-list patterns.

    Line forms (subset): ``example.com`` (domain match, any subdomain/path);
    ``http(s)://host/path`` (URL prefix match); ``contains:substr``;
    a leading ``-`` negates (an URL matching a negative line is NOT in the
    site list even if a positive line matches).  A ``tag:NAME `` prefix
    attaches a tag to the pattern (reference 'tag:shallow site:x' form,
    Spider.cpp:1771-1831); the matching pattern's tag feeds the filter
    DSL's ``tag:NAME`` predicate.
    """

    def __init__(self, lines):
        self.domains: dict[str, str] = {}  # domain -> tag ("" if none)
        self.prefixes: list[tuple[str, str]] = []  # (prefix, tag)
        self.contains: list[tuple[str, str]] = []
        self.neg_domains: set[str] = set()
        self.neg_prefixes: list[str] = []
        self.neg_contains: list[str] = []
        for raw in lines:
            line = raw.strip()
            if not line or line.startswith("#"):
                continue
            neg = line.startswith("-")
            if neg:
                line = line[1:].strip()
            tag = ""
            if line.startswith("tag:"):
                tag, _, line = line[4:].partition(" ")
                line = line.strip()
            if line.startswith("contains:"):
                if neg:
                    self.neg_contains.append(line[9:])
                else:
                    self.contains.append((line[9:], tag))
            elif line.startswith(("http://", "https://")):
                if neg:
                    self.neg_prefixes.append(line)
                else:
                    self.prefixes.append((line, tag))
            else:
                if neg:
                    self.neg_domains.add(line.lower())
                else:
                    self.domains.setdefault(line.lower(), tag)

    def _match_tag(self, url: str, domain: str):
        """(matched, tag) for the first matching positive pattern."""
        if domain in self.neg_domains:
            return False, ""
        if any(s in url for s in self.neg_contains):
            return False, ""
        if any(url.startswith(p) for p in self.neg_prefixes):
            return False, ""
        t = self.domains.get(domain)
        if t is not None:
            return True, t
        for s, tag in self.contains:
            if s in url:
                return True, tag
        for p, tag in self.prefixes:
            if url.startswith(p):
                return True, tag
        return False, ""

    def matches(self, url: str, domain: str) -> bool:
        return self._match_tag(url, domain)[0]

    def matches_batch(self, urls, domains) -> np.ndarray:
        return np.fromiter(
            (self.matches(u, d) for u, d in zip(urls, domains)),
            dtype=bool,
            count=len(urls),
        )

    def tags_batch(self, urls, domains) -> np.ndarray:
        return np.array(
            [self._match_tag(u, d)[1] for u, d in zip(urls, domains)], dtype=object
        )

    def match_and_tags_batch(self, urls, domains):
        """(matched bool[], tag object[]) in ONE pass — admission calls
        both, and _match_tag dominates the sitelist cost at scale.
        Common fast path: domain-only pattern tables (no contains/prefix
        lines) reduce to dict gets."""
        n = len(urls)
        if not (
            self.contains
            or self.prefixes
            or self.neg_contains
            or self.neg_prefixes
        ):
            dget = self.domains.get
            neg = self.neg_domains
            tags = np.empty(n, dtype=object)
            ok = np.zeros(n, dtype=bool)
            for i, d in enumerate(domains):
                t = dget(d) if d not in neg else None
                if t is None:
                    tags[i] = ""
                else:
                    ok[i] = True
                    tags[i] = t
            return ok, tags
        ok = np.zeros(n, dtype=bool)
        tags = np.empty(n, dtype=object)
        for i, (u, d) in enumerate(zip(urls, domains)):
            m, t = self._match_tag(u, d)
            ok[i] = m
            tags[i] = t
        return ok, tags
