"""The URL-filter rule DSL: compile + vectorized first-match evaluation.

Mirrors ``getUrlFilterNum`` (reference: Spider.cpp:2202-3703).  A filter
table is an ordered list of rules; each rule's ``expression`` is an
``&&``-conjunction of predicates, optionally ``!``-negated; the first rule
whose every predicate passes wins and its parameter columns (priority,
spider frequency, per-IP caps, force-delete, harvest-links) apply
(Spider.cpp:2255-2268 for ``!``/val handling; ``default`` always matches,
Spider.cpp:2790-2800).

Implemented predicate subset (reference line in Spider.cpp):
  boolean — hasreply 2290, hastmperror 2318 (tmp error set 2333-2344),
  isinjected 2362, isreindex 2399, insitelist 2418, isaddurl 2456,
  ismanualadd 2474, isindexed 2543, isnewrequest 2698, isnew 2729,
  iswww 2753;
  numeric (==,!=,<,>,<=,>=) — hopcount ~3178, lastspidertime 3204,
  errorcount 3281, errorcode 3316, numinlinks 3350, httpstatus 3496;
  string — tld 3041, lang 3112 (comma lists), ^prefix 3563,
  $suffix 3600, bare substring 3642; default.

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
TMP_ERROR_CODES = frozenset({ERR_DNS, ERR_TCP_TIMEOUT})


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


_NUM_PRED = re.compile(r"^(hopcount|lastspidertime|errorcount|errorcode|numinlinks|httpstatus|urlage)\s*(==|!=|<=|>=|<|>)\s*(-?\d+)$")
_STR_PRED = re.compile(r"^(tld|lang)\s*(==|!=)\s*([\w,.\-]+)$")

_BOOL_FIELDS = {
    "hasreply": "had_reply",
    "isinjected": "is_injecting",
    "isreindex": "is_reindex",
    "insitelist": "in_sitelist",
    "isaddurl": "is_addurl",
    "ismanualadd": "is_manualadd",
    "isindexed": "is_indexed",
    "isnew": "had_reply",  # inverted below (isnew ⇔ !hadReply, Spider.cpp:2729-2751)
    "iswww": "is_www",
}

_NUM_FIELDS = {
    "hopcount": "hop_count",
    "lastspidertime": "spidered_time",
    "errorcount": "err_count",
    "errorcode": "err_code",
    "numinlinks": "num_inlinks",
    "httpstatus": "http_status",
    "urlage": "url_age",
}

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

    m = _NUM_PRED.match(token)
    if m:
        fld = _NUM_FIELDS[m.group(1)]
        op = _OPS[m.group(2)]
        rhs = int(m.group(3))

        def numpred(c, fld=fld, op=op, rhs=rhs, neg=neg):
            r = op(c[fld], rhs)
            # reply-based numeric predicates never match without a reply
            if fld in ("spidered_time", "http_status"):
                r = r & c["had_reply"].astype(bool)
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

    return subpred


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
    site list even if a positive line matches).
    """

    def __init__(self, lines):
        self.domains: set[str] = set()
        self.prefixes: list[str] = []
        self.contains: list[str] = []
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
            if line.startswith("contains:"):
                (self.neg_contains if neg else self.contains).append(line[9:])
            elif line.startswith(("http://", "https://")):
                (self.neg_prefixes if neg else self.prefixes).append(line)
            else:
                (self.neg_domains if neg else self.domains).add(line.lower())

    def matches(self, url: str, domain: str) -> bool:
        if domain in self.neg_domains:
            return False
        if any(s in url for s in self.neg_contains):
            return False
        if any(url.startswith(p) for p in self.neg_prefixes):
            return False
        if domain in self.domains:
            return True
        if any(s in url for s in self.contains):
            return True
        if any(url.startswith(p) for p in self.prefixes):
            return True
        return False

    def matches_batch(self, urls, domains) -> np.ndarray:
        return np.fromiter(
            (self.matches(u, d) for u, d in zip(urls, domains)),
            dtype=bool,
            count=len(urls),
        )
