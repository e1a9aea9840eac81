"""robots.txt parsing + matching with Gigablast's semantics.

Reference behavior (Robots.cpp / RobotRule.cpp, exercised by the 92 cases
in test/unit/RobotsTest.cpp):

- groups: ``User-agent`` lines open a group; our UA matches by *prefix*,
  case-insensitive (Robots.cpp:150-160); ``*`` is the default group.  If a
  UA-specific group exists it is used exclusively — rules *and*
  crawl-delay — else the default group (Robots.cpp:330-346, 363-377).
- rules: ``Allow`` / ``Disallow`` with a path value; first *matching* rule
  wins after sorting rules by path length, longest first
  (RobotRule.h:38-40, Robots.cpp:306-311); default is allow
  (Robots.cpp:339).
- an empty Disallow/Allow value is ignored (no rule).
- path matching: plain rules are prefix matches; a trailing ``$`` anchors
  a full match (the ``$`` is not part of the path); ``*`` wildcards
  anywhere; trailing ``*`` on an unanchored rule is stripped
  (RobotRule.cpp:7-28, 36-110).  Matching is against path+query.
- ``Crawl-delay``: float seconds → int milliseconds, truncated
  (Robots.cpp:169-190); -1 when absent.
- comments (``#``) stripped; a UA line after group records starts a new
  group.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


@dataclass
class RobotRule:
    allow: bool
    path: str
    anchored: bool = False
    wildcard: bool = False
    _rx: "re.Pattern | None" = field(default=None, repr=False, compare=False)

    @classmethod
    def make(cls, allow: bool, raw_path: str) -> "RobotRule | None":
        if not raw_path:
            return None
        anchored = raw_path.endswith("$")
        path = raw_path[:-1] if anchored else raw_path
        if not anchored:
            path = path.rstrip("*")  # RobotRule.cpp:16-19
            if not path:
                # "Disallow: *" → prefix "" matches everything; reference
                # strips to empty which prefix-matches all paths
                path = ""
        wildcard = "*" in path
        rule = cls(allow=allow, path=path, anchored=anchored, wildcard=wildcard)
        if wildcard:
            pat = "".join(".*" if ch == "*" else re.escape(ch) for ch in _collapse(path))
            rule._rx = re.compile(pat + ("$" if anchored else ""))
        return rule

    def sort_len(self) -> int:
        return len(self.path) + (1 if self.anchored else 0)

    def matches(self, path_with_query: str) -> bool:
        if self.wildcard:
            return self._rx.match(path_with_query) is not None
        if self.anchored:
            return path_with_query == self.path
        return path_with_query.startswith(self.path)


def _collapse(path: str) -> str:
    return re.sub(r"\*+", "*", path)


@dataclass
class RobotsPolicy:
    rules: list  # sorted, longest path first
    crawl_delay_ms: int  # -1 if none
    had_group: bool

    def is_allowed(self, path_with_query: str) -> bool:
        for r in self.rules:
            if r.matches(path_with_query):
                return r.allow
        return True


_LINE = re.compile(r"^\s*([A-Za-z][A-Za-z0-9\-]*)\s*:\s*(.*?)\s*$")


def parse_robots(robots_txt: str, user_agent: str = "gigablastbot") -> RobotsPolicy:
    """Parse a robots.txt body into the policy for ``user_agent``."""
    ua = user_agent.lower()
    ua_rules: list[RobotRule] = []
    def_rules: list[RobotRule] = []
    ua_delay = -1
    def_delay = -1
    ua_found = False
    def_found = False

    in_ua = False
    in_def = False
    group_has_records = False

    for raw in (robots_txt or "").splitlines():
        line = raw.split("#", 1)[0]
        m = _LINE.match(line)
        if not m:
            continue
        fld = m.group(1).lower()
        val = m.group(2)
        if fld == "user-agent":
            if group_has_records:
                in_ua = in_def = False
                group_has_records = False
            v = val.lower()
            if v == "*":
                def_found = True
                in_def = True
            elif v and ua.startswith(v):  # prefix match, Robots.cpp:156
                ua_found = True
                in_ua = True
            continue
        if fld in ("allow", "disallow"):
            group_has_records = True
            if not (in_ua or in_def):
                continue
            rule = RobotRule.make(allow=(fld == "allow"), raw_path=val)
            if rule is None:
                continue
            if in_ua:
                ua_rules.append(rule)
            if in_def and not in_ua:
                def_rules.append(rule)
            continue
        if fld == "crawl-delay":
            group_has_records = True
            try:
                delay = float(val)
            except ValueError:
                continue
            if in_ua:
                ua_delay = int(delay * 1000)
            elif in_def:
                def_delay = int(delay * 1000)
            continue
        # unknown fields end nothing; they count as group records only if
        # inside a group (sitemap etc. are cross-group in practice)

    if ua_found:
        rules, delay = ua_rules, ua_delay
    elif def_found:
        rules, delay = def_rules, def_delay
    else:
        rules, delay = [], -1
    # longest path first; stable for ties (Robots.cpp:306-311)
    rules = sorted(rules, key=lambda r: -r.sort_len())
    return RobotsPolicy(rules=rules, crawl_delay_ms=delay, had_group=ua_found or def_found)
