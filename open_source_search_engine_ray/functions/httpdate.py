"""HTTP date parsing — a faithful port of the reference's ``atotime``
family (HttpMime.cpp:246-474) used for ``Last-Modified`` headers.

Formats (HttpMime.cpp:247-253):

- #1 ``Sun, 06 Nov 1994 08:49:37 GMT``   (RFC 822 / RFC 1123)
- #2 ``Sunday, 06-Nov-94 08:49:37 GMT``  (RFC 850)
- #3 ``Sun Nov  6 08:49:37 1994``        (ANSI C asctime)
- #4 ``06 Nov 1994 08:49:37 GMT``        (reference's own variant)
- #5 ``2007-12-31`` / ``2008-04-30T20:48:25Z`` (ISO 8601 subset)

Quirks preserved on purpose (semantic parity with the reference, not
with RFC 2616):

- RFC 850 years are taken raw as ``tm_year`` (HttpMime.cpp:346 — no
  -1900), so two-digit years mean 19xx and a four-digit year would be
  shifted; real-world RFC 850 dates are two-digit.
- the trailing timezone offset is *added* to the UTC-interpreted time
  (HttpMime.cpp:318-320 ``global += tzoff``).
- unknown month names resolve through the reference's switch
  fallthrough (HttpMime.cpp:507-529).

Returns -1 when unparseable (callers treat -1 as "absent", matching
``m_lastModifiedDate`` defaulting).
"""

from __future__ import annotations

import calendar

#: subset of the reference's Timezone.cpp table (345 entries covering
#: every world zone); we carry the zones that occur in HTTP headers in
#: practice — seconds to ADD per HttpMime.cpp:318.  Unlisted zones act
#: like BADTIMEZONE (no adjustment), same as the reference's miss path.
TZ_OFFSETS = {
    "gmt": 0, "utc": 0, "ut": 0, "z": 0, "wet": 0, "azost": 0,
    "bst": 3600, "cet": 3600, "west": 3600,
    "cest": 7200, "eet": 7200, "sast": 7200,
    "eest": 10800, "msk": 10800,
    "est": -18000, "edt": -14400,
    "cst": -21600, "cdt": -18000,
    "mst": -25200, "mdt": -21600,
    "pst": -28800, "pdt": -25200,
    "akst": -32400, "akdt": -28800,
    "hst": -36000, "ast": -14400, "adt": -10800,
    "nst": -12600, "ndt": -9000,
    "ist": 19800, "jst": 32400, "kst": 32400,
    "aest": 36000, "aedt": 39600, "awst": 28800,
    "nzst": 43200, "nzdt": 46800,
}


def _atol(s: str, i: int) -> int:
    j = i
    while j < len(s) and s[j].isdigit():
        j += 1
    return int(s[i:j]) if j > i else 0


def _skip(s: str, i: int, pred) -> int:
    while i < len(s) and pred(s[i]):
        i += 1
    return i


def _skip_until(s: str, i: int, pred) -> int:
    while i < len(s) and not pred(s[i]):
        i += 1
    return i


def _month(s: str, i: int) -> int:
    """HttpMime.cpp:501-529 getMonth, including the switch fallthrough."""
    a = s[i].lower() if i < len(s) else "\0"
    b = s[i + 1].lower() if i + 1 < len(s) else "\0"
    c = s[i + 2].lower() if i + 2 < len(s) else "\0"
    if a == "j":
        if b == "a":
            return 0
        if c == "n":
            return 5
        if c == "l":
            return 6
        a = "m"  # fallthrough
    if a == "m":
        if c == "r":
            return 2
        if c == "y":
            return 4
        a = "a"  # fallthrough
    if a == "a":
        if b == "p":
            return 3
        if b == "u":
            return 7
        a = "f"  # fallthrough
    return {"f": 1, "s": 8, "o": 9, "n": 10, "d": 11}.get(a, 0)


def _time(s: str, i: int) -> tuple:
    """HttpMime.cpp:531-543 getTime — hour:min:sec, each defaulting 0."""
    hour = _atol(s, i)
    i = _skip(s, i, str.isdigit)
    if i < len(s) and s[i] == ":":
        i += 1
    minute = _atol(s, i)
    i = _skip(s, i, str.isdigit)
    if i < len(s) and s[i] == ":":
        i += 1
    sec = _atol(s, i)
    return hour, minute, sec


def _timegm(year: int, mon: int, mday: int, h: int, m: int, sec: int) -> int:
    return calendar.timegm((year, mon + 1, mday, h, m, sec, 0, 1, -1))


def _tz_adjust(s: str, i: int, t: int) -> int:
    i = _skip(s, i, str.isspace)
    j = _skip(s, i, str.isalnum)
    off = TZ_OFFSETS.get(s[i:j].lower())
    return t + off if off is not None else t


def _atotime1(s: str, i: int) -> int:
    # Sun, 06 Nov 1994 08:49:37 GMT (also the shared tail of #2/#4)
    i = _skip_until(s, i, str.isdigit)
    mday = _atol(s, i)
    i = _skip_until(s, i, str.isalpha)
    mon = _month(s, i)
    i = _skip_until(s, i, str.isdigit)
    year = _atol(s, i)
    i = _skip(s, i, str.isdigit)
    i = _skip(s, i, str.isspace)
    h, m, sec = _time(s, i)
    t = _timegm(year, mon, mday, h, m, sec)
    i = _skip_until(s, i, str.isspace)
    if i >= len(s):
        return t
    return _tz_adjust(s, i, t)


def _atotime2(s: str, i: int) -> int:
    # Sunday, 06-Nov-94 08:49:37 GMT — tm_year taken RAW
    i = _skip_until(s, i, str.isdigit)
    mday = _atol(s, i)
    i = _skip_until(s, i, str.isalpha)
    mon = _month(s, i)
    i = _skip_until(s, i, str.isdigit)
    year_tm = _atol(s, i)  # no -1900: HttpMime.cpp:346
    i = _skip(s, i, str.isdigit)
    i = _skip(s, i, str.isspace)
    h, m, sec = _time(s, i)
    t = _timegm(1900 + year_tm, mon, mday, h, m, sec)
    i = _skip_until(s, i, str.isspace)
    if i >= len(s):
        return t
    return _tz_adjust(s, i, t)


def _atotime3(s: str, i: int) -> int:
    # Sun Nov  6 08:49:37 1994
    i = _skip(s, i, str.isalpha)
    i = _skip(s, i, str.isspace)
    mon = _month(s, i)
    i = _skip_until(s, i, str.isdigit)
    mday = _atol(s, i)
    # TIME starts after the day-of-month digits + following spaces
    j = _skip(s, i, str.isdigit)
    j = _skip(s, j, str.isspace)
    h, m, sec = _time(s, j)
    j = _skip_until(s, j, str.isspace)
    j = _skip(s, j, str.isspace)
    year = _atol(s, j)
    return _timegm(year, mon, mday, h, m, sec)


def _atotime4(s: str, i: int) -> int:
    # 06 Nov 1994 08:49:37 GMT — same shape as #1 without the weekday
    return _atotime1(s, i)


def _atotime5(s: str, i: int) -> int:
    # 2007-12-31 / 2008-04-30T20:48:25Z
    year = _atol(s, i)
    if year < 1900 or year > 2100:
        return -1
    i = _skip(s, i, str.isdigit)
    if i >= len(s) or s[i] not in "-/ ":
        return -1
    i += 1
    if i >= len(s) or not s[i].isdigit():
        return -1
    mon = _atol(s, i) - 1
    i = _skip(s, i, str.isdigit)
    if i >= len(s) or s[i] not in "-/ ":
        # date-only YYYY-MM is malformed for the reference too
        return -1
    i += 1
    if i >= len(s) or not s[i].isdigit():
        return -1
    mday = _atol(s, i)
    i = _skip(s, i, str.isdigit)
    i = _skip(s, i, str.isspace)
    if i < len(s) and s[i] == "T":
        i += 1
    h, m, sec = _time(s, i)
    return _timegm(year, mon, mday, h, m, sec)


def parse_http_date(s) -> int:
    """``atotime`` (HttpMime.cpp:255-281): epoch seconds, or -1."""
    if not s:
        return -1
    if isinstance(s, (bytes, bytearray)):
        s = s.decode("latin-1", "replace")
    i = _skip_until(s, 0, str.isalnum)
    if i >= len(s):
        return -1
    try:
        if s[i].isdigit():
            if _atol(s, i) > 1900:
                return _atotime5(s, i)
            return _atotime4(s, i)
        if "-" in s[i:]:
            return _atotime2(s, i)
        if "," in s[i:]:
            return _atotime1(s, i)
        return _atotime3(s, i)
    except (ValueError, OverflowError):
        return -1
