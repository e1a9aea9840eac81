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

#: the reference's FULL Timezone.cpp table (273 active entries,
#: Timezone.cpp:14-293), mechanically extracted: seconds to ADD per
#: HttpMime.cpp:318 ``global += tzoff`` (hourMod*3600 + minMod*60,
#: Timezone.cpp:337-339).  Reference quirks preserved on purpose:
#: "ist" is Irish Summer Time (+1:00, not India), "ndt" is +2:30,
#: "mt" is Mountain (-7).  Unlisted zones act like BADTIMEZONE (no
#: adjustment), same as the reference's miss path.
TZ_OFFSETS = {
    "acdt": 37800, "acst": 34200, "adt": -10800, "aedt": 39600, "aest": 36000, "aft": 16200,
    "ahdt": -32400, "ahst": -36000, "akdt": -28800, "akst": -32400, "amst": 14400, "amt": 14400,
    "anast": 46800, "anat": 43200, "art": -10800, "ast": -14400, "at": -3600, "awst": 28800,
    "azost": 0, "azot": -3600, "azst": 18000, "azt": 14400, "badt": 14400, "bat": 21600,
    "bdst": 7200, "bdt": 21600, "bet": -39600, "bnt": 28800, "bort": 28800, "bot": -14400,
    "bra": -10800, "bst": 3600, "bt": 21600, "btt": 21600, "cat": 7200, "cct": 28800,
    "cdt": -18000, "cest": 7200, "cet": 3600, "chadt": 49500, "chast": 45900, "chst": 36000,
    "ckt": -36000, "clst": -10800, "clt": -14400, "cot": -18000, "cst": -21600, "ct": -21600,
    "cut": 0, "cxt": 25200, "davt": 25200, "ddut": 36000, "dnt": 3600, "dst": 7200,
    "easst": -18000, "east": -21600, "eat": 10800, "ect": -18000, "edt": -14400, "eest": 10800,
    "eet": 7200, "egst": 0, "egt": -3600, "emt": 3600, "est": -18000, "et": -18000,
    "fdt": -3600, "fjst": 46800, "fjt": 43200, "fkst": -10800, "fkt": -14400, "fst": 7200,
    "fwt": 3600, "galt": -21600, "gamt": -32400, "gest": 18000, "get": 14400, "gft": -10800,
    "gilt": 43200, "gmt": 0, "gst": 36000, "gyt": -14400, "haa": -10800, "hac": -18000,
    "hae": -14400, "hap": -25200, "har": -21600, "hat": -9000, "hay": -28800, "hdt": -34200,
    "hfe": 7200, "hfh": 3600, "hkt": 28800, "hna": -14400, "hnc": -21600, "hne": -18000,
    "hnp": -28800, "hnr": -25200, "hnt": -12600, "hny": -32400, "hoe": 3600, "hst": -36000,
    "ict": 25200, "idle": 43200, "idlw": -43200, "idt": 10800, "iot": 18000, "irdt": 16200,
    "irkst": 32400, "irkt": 28800, "irst": 16200, "irt": 12600, "ist": 3600, "it": 12600,
    "ita": 3600, "javt": 25200, "jayt": 32400, "jst": 32400, "jt": 25200, "kdt": 36000,
    "kgst": 21600, "kgt": 18000, "kost": 43200, "krast": 28800, "krat": 25200, "kst": 32400,
    "lhdt": 39600, "lhst": 37800, "ligt": 36000, "lint": 50400, "lkt": 21600, "magst": 43200,
    "magt": 39600, "mal": 28800, "mart": -34200, "mat": 10800, "mawt": 21600, "mdt": -21600,
    "med": 7200, "medst": 7200, "mest": 7200, "mesz": 7200, "met": 3600, "mewt": 3600,
    "mex": -21600, "mht": 43200, "mmt": 23400, "mpt": 36000, "msd": 14400, "msk": 10800,
    "msks": 14400, "mst": -25200, "mt": -25200, "mut": 14400, "mvt": 18000, "myt": 28800,
    "nct": 39600, "ndt": 9000, "nft": 41400, "nor": 3600, "novst": 25200, "novt": 21600,
    "npt": 20700, "nrt": 43200, "nst": -12600, "nsut": 23400, "nt": -39600, "nut": -39600,
    "nzdt": 46800, "nzst": 43200, "nzt": 43200, "oesz": 10800, "oez": 7200, "omsst": 25200,
    "omst": 21600, "pdt": -25200, "pet": -18000, "petst": 46800, "pett": 43200, "pgt": 36000,
    "phot": 46800, "pht": 28800, "pkt": 18000, "pmdt": -7200, "pmt": -10800, "pnt": -30600,
    "pont": 39600, "pst": -28800, "pt": -28800, "pwt": 32400, "pyst": -10800, "pyt": -14400,
    "r1t": 7200, "r2t": 10800, "ret": 14400, "rok": 32400, "sadt": 37800, "sast": 7200,
    "sbt": 39600, "sct": 14400, "set": 3600, "sgt": 28800, "srt": -10800, "sst": 7200,
    "swt": 3600, "tft": 18000, "tha": 25200, "that": -36000, "tjt": 18000, "tkt": -36000,
    "tmt": 18000, "tot": 46800, "truk": 36000, "tst": 10800, "tuc": 0, "tvt": 43200,
    "ulast": 32400, "ulat": 28800, "usz1": 7200, "usz1s": 10800, "usz2": 10800, "usz2s": 14400,
    "usz3": 14400, "usz3s": 18000, "usz4": 18000, "usz4s": 21600, "usz5": 21600, "usz5s": 25200,
    "usz6": 25200, "usz6s": 28800, "usz7": 28800, "usz7s": 32400, "usz8": 32400, "usz8s": 36000,
    "usz9": 36000, "usz9s": 39600, "utc": 0, "utz": -10800, "uyt": -10800, "uz10": 39600,
    "uz10s": 43200, "uz11": 43200, "uz11s": 46800, "uz12": 46800, "uz12s": 50400, "uzt": 18000,
    "vet": -14400, "vlast": 39600, "vlat": 36000, "vtz": -7200, "vut": 39600, "wakt": 43200,
    "wast": 7200, "wat": 3600, "west": 3600, "wesz": 3600, "wet": 0, "wez": 0,
    "wft": 43200, "wgst": -7200, "wgt": -10800, "wib": 25200, "wit": 32400, "wita": 28800,
    "wst": 28800, "wtz": -3600, "wut": 3600, "yakst": 36000, "yakt": 32400, "yapt": 36000,
    "ydt": -28800, "yekst": 21600, "yst": -32400,
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
