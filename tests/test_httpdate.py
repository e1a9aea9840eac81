"""atotime port (functions/httpdate.py vs HttpMime.cpp:246-474):
all six reference date formats, the RFC-850 raw-tm_year quirk, the
additive timezone adjustment, and failure paths."""

import calendar
import email.utils

from open_source_search_engine_ray.functions.httpdate import parse_http_date


REF = calendar.timegm(
    email.utils.parsedate("Sun, 06 Nov 1994 08:49:37 GMT")
)


def test_all_reference_formats_agree():
    for s in (
        "Sun, 06 Nov 1994 08:49:37 GMT",       # 1 RFC 1123
        "Sunday, 06-Nov-94 08:49:37 GMT",      # 2 RFC 850
        "Sun Nov  6 08:49:37 1994",            # 3 asctime
        "06 Nov 1994 08:49:37 GMT",            # 4 reference variant
    ):
        assert parse_http_date(s) == REF, s


def test_iso8601_forms():
    assert parse_http_date("2007-12-31") == calendar.timegm(
        (2007, 12, 31, 0, 0, 0, 0, 1, -1)
    )
    assert parse_http_date("2008-04-30T20:48:25Z") == calendar.timegm(
        (2008, 4, 30, 20, 48, 25, 0, 1, -1)
    )


def test_timezone_is_added_like_the_reference():
    # HttpMime.cpp:318-320: global += tzoff (EST = -5h)
    gmt = parse_http_date("Tue, 15 Nov 1994 12:45:26 GMT")
    assert parse_http_date("Tue, 15 Nov 1994 12:45:26 EST") == gmt - 18000
    # unknown zone = BADTIMEZONE miss path: no adjustment
    assert parse_http_date("Tue, 15 Nov 1994 12:45:26 XQZ") == gmt


def test_full_timezone_table():
    # the FULL Timezone.cpp table is ported (273 active entries) —
    # spot-check half-hour/quarter-hour zones and the reference's own
    # quirks (Timezone.cpp:14-293; quirks ARE the spec):
    from open_source_search_engine_ray.functions.httpdate import TZ_OFFSETS

    assert len(TZ_OFFSETS) == 273
    gmt = parse_http_date("Tue, 15 Nov 1994 12:45:26 GMT")

    def off(zone):
        return parse_http_date(f"Tue, 15 Nov 1994 12:45:26 {zone}") - gmt

    assert off("CHADT") == 13 * 3600 + 45 * 60  # +13:45 quarter-hour
    assert off("NST") == -(3 * 3600 + 30 * 60)  # -3:30 (negative minMod)
    assert off("MART") == -(9 * 3600 + 30 * 60)
    assert off("IST") == 3600       # Irish Summer Time, NOT India (+5:30)
    assert off("NDT") == 9000       # reference says +2:30 (quirk)
    assert off("MT") == -7 * 3600   # "MORE LIKELY MOUNTAIN TIME"
    assert off("NZDT") == 13 * 3600
    assert off("YAKST") == 10 * 3600 if "yakst" in TZ_OFFSETS else True


def test_failure_paths():
    for s in ("", None, b"", "garbage", "9999-99-99", "1234-", "Mon, 99"):
        assert parse_http_date(s) == -1


def test_bytes_input():
    assert parse_http_date(b"Sun, 06 Nov 1994 08:49:37 GMT") == REF
