"""Property tests for the atotime port (functions/httpdate.py).

Checks the parser against round-trips through each format the
reference dispatcher recognizes, over a wide epoch range, plus
crash-freedom on arbitrary header junk."""

import calendar
import time

from hypothesis import given, settings
from hypothesis import strategies as st

from open_source_search_engine_ray.functions.httpdate import parse_http_date

# epochs covering 1971..2036 (closed formats use 4-digit years; RFC 850
# two-digit years only round-trip inside 19xx, tested separately)
EPOCHS = st.integers(min_value=31_536_000, max_value=2_100_000_000)


@settings(max_examples=300, deadline=None)
@given(EPOCHS)
def test_rfc1123_roundtrip(t):
    s = time.strftime("%a, %d %b %Y %H:%M:%S GMT", time.gmtime(t))
    assert parse_http_date(s) == t


@settings(max_examples=300, deadline=None)
@given(EPOCHS)
def test_bare_variant_roundtrip(t):
    s = time.strftime("%d %b %Y %H:%M:%S GMT", time.gmtime(t))
    assert parse_http_date(s) == t


@settings(max_examples=300, deadline=None)
@given(EPOCHS)
def test_asctime_roundtrip(t):
    # asctime pads day-of-month with a space, exactly what atotime3 eats
    tm = time.gmtime(t)
    s = time.asctime(tm)
    assert parse_http_date(s) == t


@settings(max_examples=300, deadline=None)
@given(EPOCHS)
def test_iso8601_roundtrip(t):
    s = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime(t))
    assert parse_http_date(s) == t


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=0, max_value=946_684_799))  # 1970..1999
def test_rfc850_roundtrip_19xx(t):
    # two-digit years: the reference takes tm_year raw, so only 19xx
    # round-trips (documented quirk)
    s = time.strftime("%A, %d-%b-%y %H:%M:%S GMT", time.gmtime(t))
    assert parse_http_date(s) == t


@settings(max_examples=500, deadline=None)
@given(st.text(max_size=64))
def test_never_raises_on_junk(s):
    out = parse_http_date(s)
    assert isinstance(out, int)


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=64))
def test_never_raises_on_bytes_junk(b):
    assert isinstance(parse_http_date(b), int)
