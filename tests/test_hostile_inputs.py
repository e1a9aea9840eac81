"""Crash-freedom fuzz over every surface that eats raw web bytes.

Production crawls feed these kernels attacker-controlled input (page
bodies, headers, robots bodies, outlink text); a raised exception in a
map_batches worker fails the whole batch and, under Ray retries,
re-fails identically — so 'never raises' is a correctness property,
not a nicety."""

from hypothesis import given, settings
from hypothesis import strategies as st

_HTMLISH = st.sampled_from(
    [
        "<a href='", "<a href=\"", "<A HREF=", "</a>", "<img src=",
        "<script>", "</script>", "<style>", "<!--", "-->", "<title>",
        "&amp;", "&#x41;", "&#65;", "&bogus;", "&#xZZ;", "<b", ">",
        "<", "='';", "\"", "'", "<p>", "</p>", "<br/>", "<iframe src=",
        "<meta charset=", "utf-8", "'>", "\\x00", "é", "￿",
    ]
)


@st.composite
def htmlish(draw):
    return "".join(draw(st.lists(_HTMLISH, max_size=16))) + draw(
        st.text(max_size=24)
    )


@settings(max_examples=400, deadline=None)
@given(htmlish())
def test_extract_span_rows_never_raises(html):
    from open_source_search_engine_ray.sources.htmlparse import extract_span_rows

    spans = extract_span_rows(html)
    for s in spans:
        assert set(s) >= {"kind", "text", "media_ref"}
        assert isinstance(s["kind"], str)


@settings(max_examples=400, deadline=None)
@given(st.binary(max_size=128), st.sampled_from([
    "", "text/html", "text/html; charset=utf-8",
    "text/html; charset=shift_jis", "text/html; charset=bogus-charset",
    "application/pdf", "text/html; charset=utf-16-le",
]))
def test_to_utf8_never_raises(body, ctype):
    from open_source_search_engine_ray.functions.charset import to_utf8

    out = to_utf8(body, ctype)
    assert isinstance(out, str)


@settings(max_examples=400, deadline=None)
@given(st.binary(max_size=160))
def test_parse_response_never_raises(raw):
    from open_source_search_engine_ray.stages.httpfetch import _parse_response

    fr = _parse_response(raw)
    assert isinstance(fr.http_status, int)
    assert isinstance(fr.body, bytes)


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=160))
def test_parse_response_declared_encodings_never_raise(raw):
    from open_source_search_engine_ray.stages.httpfetch import _parse_response

    for enc in (b"gzip", b"deflate"):
        fr = _parse_response(
            b"HTTP/1.1 200 OK\r\nContent-Encoding: " + enc + b"\r\n\r\n" + raw
        )
        assert isinstance(fr.body, bytes)


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=200))
def test_parse_robots_never_raises(body):
    from open_source_search_engine_ray.functions.robots import parse_robots

    pol = parse_robots(body, "gigablastbot")
    for p in ("/", "/x?y=1", ""):
        assert pol.is_allowed(p) in (True, False)
    assert isinstance(pol.crawl_delay_ms, int)


@settings(max_examples=300, deadline=None)
@given(st.lists(st.text(max_size=64), max_size=8))
def test_uh48_batch_never_raises(urls):
    from open_source_search_engine_ray.functions.gbhash import uh48_batch

    out = uh48_batch(urls)
    assert len(out) == len(urls)


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=120))
def test_words_tokenize_never_raises(text):
    from open_source_search_engine_ray.functions.words import (
        word_ids,
        words_tokenize,
    )

    toks = words_tokenize(text)
    for w, is_word in toks:
        assert isinstance(w, str) and is_word in (True, False)
    # the alternating stream is a partition of the input
    assert "".join(w for w, _ in toks) == text
    word_ids(text)
