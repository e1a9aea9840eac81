"""Charset→UTF-8 conversion (XmlDoc.cpp:10311-10678 subset) and
adult-content scoring (AdultCheck.cpp)."""

import pyarrow as pa

from open_source_search_engine_ray.functions.adultcheck import (
    adult_points,
    adult_points_batch,
    is_adult,
)
from open_source_search_engine_ray.functions.charset import (
    decode_batch,
    detect_charset,
    to_utf8,
)
from open_source_search_engine_ray.sources.synthweb import parse_html, render_html


def spans_with(text):
    return [
        {"kind": "text", "text": text, "media_ref": "", "offset": 0},
        {"kind": "link", "text": "next", "media_ref": "http://x.test/p1.html", "offset": 1},
    ]


def test_latin1_page_decodes_to_same_spans():
    spans = spans_with("café naïve déjà-vu — ¡hola!".replace("—", "-"))
    html = '<meta charset="iso-8859-1">' + render_html(spans)
    raw = html.encode("iso-8859-1")
    assert detect_charset(raw) == "iso-8859-1"
    assert parse_html(to_utf8(raw)) == spans


def test_shiftjis_page_decodes_to_same_spans():
    spans = spans_with("こんにちは 世界")
    html = '<meta http-equiv="Content-Type" content="text/html; charset=shift_jis">' + render_html(spans)
    raw = html.encode("shift_jis")
    assert detect_charset(raw) == "shift_jis"
    assert parse_html(to_utf8(raw)) == spans


def test_http_header_beats_meta_and_bom_beats_all():
    body = "pâté".encode("iso-8859-1")
    assert detect_charset(body, "text/html; charset=ISO-8859-1") == "ISO-8859-1"
    assert to_utf8(body, "text/html; charset=iso-8859-1") == "pâté"
    import codecs

    bom_body = codecs.BOM_UTF16_LE + "pâté".encode("utf-16-le")
    assert detect_charset(bom_body, "charset=iso-8859-1") == "utf-16-le"
    assert to_utf8(bom_body) == "pâté"


def test_unknown_charset_and_garbage_never_raise():
    assert to_utf8(b"\xff\xfe\x00garbage\x9c", 'charset="klingon-1"')
    assert detect_charset(b"", "") == "utf-8"
    # plain utf-8 without any declaration
    assert to_utf8("héllo".encode()) == "héllo"
    # invalid utf-8 without declaration falls back to windows-1252
    assert detect_charset(b"caf\xe9") == "windows-1252"
    assert to_utf8(b"caf\xe9") == "café"


def test_decode_batch_stage():
    t = pa.table(
        {
            "body": pa.array(
                ["héllo".encode(), "pâté".encode("latin-1"), b""], pa.binary()
            ),
            "content_type": pa.array(["", "text/html; charset=latin-1", ""]),
        }
    )
    out = decode_batch(t)
    assert out["html"].to_pylist() == ["héllo", "pâté", ""]
    assert out["charset"].to_pylist()[1].lower() in ("latin-1", "iso-8859-1")


# -- adult check -------------------------------------------------------------


def test_adult_points_exceptions_cancel():
    # "sussex" matches the +1 "sex" needle and two -1 exception entries
    assert adult_points("history of sussex county") == -1
    assert not is_adult("history of sussex county")
    # cum laude / document: +2 "cum" cancelled by -2 exceptions
    assert adult_points("graduated cum laude") == 0
    assert adult_points("the documentation") == 0
    assert adult_points("analog circuits") == 0  # anal+2, analog-2


def test_adult_threshold_semantics():
    assert not is_adult("nude")  # single +1: below threshold
    assert is_adult("nude xxx")  # 1+1 = 2
    assert is_adult("porn")  # single +2 needle
    assert adult_points("porn porn porn") == 2  # presence, not occurrences
    assert not is_adult("a perfectly ordinary web page about crawling")


def test_adult_batch():
    pts = adult_points_batch(["porn", "sussex", "hello world"])
    # "hello" is a -1 exception for "hell" (+1): nets 0
    assert pts.tolist() == [2, -1, 0]
