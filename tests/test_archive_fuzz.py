"""Fuzz the WARC/ARC readers and the PDF extractor.

Real-corpus ingestion reads archives from disk exactly as found —
truncated transfers, flipped bytes, and hostile member files included.
The readers must degrade to fewer records, never to a raised exception
(a crashed read task re-fails identically under Ray retries)."""

import gzip
import random

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from open_source_search_engine_ray.sources.warc import (
    parse_arc_bytes,
    parse_warc_bytes,
)
from open_source_search_engine_ray.stages.convert import pdf_extract_text

REF_WARC = "/root/reference/html/test.warc.gz"
REF_ARC = "/root/reference/html/test.arc.gz"


def _fixture_bytes(path):
    with open(path, "rb") as f:
        return gzip.decompress(f.read())


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=200))
def test_warc_random_bytes_never_raise(data):
    list(parse_warc_bytes(data))


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=200))
def test_arc_random_bytes_never_raise(data):
    list(parse_arc_bytes(data))


@pytest.mark.parametrize("path,parse", [(REF_WARC, parse_warc_bytes), (REF_ARC, parse_arc_bytes)])
def test_truncations_of_real_fixture_never_raise(path, parse):
    raw = _fixture_bytes(path)
    rng = random.Random(7)
    for _ in range(80):
        cut = rng.randrange(len(raw) + 1)
        list(parse(raw[:cut]))


@pytest.mark.parametrize("path,parse", [(REF_WARC, parse_warc_bytes), (REF_ARC, parse_arc_bytes)])
def test_byte_flips_of_real_fixture_never_raise(path, parse):
    raw = bytearray(_fixture_bytes(path))
    rng = random.Random(11)
    for _ in range(80):
        mutated = bytearray(raw)
        for _ in range(rng.randrange(1, 6)):
            i = rng.randrange(len(mutated))
            mutated[i] = rng.randrange(256)
        list(parse(bytes(mutated)))


def test_corrupt_gzip_member_never_raises():
    # declared gzip magic but garbage stream
    list(parse_warc_bytes(b"\x1f\x8b" + b"\x00" * 40))
    list(parse_arc_bytes(b"\x1f\x8b" + b"\xff" * 40))


_PDFISH = st.sampled_from(
    [
        b"%PDF-1.4\n", b"stream\n", b"endstream", b"obj", b"endobj",
        b"BT ", b"ET", b"Tj", b"TJ", b"(text)", b"(", b")", b"\\(",
        b"<</Length 5>>", b"[(a)-120(b)]", b"/FlateDecode", b"xref",
        b"\x00\xff", b"Td", b"'",
    ]
)


@st.composite
def pdfish(draw):
    return b"".join(draw(st.lists(_PDFISH, max_size=16))) + draw(
        st.binary(max_size=24)
    )


@settings(max_examples=300, deadline=None)
@given(pdfish())
def test_pdf_extract_never_raises(data):
    out = pdf_extract_text(data)
    assert isinstance(out, str)
