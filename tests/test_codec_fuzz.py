"""Fuzz the round-5 binary surfaces: JPEG/GIF decoders and the
CFB/Word/Excel/PowerPoint extractors.

These kernels read crawled bytes exactly as found; the contract is the
same as the archive readers': a clean ``ValueError``/``IndexError``
(the conversion/media stages' fallback triggers) or a valid result —
never a hang, never an uncaught exception (a crashed map_batches task
re-fails identically under Ray retries)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from open_source_search_engine_ray.functions.msdoc import (
    doc_extract_text,
    encode_doc,
)
from open_source_search_engine_ray.functions.msoffice import (
    encode_ppt,
    encode_xls,
    ppt_extract_text,
    xls_extract_text,
)
from open_source_search_engine_ray.pipelines.media_gif import (
    decode_gif,
    encode_gif,
)
from open_source_search_engine_ray.pipelines.media_jpeg import (
    decode_jpeg,
    encode_jpeg,
)

OK_ERRS = (ValueError, IndexError)


def _try(fn, data):
    try:
        fn(data)
    except OK_ERRS:
        pass


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=300))
def test_random_bytes_all_decoders(data):
    for fn in (decode_jpeg, decode_gif, doc_extract_text,
               xls_extract_text, ppt_extract_text):
        _try(fn, data)


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=300))
def test_prefixed_random_bytes(data):
    _try(decode_jpeg, b"\xff\xd8" + data)
    _try(decode_gif, b"GIF89a" + data)
    _try(doc_extract_text, b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1" + data)


@pytest.fixture(scope="module")
def valid_payloads():
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    pal = np.stack([np.arange(8)] * 3, axis=-1).astype(np.uint8) * 30
    return [
        (decode_jpeg, encode_jpeg(np.tile(img, (2, 3)), 85)),
        (decode_gif, encode_gif((img % 8), pal)),
        (doc_extract_text, encode_doc("fuzz doc body", complex_doc=True)),
        (xls_extract_text, encode_xls(["fuzz", "cells"])),
        (ppt_extract_text, encode_ppt(["fuzz slide"])),
    ]


@settings(max_examples=120, deadline=None)
@given(
    which=st.integers(0, 4),
    edits=st.lists(
        st.tuples(st.integers(0, 10_000), st.integers(0, 255)),
        min_size=1,
        max_size=6,
    ),
)
def test_bitflipped_valid_payloads(valid_payloads, which, edits):
    fn, base = valid_payloads[which]
    data = bytearray(base)
    for pos, val in edits:
        data[8 + pos % (len(data) - 8)] = val
    _try(fn, bytes(data))


@settings(max_examples=120, deadline=None)
@given(cut=st.integers(0, 10_000))
def test_truncated_valid_payloads(valid_payloads, cut):
    for fn, base in valid_payloads:
        _try(fn, base[: cut % (len(base) + 1)])
