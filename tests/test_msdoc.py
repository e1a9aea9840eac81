"""Word binary (.doc) extraction: CFB container + FIB/piece-table text
layer (functions/msdoc.py — the antiword stand-in for the reference's
gbconvert.sh CT_DOC routing)."""

import numpy as np
import pytest

from open_source_search_engine_ray.functions.msdoc import (
    CfbFile,
    doc_extract_text,
    encode_doc,
)
from open_source_search_engine_ray.stages.convert import CT_DOC, DocConvertStage

TEXT = "Hello crawl world.\nSecond paragraph — naïve café text."


@pytest.mark.parametrize("complex_doc", [False, True])
@pytest.mark.parametrize("unicode", [False, True])
def test_roundtrip(complex_doc, unicode):
    data = encode_doc(TEXT, complex_doc=complex_doc, unicode=unicode)
    out = doc_extract_text(data)
    assert out == TEXT.replace("\n", "\n")


def test_control_char_mapping():
    # cell mark / line break / optional hyphen / field char
    raw = "a\x07b\x0bc\x1fd\x01e"
    data = encode_doc(raw)
    assert doc_extract_text(data) == "a\nb\nc" + "d" + "e"


def test_cfb_layer():
    data = encode_doc(TEXT, complex_doc=True)
    cfb = CfbFile(data)
    names = {e["name"] for e in cfb.entries if e["type"] == 2}
    assert names == {"WordDocument", "0Table"}
    assert len(cfb.stream("WordDocument")) == 4096


def test_scope_errors():
    with pytest.raises(ValueError):
        doc_extract_text(b"not a doc at all")
    # CFB but no WordDocument stream
    from open_source_search_engine_ray.functions.msdoc import _cfb_build

    with pytest.raises(ValueError):
        doc_extract_text(_cfb_build({"Other": b"\x00" * 4096}))
    # wrong wIdent
    bad = bytearray(encode_doc(TEXT))
    # WordDocument data starts at sector 2 (FAT=0, dir=1)
    bad[512 + 2 * 512] = 0x00
    with pytest.raises(ValueError):
        doc_extract_text(bytes(bad))


def test_hostile_bytes_never_hang():
    rng = np.random.default_rng(13)
    base = encode_doc(TEXT, complex_doc=True, unicode=True)
    for _ in range(40):
        data = bytearray(base)
        for _ in range(4):
            data[int(rng.integers(8, len(data)))] = int(rng.integers(0, 256))
        try:
            doc_extract_text(bytes(data))
        except (ValueError, IndexError):
            pass


def test_convert_stage_routes_doc():
    import pyarrow as pa

    stage = DocConvertStage()
    html, ok = stage.convert(CT_DOC, encode_doc(TEXT))
    assert ok and "Hello crawl world." in html
    html2, ok2 = stage.convert(CT_DOC, b"\xd0\xcf\x11\xe0garbage")
    assert not ok2 and html2 == ""
