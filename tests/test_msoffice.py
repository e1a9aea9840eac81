"""XLS (BIFF8 SST/LABEL) and PPT (text atoms) extraction over the
shared CFB reader — the xlhtml/ppthtml stand-ins."""

import numpy as np
import pytest

from open_source_search_engine_ray.functions.msoffice import (
    encode_ppt,
    encode_xls,
    ppt_extract_text,
    xls_extract_text,
)


def test_xls_sst_roundtrip():
    strings = ["Revenue", "Q1 2024", "naïve café", "日本語セル", "last"]
    out = xls_extract_text(encode_xls(strings))
    assert out == "\n".join(strings)


def test_xls_inline_labels():
    out = xls_extract_text(
        encode_xls(["shared"], inline=[(0, 0, "cellA1"), (1, 2, "cellC2")])
    )
    assert out == "shared\ncellA1\ncellC2"


def test_ppt_roundtrip():
    texts = ["Title slide", "Bullet — one", "日本語テキスト", "closing"]
    out = ppt_extract_text(encode_ppt(texts))
    assert out == "\n".join(texts)


def test_scope_errors():
    with pytest.raises(ValueError):
        xls_extract_text(b"not a cfb")
    with pytest.raises(ValueError):
        ppt_extract_text(b"junk")
    # CFB without the right stream
    from open_source_search_engine_ray.functions.msdoc import _cfb_build

    with pytest.raises(ValueError):
        xls_extract_text(_cfb_build({"Nope": b"\x00" * 4096}))
    with pytest.raises(ValueError):
        ppt_extract_text(_cfb_build({"Nope": b"\x00" * 4096}))


def test_hostile_bytes_never_hang():
    rng = np.random.default_rng(17)
    bases = [
        encode_xls(["alpha", "βeta", "gamma"]),
        encode_ppt(["one", "two"]),
    ]
    for base, fn in zip(bases, (xls_extract_text, ppt_extract_text)):
        for _ in range(30):
            data = bytearray(base)
            for _ in range(4):
                data[int(rng.integers(8, len(data)))] = int(rng.integers(0, 256))
            try:
                fn(bytes(data))
            except (ValueError, IndexError):
                pass


def test_warc_binary_docs_convert_to_spans(tmp_path, ray_session):
    """A WARC carrying .doc/.xls/.ppt bodies flows through
    corpus_to_documents: DocConvertStage's pure-Python fallbacks
    extract the text and the span parser emits it (the gbconvert.sh
    path end-to-end, no converter binaries present)."""
    from open_source_search_engine_ray.functions.msdoc import encode_doc
    from open_source_search_engine_ray.sources.warc import (
        corpus_to_documents,
        write_warc,
    )

    records = [
        {
            "url": "http://x.test/report.doc",
            "body": encode_doc("Annual report body text.", complex_doc=True),
            "content_type": "application/msword",
        },
        {
            "url": "http://x.test/sheet.xls",
            "body": encode_xls(["Spreadsheet cell text"]),
            "content_type": "application/vnd.ms-excel",
        },
        {
            "url": "http://x.test/deck.ppt",
            "body": encode_ppt(["Slide deck text"]),
            "content_type": "application/vnd.ms-powerpoint",
        },
        {"url": "http://x.test/page.html", "html": "<p>plain page</p>"},
    ]
    path = str(tmp_path / "bin.warc.gz")
    write_warc(records, path)
    df = corpus_to_documents([path]).to_pandas()
    texts = {
        r["doc_id"]: " ".join(
            s["text"] for s in r["spans"] if s["kind"] == "text"
        )
        for r in df.to_dict("records")
    }
    assert "Annual report body text." in texts["http://x.test/report.doc"]
    assert "Spreadsheet cell text" in texts["http://x.test/sheet.xls"]
    assert "Slide deck text" in texts["http://x.test/deck.ppt"]
    assert "plain page" in texts["http://x.test/page.html"]
