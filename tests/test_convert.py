"""Binary-document conversion (gbfilter path): CT taxonomy
(HttpMime.h:23-31), the built-in minimal PDF extractor, the sandboxed
external-converter gating, and the e2e WARC-with-PDF ingestion into
spans (XmlDoc.cpp:9729-9736)."""

import gzip
import io
import zlib

import pyarrow as pa

from open_source_search_engine_ray.stages.convert import (
    CT_DOC,
    CT_HTML,
    CT_PDF,
    CT_PS,
    CT_TEXT,
    CT_UNKNOWN,
    CT_XLS,
    DocConvertStage,
    get_content_type,
    pdf_extract_text,
)


def make_pdf(text: str, flate: bool = True) -> bytes:
    """Minimal single-page PDF with the text in one content stream."""
    lit = text.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
    content = f"BT /F1 12 Tf 72 720 Td ({lit}) Tj ET".encode("latin-1")
    if flate:
        payload = zlib.compress(content)
        filt = b" /Filter /FlateDecode"
    else:
        payload = content
        filt = b""
    objs = [
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n",
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n",
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>\nendobj\n",
        b"4 0 obj\n<< /Length " + str(len(payload)).encode() + filt
        + b" >>\nstream\n" + payload + b"\nendstream\nendobj\n",
        b"5 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
        b"\nendobj\n",
    ]
    out = io.BytesIO()
    out.write(b"%PDF-1.4\n")
    offsets = []
    for o in objs:
        offsets.append(out.tell())
        out.write(o)
    xref_pos = out.tell()
    out.write(b"xref\n0 6\n0000000000 65535 f \n")
    for off in offsets:
        out.write(f"{off:010d} 00000 n \n".encode())
    out.write(
        b"trailer\n<< /Size 6 /Root 1 0 R >>\nstartxref\n"
        + str(xref_pos).encode()
        + b"\n%%EOF\n"
    )
    return out.getvalue()


def test_content_type_taxonomy():
    assert get_content_type("text/html; charset=utf-8") == CT_HTML
    assert get_content_type("TEXT/PLAIN") == CT_TEXT
    assert get_content_type("application/pdf") == CT_PDF
    assert get_content_type("application/msword") == CT_DOC
    assert get_content_type("application/vnd.ms-excel") == CT_XLS
    assert get_content_type("application/postscript") == CT_PS
    assert get_content_type("image/png") == CT_UNKNOWN
    assert get_content_type(None) == CT_UNKNOWN


def test_pdf_extract_text_flate_and_plain():
    msg = "Hello converted (PDF) world \\ with escapes"
    for flate in (True, False):
        got = pdf_extract_text(make_pdf(msg, flate=flate))
        assert got == msg, (flate, got)
    # garbage and image-only degrade to "" (convert failure, not crash)
    assert pdf_extract_text(b"not a pdf") == ""
    assert pdf_extract_text(b"%PDF-1.4\n<< /Filter /DCTDecode >>\nstream\n\xff\xd8\nendstream") == ""


def test_convert_stage_batch_contract():
    st = DocConvertStage()
    batch = pa.table(
        {
            "url": ["http://a.test/x.pdf", "http://a.test/y.html",
                    "http://a.test/z.doc"],
            "content_type": ["application/pdf", "text/html",
                             "application/msword"],
            "body": ["", "<html><body>page</body></html>", ""],
            "body_raw": [make_pdf("pdf body text"), b"", b"\xd0\xcf\x11\xe0"],
        }
    )
    out = st(batch)
    ok = out["convert_ok"].to_pylist()
    body = out["body"].to_pylist()
    ct = out["ct"].to_pylist()
    assert ct == [CT_PDF, CT_HTML, CT_DOC]
    assert ok[0] and "pdf body text" in body[0] and body[0].startswith("<html>")
    assert ok[1] and body[1] == "<html><body>page</body></html>"
    # no antiword in the sandbox: honestly gated failure, row kept
    if st._bins[CT_DOC][0] is None:
        assert not ok[2] and body[2] == ""


def test_warc_pdf_to_spans(ray_session, tmp_path):
    """e2e: a WARC holding an HTML page and a PDF response ingests into
    spans for BOTH (the PDF through the conversion stage)."""
    from open_source_search_engine_ray.sources.warc import corpus_to_documents

    html_payload = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
        b"<html><head><title>T</title></head><body><p>html page</p></body></html>"
    )
    pdf = make_pdf("portable document text")
    pdf_payload = (
        b"HTTP/1.1 200 OK\r\nContent-Type: application/pdf\r\n\r\n" + pdf
    )
    buf = io.BytesIO()
    for url, payload in [
        ("http://w.test/page.html", html_payload),
        ("http://w.test/doc.pdf", pdf_payload),
    ]:
        head = (
            b"WARC/1.0\r\nWARC-Type: response\r\n"
            + f"WARC-Target-URI: {url}\r\n".encode()
            + f"Content-Length: {len(payload)}\r\n".encode()
            + b"\r\n"
        )
        buf.write(head + payload + b"\r\n\r\n")
    path = tmp_path / "mixed.warc.gz"
    path.write_bytes(gzip.compress(buf.getvalue()))

    df = corpus_to_documents([str(path)]).to_pandas().sort_values("doc_id")
    assert list(df["doc_id"]) == [
        "http://w.test/doc.pdf",
        "http://w.test/page.html",
    ]
    texts = {
        d: " ".join(s["text"] for s in spans if s["kind"] == "text")
        for d, spans in zip(df["doc_id"], df["spans"])
    }
    assert "portable document text" in texts["http://w.test/doc.pdf"]
    assert "html page" in texts["http://w.test/page.html"]


def test_ps_extract_text():
    from open_source_search_engine_ray.stages.convert import (
        CT_PS,
        ps_extract_text,
    )

    ps = (
        b"%!PS-Adobe-3.0\n/Times findfont 12 scalefont setfont\n"
        b"72 720 moveto (Hello PostScript) show\n"
        b"72 700 moveto 1 0 (spaced \\(escaped\\) text) ashow\n"
        b"0 0 32 1 0 (width shown) widthshow\nshowpage\n"
    )
    got = ps_extract_text(ps)
    assert got == "Hello PostScript spaced (escaped) text width shown"
    assert ps_extract_text(b"%!PS\nnewpath 0 0 moveto showpage\n") == ""
    # stage fallback path (no pstotext binary in the sandbox)
    st = DocConvertStage()
    html, ok = st.convert(CT_PS, ps)
    if st._bins[CT_PS][0] is None:
        assert ok and "Hello PostScript" in html and html.startswith("<html>")


def test_rtf_extract_text():
    from open_source_search_engine_ray.stages.convert import (
        CT_RTF,
        get_content_type,
        rtf_extract_text,
    )

    rtf = (
        rb"{\rtf1\ansi\deff0{\fonttbl{\f0 Times New Roman;}}"
        rb"{\colortbl;\red0\green0\blue0;}"
        rb"{\*\generator Fancy Writer 9;}"
        rb"\uc1\pard Caf\'e9 body \u8212 ? dash{\b bold run} text\par"
        rb" second \{line\} with tab\tab end}"
    )
    got = rtf_extract_text(rtf)
    assert "Café body — dash" in got
    assert "bold run text" in got
    assert "\nsecond {line} with tab\tend" in got
    # metadata destinations are skipped
    assert "Times New Roman" not in got
    assert "Fancy Writer" not in got
    assert rtf_extract_text(b"plain text, not rtf") == ""
    assert get_content_type("application/rtf") == CT_RTF
    assert get_content_type("text/rtf; charset=windows-1252") == CT_RTF
    st = DocConvertStage()
    html, ok = st.convert(CT_RTF, rtf)
    assert ok and "Café body" in html
