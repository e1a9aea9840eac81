"""WARC / ARC corpus ingestion (reference fixtures: html/test.warc.gz,
html/test.arc.gz, test/Makefile:1-17) — reads archive records from
(optionally multi-member-gzipped) files into
(url, http_status, content_type, body) rows via
``ray.data.read_binary_files`` + a flat-map parser, then into the span
model: ``warc_to_documents`` with the fixture round-trip parser, or
``corpus_to_documents`` with the real-HTML extractor
(sources/htmlparse.py) for archived web pages.

HTTP payload handling mirrors the reference's reply processing:
Content-Encoding gzip/deflate is inflated (Msg13.cpp:1920-2004), and
bodies are decoded to UTF-8 through the charset chain
(BOM → header → <meta> → fallback, XmlDoc.cpp:10311-10678).
"""

from __future__ import annotations

import gzip
import io
import zlib

from ..functions.charset import to_utf8


def parse_warc_bytes(data: bytes):
    """Yield dicts (url, http_status, content_type, body) for WARC
    ``response`` records."""
    if data[:2] == b"\x1f\x8b":
        try:
            data = gzip.decompress(data)
        except (OSError, EOFError):
            # magic bytes but a corrupt/truncated stream: fall through
            # with the raw bytes — the line scanner skips garbage
            pass
    stream = io.BytesIO(data)
    while True:
        # record header block
        line = stream.readline()
        if not line:
            break
        if not line.strip():
            continue
        if not line.startswith(b"WARC/"):
            # skip until next record marker
            continue
        headers = {}
        while True:
            h = stream.readline()
            if not h or not h.strip():
                break
            if b":" in h:
                k, v = h.split(b":", 1)
                headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers.get(b"content-length", b"0"))
        except ValueError:
            continue  # corrupted length header: resync on next marker
        payload = stream.read(max(length, 0))
        # trailing CRLFCRLF between records
        wtype = headers.get(b"warc-type", b"").decode("latin-1")
        url = headers.get(b"warc-target-uri", b"").decode("latin-1")
        if wtype != "response" or not url:
            continue
        status, ctype, body = _parse_http_payload(payload)
        yield _rec(url, status, ctype, body)


def _rec(url: str, status: int, ctype: str, body: bytes) -> dict:
    """Record dict: text bodies decode through the charset chain; binary
    convertible bodies (PDF/DOC/... — stages/convert.py taxonomy) stay
    raw in ``body_raw`` for the DocConvertStage."""
    from ..stages.convert import CONVERTIBLE, get_content_type

    if get_content_type(ctype) in CONVERTIBLE:
        return {
            "url": url,
            "http_status": status,
            "content_type": ctype,
            "body": "",
            "body_raw": body,
        }
    return {
        "url": url,
        "http_status": status,
        "content_type": ctype,
        "body": to_utf8(body, ctype),
        "body_raw": b"",
    }


def parse_arc_bytes(data: bytes):
    """Yield dicts (url, http_status, content_type, body) for ARC v1/v2
    records (Internet Archive ARC file format; the reference ships
    html/test.arc.gz and ingests it via ``gb ... arc``, test/Makefile).

    Record head = one space-separated line whose first field is the URL
    and last field the payload byte length (v1: 5 fields, v2: 10); the
    leading ``filedesc://`` record is the archive's own metadata and is
    skipped."""
    if data[:2] == b"\x1f\x8b":
        try:
            data = gzip.decompress(data)  # per-record gzip members
        except (OSError, EOFError):
            pass  # corrupt stream: scan raw, skip garbage lines
    stream = io.BytesIO(data)
    while True:
        line = stream.readline()
        if not line:
            break
        line = line.strip()
        if not line:
            continue
        parts = line.split(b" ")
        try:
            length = int(parts[-1])
        except (ValueError, IndexError):
            continue
        payload = stream.read(length)
        url = parts[0].decode("latin-1")
        if url.startswith("filedesc://") or "://" not in url:
            continue
        status, ctype, body = _parse_http_payload(payload)
        yield _rec(url, status, ctype, body)


def _parse_http_payload(payload: bytes):
    """Split an HTTP response payload into (status, content_type,
    body-bytes); inflates gzip/deflate Content-Encoding."""
    head, sep, body = payload.partition(b"\r\n\r\n")
    if not sep:
        head, sep, body = payload.partition(b"\n\n")
    status = 0
    ctype = ""
    first = head.split(b"\r\n", 1)[0].split(b"\n", 1)[0]
    parts = first.split()
    if len(parts) >= 2 and parts[0].startswith(b"HTTP/"):
        try:
            status = int(parts[1])
        except ValueError:
            status = 0
        enc = b""
        for ln in head.splitlines()[1:]:
            k, _, v = ln.partition(b":")
            lk = k.strip().lower()
            if lk == b"content-type":
                ctype = v.strip().decode("latin-1")
            elif lk == b"content-encoding":
                enc = v.strip().lower()
        if enc == b"gzip":
            try:
                body = gzip.decompress(body)
            except OSError:
                pass
        elif enc == b"deflate":
            try:
                body = zlib.decompress(body)
            except zlib.error:
                try:
                    body = zlib.decompress(body, -zlib.MAX_WBITS)
                except zlib.error:
                    pass
    else:
        body = payload  # no HTTP header block; treat whole payload as body
        status = 200
    return status, ctype, body


def write_warc(records, path: str, compress: bool = True) -> None:
    """Write records as a WARC file (test fixture helper): each record
    is (url, html) for text/html, or (url, body: bytes, content_type)
    for binary documents."""
    buf = io.BytesIO()
    for r in records:
        if "body" in r:
            body = r["body"]
            ctype = r.get("content_type", "application/octet-stream")
        else:
            body = r["html"].encode("utf-8")
            ctype = "text/html"
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: "
            + ctype.encode()
            + b"\r\n\r\n"
            + body
        )
        head = (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            + f"WARC-Target-URI: {r['url']}\r\n".encode()
            + f"Content-Length: {len(http)}\r\n".encode()
            + b"\r\n"
        )
        buf.write(head + http + b"\r\n\r\n")
    data = buf.getvalue()
    if compress:
        data = gzip.compress(data)
    with open(path, "wb") as f:
        f.write(data)


def read_warc_dataset(paths, fmt: str = "warc"):
    """ray.data pipeline: WARC/ARC files → Dataset of
    (url, http_status, content_type, body)."""
    import ray.data as rd

    ds = rd.read_binary_files(paths)
    parse = parse_arc_bytes if fmt == "arc" else parse_warc_bytes

    def explode(batch):
        import pyarrow as pa

        urls, statuses, ctypes, bodies, raws = [], [], [], [], []
        for blob in batch["bytes"].to_pylist():
            for rec in parse(blob):
                urls.append(rec["url"])
                statuses.append(rec["http_status"])
                ctypes.append(rec["content_type"])
                bodies.append(rec["body"])
                raws.append(rec["body_raw"])
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "http_status": pa.array(statuses, pa.int32()),
                "content_type": pa.array(ctypes, pa.string()),
                "body": pa.array(bodies, pa.string()),
                "body_raw": pa.array(raws, pa.binary()),
            }
        )

    return ds.map_batches(explode, batch_format="pyarrow")


def corpus_to_documents(paths, fmt: str = "warc", convert_concurrency: int = 2):
    """Archived real-web corpus → documents(doc_id, spans) via the
    general HTML extractor (full entity decoding + charset chain) —
    the ingestion path for non-SynthWeb pages.  Binary documents
    (PDF/DOC/... ) pass through the DocConvertStage actor pool first
    (XmlDoc.cpp:9729-9736 gbfilter semantics); rows it cannot convert
    are dropped like the reference's gbfilter read-error path."""
    from ..stages.convert import CONVERTIBLE, DocConvertStage
    from .htmlparse import extract_span_rows

    ds = read_warc_dataset(paths, fmt=fmt).map_batches(
        DocConvertStage,
        concurrency=convert_concurrency,
        batch_size=64,  # bodies are large; keep batches small
        batch_format="pyarrow",
        num_cpus=1,
    )

    def to_docs(batch):
        import pyarrow as pa

        from ..stages.fetch import SPAN_TYPE

        ids, spans = [], []
        for url, status, ctype, body, ct, ok in zip(
            batch["url"].to_pylist(),
            batch["http_status"].to_pylist(),
            batch["content_type"].to_pylist(),
            batch["body"].to_pylist(),
            batch["ct"].to_pylist(),
            batch["convert_ok"].to_pylist(),
        ):
            is_html = "html" in (ctype or "html")
            is_converted = ct in CONVERTIBLE and ok
            if status == 200 and body and (is_html or is_converted):
                ids.append(url)
                spans.append(extract_span_rows(body))
        return pa.table(
            {"doc_id": pa.array(ids, pa.string()), "spans": pa.array(spans, SPAN_TYPE)}
        )

    return ds.map_batches(to_docs, batch_format="pyarrow")


def warc_to_documents(paths):
    """WARC → documents(doc_id, spans) via the span parser."""
    from .synthweb import parse_html

    ds = read_warc_dataset(paths)

    def to_docs(batch):
        import pyarrow as pa

        from ..stages.fetch import SPAN_TYPE

        ids, spans = [], []
        for url, status, body in zip(
            batch["url"].to_pylist(),
            batch["http_status"].to_pylist(),
            batch["body"].to_pylist(),
        ):
            if status == 200 and body:
                ids.append(url)
                spans.append(parse_html(body))
        return pa.table(
            {"doc_id": pa.array(ids, pa.string()), "spans": pa.array(spans, SPAN_TYPE)}
        )

    return ds.map_batches(to_docs, batch_format="pyarrow")
