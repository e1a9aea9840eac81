"""Minimal WARC ingestion (reference corpus fixtures: html/test.warc.gz,
test/Makefile) — reads WARC 1.0 ``response`` records from (optionally
gzipped) files into (url, http_status, html) rows via
``ray.data.read_binary_files`` + a flat-map parser, then into the span
model with the same ParseStage kernel as the live fetcher.

Only the subset needed for corpus ingestion is implemented: record
header parsing, Content-Length framed payloads, and an embedded HTTP/1.x
response header block.
"""

from __future__ import annotations

import gzip
import io


def parse_warc_bytes(data: bytes):
    """Yield dicts (url, http_status, body_text) for WARC response records."""
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
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
        length = int(headers.get(b"content-length", b"0"))
        payload = stream.read(length)
        # trailing CRLFCRLF between records
        wtype = headers.get(b"warc-type", b"").decode()
        url = headers.get(b"warc-target-uri", b"").decode()
        if wtype != "response" or not url:
            continue
        status, body = _parse_http_payload(payload)
        yield {"url": url, "http_status": status, "body": body}


def _parse_http_payload(payload: bytes):
    """Split an HTTP response payload into (status, body-str)."""
    head, sep, body = payload.partition(b"\r\n\r\n")
    if not sep:
        head, sep, body = payload.partition(b"\n\n")
    status = 0
    first = head.split(b"\r\n", 1)[0].split(b"\n", 1)[0]
    parts = first.split()
    if len(parts) >= 2 and parts[0].startswith(b"HTTP/"):
        try:
            status = int(parts[1])
        except ValueError:
            status = 0
    else:
        body = payload  # no HTTP header block; treat whole payload as body
        status = 200
    return status, body.decode("utf-8", errors="replace")


def write_warc(records, path: str, compress: bool = True) -> None:
    """Write (url, html) records as a WARC file (test fixture helper)."""
    buf = io.BytesIO()
    for r in records:
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
            + r["html"].encode("utf-8")
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


def read_warc_dataset(paths):
    """ray.data pipeline: WARC files → Dataset of (url, http_status, body)."""
    import ray.data as rd

    ds = rd.read_binary_files(paths)

    def explode(batch):
        import pyarrow as pa

        urls, statuses, bodies = [], [], []
        for blob in batch["bytes"].to_pylist():
            for rec in parse_warc_bytes(blob):
                urls.append(rec["url"])
                statuses.append(rec["http_status"])
                bodies.append(rec["body"])
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "http_status": pa.array(statuses, pa.int32()),
                "body": pa.array(bodies, pa.string()),
            }
        )

    return ds.map_batches(explode, batch_format="pyarrow")


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
