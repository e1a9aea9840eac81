"""Charset detection + conversion to UTF-8 (reference
XmlDoc.cpp:10311-10678 getUtf8Content / getCharset, iana_charset.cpp).

Priority mirrors the reference's resolution order: byte-order mark →
HTTP Content-Type header charset → <meta> declaration in the document
head → UTF-8 if it validates → windows-1252/latin-1 fallback (the
reference falls back through its iana table; Python's codecs registry
plays that role here — every IANA name codecs knows is accepted).
Decoding never fails: unknown charsets fall back, undecodable bytes are
replaced (the reference likewise indexes what it can)."""

from __future__ import annotations

import codecs
import re

import numpy as np
import pyarrow as pa

_META_RE = re.compile(
    rb"""<meta[^>]+?(?:charset\s*=\s*["']?([\w\-]+)|content\s*=\s*["'][^"']*charset=([\w\-]+))""",
    re.I,
)
_HDR_RE = re.compile(r"charset\s*=\s*\"?([\w\-]+)", re.I)

_BOMS = (
    (codecs.BOM_UTF8, "utf-8"),
    (codecs.BOM_UTF16_LE, "utf-16-le"),
    (codecs.BOM_UTF16_BE, "utf-16-be"),
)


def _valid_codec(name: str | None) -> str | None:
    if not name:
        return None
    try:
        codecs.lookup(name)
        return name
    except LookupError:
        return None


def detect_charset(body: bytes, content_type: str = "") -> str:
    """Resolve the charset for a raw HTTP body."""
    for bom, name in _BOMS:
        if body.startswith(bom):
            return name
    m = _HDR_RE.search(content_type or "")
    c = _valid_codec(m.group(1) if m else None)
    if c:
        return c
    m = _META_RE.search(body[:4096])
    if m:
        c = _valid_codec((m.group(1) or m.group(2) or b"").decode("ascii", "ignore"))
        if c:
            return c
    try:
        body.decode("utf-8")
        return "utf-8"
    except UnicodeDecodeError:
        return "windows-1252"


def to_utf8(body: bytes, content_type: str = "") -> str:
    """Decode a raw body to a UTF-8 Python string (never raises)."""
    cs = detect_charset(body, content_type)
    for bom, name in _BOMS:
        if cs == name and body.startswith(bom):
            body = body[len(bom):]
            break
    try:
        return body.decode(cs, errors="replace")
    except LookupError:  # codec vanished between detect and decode
        return body.decode("latin-1", errors="replace")


def decode_batch(t: pa.Table, body_col: str = "body", ct_col: str = "content_type") -> pa.Table:
    """map_batches stage: binary body + content-type header → utf-8
    ``html`` string column appended (the charset step of the reference's
    parse chain, run before span extraction)."""
    bodies = t[body_col].to_pylist()
    cts = t[ct_col].to_pylist() if ct_col in t.column_names else [""] * t.num_rows
    html = [to_utf8(b or b"", c or "") for b, c in zip(bodies, cts)]
    cs = [detect_charset(b or b"", c or "") for b, c in zip(bodies, cts)]
    t = t.append_column("html", pa.array(html, pa.string()))
    return t.append_column("charset", pa.array(cs, pa.string()))


def charset_columns(texts) -> np.ndarray:
    return np.array([detect_charset(x if isinstance(x, bytes) else x.encode()) for x in texts], dtype=object)
