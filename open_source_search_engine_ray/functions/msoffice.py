"""Excel (.xls) and PowerPoint (.ppt) binary text extraction — the
``xlhtml`` / ``ppthtml`` stand-ins, pure Python over the shared CFB
reader (:mod:`.msdoc`).

The reference converts CT_XLS / CT_PPT by shelling out
(``gbconvert.sh``; ``XmlDoc.cpp`` content-type routing); neither
binary exists in this container.  What those tools' text paths
actually read:

* **XLS (BIFF8)**: the ``Workbook`` stream is a sequence of
  ``(record_id:u16, length:u16, payload)`` records.  Cell text lives
  in the SST (shared string table, record 0x00FC, with 0x003C
  CONTINUE records) as XLUnicodeRichExtendedString entries — 8-bit or
  UTF-16LE per-string, with optional rich-run/ext payloads to skip —
  plus inline LABEL (0x0204) records in old sheets.
* **PPT**: the ``PowerPoint Document`` stream is a record tree of
  ``(verAndInstance:u16, type:u16, length:u32)`` atoms; slide text is
  in TextCharsAtom (0x0FA0, UTF-16LE) and TextBytesAtom (0x0FA8,
  8-bit) leaves, in stream order.

``encode_xls`` / ``encode_ppt`` build spec-shaped fixtures (the media
codec pattern).  Out-of-scope payloads raise ``ValueError`` and the
conversion stage falls back to the deterministic error path.
"""

from __future__ import annotations

import struct

from .msdoc import CfbFile, _cfb_build

# ---------------------------------------------------------------------------
# XLS / BIFF8
# ---------------------------------------------------------------------------

_XLS_SST = 0x00FC
_XLS_CONTINUE = 0x003C
_XLS_LABEL = 0x0204
_XLS_BOF = 0x0809
_XLS_EOF = 0x000A


def _biff_records(stream: bytes):
    i = 0
    n = len(stream)
    while i + 4 <= n:
        rid, ln = struct.unpack_from("<HH", stream, i)
        payload = stream[i + 4 : i + 4 + ln]
        if len(payload) < ln:
            raise ValueError("BIFF record truncated")
        yield rid, payload
        i += 4 + ln


def _read_xl_string(buf: bytes, i: int, cch: int) -> tuple:
    """XLUnicodeRichExtendedString at buf[i:]: returns (text, next_i).
    ``cch`` characters already parsed from the 2-byte length prefix."""
    if i >= len(buf):
        raise ValueError("SST string truncated")
    flags = buf[i]
    i += 1
    high = flags & 0x01
    rich = flags & 0x08
    ext = flags & 0x04
    crun = 0
    cbext = 0
    if rich:
        (crun,) = struct.unpack_from("<H", buf, i)
        i += 2
    if ext:
        (cbext,) = struct.unpack_from("<i", buf, i)
        i += 4
    nbytes = cch * (2 if high else 1)
    raw = buf[i : i + nbytes]
    if len(raw) < nbytes:
        raise ValueError("SST string body truncated")
    text = raw.decode("utf-16-le" if high else "cp1252", "replace")
    i += nbytes + 4 * crun + cbext
    return text, i


def xls_extract_text(data: bytes) -> str:
    """.xls bytes → cell text (SST strings + inline labels), newline
    separated, stream order."""
    cfb = CfbFile(data)
    try:
        wb = cfb.stream("Workbook")
    except ValueError:
        wb = cfb.stream("Book")  # BIFF5-era name
    texts: list = []
    saw_bof = False
    for rid, payload in _biff_records(wb):
        if rid == _XLS_BOF:
            saw_bof = True
        elif rid == _XLS_SST:
            # cstTotal(u32) cstUnique(u32) then strings; CONTINUE
            # handling: fixtures emit single-record SSTs (documented
            # scope — a split string restarts with its own flags byte)
            (_total, unique) = struct.unpack_from("<II", payload, 0)
            i = 8
            for _ in range(unique):
                if i + 2 > len(payload):
                    break  # remainder lives in CONTINUE records
                (cch,) = struct.unpack_from("<H", payload, i)
                s, i = _read_xl_string(payload, i + 2, cch)
                texts.append(s)
        elif rid == _XLS_LABEL:
            # row(u16) col(u16) ixfe(u16) then XLUnicodeString
            (cch,) = struct.unpack_from("<H", payload, 6)
            s, _ = _read_xl_string(payload, 8, cch)
            texts.append(s)
    if not saw_bof:
        raise ValueError("Workbook stream has no BOF record")
    return "\n".join(t for t in texts if t)


def encode_xls(strings: list, inline: list | None = None) -> bytes:
    """Fixture builder: BIFF8 Workbook with an SST holding ``strings``
    (mixed 8-bit/UTF-16 per content) and optional inline LABEL cells."""
    recs = bytearray()
    recs += struct.pack("<HHHH", _XLS_BOF, 4, 0x0600, 0x0005)  # BIFF8, workbook
    sst = bytearray(struct.pack("<II", len(strings), len(strings)))
    for s in strings:
        try:
            raw = s.encode("cp1252")
            high = 0
        except UnicodeEncodeError:
            raw = s.encode("utf-16-le")
            high = 1
        sst += struct.pack("<HB", len(s), high) + raw
    recs += struct.pack("<HH", _XLS_SST, len(sst)) + sst
    for r, (row, col, s) in enumerate(inline or []):
        body = struct.pack("<HHHHB", row, col, 15, len(s), 0) + s.encode(
            "cp1252", "replace"
        )
        recs += struct.pack("<HH", _XLS_LABEL, len(body)) + body
    recs += struct.pack("<HH", _XLS_EOF, 0)
    wb = bytes(recs) + b"\x00" * max(0, 4096 - len(recs))
    return _cfb_build({"Workbook": wb})


# ---------------------------------------------------------------------------
# PPT
# ---------------------------------------------------------------------------

_PPT_TEXTCHARS = 0x0FA0
_PPT_TEXTBYTES = 0x0FA8
#: container record types (recVer == 0xF) get descended into
_PPT_STREAM = "PowerPoint Document"


def _ppt_walk(stream: bytes, i: int, end: int, out: list, depth: int = 0):
    if depth > 32:
        raise ValueError("PPT record tree too deep")
    while i + 8 <= end:
        ver_inst, rtype, ln = struct.unpack_from("<HHI", stream, i)
        i += 8
        if i + ln > end:
            raise ValueError("PPT record truncated")
        if (ver_inst & 0x000F) == 0x000F:  # container
            _ppt_walk(stream, i, i + ln, out, depth + 1)
        elif rtype == _PPT_TEXTCHARS:
            out.append(stream[i : i + ln].decode("utf-16-le", "replace"))
        elif rtype == _PPT_TEXTBYTES:
            out.append(stream[i : i + ln].decode("cp1252", "replace"))
        i += ln


def ppt_extract_text(data: bytes) -> str:
    """.ppt bytes → slide text (TextCharsAtom/TextBytesAtom leaves in
    stream order), newline separated."""
    cfb = CfbFile(data)
    doc = cfb.stream(_PPT_STREAM)
    out: list = []
    _ppt_walk(doc, 0, len(doc), out)
    cleaned = [t.replace("\r", "\n") for t in out if t]
    return "\n".join(cleaned)


def encode_ppt(texts: list) -> bytes:
    """Fixture builder: one container record holding one text atom per
    entry (UTF-16 when needed, else bytes)."""
    atoms = bytearray()
    for t in texts:
        try:
            raw = t.encode("cp1252")
            rtype = _PPT_TEXTBYTES
        except UnicodeEncodeError:
            raw = t.encode("utf-16-le")
            rtype = _PPT_TEXTCHARS
        atoms += struct.pack("<HHI", 0x0000, rtype, len(raw)) + raw
    doc = struct.pack("<HHI", 0x000F, 0x03E8, len(atoms)) + bytes(atoms)
    doc += b"\x00" * max(0, 4096 - len(doc))
    return _cfb_build({_PPT_STREAM: doc})
