"""Binary-document conversion stage: CT_PDF / CT_DOC / CT_XLS / CT_PPT
/ CT_PS → HTML text, the reference's gbfilter path.

Reference semantics:

* **Content-type taxonomy** — HttpMime.h:23-31 (CT_UNKNOWN..CT_PS);
  ``get_content_type`` is the ``getContentTypeFromStr`` subset the
  converter needs.
* **Sandboxed converters** — XmlDoc.cpp:9729-9736: the reference writes
  the body to a temp file and shells to ``gbconvert.sh`` (pdftohtml) /
  ``antiword`` / ``xlhtml`` / ``ppthtml`` / ``pstotext`` under resource
  limits (``ulimit -v 25000`` KB, ``ulimit -t 30``, ``timeout``,
  ``nice -n 19``), then reads the converted HTML back.  Here the same
  shape: tempfile in/out, ``subprocess.run`` with ``RLIMIT_AS`` /
  ``RLIMIT_CPU`` set in ``preexec_fn``, wall-clock timeout — resolved
  ONCE per actor in ``__init__`` (``shutil.which``), the import-try
  gating pattern the media codecs use.
* **Built-in fallbacks** — the sandbox has no converter binaries, so
  every convertible type falls back to a pure-Python extractor:
  CT_PDF (uncompressed or FlateDecode content streams, BT..ET text
  blocks with Tj/TJ/'/" string operands), CT_PS (show-operator string
  scan), CT_RTF (control-word state machine), CT_DOC (CFB + FIB/piece
  table, functions/msdoc.py), CT_XLS (BIFF8 SST/LABEL strings) and
  CT_PPT (TextChars/TextBytes atoms, functions/msoffice.py).
  Undecodable payloads yield ``convert_ok=False`` rows (the
  reference's gbfilter read-error path) — honestly gated, never
  silently wrong.

The stage is a callable class for
``map_batches(DocConvertStage, concurrency=N, batch_format="pyarrow")``;
at 100 TB the conversion tier is CPU-bound subprocess work, so it sizes
with ``num_cpus=1`` per actor and small batches (bodies are large).
"""

from __future__ import annotations

import re
import struct
import zlib

import pyarrow as pa

# HttpMime.h:23-31
CT_UNKNOWN = 0
CT_HTML = 1
CT_TEXT = 2
CT_XML = 3
CT_PDF = 4
CT_DOC = 5
CT_XLS = 6
CT_PPT = 7
CT_PS = 8
# extension beyond HttpMime.h's CT_UNKNOWN..CT_PS: RTF arrives as
# application/rtf on real crawls and has a cheap pure-Python extractor
CT_RTF = 9

_CT_MAP = {
    "text/html": CT_HTML,
    "text/plain": CT_TEXT,
    "text/xml": CT_XML,
    "application/xml": CT_XML,
    "application/xhtml+xml": CT_HTML,
    "application/pdf": CT_PDF,
    "application/msword": CT_DOC,
    "application/vnd.ms-excel": CT_XLS,
    "application/vnd.ms-powerpoint": CT_PPT,
    "application/postscript": CT_PS,
    "application/rtf": CT_RTF,
    "text/rtf": CT_RTF,
}

# the binary types gbfilter converts (XmlDoc.cpp:9725-9741)
CONVERTIBLE = frozenset({CT_PDF, CT_DOC, CT_XLS, CT_PPT, CT_PS, CT_RTF})

# converter binary per type (gbconvert.sh wraps pdftohtml)
_CONVERTER_BIN = {
    CT_PDF: ("pdftohtml", ["-i", "-noframes", "-stdout"]),
    CT_DOC: ("antiword", []),
    CT_XLS: ("xlhtml", []),
    CT_PPT: ("ppthtml", []),
    CT_PS: ("pstotext", []),
}


def get_content_type(mime: str | None) -> int:
    """``getContentTypeFromStr`` subset: MIME string → CT code."""
    if not mime:
        return CT_UNKNOWN
    key = mime.split(";", 1)[0].strip().lower()
    return _CT_MAP.get(key, CT_UNKNOWN)


# -- built-in minimal PDF text extraction -----------------------------------

_STREAM_START_RE = re.compile(rb">>\s*stream\r?\n")
_BT_RE = re.compile(rb"BT(.*?)ET", re.S)
_LIT_RE = re.compile(rb"\((?:\\.|[^\\()])*\)")
_ESC = {
    b"n": b"\n",
    b"r": b"\r",
    b"t": b"\t",
    b"b": b"\b",
    b"f": b"\f",
    b"(": b"(",
    b")": b")",
    b"\\": b"\\",
}


def _unescape_literal(lit: bytes) -> bytes:
    out = bytearray()
    i = 1  # skip '('
    end = len(lit) - 1  # skip ')'
    while i < end:
        c = lit[i : i + 1]
        if c == b"\\" and i + 1 < end:
            nxt = lit[i + 1 : i + 2]
            if nxt.isdigit():  # octal escape, up to 3 digits
                j = i + 1
                while j < min(i + 4, end) and lit[j : j + 1].isdigit():
                    j += 1
                out.append(int(lit[i + 1 : j], 8) & 0xFF)
                i = j
                continue
            out += _ESC.get(nxt, nxt)
            i += 2
            continue
        out += c
        i += 1
    return bytes(out)


def _stream_objects(data: bytes):
    """Yield (stream_dict_bytes, body_start) for every ``<<...>>
    stream`` object; the dict start is found by walking ``<< >>``
    nesting backwards from the ``stream`` keyword."""
    for m in _STREAM_START_RE.finditer(data):
        depth = 1
        i = m.start()
        while depth and i > 0:
            j = data.rfind(b"<<", 0, i)
            k = data.rfind(b">>", 0, i)
            if j < 0:
                break
            if k > j:
                depth += 1
                i = k
            else:
                depth -= 1
                i = j
        yield data[i : m.start()], m.end()


def pdf_extract_text(data: bytes) -> str:
    """Text from simple PDFs: every string literal inside BT..ET text
    blocks of each (optionally FlateDecode) content stream, in document
    order.  Returns "" when nothing extractable (encrypted, image-only,
    unsupported filters) — the caller treats that as a convert failure."""
    parts: list[bytes] = []
    for sdict, start in _stream_objects(data):
        end = data.find(b"endstream", start)
        if end < 0:
            continue
        raw = data[start:end].rstrip(b"\r\n")
        if b"/FlateDecode" in sdict:
            try:
                raw = zlib.decompress(raw)
            except zlib.error:
                continue
        elif b"/Filter" in sdict:
            continue  # unsupported filter (DCT, LZW, ...)
        for bt in _BT_RE.finditer(raw):
            for lit in _LIT_RE.finditer(bt.group(1)):
                parts.append(_unescape_literal(lit.group(0)))
    text = b" ".join(p for p in parts if p.strip())
    return text.decode("latin-1", errors="replace")


_PS_SHOW_RE = re.compile(
    rb"(\((?:\\.|[^\\()])*\))\s*"
    rb"(?:show|ashow|widthshow|awidthshow|kshow)\b"
)


def ps_extract_text(data: bytes) -> str:
    """Text from PostScript: every string literal that feeds a
    show-family operator (``(s) show``, ``ax ay (s) ashow``, ...), in
    document order — the same signal ``pstotext`` keys on.  Nested
    unescaped parens inside literals are not handled (rare; external
    pstotext covers them when installed).  Returns "" when nothing
    extractable."""
    parts = [
        _unescape_literal(m.group(1)) for m in _PS_SHOW_RE.finditer(data)
    ]
    return b" ".join(p for p in parts if p.strip()).decode(
        "latin-1", errors="replace"
    )


#: RTF destination groups whose content is metadata, not body text
_RTF_SKIP_DESTS = frozenset(
    {
        b"fonttbl", b"colortbl", b"stylesheet", b"info", b"pict",
        b"header", b"footer", b"headerl", b"headerr", b"footerl",
        b"footerr", b"object", b"datastore", b"themedata",
    }
)
_RTF_TOKEN_RE = re.compile(
    rb"\\'([0-9a-fA-F]{2})"      # hex escape
    rb"|\\u(-?\d+)\s?"           # unicode escape (+1 fallback char)
    rb"|\\([a-zA-Z]+)(-?\d+)? ?" # control word
    rb"|\\([^a-zA-Z])"           # control symbol (\\ \{ \} \~ \*)
    rb"|([{}])"                  # group delimiters
)


def rtf_extract_text(data: bytes) -> str:
    """Text from RTF: tokenizes control words / hex + unicode escapes /
    groups, skipping metadata destinations (fonttbl, pict, \\*-groups,
    ...); ``\\par``/``\\line`` become newlines, ``\\tab`` a tab.
    cp1252 for hex-escaped and plain bytes."""
    if not data.startswith(b"{\\rtf"):
        return ""
    out: list[str] = []
    depth = 0
    skip_until = None  # group depth at which a skipped destination ends
    uc_skip = 1  # chars to skip after \uN (the \ucN parm)
    pending_skip = 0
    pos = 0
    for m in _RTF_TOKEN_RE.finditer(data):
        if m.start() > pos and skip_until is None:
            run = data[pos : m.start()].replace(b"\r", b"").replace(b"\n", b"")
            if pending_skip:  # \uN fallback chars to drop
                drop = min(pending_skip, len(run))
                run = run[drop:]
                pending_skip -= drop
            if run:
                out.append(run.decode("cp1252", errors="replace"))
        pos = m.end()
        hexb, uni, word, parm, sym, grp = m.groups()
        if grp == b"{":
            depth += 1
            continue
        if grp == b"}":
            depth -= 1
            if skip_until is not None and depth < skip_until:
                skip_until = None
            continue
        if skip_until is not None:
            continue
        if sym == b"*":
            # {\* ...}: unknown destination — skip the whole group
            skip_until = depth
            continue
        if hexb is not None:
            if pending_skip:
                pending_skip -= 1
            else:
                out.append(bytes([int(hexb, 16)]).decode("cp1252", "replace"))
            continue
        if uni is not None:
            cp = int(uni)
            out.append(chr(cp + 65536 if cp < 0 else cp))
            pending_skip = uc_skip
            continue
        if sym is not None:
            out.append(
                {b"\\": "\\", b"{": "{", b"}": "}", b"~": "\xa0"}.get(sym, "")
            )
            continue
        if word is not None:
            if word in _RTF_SKIP_DESTS:
                skip_until = depth
            elif word == b"uc":
                uc_skip = int(parm or 1)
            elif word in (b"par", b"line", b"sect", b"page"):
                out.append("\n")
            elif word == b"tab":
                out.append("\t")
            continue
    return "".join(out).strip()


def _html_escape(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


class DocConvertStage:
    """Actor-pool batch stage: rows with a convertible ``content_type``
    get their binary ``body_raw`` converted to HTML in ``body``;
    appends ``ct`` (CT code) and ``convert_ok`` columns."""

    def __init__(self, timeout_s: float = 30.0, mem_kb: int = 25000):
        import shutil

        self.timeout_s = timeout_s
        self.mem_kb = mem_kb  # reference ulimit -v 25000 (XmlDoc.cpp:9729)
        # resolve converter binaries once per actor
        self._bins = {
            ct: (shutil.which(prog), args)
            for ct, (prog, args) in _CONVERTER_BIN.items()
        }

    # -- external converter (the reference shape) ----------------------

    def _convert_external(self, prog: str, args: list, data: bytes) -> str | None:
        import resource
        import subprocess
        import tempfile

        def limits():  # ulimit -v / -t, nice 19 (XmlDoc.cpp:9729-9736)
            try:
                resource.setrlimit(
                    resource.RLIMIT_AS, (self.mem_kb * 1024,) * 2
                )
                resource.setrlimit(resource.RLIMIT_CPU, (30, 30))
                import os

                os.nice(19)
            except (ValueError, OSError):
                pass

        with tempfile.NamedTemporaryFile(suffix=".bin") as f:
            f.write(data)
            f.flush()
            try:
                r = subprocess.run(
                    [prog, *args, f.name],
                    capture_output=True,
                    timeout=self.timeout_s,
                    preexec_fn=limits,
                )
            except (subprocess.TimeoutExpired, OSError):
                return None
        if r.returncode != 0 or not r.stdout:
            return None
        return r.stdout.decode("utf-8", errors="replace")

    def convert(self, ct: int, data: bytes) -> tuple[str, bool]:
        """(html, ok) for one binary document."""
        prog, args = self._bins.get(ct, (None, []))
        if prog is not None:
            html = self._convert_external(prog, args, data)
            if html is not None:
                return html, True
        text = ""
        if ct == CT_PDF:
            text = pdf_extract_text(data)
        elif ct == CT_PS:
            text = ps_extract_text(data)
        elif ct == CT_RTF:
            text = rtf_extract_text(data)
        elif ct == CT_DOC:
            # antiword stand-in: CFB + FIB/piece-table text layer
            # (functions/msdoc.py); ValueError = undecodable binary
            try:
                from ..functions.msdoc import doc_extract_text

                text = doc_extract_text(data)
            except (ValueError, IndexError, struct.error):
                text = ""
        elif ct == CT_XLS:
            # xlhtml stand-in: BIFF8 SST / LABEL strings (msoffice.py)
            try:
                from ..functions.msoffice import xls_extract_text

                text = xls_extract_text(data)
            except (ValueError, IndexError, struct.error):
                text = ""
        elif ct == CT_PPT:
            # ppthtml stand-in: TextChars/TextBytes atoms (msoffice.py)
            try:
                from ..functions.msoffice import ppt_extract_text

                text = ppt_extract_text(data)
            except (ValueError, IndexError, struct.error):
                text = ""
        if text.strip():
            return (
                "<html><body><p>" + _html_escape(text) + "</p></body></html>",
                True,
            )
        return "", False

    def __call__(self, batch: pa.Table) -> pa.Table:
        ctypes = batch["content_type"].to_pylist()
        cts = [get_content_type(c) for c in ctypes]
        body = batch["body"].to_pylist()
        raw = (
            batch["body_raw"].to_pylist()
            if "body_raw" in batch.column_names
            else [b""] * len(cts)
        )
        ok = [True] * len(cts)
        for i, ct in enumerate(cts):
            if ct in CONVERTIBLE:
                body[i], ok[i] = self.convert(ct, raw[i] or b"")
        out = batch.drop_columns(
            [c for c in ("body", "body_raw") if c in batch.column_names]
        )
        out = out.append_column("body", pa.array(body, pa.string()))
        out = out.append_column("ct", pa.array(cts, pa.int32()))
        out = out.append_column("convert_ok", pa.array(ok, pa.bool_()))
        return out
