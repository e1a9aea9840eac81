"""General real-web HTML → span extraction.

The crawl fixture parser (``synthweb.parse_html_columnar``) is
round-trip exact for the SynthWeb markup subset; this module handles
ARBITRARY archived HTML (WARC/ARC corpus ingestion) the way the
reference's node extraction does: Xml.cpp tag walk → Words.cpp text
runs → Links.cpp anchor/src harvesting, with FULL entity decoding.

Entity decoding uses the stdlib ``html.unescape``, which implements the
complete WHATWG named-entity table — the same ``entities.json`` the
reference generates Entities.cpp from (reference generate_entities.py)
— plus numeric ``&#123;`` / ``&#x1f;`` forms and the legacy
missing-semicolon names, matching Entities.cpp:1-60 semantics.

Output is the engine's span model (kind ∈ text/link/image, text,
media_ref) in document order.  ``<script>``/``<style>`` bodies and
comments are dropped (the reference skips TAG_SCRIPT sections when
building Words, Xml.cpp:345-420).
"""

from __future__ import annotations

import html as _html
import re

_SCRIPT = re.compile(r"<(script|style)\b[^>]*>.*?</\1\s*>", re.S | re.I)
_COMMENT = re.compile(r"<!--.*?-->", re.S)
_TAG = re.compile(r"<[^>]*>")
_WS = re.compile(r"\s+")
# block-ish boundaries that end a text run (subset of the reference's
# breaking-tag table, Xml.cpp isBreakingTag)
_BLOCK = re.compile(
    r"</?(?:p|div|br|td|tr|th|table|li|ul|ol|h[1-6]|blockquote|pre|"
    r"form|hr|title|dd|dt)\b[^>]*>",
    re.I,
)
_A = re.compile(
    r"""<a\b[^>]*?\bhref\s*=\s*("[^"]*"|'[^']*'|[^\s>]+)[^>]*>(.*?)</a\s*>""",
    re.S | re.I,
)
_IMG = re.compile(
    r"""<img\b[^>]*?\bsrc\s*=\s*("[^"]*"|'[^']*'|[^\s>]+)[^>]*>""",
    re.S | re.I,
)


def _attr(raw: str) -> str:
    if raw and raw[0] in "\"'":
        raw = raw[1:-1]
    return _html.unescape(raw.strip())


def _text(raw: str) -> str:
    """Tag-stripped, entity-decoded, whitespace-collapsed text run."""
    return _WS.sub(" ", _html.unescape(_TAG.sub(" ", raw))).strip()


def extract_spans(html: str) -> tuple:
    """Parse arbitrary HTML into parallel span columns
    (kinds, texts, media_refs) in document order.

    Anchors become ``link`` spans (href entity-decoded per
    Links.cpp:1290-1340's getLinkText/normalization step), ``<img>``
    outside anchors become ``image`` spans, and the text BETWEEN those
    nodes is emitted as ``text`` spans split on block-level tags.
    """
    html = _SCRIPT.sub(" ", html)
    html = _COMMENT.sub(" ", html)
    events = []  # (start, end, kind, text, ref)
    regions = []
    for m in _A.finditer(html):
        href = _attr(m.group(1))
        if href:
            events.append((m.start(), m.end(), "link", _text(m.group(2)), href))
            regions.append((m.start(), m.end()))
    for m in _IMG.finditer(html):
        if any(s <= m.start() < e for s, e in regions):
            continue  # image inside an anchor: the link span carries it
        src = _attr(m.group(1))
        alt = ""
        am = re.search(r"""\balt\s*=\s*("[^"]*"|'[^']*'|[^\s>]+)""", m.group(0))
        if am:
            alt = _html.unescape(_attr(am.group(1)))
        if src:
            events.append((m.start(), m.end(), "image", alt, src))
    events.sort(key=lambda ev: ev[0])

    kinds: list = []
    texts: list = []
    refs: list = []

    def emit_text(chunk: str) -> None:
        for piece in _BLOCK.split(chunk):
            t = _text(piece)
            if t:
                kinds.append("text")
                texts.append(t)
                refs.append("")

    pos = 0
    for s, e, kind, text, ref in events:
        if s > pos:
            emit_text(html[pos:s])
        kinds.append(kind)
        texts.append(text)
        refs.append(ref)
        pos = max(pos, e)
    if pos < len(html):
        emit_text(html[pos:])
    return kinds, texts, refs


def extract_span_rows(html: str) -> list:
    """Row form: list of span dicts (kind, text, media_ref, offset)."""
    kinds, texts, refs = extract_spans(html)
    return [
        {"kind": k, "text": t, "media_ref": r, "offset": i}
        for i, (k, t, r) in enumerate(zip(kinds, texts, refs))
    ]
