"""Text-analysis kernels for training-data pipelines over the
``documents`` table: token counting, quality scoring, language ID, and
document fingerprinting.  All batch functions are vectorized (pyarrow
compute / numpy); language-ID and fingerprinting loop per string by
necessity but only over precomputed token arrays.

The reference engine's analogues: Words tokenization (Words.cpp),
LanguageIdentifier.cpp, and the content hash used for change detection
(XmlDoc.cpp:10679).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# must match the oracle SQL exactly: tokens = split on single space
_SPACE = " "

# BPE-ish word/punct tokenizer; oracle SQL uses the same regex via
# duckdb regexp_extract_all
TOKEN_REGEX = r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"

STOPWORDS = (
    "the of and a to in is was he for it with as his on be at by i this had "
    "not are but from or have an they which one you were her all she there "
    "would their we him been has when who will more no if out so said what"
).split()


def token_count_batch(texts: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Whitespace token count (split on single space)."""
    return pc.list_value_length(pc.split_pattern(texts, pattern=_SPACE))


def regex_token_count_batch(texts) -> pa.Array:
    return pc.list_value_length(pc.extract_regex_span_all(texts, pattern=TOKEN_REGEX)) if hasattr(pc, "extract_regex_span_all") else pa.array(
        [len(__import__("re").findall(TOKEN_REGEX, t)) for t in texts.to_pylist()],
        pa.int32(),
    )


def quality_columns(texts: pa.Array) -> dict:
    """Quality-score columns: n_chars, n_tokens, punct count, stopword
    count, stopword ratio (rounded to 6 dp to be hash-stable vs the SQL
    oracle), mean token length (rounded)."""
    n_chars = pc.utf8_length(texts)
    toks = pc.split_pattern(texts, pattern=_SPACE)
    n_tokens = pc.list_value_length(toks)
    punct = pc.count_substring_regex(texts, pattern=r"[.,!?;:]")
    lower_toks = pc.split_pattern(pc.utf8_lower(texts), pattern=_SPACE)
    stop_mask = pc.is_in(pc.list_flatten(lower_toks), value_set=pa.array(STOPWORDS))
    # re-aggregate the flattened mask per row
    lengths = n_tokens.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = stop_mask.to_numpy(zero_copy_only=False).astype(np.int64)
    ends = np.cumsum(lengths)
    starts = ends - lengths
    stop_counts = np.add.reduceat(flat, np.minimum(starts, max(len(flat) - 1, 0)))
    stop_counts = np.where(lengths > 0, stop_counts, 0) if len(lengths) else stop_counts
    ratio = np.round(stop_counts / np.maximum(lengths, 1), 6)
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "n_punct": punct,
        "n_stopwords": pa.array(stop_counts, pa.int64()),
        "stopword_ratio": pa.array(ratio, pa.float64()),
    }


# -- language ID -------------------------------------------------------------

# tiny per-language stopword lists for an n-gram/stopword-vote heuristic
_LANG_MARKERS = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "for", "with", "was"},
    "de": {"der", "die", "und", "das", "ist", "nicht", "mit", "ein", "für", "von"},
    "fr": {"le", "la", "les", "et", "des", "est", "une", "pour", "que", "dans"},
    "es": {"el", "la", "los", "de", "que", "y", "en", "una", "por", "con"},
    "it": {"il", "la", "di", "che", "e", "per", "una", "con", "del", "non"},
}


# Unicode script blocks → language (the script half of
# LanguageIdentifier.cpp's charset+wordlist resolution: non-Latin
# scripts identify the language family directly; Latin text falls
# through to the stopword vote below).  Ranges are the standard
# Unicode block boundaries.
_SCRIPT_RANGES = (
    (0x3040, 0x30FF, "ja"),  # hiragana + katakana (decisive over CJK)
    (0xAC00, 0xD7AF, "ko"),  # hangul syllables
    (0x1100, 0x11FF, "ko"),  # hangul jamo
    (0x4E00, 0x9FFF, "zh"),  # CJK unified ideographs
    (0x0400, 0x04FF, "ru"),  # cyrillic
    (0x0600, 0x06FF, "ar"),  # arabic
    (0x0590, 0x05FF, "he"),  # hebrew
    (0x0370, 0x03FF, "el"),  # greek
    (0x0900, 0x097F, "hi"),  # devanagari
    (0x0E00, 0x0E7F, "th"),  # thai
)


def _script_lang(text: str) -> str | None:
    """Codepoint-range script vote; None = Latin-ish (use stopwords)."""
    cp = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)
    if len(cp) == 0 or int(cp.max()) < 0x370:
        return None
    counts: dict[str, int] = {}
    for lo, hi, lang in _SCRIPT_RANGES:
        c = int(((cp >= lo) & (cp <= hi)).sum())
        if c:
            counts[lang] = counts.get(lang, 0) + c
    if not counts:
        return None
    non_ascii = int((cp >= 0x80).sum())
    # kana presence is decisive: Japanese text mixes kana with CJK
    # ideographs, Chinese text has no kana
    if counts.get("ja") and counts.get("zh"):
        counts["ja"] += counts.pop("zh")
    lang, c = max(counts.items(), key=lambda kv: (kv[1], kv[0]))
    if c * 10 >= non_ascii * 3 and c >= 4:
        return lang
    return None


def lang_id(text: str) -> str:
    """Language ID: Unicode-script vote for non-Latin scripts, then a
    stopword vote for Latin text (heuristic stand-in for
    LanguageIdentifier.cpp's charset+wordlist chain).  Returns the
    best-scoring language or 'xx'."""
    s = _script_lang(text)
    if s is not None:
        return s
    words = text.lower().split()
    if not words:
        return "xx"
    best, best_score = "xx", 0
    for lang, markers in _LANG_MARKERS.items():
        score = sum(1 for w in words if w in markers)
        if score > best_score:
            best, best_score = lang, score
    return best


def lang_id_batch(texts) -> pa.Array:
    return pa.array([lang_id(t) for t in texts.to_pylist()], pa.string())


# -- fingerprinting ----------------------------------------------------------

_FP_BASE = np.uint64(1099511628211)
_MAX_FP_LEN = 1 << 16
_FP_POWERS: np.ndarray | None = None


def _fp_powers(n: int) -> np.ndarray:
    global _FP_POWERS
    if _FP_POWERS is None or len(_FP_POWERS) < n:
        size = max(n, _MAX_FP_LEN)
        # cumulative powers of the base mod 2^64
        acc = np.full(size, _FP_BASE, dtype=np.uint64)
        acc[0] = np.uint64(1)
        _FP_POWERS = np.multiply.accumulate(acc)
    return _FP_POWERS


def fingerprint(text: str) -> int:
    """64-bit polynomial rolling-hash fingerprint over bytes:
    Σ byte_i · B^(n−1−i) mod 2^64 — vectorizable, order-sensitive."""
    b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    n = len(b)
    if n == 0:
        return 0
    pw = _fp_powers(n)[:n][::-1]
    return int((b.astype(np.uint64) * pw).sum(dtype=np.uint64))


def fingerprint_batch(texts) -> np.ndarray:
    lst = texts.to_pylist() if hasattr(texts, "to_pylist") else list(texts)
    enc = [t.encode("utf-8") for t in lst]
    all_lens = np.fromiter((len(e) for e in enc), np.int64, len(enc))
    out = np.zeros(len(enc), dtype=np.uint64)
    nonempty = np.nonzero(all_lens > 0)[0]
    if len(nonempty) == 0:
        return out
    # reduceat over only nonempty strings (empty segments corrupt
    # neighbouring reductions), then scatter back
    lens = all_lens[nonempty]
    flat = np.frombuffer(b"".join(enc[i] for i in nonempty), dtype=np.uint8).astype(np.uint64)
    pw = _fp_powers(int(lens.max()))
    starts = np.cumsum(lens) - lens
    # power exponent per byte: len-1-pos within its string
    pos = np.arange(flat.size, dtype=np.int64) - np.repeat(starts, lens)
    exp = np.repeat(lens, lens) - 1 - pos
    vals = flat * pw[exp]
    out[nonempty] = np.add.reduceat(vals, starts)
    return out
