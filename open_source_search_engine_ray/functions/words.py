"""Words.cpp-faithful tokenization: the reference's document token
stream (Words::set(char*) / Words::addWords, Words.cpp:197-457), text
path (no tag nodes — the Xml path feeds tag tokens separately).

The stream alternates ALNUM words and PUNCT words (a run of
non-word-chars is itself a token, Words.cpp:86 "we also consider a
string of punctuation characters to be a word").  Alnum words implement
the reference's merge exceptions:

* ``java++`` / ``A+`` / ``c#``   (Words.cpp:360-368)
* ``1,234,567`` comma groups     (Words.cpp:370-385: first comma within
  3 digits of the word start, then repeated ``,ddd`` groups not
  followed by a 4th digit)
* ``3.14`` decimal point         (Words.cpp:387-395)
* one apostrophe: ``we're``      (Words.cpp:399-405, at most one)
* script changes break words; ideograph/hiragana/thai include one char
  then break (CJK unigrams, Words.cpp:350-357)

Word ids are the reference's ``hash64Lower_utf8`` (hash.h:139-196): XOR
of g_hashtab[pos][byte] over the LOWERCASED utf-8 bytes — the same
md5-pinned table as uh48, so ids are bit-exact (ASCII exactly; non-ASCII
via the per-codepoint simple lowercase, matching ucToLower for the
common planes).

Index-tier scope note: only the token stream + wids are modeled; Bits/
Phrases/Pos derivations stay out of scope (SURVEY §2).
"""

from __future__ import annotations

import unicodedata

import numpy as np

from .gbhash import HASHTAB

_ASCII_ALNUM = frozenset(
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
)

# script buckets for the word-break rule (ucGetScript subset; Latin is
# folded into common like the reference does at Words.cpp:347-349)
_SCRIPT_RANGES = (
    (0x0370, 0x03FF, "greek"),
    (0x0400, 0x04FF, "cyrillic"),
    (0x0530, 0x058F, "armenian"),
    (0x0590, 0x05FF, "hebrew"),
    (0x0600, 0x06FF, "arabic"),
    (0x0900, 0x097F, "devanagari"),
    (0x0E00, 0x0E7F, "thai"),
    (0x3040, 0x309F, "hiragana"),
    (0x30A0, 0x30FF, "katakana"),
    (0x4E00, 0x9FFF, "ideograph"),
    (0x3400, 0x4DBF, "ideograph"),
    (0xAC00, 0xD7AF, "hangul"),
)

_BREAK_ALONE = frozenset({"ideograph", "hiragana", "thai"})


def _script(ch: str) -> str:
    cp = ord(ch)
    if cp < 0x0250:
        return "common"  # ASCII + Latin-1 + Latin extended (folded)
    for lo, hi, name in _SCRIPT_RANGES:
        if lo <= cp <= hi:
            return name
    return "common"


def _is_word_char(ch: str) -> bool:
    if ch in _ASCII_ALNUM:
        return True
    if ord(ch) < 128:
        return False
    return ch.isalnum()  # UC_WORDCHAR approximation


def _is_extend(ch: str) -> bool:
    # UC_IGNORABLE | UC_EXTEND: combining marks / format chars continue
    # the current word without script effects (Words.cpp:334-335)
    return unicodedata.category(ch) in ("Mn", "Me", "Cf")


def words_tokenize(text: str) -> list:
    """Token stream as (token, is_alnum) tuples, concatenating back to
    the input exactly (the reference's words are pointers into the
    source buffer).  ``old_script`` persists across the whole call like
    the reference's function-scoped ``oldScript``; the punct loop
    pre-sets it from the word char it stops at (Words.cpp:283-296), so
    a word never breaks on its own first character."""
    s = text
    n = len(s)
    out: list = []
    i = 0
    old_script = "common"

    def ch(k: int) -> str:
        return s[k] if 0 <= k < n else ""

    def is_digit(k: int) -> bool:
        c = ch(k)
        return "0" <= c <= "9"

    while i < n:
        if not _is_word_char(s[i]):
            # punct word: run of non-word chars (Words.cpp:263-300);
            # the stopping word char pre-sets the script state
            start = i
            while i < n and not _is_word_char(s[i]):
                i += 1
            if i < n:
                old_script = (
                    "common" if ord(s[i]) < 128 else _script(s[i])
                )
                if old_script == "latin":  # folded (Words.cpp:347-349)
                    old_script = "common"
            out.append((s[start:i], False))
            continue
        # alnum word (Words.cpp:316-405)
        j = i
        had_apostrophe = False
        while True:
            while i < n:
                c = s[i]
                if ord(c) < 128:
                    if c in _ASCII_ALNUM:
                        i += 1
                        continue
                    old_script = "common"
                    break
                if _is_extend(c):
                    i += 1
                    continue
                if not _is_word_char(c):
                    old_script = "common"
                    break
                saved = old_script
                old_script = _script(c)
                if old_script in _BREAK_ALONE:
                    i += 1  # include it, then break (CJK unigram)
                    break
                if saved != old_script:
                    break  # script change: break BEFORE including
                i += 1
            # java++ / A+ / c# (Words.cpp:360-368)
            if ch(i) == "+":
                if ch(i + 1) == "+" and not (
                    ch(i + 2) and _is_word_char(ch(i + 2))
                ):
                    i += 2
                elif not (ch(i + 1) and _is_word_char(ch(i + 1))):
                    i += 1
            if ch(i) == "#" and not (ch(i + 1) and _is_word_char(ch(i + 1))):
                i += 1
            # comma groups: ,ddd repeated (Words.cpp:370-385)
            if ch(i) == "," and i - j <= 3 and is_digit(i - 1):
                ok = True
                if i - j >= 2 and not is_digit(i - 2):
                    ok = False
                if ok and i - j >= 3 and not is_digit(i - 3):
                    ok = False
                if ok:
                    while (
                        ch(i) == ","
                        and is_digit(i + 1)
                        and is_digit(i + 2)
                        and is_digit(i + 3)
                        and not is_digit(i + 4)
                    ):
                        i += 4
            # decimal point (Words.cpp:387-395)
            if ch(i) == "." and is_digit(i - 1) and is_digit(i + 1):
                i += 1
                while is_digit(i):
                    i += 1
            # one apostrophe: we're / dave's (Words.cpp:399-405)
            if (
                ch(i) == "'"
                and ch(i + 1)
                and _is_word_char(ch(i + 1))
                and not had_apostrophe
            ):
                i += 1
                had_apostrophe = True
                continue  # goto again
            break
        out.append((s[j:i], True))
    return out


def _lower_bytes(w: str) -> bytes:
    # per-codepoint simple lowercase (ucToLower is 1:1; skip Python's
    # multi-char expansions)
    return "".join(
        (lc if len(lc := c.lower()) == 1 else c) for c in w
    ).encode("utf-8")


def word_id(w: str) -> int:
    """hash64Lower_utf8 (hash.h:139-196): bit-exact via the pinned
    g_hashtab."""
    h = np.uint64(0)
    for i, byte in enumerate(_lower_bytes(w)):
        h ^= HASHTAB[i & 0xFF, byte]
    return int(h)


def word_ids(text: str) -> list:
    """Ids of the ALNUM words in stream order (punct words carry id 0,
    Words.cpp:413-415)."""
    return [word_id(w) for w, al in words_tokenize(text) if al]


def word_counts(text: str) -> tuple:
    """(n_alnum, n_punct) over the token stream."""
    toks = words_tokenize(text)
    na = sum(1 for _, al in toks if al)
    return na, len(toks) - na
