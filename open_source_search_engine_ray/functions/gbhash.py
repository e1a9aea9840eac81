"""Gigablast-compatible Zobrist string hashing, vectorized with numpy.

The reference engine keys its entire frontier on ``hash64b(url)`` — a
position×byte XOR against a fixed 256×256 uint64 table ``g_hashtab``
(reference: hash.h:59-67).  The table is generated from glibc ``rand()``
seeded with 1945687 (reference: hash.cpp:21-60) and self-checked via
``g_hashtab[0][0] == 6720717044602784129``.  We regenerate the identical
table bit-exactly through ``ctypes``/libc and cache it as an ``.npy``
artifact next to this module, so every hash (and therefore the crawl
ordering and the URL-seen set) matches the reference.

``uh48`` is the low 48 bits of ``hash64b`` (reference: Spider.h:729-732);
Gigablast treats uh48 equality as URL equality ("probable match"), and so
do we.
"""

from __future__ import annotations

import os

import numpy as np

_ARTIFACT = os.path.join(os.path.dirname(__file__), "_hashtab.npy")

#: reference: hash.cpp:58 — the self-check constant for g_hashtab[0][0]
_CHECK_00 = 6720717044602784129

UH48_MASK = (1 << 48) - 1


#: md5 of the golden table bytes (C-order uint64); guards against ANY
#: corruption, not just the first cell
_TABLE_MD5 = "29d4df18b5dfd0c6c4040d32788176cc"


def _glibc_rand_stream(seed: int, n: int) -> np.ndarray:
    """Pure-Python reimplementation of glibc's TYPE_3 ``rand()``
    (additive feedback r[i] = r[i-3] + r[i-31] mod 2^32, output >> 1,
    first 310 outputs discarded; seeding via MINSTD).  Thread-safe —
    unlike calling libc's rand() through ctypes, where any other thread
    in the process touching libc's shared PRNG state silently corrupts
    the sequence (this corrupted worker-local hash tables under Ray
    until the table became a checked-in artifact)."""
    total = n + 344
    r = np.empty(total, dtype=np.uint64)
    r[0] = seed
    for i in range(1, 31):
        # r[i] = (16807 * r[i-1]) % 2147483647, signed-safe
        r[i] = (16807 * int(r[i - 1])) % 2147483647
    for i in range(31, 34):
        r[i] = r[i - 31]
    mask = np.uint64(0xFFFFFFFF)
    for i in range(34, total):
        r[i] = (r[i - 3] + r[i - 31]) & mask
    return (r[344:] >> np.uint64(1)).astype(np.int64)


def _generate_table() -> np.ndarray:
    """Regenerate g_hashtab from the glibc rand stream seeded 1945687.

    Mirrors the loop at reference hash.cpp:36-47: per cell,
    ``hi = rand(); maybe |= 0x80000000; lo = rand(); maybe |= 0x80000000``
    where "maybe" consumes one extra rand() and fires when it exceeds
    RAND_MAX/2."""
    raw = _glibc_rand_stream(1945687, 256 * 256 * 4).reshape(-1, 4)
    half = 0x7FFFFFFF // 2
    hi = raw[:, 0] | np.where(raw[:, 1] > half, 0x80000000, 0)
    lo = raw[:, 2] | np.where(raw[:, 3] > half, 0x80000000, 0)
    tab = (hi.astype(np.uint64) << np.uint64(32)) | lo.astype(np.uint64)
    tab = tab.reshape(256, 256)
    _validate(tab)
    return tab


def _validate(tab: np.ndarray) -> None:
    import hashlib

    if tab.shape != (256, 256) or int(tab[0, 0]) != _CHECK_00:
        raise RuntimeError("g_hashtab corrupt: first-cell check failed")
    digest = hashlib.md5(np.ascontiguousarray(tab).tobytes()).hexdigest()
    if digest != _TABLE_MD5:
        raise RuntimeError(f"g_hashtab corrupt: md5 {digest} != {_TABLE_MD5}")


def _load_table() -> np.ndarray:
    if os.path.exists(_ARTIFACT):
        tab = np.load(_ARTIFACT)
        _validate(tab)
        return tab
    tab = _generate_table()
    try:  # cache for the next worker; best-effort, atomic
        tmp = _ARTIFACT + f".tmp{os.getpid()}"
        with open(tmp, "wb") as f:
            np.save(f, tab)
        os.replace(tmp, _ARTIFACT)
    except OSError:
        pass
    return tab


HASHTAB: np.ndarray = _load_table()


def hash64b(s: str | bytes) -> int:
    """Scalar hash64b (reference hash.h:59-67): XOR of HASHTAB[i & 0xff][byte]."""
    b = s.encode("utf-8") if isinstance(s, str) else s
    h = np.uint64(0)
    for i, c in enumerate(b):
        h ^= HASHTAB[i & 0xFF, c]
    return int(h)


def uh48(s: str | bytes) -> int:
    """48-bit URL hash (reference Spider.h:729-732)."""
    return hash64b(s) & UH48_MASK


def hash64b_batch(strings) -> np.ndarray:
    """Vectorized hash64b over a sequence/array of strings → uint64 ndarray.

    One table gather + one XOR-reduceat per batch; no Python loop over rows.
    """
    if len(strings) == 0:
        return np.empty(0, dtype=np.uint64)
    enc = [s.encode("utf-8") if isinstance(s, str) else bytes(s) for s in strings]
    all_lens = np.fromiter((len(e) for e in enc), dtype=np.int64, count=len(enc))
    out = np.zeros(len(enc), dtype=np.uint64)
    nonempty = np.nonzero(all_lens > 0)[0]
    if len(nonempty) == 0:
        return out
    # reduceat over only the nonempty strings (empty segments would
    # corrupt neighbouring reductions), then scatter back
    lens = all_lens[nonempty]
    flat = np.frombuffer(b"".join(enc[i] for i in nonempty), dtype=np.uint8)
    starts = np.cumsum(lens) - lens
    # position of each byte within its string, masked to 8 bits like the
    # reference's (unsigned char)i cast
    pos = (np.arange(flat.size, dtype=np.int64) - np.repeat(starts, lens)) & 0xFF
    vals = HASHTAB[pos, flat]
    out[nonempty] = np.bitwise_xor.reduceat(vals, starts)
    return out


def uh48_batch(strings) -> np.ndarray:
    return hash64b_batch(strings) & np.uint64(UH48_MASK)


def hash32_batch(strings) -> np.ndarray:
    """32-bit host/domain/site hashes.

    The reference uses a separate hash32 family (hash.h) for these; only
    uh48 must be bit-exact for crawl ordering / URL-seen, so for internal
    keys we derive 32-bit hashes from hash64b (documented divergence).
    """
    return (hash64b_batch(strings) & np.uint64(0xFFFFFFFF)).astype(np.uint32)


def hash32(s: str | bytes) -> int:
    return hash64b(s) & 0xFFFFFFFF


# -- probable docids --------------------------------------------------------

DOCID_BITS = 38  # reference Titledb.h:10-11 — 38-bit docids, 270B capacity
DOCID_MASK = np.uint64((1 << DOCID_BITS) - 1)


def probable_docid_batch(urls) -> np.ndarray:
    """Probable docid per URL: ``hash64b(url) & DOCID_MASK``
    (reference Titledb.h:41-87, XmlDoc.cpp:6349).  Collisions are
    resolved by probing the low 6 bits within the documents table
    (getFirstProbableDocId/getLastProbableDocId — see
    pipelines/training.assign_docids)."""
    return hash64b_batch(urls) & DOCID_MASK


def docid_probe_range(docid: int) -> tuple:
    """[first, last] probable docid for collision probing — the low 6
    bits are the probe window (reference Titledb.h:83-87)."""
    return docid & ~0x3F, docid | 0x3F
