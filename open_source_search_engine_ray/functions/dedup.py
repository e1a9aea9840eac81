"""Near-duplicate detection kernels: shingling, MinHash, SimHash,
Jaccard — all mergeable/bandable so the pipelines in
pipelines/training.py can run them as map_batches → groupby(LSH bucket)
→ verify, the scale shape for 100 TB dedup.

Everything is vectorized numpy over flattened token arrays; the only
per-document Python work is the ragged-array bookkeeping.
"""

from __future__ import annotations

import numpy as np

from .textstats import fingerprint_batch

_M1 = np.uint64(0x9E3779B97F4A7C15)
_M2 = np.uint64(0xC2B2AE3D27D4EB4F)
_M3 = np.uint64(0xFF51AFD7ED558CCD)
MERSENNE61 = np.uint64((1 << 61) - 1)


def _mix(x: np.ndarray) -> np.ndarray:
    x = (x ^ (x >> np.uint64(33))) * _M3
    return x ^ (x >> np.uint64(29))


def tokenize(text: str) -> list:
    return text.lower().split()


def token_hashes(texts: list) -> tuple:
    """Flattened stable token hashes for a batch of texts.
    Returns (flat_hashes uint64, lengths int64)."""
    toks = [tokenize(t) for t in texts]
    lens = np.fromiter((len(t) for t in toks), np.int64, len(toks))
    flat_tokens = [w for doc in toks for w in doc]
    flat = fingerprint_batch(flat_tokens) if flat_tokens else np.empty(0, np.uint64)
    return flat, lens


def shingle_hashes(flat_tok: np.ndarray, lens: np.ndarray, k: int = 3) -> tuple:
    """Word k-shingle hashes per document from flattened token hashes.
    Documents shorter than k get a single shingle of what they have.
    Returns (flat_shingles uint64, shingle_lens int64)."""
    n_docs = len(lens)
    sh_lens = np.maximum(lens - (k - 1), np.minimum(lens, 1)).astype(np.int64)
    out = np.empty(int(sh_lens.sum()), dtype=np.uint64)
    starts = np.cumsum(lens) - lens
    o = 0
    for d in range(n_docs):
        L = int(lens[d])
        s = int(starts[d])
        if L == 0:
            continue
        if L < k:
            h = np.uint64(0)
            for j in range(L):
                h = h * _M1 + flat_tok[s + j]
            out[o] = _mix(h)
            o += 1
            continue
        # rolling combine of k consecutive token hashes, vectorized
        acc = np.zeros(L - k + 1, dtype=np.uint64)
        for j in range(k):
            acc = acc * _M1 + flat_tok[s + j : s + j + L - k + 1]
        out[o : o + L - k + 1] = _mix(acc)
        o += L - k + 1
    return out[:o], sh_lens


def minhash_signatures(
    flat_sh: np.ndarray, sh_lens: np.ndarray, num_perm: int = 64, seed: int = 7
) -> np.ndarray:
    """(n_docs, num_perm) MinHash signature matrix via universal hashing
    h_i(x) = (a_i·x + b_i) mod 2^61−1 (mergeable across batches)."""
    rng = np.random.Generator(np.random.PCG64(seed))
    a = rng.integers(1, int(MERSENNE61), num_perm, dtype=np.uint64)
    b = rng.integers(0, int(MERSENNE61), num_perm, dtype=np.uint64)
    n_docs = len(sh_lens)
    sig = np.full((n_docs, num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    if len(flat_sh) == 0:
        return sig
    starts = (np.cumsum(sh_lens) - sh_lens).astype(np.int64)
    x = flat_sh & MERSENNE61
    nonempty = sh_lens > 0
    red_starts = np.minimum(starts, len(x) - 1)
    for i in range(num_perm):
        hv = (x * a[i] + b[i]) & np.uint64(0xFFFFFFFFFFFFFFFF)
        hv = (hv >> np.uint64(61)) + (hv & MERSENNE61)  # fast mod 2^61-1 (approx fold)
        red = np.minimum.reduceat(hv, red_starts)
        sig[nonempty, i] = red[nonempty]
    return sig


def lsh_band_keys(sig: np.ndarray, bands: int = 16) -> np.ndarray:
    """(n_docs, bands) uint64 band bucket keys (hash of each band's rows)."""
    n, num_perm = sig.shape
    assert num_perm % bands == 0
    r = num_perm // bands
    keys = np.empty((n, bands), dtype=np.uint64)
    for bi in range(bands):
        acc = np.zeros(n, dtype=np.uint64)
        for j in range(bi * r, (bi + 1) * r):
            acc = acc * _M1 + sig[:, j]
        keys[:, bi] = _mix(acc) ^ np.uint64((bi * int(_M2)) & 0xFFFFFFFFFFFFFFFF)
    return keys


def signature_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    return float((sig_a == sig_b).mean())


def exact_jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    """Exact word-k-shingle Jaccard for candidate verification."""
    fa, la = token_hashes([text_a])
    fb, lb = token_hashes([text_b])
    sa, _ = shingle_hashes(fa, la, k)
    sb, _ = shingle_hashes(fb, lb, k)
    A, B = set(sa.tolist()), set(sb.tolist())
    if not A and not B:
        return 1.0
    return len(A & B) / len(A | B)


def simhash(flat_tok: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """64-bit SimHash per document from flattened token hashes:
    per-bit majority vote over token hashes."""
    n_docs = len(lens)
    out = np.zeros(n_docs, dtype=np.uint64)
    if len(flat_tok) == 0:
        return out
    bits = np.unpackbits(flat_tok.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little")
    contrib = bits.astype(np.int32) * 2 - 1  # (n_tokens, 64)
    starts = (np.cumsum(lens) - lens).astype(np.int64)
    red_starts = np.minimum(starts, len(flat_tok) - 1)
    sums = np.add.reduceat(contrib, red_starts, axis=0)
    sign = (sums > 0).astype(np.uint8)
    packed = np.packbits(sign, axis=1, bitorder="little").view(np.uint64).ravel()
    nonempty = lens > 0
    out[nonempty] = packed[nonempty]
    return out


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = a ^ b
    # popcount via bit tricks (vectorized)
    x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
    x = (x & np.uint64(0x3333333333333333)) + ((x >> np.uint64(2)) & np.uint64(0x3333333333333333))
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return ((x * np.uint64(0x0101010101010101)) >> np.uint64(56)).astype(np.int64)


def simhash_band_keys(sh: np.ndarray, bands: int = 4) -> np.ndarray:
    """Split the 64-bit simhash into ``bands`` chunks (pigeonhole: two
    hashes within hamming distance < bands share at least one chunk)."""
    n = len(sh)
    width = 64 // bands
    mask = np.uint64((1 << width) - 1)
    keys = np.empty((n, bands), dtype=np.uint64)
    for bi in range(bands):
        chunk = (sh >> np.uint64(bi * width)) & mask
        salt = np.uint64((bi * int(_M2)) & 0xFFFFFFFFFFFFFFFF)
        keys[:, bi] = _mix(chunk ^ salt) | np.uint64(1)
    return keys


def cosine_topk(queries: np.ndarray, vectors: np.ndarray, k: int) -> tuple:
    """Brute-force cosine top-k: (scores (Q,k), indices (Q,k)) — numpy
    matmul per batch; the baseline ANN path."""
    qn = queries / np.maximum(np.linalg.norm(queries, axis=1, keepdims=True), 1e-12)
    vn = vectors / np.maximum(np.linalg.norm(vectors, axis=1, keepdims=True), 1e-12)
    sims = qn @ vn.T  # (Q, N)
    k = min(k, sims.shape[1])
    idx = np.argpartition(-sims, k - 1, axis=1)[:, :k]
    part = np.take_along_axis(sims, idx, axis=1)
    order = np.argsort(-part, axis=1, kind="stable")
    top_idx = np.take_along_axis(idx, order, axis=1)
    top_scores = np.take_along_axis(part, order, axis=1)
    return top_scores, top_idx
