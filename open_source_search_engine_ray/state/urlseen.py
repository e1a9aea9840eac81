"""Partitioned URL-seen filtering: Bloom filter + optional exact backing.

Replaces Gigablast's three cooperating layers (spiderdb key collision,
the 1-day dup cache at SpiderColl.cpp:845-904, and merge-time
dedupSpiderdbList) with a per-partition Bloom segment backed (in
verification mode) by an exact set.  Gigablast already accepts 48-bit
hash equality as URL equality (Spider.h:729-732 "probable match"); the
Bloom false-positive rate is the analogous controlled approximation for
the scale path — sizing math: ~1.2 GB of bits per 10^9 keys at 1% fpp,
sharded as one segment per frontier partition (north_rule).

Dup-cache keys include the flag salts and min(hopCount,3) like the
reference (SpiderColl.cpp:872-889), plus added_time so that concurrent
route-backs from different partitions can never make admission depend on
arrival order (the survivor is then resolved by the commutative
min-(hop,added) merge in FrontierCore).
"""

from __future__ import annotations

import numpy as np

_MIX = np.uint64(0x9E3779B97F4A7C15)


class BloomFilter:
    """Vectorized k-hash Bloom filter over uint64 keys."""

    def __init__(self, n_bits: int = 1 << 20, k: int = 7):
        assert n_bits & (n_bits - 1) == 0, "n_bits must be a power of two"
        self.n_bits = n_bits
        self.k = k
        self.bits = np.zeros(n_bits >> 3, dtype=np.uint8)
        self._mask = np.uint64(n_bits - 1)

    def _positions(self, keys: np.ndarray) -> np.ndarray:
        # double hashing: h1 + i*h2 (Kirsch–Mitzenmacher)
        k64 = keys.astype(np.uint64)
        h1 = k64 * _MIX
        h1 ^= h1 >> np.uint64(29)
        h2 = (k64 ^ (k64 >> np.uint64(33))) * np.uint64(0xC2B2AE3D27D4EB4F) | np.uint64(1)
        i = np.arange(self.k, dtype=np.uint64)[:, None]
        return (h1[None, :] + i * h2[None, :]) & self._mask  # (k, n)

    def test_and_add(self, keys: np.ndarray) -> np.ndarray:
        """Returns mask of keys that were NOT present (new); adds all."""
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(np.asarray(keys))
        byte = (pos >> np.uint64(3)).astype(np.int64)
        bit = np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8)
        present = (self.bits[byte] & bit) != 0
        is_new = ~present.all(axis=0)
        np.bitwise_or.at(self.bits, byte.ravel(), bit.ravel())
        return is_new

    def __contains__(self, key: int) -> bool:
        return not self.test(np.array([key], dtype=np.uint64))[0]

    def test(self, keys: np.ndarray) -> np.ndarray:
        """Mask of keys NOT present (definitely new)."""
        pos = self._positions(np.asarray(keys))
        byte = (pos >> np.uint64(3)).astype(np.int64)
        bit = np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8)
        present = (self.bits[byte] & bit) != 0
        return ~present.all(axis=0)

    def state(self) -> dict:
        return {"n_bits": self.n_bits, "k": self.k, "bits": self.bits.copy()}

    @classmethod
    def from_state(cls, st: dict) -> "BloomFilter":
        bf = cls(st["n_bits"], st["k"])
        bf.bits = st["bits"].copy()
        return bf


class UrlSeen:
    """Bloom + (optional) exact set.  ``exact=True`` gives zero false
    positives for correctness runs; ``exact=False`` is the 10^10-URL
    scale path where a Bloom FP drops a URL with probability fpp
    (mirroring the reference's acceptance of uh48 collisions)."""

    def __init__(self, n_bits: int = 1 << 20, exact: bool = True):
        self.bloom = BloomFilter(n_bits)
        self.exact: set | None = set() if exact else None

    def test_and_add(self, keys: np.ndarray) -> np.ndarray:
        keys = np.asarray(keys, dtype=np.uint64)
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        # process unique keys so the outcome is independent of batch
        # boundaries: within a call only the FIRST occurrence of a key is
        # "new", exactly as if rows arrived one by one
        uniq, first_idx = np.unique(keys, return_index=True)
        new_uniq = self.bloom.test_and_add(uniq)
        if self.exact is not None:
            # bloom says "maybe seen" → consult the exact set
            for i in np.nonzero(~new_uniq)[0]:
                if int(uniq[i]) not in self.exact:
                    new_uniq[i] = True
            self.exact.update(int(k) for k in uniq)
        new_mask = np.zeros(len(keys), dtype=bool)
        new_mask[first_idx[new_uniq]] = True
        return new_mask

    def state(self) -> dict:
        return {"bloom": self.bloom.state(), "exact": self.exact}

    @classmethod
    def from_state(cls, st: dict) -> "UrlSeen":
        u = cls.__new__(cls)
        u.bloom = BloomFilter.from_state(st["bloom"])
        u.exact = st["exact"]
        return u
