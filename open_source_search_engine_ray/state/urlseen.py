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


class CuckooFilter:
    """Partial-key cuckoo filter (Fan et al. 2014, "Cuckoo Filter:
    Practically Better Than Bloom"): 16-bit fingerprints in 4-slot
    buckets, alternate bucket i2 = i1 XOR hash(fp).  Unlike the Bloom
    layer it supports DELETE, which gives the URL-seen set force-delete
    + re-add semantics (north_rule: "partitioned bloom+cuckoo filters").
    Eviction is deterministic (kick slot = kicks % slots) so engine and
    oracle stay bit-identical.  ~2*slots/2^16 ≈ 1.2e-4 fpp; load factor
    ~0.95 before the bounded stash absorbs overflow."""

    MAX_KICKS = 500

    def __init__(self, n_buckets: int = 1 << 16, slots: int = 4):
        assert n_buckets & (n_buckets - 1) == 0
        self.n_buckets = n_buckets
        self.slots = slots
        self.table = np.zeros((n_buckets, slots), dtype=np.uint16)
        self.stash: set = set()  # overflow fingerprint keys (i1, fp)
        self._mask = np.uint64(n_buckets - 1)
        self.n_items = 0

    def _fps(self, keys: np.ndarray) -> np.ndarray:
        h = keys.astype(np.uint64) * _MIX
        h ^= h >> np.uint64(29)
        fp = (h & np.uint64(0xFFFF)).astype(np.uint16)
        fp[fp == 0] = 1  # 0 marks an empty slot
        return fp

    def _i1s(self, keys: np.ndarray) -> np.ndarray:
        h = (keys.astype(np.uint64) ^ (keys.astype(np.uint64) >> np.uint64(33))) * np.uint64(
            0xC2B2AE3D27D4EB4F
        )
        return ((h >> np.uint64(17)) & self._mask).astype(np.int64)

    def _alt(self, i: np.ndarray, fp: np.ndarray) -> np.ndarray:
        return (
            (i.astype(np.uint64) ^ (fp.astype(np.uint64) * _MIX)) & self._mask
        ).astype(np.int64)

    def _canon(self, i: int, fp: int) -> tuple:
        """Canonical stash key: a fingerprint's two buckets are mutually
        derivable (i2 = i1 ^ h(fp)), so min() makes lookup bucket-free."""
        j = int(self._alt(np.array([i]), np.array([fp], dtype=np.uint16))[0])
        return (min(i, j), fp)

    def contains_batch(self, keys: np.ndarray) -> np.ndarray:
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        fp = self._fps(keys)
        i1 = self._i1s(keys)
        i2 = self._alt(i1, fp)
        hit = (self.table[i1] == fp[:, None]).any(axis=1) | (
            self.table[i2] == fp[:, None]
        ).any(axis=1)
        if self.stash:
            for j in np.nonzero(~hit)[0]:
                if self._canon(int(i1[j]), int(fp[j])) in self.stash:
                    hit[j] = True
        return hit

    def _insert_at(self, i: int, fp: int) -> bool:
        row = self.table[i]
        for s in range(self.slots):
            if row[s] == 0:
                row[s] = fp
                return True
        return False

    def add_key(self, key: int) -> None:
        self.add_batch(np.array([key], dtype=np.uint64))

    def add_batch(self, keys: np.ndarray) -> None:
        """Insert keys.  fp/i1/i2 are computed in one vectorized pass,
        and placement itself is vectorized: each pass scatters at most
        one key per target bucket into its first free slot (a stable
        bucket-sort dedup picks the winner), alternating i1/i2 passes
        until no key can place without kicking.  Only the rare kick
        chains fall back to the sequential path.  Bucket CHOICE can
        differ from one-by-one insertion, but lookup/delete semantics
        are bucket-pair symmetric, so contains()/delete() behavior is
        unchanged."""
        keys = np.asarray(keys, dtype=np.uint64)
        if len(keys) == 0:
            return
        fps = self._fps(keys)
        i1s = self._i1s(keys)
        i2s = self._alt(i1s, fps)
        self.n_items += len(keys)
        idx = np.arange(len(keys))
        for buckets in (i1s, i2s):
            while idx.size:
                b = buckets[idx]
                free = self.table[b] == 0  # (m, slots)
                has_free = free.any(axis=1)
                # one winner per bucket this pass (first in batch order)
                order = np.argsort(b, kind="stable")
                bs = b[order]
                first = np.ones(bs.size, dtype=bool)
                first[1:] = bs[1:] != bs[:-1]
                take = np.zeros(idx.size, dtype=bool)
                take[order[first]] = True
                take &= has_free
                if not take.any():
                    break
                self.table[b[take], free[take].argmax(axis=1)] = fps[idx[take]]
                keep = ~take
                # keys whose bucket is full wait for the next buckets
                # array (or the kick path); keys that lost the per-bucket
                # race retry this array
                if not (keep & has_free).any():
                    idx = idx[keep]
                    break
                idx = idx[keep]
        for j in idx.tolist():
            fp, i1 = int(fps[j]), int(i1s[j])
            if self._insert_at(i1, fp) or self._insert_at(int(i2s[j]), fp):
                continue
            # deterministic cuckoo kick chain
            i, cur = i1, fp
            placed = False
            for kick in range(self.MAX_KICKS):
                slot = kick % self.slots
                cur, self.table[i, slot] = int(self.table[i, slot]), cur
                i = int(self._alt(np.array([i]), np.array([cur], dtype=np.uint16))[0])
                if self._insert_at(i, cur):
                    placed = True
                    break
            if not placed:
                # table effectively full: bounded stash keeps zero false
                # negatives
                self.stash.add(self._canon(i, cur))

    def delete_key(self, key: int) -> bool:
        k = np.array([key], dtype=np.uint64)
        fp = int(self._fps(k)[0])
        i1 = int(self._i1s(k)[0])
        i2 = int(self._alt(np.array([i1]), np.array([fp], dtype=np.uint16))[0])
        for i in (i1, i2):
            row = self.table[i]
            hit = np.nonzero(row == fp)[0]
            if len(hit):
                row[hit[0]] = 0
                self.n_items -= 1
                return True
        ck = self._canon(i1, fp)
        if ck in self.stash:
            self.stash.discard(ck)
            self.n_items -= 1
            return True
        return False

    def state(self) -> dict:
        return {
            "n_buckets": self.n_buckets,
            "slots": self.slots,
            "table": self.table.copy(),
            "stash": set(self.stash),
            "n_items": self.n_items,
        }

    @classmethod
    def from_state(cls, st: dict) -> "CuckooFilter":
        cf = cls(st["n_buckets"], st["slots"])
        cf.table = st["table"].copy()
        cf.stash = set(st["stash"])
        cf.n_items = st["n_items"]
        return cf


class UrlSeen:
    """Bloom (first level) + exact set OR cuckoo (authoritative level).

    ``exact=True`` gives zero false positives for correctness runs;
    ``exact=False`` is the 10^10-URL scale path: the Bloom segment
    answers "definitely new" cheaply and the cuckoo segment is the
    authoritative probable-set — deletable, so force-deleted URLs can
    be re-admitted (the Bloom alone could never forget them).  A cuckoo
    FP drops a URL with p≈1.2e-4, mirroring the reference's acceptance
    of uh48 collisions (Spider.h:729-732)."""

    def __init__(self, n_bits: int = 1 << 20, exact: bool = True):
        self.bloom = BloomFilter(n_bits)
        self.exact: set | None = set() if exact else None
        self.cuckoo: CuckooFilter | None = (
            None if exact else CuckooFilter(max(1 << 10, n_bits >> 5))
        )

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
            # bloom says "maybe seen" → consult the exact set.  tolist()
            # converts to native ints in one C pass — the per-key int()
            # genexpr here was ~half the admission cost at 150k hosts
            ul = uniq.tolist()
            ex = self.exact
            for i in np.nonzero(~new_uniq)[0]:
                if ul[i] not in ex:
                    new_uniq[i] = True
            ex.update(ul)
        elif self.cuckoo is not None:
            # cuckoo is authoritative where the bloom says "maybe seen"
            # (this is where a deleted key resurrects as new)
            maybe = np.nonzero(~new_uniq)[0]
            if len(maybe):
                hit = self.cuckoo.contains_batch(uniq[maybe])
                new_uniq[maybe[~hit]] = True
            self.cuckoo.add_batch(uniq[new_uniq])
        new_mask = np.zeros(len(keys), dtype=bool)
        new_mask[first_idx[new_uniq]] = True
        return new_mask

    def delete(self, keys: np.ndarray) -> int:
        """Force-delete keys from the seen set so they can be re-added
        (reference: PageReindex force delete + respider).  Supported in
        exact mode (set discard) and cuckoo mode (filter delete); the
        Bloom layer keeps its bits — the authoritative level overrides."""
        keys = np.asarray(keys, dtype=np.uint64)
        n = 0
        if self.exact is not None:
            for k in keys:
                if int(k) in self.exact:
                    self.exact.discard(int(k))
                    n += 1
        elif self.cuckoo is not None:
            for k in keys:
                n += bool(self.cuckoo.delete_key(int(k)))
        return n

    def state(self) -> dict:
        return {
            "bloom": self.bloom.state(),
            "exact": self.exact,
            "cuckoo": self.cuckoo.state() if self.cuckoo is not None else None,
        }

    @classmethod
    def from_state(cls, st: dict) -> "UrlSeen":
        u = cls.__new__(cls)
        u.bloom = BloomFilter.from_state(st["bloom"])
        u.exact = st["exact"]
        ck = st.get("cuckoo")
        u.cuckoo = CuckooFilter.from_state(ck) if ck is not None else None
        return u
