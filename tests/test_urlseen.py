"""URL-seen layers: Bloom, cuckoo (deletable), and the combined UrlSeen
segment (north_rule: partitioned bloom+cuckoo on canonical URL hashes)."""

import numpy as np
import pytest

from open_source_search_engine_ray.state.urlseen import (
    BloomFilter,
    CuckooFilter,
    UrlSeen,
)


def keys(*vals):
    return np.array(vals, dtype=np.uint64)


def rand_keys(n, seed=3):
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.integers(1, 1 << 48, n, dtype=np.uint64)


def test_bloom_basic_and_no_false_negatives():
    bf = BloomFilter(1 << 16)
    k = rand_keys(2000)
    assert bf.test_and_add(k).all()  # all new
    assert not bf.test(k).any()  # none "definitely new" afterwards


def test_cuckoo_add_contains_delete_readd():
    cf = CuckooFilter(1 << 12)
    k = rand_keys(1000, seed=5)
    for x in k:
        cf.add_key(int(x))
    assert cf.contains_batch(k).all()  # no false negatives
    # delete half, they must disappear; the other half stays
    for x in k[:500]:
        assert cf.delete_key(int(x))
    assert not cf.contains_batch(k[:500]).any() or (
        # allow fp-collision survivors at the documented rate
        cf.contains_batch(k[:500]).sum() < 5
    )
    assert cf.contains_batch(k[500:]).all()
    # re-add the deleted ones
    for x in k[:500]:
        cf.add_key(int(x))
    assert cf.contains_batch(k).all()


def test_cuckoo_false_positive_rate_bounded():
    cf = CuckooFilter(1 << 12)
    for x in rand_keys(8000, seed=7):  # ~50% load
        cf.add_key(int(x))
    probe = rand_keys(20000, seed=11)
    fpp = cf.contains_batch(probe).mean()
    assert fpp < 0.005  # 16-bit fingerprints: ~1.2e-4 expected


def test_cuckoo_overflow_goes_to_stash_no_false_negatives():
    cf = CuckooFilter(1 << 4, slots=2)  # tiny: 32 slots
    k = rand_keys(64, seed=13)
    for x in k:
        cf.add_key(int(x))
    assert cf.contains_batch(k).all()  # stash absorbs overflow
    assert len(cf.stash) > 0


def test_cuckoo_state_roundtrip():
    cf = CuckooFilter(1 << 10)
    k = rand_keys(500, seed=17)
    for x in k:
        cf.add_key(int(x))
    cf2 = CuckooFilter.from_state(cf.state())
    assert cf2.contains_batch(k).all()
    assert cf2.delete_key(int(k[0]))


@pytest.mark.parametrize("exact", [True, False])
def test_urlseen_delete_and_readd(exact):
    us = UrlSeen(1 << 16, exact=exact)
    k = keys(101, 202, 303)
    assert us.test_and_add(k).all()
    assert not us.test_and_add(k).any()  # seen now
    # force-delete 202 → it becomes admissible again (the bloom alone
    # could never forget it; exact set / cuckoo override)
    assert us.delete(keys(202)) == 1
    new = us.test_and_add(k)
    assert new.tolist() == [False, True, False]
    assert not us.test_and_add(keys(202)).any()


def test_urlseen_cuckoo_mode_batch_boundary_independent():
    us = UrlSeen(1 << 16, exact=False)
    k = rand_keys(300, seed=19)
    dup = np.concatenate([k, k[:100]])
    new = us.test_and_add(dup)
    assert new[:300].all() and not new[300:].any()
    us2 = UrlSeen(1 << 16, exact=False)
    a = us2.test_and_add(k[:150])
    b = us2.test_and_add(np.concatenate([k[150:], k[:50]]))
    assert a.all() and b[:150].all() and not b[150:].any()


def test_urlseen_state_roundtrip_cuckoo():
    us = UrlSeen(1 << 16, exact=False)
    k = rand_keys(200, seed=23)
    us.test_and_add(k)
    us.delete(k[:10])
    us2 = UrlSeen.from_state(us.state())
    new = us2.test_and_add(k)
    assert new[:10].all() and not new[10:].any()
