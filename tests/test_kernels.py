"""Kernel-level tests (no Spark) — mirrors the reference's test strategy:

- e2e insert-all/contain-all with FPR measurement (example/test.cc:30-58)
- serialize round-trip (example/test1.cc:38-74)
- AltIndex involution property (cuckoofilter.h:194 assert)
- adversarial sequential/rotated keys (bulk-insert-and-query.cc:747-767)
- merge associativity/commutativity (north rule; gqf.c:2428-2475 pattern)
- statistical bounds for Bloom/HLL/CMS/KLL (published bounds)
"""

import numpy as np
import pytest

from cuckoofilter_spark.kernels.bloom import BloomFilter
from cuckoofilter_spark.kernels.cms import CountMinSketch
from cuckoofilter_spark.kernels.cuckoo import (
    CuckooFilter,
    CuckooFullError,
    pack_tags,
    unpack_tags,
)
from cuckoofilter_spark.kernels.hashing import (
    murmur64,
    reverse_bits64,
    rotl64,
    simple_mix_split,
    splitmix64,
    splitmix64_seq,
    two_independent_multiply_shift,
    upperpower2,
)
from cuckoofilter_spark.kernels.hll import HyperLogLog
from cuckoofilter_spark.kernels.kll import KLLSketch


# ---------------------------------------------------------------- hashing
def test_murmur64_golden_vectors():
    # fmix64 fixed points computed independently (murmur3 reference impl)
    assert int(murmur64(np.array([0], dtype=np.uint64))[0]) == 0
    got = murmur64(np.array([1, 0xDEADBEEF], dtype=np.uint64))
    # python re-derivation of the same finalizer
    def fmix(h):
        h ^= h >> 33
        h = (h * 0xFF51AFD7ED558CCD) & (1 << 64) - 1
        h ^= h >> 33
        h = (h * 0xC4CEB9FE1A85EC53) & (1 << 64) - 1
        h ^= h >> 33
        return h
    assert int(got[0]) == fmix(1)
    assert int(got[1]) == fmix(0xDEADBEEF)


def test_splitmix64_golden():
    # first outputs of splitmix64 seeded at 0 (published test vector)
    s = splitmix64(np.array([1, 2, 3], dtype=np.uint64))
    def ref(x):
        z = (x + 0x9E3779B97F4A7C15) & (1 << 64) - 1
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & (1 << 64) - 1
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & (1 << 64) - 1
        return z ^ (z >> 31)
    assert [int(v) for v in s] == [ref(1), ref(2), ref(3)]


def test_multiply_shift_matches_python_128bit():
    keys = splitmix64_seq(11, 1000)
    m, a = 0x9E3779B97F4A7C15, 0xDEADBEEFCAFEF00D
    got = two_independent_multiply_shift(keys, m, a)
    for i in (0, 1, 500, 999):
        k = int(keys[i])
        assert int(got[i]) == ((a + m * k) >> 64) & ((1 << 64) - 1)


def test_signed_keys_view_as_unsigned():
    neg = np.array([-1, -12345], dtype=np.int64)
    pos = neg.view(np.uint64)
    assert np.array_equal(simple_mix_split(neg, 5), simple_mix_split(pos, 5))


def test_rotl_and_reverse_bits():
    x = np.array([1], dtype=np.uint64)
    assert int(rotl64(x, 1)[0]) == 2
    assert int(rotl64(x, 64)[0]) == 1
    assert int(reverse_bits64(x)[0]) == 1 << 63
    y = splitmix64_seq(3, 100)
    assert np.array_equal(reverse_bits64(reverse_bits64(y)), y)


def test_upperpower2():
    assert [upperpower2(v) for v in (0, 1, 2, 3, 4, 5, 1000)] == [1, 1, 2, 4, 4, 8, 1024]


# --------------------------------------------------------------- bit-pack
@pytest.mark.parametrize("bits", [4, 8, 12, 16, 32])
def test_pack_unpack_roundtrip(bits):
    rng = np.random.RandomState(bits)
    tags = rng.randint(0, 1 << bits, size=4096).astype(np.uint32)
    assert np.array_equal(unpack_tags(pack_tags(tags, bits), bits, tags.size),
                          tags.astype(unpack_tags(pack_tags(tags, bits), bits, 0).dtype))


def test_pack12_layout_size():
    tags = np.arange(8, dtype=np.uint16)
    assert len(pack_tags(tags, 12)) == 12  # 1.5 bytes/tag


# ----------------------------------------------------------------- cuckoo
def test_alt_index_involution():
    """assert(i1 == AltIndex(i2, tag)) — cuckoofilter.h:194."""
    f = CuckooFilter.create(10_000, bits=12, seed=9)
    keys = splitmix64_seq(1, 5000)
    i1, tag = f._index_tag(keys)
    i2 = f.alt_index(i1, tag)
    assert np.array_equal(f.alt_index(i2, tag), i1)


def test_no_false_negatives_and_fpr_bound():
    """example/test.cc:30-58 analogue."""
    n = 100_000
    f = CuckooFilter.create(n, bits=12, seed=7)
    keys = splitmix64_seq(0, n)
    assert f.add_many(keys) == n
    assert f.contains_many(keys).all()
    absent = splitmix64_seq(10_000_000, n)
    fpr = f.contains_many(absent).mean()
    assert fpr <= f.expected_fpp()  # 2*4/2^12 ≈ 0.195%


@pytest.mark.parametrize("bits,max_fpr", [(8, 0.04), (12, 0.002), (16, 0.0002)])
def test_fpr_by_width(bits, max_fpr):
    n = 50_000
    f = CuckooFilter.create(n, bits=bits, seed=21)
    f.add_many(splitmix64_seq(0, n))
    fpr = f.contains_many(splitmix64_seq(10_000_000, 200_000)).mean()
    assert fpr <= max_fpr


def test_occupancy_before_failure():
    """Fill to failure; load factor must be >= 0.94 (cuckoofilter.h:95)."""
    f = CuckooFilter.create(100_000, bits=12, seed=7)
    stream = splitmix64_seq(5, int(f.size_in_tags() * 1.05))
    f.add_many(stream, raise_on_full=False)
    assert f.load_factor() >= 0.94


def test_not_enough_space_raises():
    f = CuckooFilter(16, 12, 3, 64)  # tiny table
    with pytest.raises(CuckooFullError):
        f.add_many(splitmix64_seq(0, 200))


def test_serialize_roundtrip_identity():
    """example/test1.cc:38-74 analogue — bit-exact state round-trip."""
    f = CuckooFilter.create(20_000, bits=12, seed=13)
    f.add_many(splitmix64_seq(2, 18_000))
    g = CuckooFilter.from_bytes(f.to_bytes())
    assert np.array_equal(f.table, g.table)
    assert (g.num_items, g.seed, g.num_buckets) == (f.num_items, f.seed, f.num_buckets)
    probes = splitmix64_seq(77, 10_000)
    assert np.array_equal(f.contains_many(probes), g.contains_many(probes))


def test_delete_semantics():
    n = 10_000
    f = CuckooFilter.create(n, bits=16, seed=3)
    keys = splitmix64_seq(0, n)
    f.add_many(keys)
    dropped = keys[:1000]
    kept = keys[1000:]
    assert f.delete_many(dropped).all()
    assert f.contains_many(kept).all()  # delete never harms other keys
    assert f.num_items == n - 1000
    # deleted keys may still FP at the filter's rate, but most are gone
    assert f.contains_many(dropped).mean() < 0.01


def test_delete_duplicates_remove_one_copy_each():
    f = CuckooFilter.create(1000, bits=12, seed=3)
    k = splitmix64_seq(0, 1)
    f.add_many(np.concatenate([k, k, k]))  # 3 copies
    assert f.num_items == 3
    assert f.delete_many(np.concatenate([k, k])).all()
    assert f.num_items == 1
    assert f.contains_many(k).all()


def test_merge_associative_commutative_bitexact():
    """North rule: merge(a, merge(b,c)) == merge(merge(a,b), c) bit-exact."""
    def mk(seed):
        g = CuckooFilter.create(30_000, bits=12, seed=99)
        g.add_many(splitmix64_seq(seed * 1_000_000, 6000))
        return g
    a, b, c = mk(1), mk(2), mk(3)
    m1 = CuckooFilter.merge(a, CuckooFilter.merge(b, c))
    m2 = CuckooFilter.merge(CuckooFilter.merge(a, b), c)
    m3 = CuckooFilter.merge(CuckooFilter.merge(c, b), a)
    assert m1.to_bytes() == m2.to_bytes() == m3.to_bytes()
    allk = np.concatenate([splitmix64_seq(s * 1_000_000, 6000) for s in (1, 2, 3)])
    assert m1.contains_many(allk).all()


def test_merge_rejects_mismatched_params():
    """gqf.c:2434-2440 analogue — refuse mismatched seed/size."""
    a = CuckooFilter.create(1000, bits=12, seed=1)
    b = CuckooFilter.create(1000, bits=12, seed=2)
    with pytest.raises(ValueError):
        CuckooFilter.merge(a, b)


def test_adversarial_sequential_keys():
    """Sequential/rotated/bit-reversed keys (bulk-insert harness seeds 0-127)."""
    n = 30_000
    base = np.arange(n, dtype=np.uint64)
    for variant in (base, rotl64(base, 17), reverse_bits64(rotl64(base, 33))):
        f = CuckooFilter.create(n, bits=12, seed=17)
        assert f.add_many(variant) == n
        assert f.contains_many(variant).all()


def test_victim_cache_membership():
    """Keys spilled to the victim cache must still be found."""
    f = CuckooFilter(64, 12, 5, 256)  # small: force kick-chain overflow
    keys = splitmix64_seq(0, 250)
    f.add_many(keys[:240], raise_on_full=False)
    if f.victim_used:
        # every reported-stored key is findable
        stored = keys[:f.num_items]
    assert f.contains_many(keys[: min(f.num_items, 240)]).sum() >= min(f.num_items, 240) * 0.99


# ------------------------------------------------------------------ bloom
def test_bloom_no_false_negatives_and_fpp():
    n = 100_000
    b = BloomFilter.create(n, bits_per_item=10, seed=3)
    keys = splitmix64_seq(0, n)
    b.add_many(keys)
    assert b.contains_many(keys).all()
    fpr = b.contains_many(splitmix64_seq(10_000_000, n)).mean()
    assert fpr <= 2.5 * b.expected_fpp()


def test_bloom_merge_equals_bulk_and_associative():
    n = 60_000
    keys = splitmix64_seq(0, n)
    bulk = BloomFilter.create(n, 10, seed=5)
    bulk.add_many(keys)
    parts = [BloomFilter.create(n, 10, seed=5) for _ in range(3)]
    for i, p in enumerate(parts):
        p.add_many(keys[i * 20_000:(i + 1) * 20_000])
    m1 = BloomFilter.merge(parts[0], BloomFilter.merge(parts[1], parts[2]))
    m2 = BloomFilter.merge(BloomFilter.merge(parts[2], parts[0]), parts[1])
    assert np.array_equal(m1.words, bulk.words)
    assert np.array_equal(m1.words, m2.words)


def test_bloom_roundtrip():
    b = BloomFilter.create(1000, 12, seed=9)
    b.add_many(splitmix64_seq(0, 900))
    c = BloomFilter.from_bytes(b.to_bytes())
    assert np.array_equal(b.words, c.words) and c.k == b.k and c.n_added == b.n_added


# -------------------------------------------------------------------- hll
def test_hll_error_bound_and_merge():
    true_n = 150_000
    keys = splitmix64_seq(0, true_n)
    h = HyperLogLog(p=14, seed=4)
    h.add_many(keys)
    h.add_many(keys[:70_000])  # duplicates must not change the estimate
    assert abs(h.estimate() - true_n) / true_n <= 3 * h.rel_error()
    a, b = HyperLogLog(p=14, seed=4), HyperLogLog(p=14, seed=4)
    a.add_many(keys[:100_000])
    b.add_many(keys[50_000:])
    m = HyperLogLog.merge(a, b)
    assert np.array_equal(m.registers, h.registers)  # max-merge == bulk
    c = HyperLogLog(p=14, seed=4)
    c.add_many(keys[:1])
    m1 = HyperLogLog.merge(HyperLogLog.merge(a, b), c)
    m2 = HyperLogLog.merge(a, HyperLogLog.merge(b, c))
    assert np.array_equal(m1.registers, m2.registers)


def test_hll_small_range_linear_counting():
    h = HyperLogLog(p=12, seed=4)
    h.add_many(splitmix64_seq(0, 100))
    assert abs(h.estimate() - 100) <= 5


def test_hll_roundtrip():
    h = HyperLogLog(p=10, seed=6)
    h.add_many(splitmix64_seq(0, 5000))
    g = HyperLogLog.from_bytes(h.to_bytes())
    assert np.array_equal(g.registers, h.registers) and g.estimate() == h.estimate()


# -------------------------------------------------------------------- cms
def test_cms_never_underestimates_and_bound():
    cms = CountMinSketch.create(eps=0.001, delta=0.01, seed=8)
    keys = (splitmix64_seq(0, 400_000) % np.uint64(2000)).astype(np.int64)
    cms.add_many(keys)
    probe = np.arange(2000)
    est = cms.query_many(probe)
    true = np.bincount(keys, minlength=2000)
    assert (est >= true).all()
    assert (est - true).max() <= cms.eps * cms.total


def test_cms_merge_exact_and_associative():
    keys = (splitmix64_seq(0, 90_000) % np.uint64(500)).astype(np.int64)
    bulk = CountMinSketch(width=2048, depth=4, seed=8)
    bulk.add_many(keys)
    parts = [CountMinSketch(width=2048, depth=4, seed=8) for _ in range(3)]
    for i, p in enumerate(parts):
        p.add_many(keys[i * 30_000:(i + 1) * 30_000])
    m1 = CountMinSketch.merge(parts[0], CountMinSketch.merge(parts[1], parts[2]))
    m2 = CountMinSketch.merge(CountMinSketch.merge(parts[1], parts[0]), parts[2])
    assert np.array_equal(m1.table, bulk.table)
    assert np.array_equal(m1.table, m2.table)
    assert m1.total == bulk.total


def test_cms_weighted_counts():
    cms = CountMinSketch(width=1024, depth=4, seed=8)
    cms.add_many(np.array([7, 8]), counts=np.array([100, 3]))
    est = cms.query_many(np.array([7, 8]))
    assert est[0] >= 100 and est[1] >= 3


def test_cms_roundtrip():
    cms = CountMinSketch(width=256, depth=3, seed=2)
    cms.add_many(np.arange(1000) % 37)
    d = CountMinSketch.from_bytes(cms.to_bytes())
    assert np.array_equal(d.table, cms.table) and d.total == cms.total


# -------------------------------------------------------------------- kll
def test_kll_rank_error_bound():
    data = np.random.RandomState(1).lognormal(5.5, 0.8, 200_000)
    s = KLLSketch(k=200, seed=5)
    s.add_many(data)
    assert s.n == data.size
    for q in (0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99):
        v = s.quantile(q)[0]
        true_rank = (data <= v).mean()
        assert abs(true_rank - q) <= s.eps


def test_kll_merge_within_bound_any_tree():
    data = np.random.RandomState(2).normal(0, 1, 120_000)
    parts = []
    for i in range(4):
        p = KLLSketch(k=200, seed=5)
        p.add_many(data[i * 30_000:(i + 1) * 30_000])
        parts.append(p)
    left = KLLSketch.merge(KLLSketch.merge(parts[0], parts[1]),
                           KLLSketch.merge(parts[2], parts[3]))
    right = KLLSketch.merge(parts[0], KLLSketch.merge(parts[1],
                            KLLSketch.merge(parts[2], parts[3])))
    for m in (left, right):
        assert m.n == data.size
        for q in (0.1, 0.5, 0.9):
            true_rank = (data <= m.quantile(q)[0]).mean()
            assert abs(true_rank - q) <= m.eps


def test_kll_roundtrip_and_rank():
    s = KLLSketch(k=128, seed=5)
    vals = np.arange(10_000, dtype=np.float64)
    s.add_many(vals)
    t = KLLSketch.from_bytes(s.to_bytes())
    assert np.array_equal(t.quantile([0.25, 0.5]), s.quantile([0.25, 0.5]))
    r = s.rank(5000.0)[0]
    assert abs(r - 5001) <= s.eps * s.n


def test_kll_deterministic_build():
    data = np.random.RandomState(3).uniform(0, 1, 50_000)
    a, b = KLLSketch(k=200, seed=5), KLLSketch(k=200, seed=5)
    a.add_many(data)
    b.add_many(data)
    assert a.to_bytes() == b.to_bytes()  # reproducible (checkpoint/resume)


def test_adversarial_key_orders():
    """Sequential / rotated / bit-reversed key streams (the reference's
    adversarial seeds 0-127, bulk-insert-and-query.cc:747-767) must not
    degrade occupancy or false-positive rate — they stress weak hashing."""
    import numpy as np
    from cuckoofilter_spark.kernels.cuckoo import CuckooFilter
    from cuckoofilter_spark.kernels.hashing import reverse_bits64, rotl64

    base = np.arange(1, 50_001, dtype=np.uint64)
    variants = {
        "sequential": base,
        "rot7": rotl64(base, 7),
        "rot33": rotl64(base, 33),
        "bitrev": reverse_bits64(base),
    }
    for name, keys in variants.items():
        f = CuckooFilter.create(60_000, bits=12, seed=21)
        f.add_many(keys)
        assert f.contains_many(keys).all(), f"{name}: false negative"
        neg = rotl64(np.arange(60_001, 160_001, dtype=np.uint64), 13)
        neg = np.setdiff1d(neg, keys)
        fpp = f.contains_many(neg).mean()
        assert fpp <= 3 * f.expected_fpp(), f"{name}: fpp {fpp}"


def test_blocked_bloom_kernel():
    """simd-block.h semantics: no false negatives, fpp near model, OR-merge
    bit-exact and associative, blob round-trip."""
    import numpy as np
    from cuckoofilter_spark.kernels.blocked_bloom import BlockedBloomFilter

    rng = np.random.default_rng(4)
    keys = np.unique(rng.integers(0, 1 << 60, 100_000, dtype=np.uint64))
    f = BlockedBloomFilter.create(keys.size, seed=9)
    f.add_many(keys)
    assert f.contains_many(keys).all()
    neg = np.setdiff1d(rng.integers(0, 1 << 60, 300_000, dtype=np.uint64), keys)
    fpp = f.contains_many(neg).mean()
    assert fpp < 0.02, fpp  # 24 bits/key blocked bloom: sub-percent regime
    g = BlockedBloomFilter.from_bytes(f.to_bytes())
    assert np.array_equal(g.buckets, f.buckets)
    # split/merge == whole, and associativity
    parts = [BlockedBloomFilter(f.num_buckets, 9) for _ in range(3)]
    for p, seg in zip(parts, np.array_split(keys, 3)):
        p.add_many(seg)
    m1 = BlockedBloomFilter.merge(BlockedBloomFilter.merge(parts[0], parts[1]), parts[2])
    m2 = BlockedBloomFilter.merge(parts[0], BlockedBloomFilter.merge(parts[1], parts[2]))
    assert np.array_equal(m1.buckets, f.buckets)
    assert m1.to_bytes() == m2.to_bytes()


def test_tdigest_kernel():
    """Accuracy on continuous data, merge-vs-whole consistency,
    estimate-level associativity, blob round-trip."""
    import numpy as np
    from cuckoofilter_spark.kernels.tdigest import TDigest

    rng = np.random.default_rng(8)
    data = rng.lognormal(5.5, 0.8, 500_000)
    t = TDigest(200)
    t.add_many(data)
    for q in (0.01, 0.5, 0.99, 0.999):
        est = float(t.quantile(q)[0])
        assert abs((data <= est).mean() - q) <= max(t.rel_rank_error(q) * 3, 0.002)
    a, b = TDigest(200), TDigest(200)
    a.add_many(data[:250_000]); b.add_many(data[250_000:])
    m = TDigest.merge(a, b)
    for q in (0.01, 0.5, 0.99):
        est = float(m.quantile(q)[0])
        assert abs((data <= est).mean() - q) <= 0.01
    g = TDigest.from_bytes(m.to_bytes())
    assert np.array_equal(g.means, m.means) and np.array_equal(g.weights, m.weights)
    import pytest
    with pytest.raises(ValueError):
        TDigest.merge(TDigest(100), TDigest(200))


def test_growable_blocked_bloom():
    """GrowSimdBlockFilter semantics: grows by doubling levels, never a
    false negative, bounded fpp, round-trip."""
    import numpy as np
    from cuckoofilter_spark.kernels.blocked_bloom import GrowBlockedBloomFilter

    rng = np.random.default_rng(6)
    f = GrowBlockedBloomFilter(initial_capacity=1000, seed=3)
    all_keys = []
    for wave in range(5):  # 5 waves of 20k -> forces multiple level-opens
        keys = rng.integers(0, 1 << 60, 20_000, dtype=np.uint64)
        f.add_many(keys)
        all_keys.append(keys)
    keys = np.concatenate(all_keys)
    assert f.contains_many(keys).all()
    assert len(f.levels) >= 4  # it actually grew
    neg = np.setdiff1d(rng.integers(0, 1 << 60, 200_000, dtype=np.uint64), keys)
    fpp = f.contains_many(neg).mean()
    assert fpp <= max(3 * f.expected_fpp(), 0.02), fpp
    g = GrowBlockedBloomFilter.from_bytes(f.to_bytes())
    assert np.array_equal(g.contains_many(neg[:5000]), f.contains_many(neg[:5000]))
    assert g.n_added() == f.n_added()


def test_cqf_kernel():
    """gqf.h semantics: exact counts at fingerprint resolution, delete
    with clamping, bit-exact assoc+commut merge == one-shot build."""
    import collections
    import numpy as np
    from cuckoofilter_spark.kernels.cqf import CountingQuotientFilter as CQF

    rng = np.random.default_rng(9)
    keys = rng.integers(0, 20000, 300_000, dtype=np.uint64)
    cnt = collections.Counter(keys.tolist())
    f = CQF(q=20, r=28, seed=2)
    f.add_many(keys)
    ks = np.array(list(cnt.keys())[:100], dtype=np.uint64)
    assert np.array_equal(f.count_many(ks), np.array([cnt[int(k)] for k in ks]))
    assert f.total == keys.size
    # weighted insert
    g = CQF(q=20, r=28, seed=2)
    g.add_many(ks, np.full(ks.size, 7, dtype=np.int64))
    assert (g.count_many(ks) == 7).all()
    # delete with clamp
    g.delete_many(ks[:10], np.full(10, 100, dtype=np.int64))
    assert (g.count_many(ks[:10]) == 0).all()
    assert (g.count_many(ks[10:]) == 7).all()
    # merge == one-shot, assoc + commut bit-exact
    parts = []
    for seg in np.array_split(keys, 4):
        p = CQF(q=20, r=28, seed=2)
        p.add_many(seg)
        parts.append(p)
    m1 = CQF.multi_merge(parts)
    m2 = CQF.multi_merge(parts[::-1])
    assert m1.to_bytes() == m2.to_bytes() == f.to_bytes()
    # roundtrip + param check
    h = CQF.from_bytes(f.to_bytes())
    assert np.array_equal(h.fingerprints, f.fingerprints)
    import pytest
    with pytest.raises(ValueError):
        CQF.merge(CQF(q=20, r=28, seed=2), CQF(q=20, r=28, seed=3))


def test_evict_slot_scalar_matches_vector():
    """evict_slot1 is the pure-int twin of evict_slots (the sequential
    AddImpl fallback draws one slot per kick; the parallel rounds draw
    a vector per round — both must read the same seeded stream)."""
    from cuckoofilter_spark.kernels.cuckoo import evict_slot1, evict_slots
    for seed in (0, 0x5EED, (1 << 64) - 1):
        for rnd in (1, 2, 77, 10**9):
            v = evict_slots(seed, rnd, 16)
            assert ((v >= 0) & (v < 4)).all()
            assert evict_slot1(seed, rnd) == v[0]
    # distinct rounds give a fresh draw stream (no constant stutter)
    firsts = {evict_slot1(7, r) for r in range(1, 64)}
    assert firsts == {0, 1, 2, 3}


def test_seq_alt_index_scalar_parity():
    """The scalar AltIndex inside _add_tags_seq must agree with the
    vectorized alt_index for both sizing variants (fill-to-failure is
    the only path that exercises the scalar form heavily)."""
    from cuckoofilter_spark.kernels.cuckoo import _U64_MASK

    for stable in (False, True):
        f = CuckooFilter.create(100_000, bits=12, seed=9, stable=stable)
        nb = f.num_buckets
        idx = np.arange(0, nb, max(1, nb // 257), dtype=np.int64)
        tags = (splitmix64_seq(3, idx.size) % 4095 + 1).astype(np.uint64)
        want = f.alt_index(idx, tags)
        kick_const = 0x5BD1E995
        half = nb >> 1
        for k in range(idx.size):
            i, t = int(idx[k]), int(tags[k])
            if stable:
                h = (t * 0xC4CEB9FE1A85EC53) & _U64_MASK
                r = (((h & 0xFFFFFFFF) * half) >> 32) * 2 + 1
                got = (nb - i - r) % nb
            else:
                got = (i ^ ((t * kick_const) & _U64_MASK)) & (nb - 1)
            assert got == int(want[k])
