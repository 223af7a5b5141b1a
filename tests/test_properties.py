"""Property-based tests (hypothesis) — SURVEY §5.2 item 2.

Mirrors the reference's assertion style (AltIndex involution at
cuckoofilter.h:194, no-false-negative sweeps at
bulk-insert-and-query.cc:595-597) as machine-generated properties, plus
the merge-associativity north-star for every mergeable kernel.
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from cuckoofilter_spark.kernels.bloom import BloomFilter
from cuckoofilter_spark.kernels.cms import CountMinSketch
from cuckoofilter_spark.kernels.cuckoo import CuckooFilter, pack_tags, unpack_tags
from cuckoofilter_spark.kernels.hll import HyperLogLog

key_arrays = st.lists(st.integers(min_value=0, max_value=(1 << 62) - 1),
                      min_size=0, max_size=400).map(
    lambda xs: np.array(sorted(set(xs)), dtype=np.uint64))


@given(key_arrays, st.integers(0, 2**32 - 1))
@settings(max_examples=40, deadline=None)
def test_cuckoo_no_false_negatives(keys, seed):
    f = CuckooFilter.create(max(64, keys.size * 2), bits=12, seed=seed)
    f.add_many(keys)
    if keys.size:
        assert f.contains_many(keys).all()


@given(key_arrays, st.integers(0, 2**32 - 1), st.data())
@settings(max_examples=30, deadline=None)
def test_cuckoo_delete_leaves_others_intact(keys, seed, data):
    if keys.size < 2:
        return
    f = CuckooFilter.create(max(64, keys.size * 2), bits=16, seed=seed)
    f.add_many(keys)
    k = data.draw(st.integers(1, keys.size - 1))
    dele, keep = keys[:k], keys[k:]
    removed = f.delete_many(dele)
    assert removed.all()
    # delete of present keys never hurts distinct still-present keys
    assert f.contains_many(keep).all()


@given(key_arrays, st.integers(0, 63))
@settings(max_examples=30, deadline=None)
def test_alt_index_involution(keys, nb_log2):
    f = CuckooFilter(1 << min(nb_log2, 20), bits=12, seed=1, capacity=100)
    idx, tag = f._index_tag(keys) if keys.size else (np.array([], dtype=np.int64),
                                                    np.array([], dtype=np.uint16))
    alt = f.alt_index(idx, tag)
    back = f.alt_index(alt, tag)
    assert np.array_equal(back, idx)


@given(st.lists(key_arrays, min_size=3, max_size=3), st.integers(0, 2**32 - 1))
@settings(max_examples=20, deadline=None)
def test_merge_assoc_commut_bitexact(parts, seed):
    """merge(a, merge(b,c)) == merge(merge(a,b), c) and merge(a,b) ==
    merge(b,a), bit-exact at the blob level, for every mergeable kernel."""
    def blob_variants(make, add, merge, to_bytes):
        ks = []
        for p in parts:
            k = make()
            add(k, p)
            ks.append(k)
        m1 = merge(merge(ks[0], ks[1]), ks[2])
        m2 = merge(ks[0], merge(ks[1], ks[2]))
        m3 = merge(merge(ks[1], ks[0]), ks[2])
        return to_bytes(m1), to_bytes(m2), to_bytes(m3)

    for make, add, merge, tb in [
        (lambda: BloomFilter.create(2048, 12, seed=seed),
         lambda k, p: k.add_many(p), BloomFilter.merge, lambda k: k.to_bytes()),
        (lambda: HyperLogLog(p=10, seed=seed),
         lambda k, p: k.add_many(p), HyperLogLog.merge, lambda k: k.to_bytes()),
        (lambda: CountMinSketch(width=256, depth=3, seed=seed),
         lambda k, p: k.add_many(p), CountMinSketch.merge, lambda k: k.to_bytes()),
        (lambda: CuckooFilter(2048, 12, seed, 4096),
         lambda k, p: k.add_many(p), CuckooFilter.merge, lambda k: k.to_bytes()),
    ]:
        b1, b2, b3 = blob_variants(make, add, merge, tb)
        assert b1 == b2  # associative
        # commutative up to the additive total for CMS is exact too
        assert b1 == b3


@given(st.lists(st.integers(0, (1 << 12) - 1), min_size=2, max_size=64)
       .filter(lambda xs: len(xs) % 2 == 0),
       st.sampled_from([4, 8, 12, 16, 32]))
@settings(max_examples=50, deadline=None)
def test_pack_unpack_roundtrip(tags, bits):
    arr = np.array([t & ((1 << bits) - 1) for t in tags],
                   dtype=np.uint32 if bits == 32 else np.uint16)
    buf = pack_tags(arr, bits)
    out = unpack_tags(buf, bits, arr.size)
    assert np.array_equal(out.astype(np.uint32), arr.astype(np.uint32))


# -- Misra-Gries: bracket + merge-order invariance ---------------------------
mg_streams = st.lists(st.integers(min_value=0, max_value=50),
                      min_size=0, max_size=600).map(
    lambda xs: np.array(xs, dtype=np.uint64))


@given(mg_streams, st.integers(1, 20), st.integers(1, 5))
@settings(max_examples=60, deadline=None)
def test_mg_bracket_and_exact_merge(stream, k, nparts):
    """For ANY stream, split, and k: per-partial MG + exact-sum merge
    keeps (a) est <= true <= est + D for present keys, (b) true <= D
    for absent keys, (c) D <= n/(k+1) summed over partials, (d) merge
    is bit-exactly order-invariant."""
    import functools

    from cuckoofilter_spark.kernels.mg import MisraGries

    parts = np.array_split(stream, nparts)
    sks = []
    for p in parts:
        s = MisraGries(k=k)
        s.add_many(p)
        assert s.keys.size <= k
        assert s.decremented <= (p.size // (k + 1)) + 1
        sks.append(s)
    m = functools.reduce(MisraGries.merge, sks)
    r = functools.reduce(MisraGries.merge, sks[::-1])
    assert m.to_bytes() == r.to_bytes()
    assert m.n == stream.size
    assert m.decremented <= stream.size // (k + 1) + nparts

    vals, true = np.unique(stream, return_counts=True) if stream.size \
        else (np.empty(0, np.uint64), np.empty(0, np.int64))
    est = m.estimate(vals)
    present = est > 0
    assert (est <= true).all()
    assert (true[present] <= est[present] + m.decremented).all()
    assert (true[~present] <= m.decremented).all()
    # compaction preserves the bracket (with its own added decrement)
    m.compact()
    est2 = m.estimate(vals)
    assert (est2 <= true).all()
    p2 = est2 > 0
    assert (true[p2] <= est2[p2] + m.decremented).all()
    assert (true[~p2] <= m.decremented).all()


pair_lists = st.lists(
    st.tuples(st.integers(0, 300), st.integers(0, (1 << 64) - 1)),
    min_size=0, max_size=300)


@given(pair_lists, st.integers(1, 4))
@settings(max_examples=40, deadline=None)
def test_multimap_find_matches_dict_and_merge_is_canonical(pairs, cuts):
    """QuotientMultimap property suite: batch Find == dict-of-lists
    for ANY pair multiset (duplicates, 2^63+ values, empty), and
    building from arbitrary splits merges to one canonical blob
    (partition-order independence — the Spark build contract)."""
    from cuckoofilter_spark.kernels.dysect import QuotientMultimap

    keys = np.array([k for k, _ in pairs], dtype=np.uint64)
    vals = np.array([v for _, v in pairs], dtype=np.uint64)
    whole = QuotientMultimap.from_pairs(keys, vals)

    oracle: dict = {}
    for k, v in pairs:
        oracle.setdefault(k, []).append(v)
    probe = np.arange(0, 310, dtype=np.uint64)
    counts, flat = whole.get_many(probe)
    cum = np.concatenate([[0], np.cumsum(counts)])
    for i in range(probe.size):
        assert sorted(flat[cum[i]:cum[i + 1]].tolist()) == sorted(
            oracle.get(i, []))

    # split at arbitrary points, merge in a different order
    bounds = np.linspace(0, keys.size, cuts + 1).astype(int)
    parts = [QuotientMultimap.from_pairs(keys[a:b], vals[a:b])
             for a, b in zip(bounds[:-1], bounds[1:])]
    merged = parts[-1]
    for p in parts[:-1]:
        merged = QuotientMultimap.merge(p, merged)
    assert merged.to_bytes() == whole.to_bytes()
