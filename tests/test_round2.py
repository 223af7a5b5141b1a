"""Round-2 components: XorFilterPlus/Rank9, SimpleTabulation, odd-width
xor storage, the flat sharded probe (victim path), CQF edge-case
regressions (ADVICE r1), LSH bucket-cap adversarial fixture, checkpoint
source-fingerprint guard, planted-pair embedding near-dup recall."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from cuckoofilter_spark.kernels.cqf import CountingQuotientFilter
from cuckoofilter_spark.kernels.cuckoo import CuckooFilter
from cuckoofilter_spark.kernels.hashing import SimpleTabulation
from cuckoofilter_spark.kernels.xor import XorFilter, pack_nbits, unpack_nbits
from cuckoofilter_spark.kernels.xorplus import Rank9, XorFilterPlus, popcount64


# -- Rank9 / XorFilterPlus -------------------------------------------------
def test_rank9_matches_bruteforce():
    rng = np.random.default_rng(1)
    for bitcount in (1, 64, 65, 511, 512, 513, 5000):
        words = (bitcount + 63) // 64
        bits = rng.integers(0, 1 << 63, size=words, dtype=np.uint64)
        tail = bitcount & 63
        if tail:
            bits[-1] &= (np.uint64(1) << np.uint64(tail)) - np.uint64(1)
        r = Rank9(bits, bitcount)
        flat = np.array([(bits[i >> 6] >> np.uint64(i & 63)) & np.uint64(1)
                         for i in range(bitcount)], dtype=bool)
        brute = np.concatenate(([0], np.cumsum(flat)))[:-1]
        pos = np.arange(bitcount)
        assert (r.rank(pos) == brute).all()
        assert (r.get(pos) == flat).all()


def test_popcount64():
    rng = np.random.default_rng(2)
    x = rng.integers(0, 1 << 63, size=1000, dtype=np.uint64)
    expect = np.array([bin(int(v)).count("1") for v in x])
    assert (popcount64(x) == expect).all()


def test_xorplus_no_fn_space_roundtrip():
    rng = np.random.default_rng(3)
    keys = np.unique(rng.integers(0, 1 << 62, size=60_000, dtype=np.uint64))
    neg = rng.integers(1 << 62, 1 << 63, size=100_000, dtype=np.uint64)
    for fp_bits in (8, 16):
        f = XorFilterPlus.build(keys, fp_bits=fp_bits, seed=0x5EED)
        assert f.contains_many(keys).all()  # no false negatives
        fpp = f.contains_many(neg).mean()
        assert fpp <= 3 * f.expected_fpp() + 1e-4
        # the point of xor+: smaller than the plain xor filter
        plain = XorFilter.build(keys, fp_bits=fp_bits, seed=0x5EED)
        assert f.bits_per_item() < plain.bits_per_item()
        assert f.bits_per_item() < 1.23 * fp_bits  # beats the raw array
        g = XorFilterPlus.from_bytes(f.to_bytes())
        assert (g.contains_many(neg[:20_000]) == f.contains_many(neg[:20_000])).all()
        assert g.to_bytes() == f.to_bytes()


def test_xorplus_empty_and_tiny():
    for n in (0, 1, 5):
        keys = np.arange(n, dtype=np.uint64)
        f = XorFilterPlus.build(keys, fp_bits=8, seed=7)
        if n:
            assert f.contains_many(keys).all()
        XorFilterPlus.from_bytes(f.to_bytes())


# -- odd-width xor storage -------------------------------------------------
def test_pack_nbits_roundtrip():
    rng = np.random.default_rng(4)
    for w in (4, 7, 10, 12, 14, 16, 20, 32):
        v = rng.integers(0, 1 << w, size=777, dtype=np.uint64).astype(np.uint32)
        assert (unpack_nbits(pack_nbits(v, w), w, v.size) == v).all()


def test_xor_odd_widths():
    rng = np.random.default_rng(5)
    keys = np.unique(rng.integers(0, 1 << 62, size=30_000, dtype=np.uint64))
    neg = rng.integers(1 << 62, 1 << 63, size=100_000, dtype=np.uint64)
    for fp_bits in (10, 14):
        f = XorFilter.build(keys, fp_bits=fp_bits, seed=0x5EED)
        assert f.contains_many(keys).all()
        assert f.contains_many(neg).mean() <= 3 * f.expected_fpp() + 1e-4
        # packed footprint, not the in-memory uint16 array
        assert abs(f.bits_per_item() - 1.23 * fp_bits) < 1.0
        g = XorFilter.from_bytes(f.to_bytes())
        assert (g.fingerprints == f.fingerprints).all()
        assert g.to_bytes() == f.to_bytes()


def test_xor_v1_blob_still_readable():
    """Blobs serialized before the pow2_blocks flag byte (ver=1, layout
    <4sHBBIQQ) must still deserialize — persisted filters outlive code."""
    import struct

    from cuckoofilter_spark.kernels import xor as xmod

    rng = np.random.default_rng(6)
    keys = np.unique(rng.integers(0, 1 << 62, size=10_000, dtype=np.uint64))
    f = XorFilter.build(keys, fp_bits=8, seed=0x5EED)  # non-pow2 layout
    v2 = f.to_bytes()
    payload = v2[struct.calcsize(xmod._FMT):]
    v1 = struct.pack("<4sHBBIQQ", b"XOR1", 1, f.fp_bits, f._attempt,
                     f.block_length, f.seed, f.size) + payload
    g = XorFilter.from_bytes(v1)
    assert not g.pow2_blocks
    assert (g.fingerprints == f.fingerprints).all()
    assert g.contains_many(keys).all()


# -- SimpleTabulation ------------------------------------------------------
def test_simple_tabulation_golden_loop():
    t = SimpleTabulation(seed=42)
    keys = np.array([0, 1, 0xDEADBEEF, 2**64 - 1, 0x0123456789ABCDEF],
                    dtype=np.uint64)
    got = t(keys)
    for k, g in zip(keys, got):  # pure-python reference loop
        r = 0
        for i in range(8):
            r ^= int(t.tables[i][(int(k) >> (8 * i)) & 0xFF])
        assert r == int(g)
    assert (SimpleTabulation(seed=42)(keys) == got).all()  # deterministic
    assert (SimpleTabulation(seed=43)(keys) != got).any()  # seed matters
    seq = t(np.arange(200_000, dtype=np.uint64))
    assert np.unique(seq).size == seq.size  # injective-ish on sequential keys


def test_simple_tabulation_adversarial_orders():
    from cuckoofilter_spark.kernels.hashing import reverse_bits64, rotl64

    t = SimpleTabulation(seed=9)
    base = np.arange(50_000, dtype=np.uint64)
    for adv in (rotl64(base, 21), reverse_bits64(base)):
        h = t(adv)
        # no mass collisions under adversarial key transforms
        assert np.unique(h).size > 0.999 * h.size


# -- flat sharded probe ----------------------------------------------------
def test_flat_probe_equals_per_shard_and_victim():
    from cuckoofilter_spark.sketch.membership import _FlatProbe, shard_of

    rng = np.random.default_rng(6)
    for stable in (False, True):
        keys = np.unique(rng.integers(0, 1 << 62, size=20_000, dtype=np.uint64))
        nsh = 8
        sh = shard_of(keys, nsh)
        blobs = []
        for s in range(nsh):
            seg = keys[sh == s]
            f = CuckooFilter.create(max(64, int(seg.size)), bits=12, seed=3,
                                    stable=stable)
            f.add_many(seg)
            blobs.append(f.to_bytes())
        probes = np.concatenate(
            [keys, rng.integers(0, 1 << 62, size=20_000, dtype=np.uint64)])
        ref = np.zeros(probes.size, dtype=bool)
        shp = shard_of(probes, nsh)
        for s in range(nsh):
            m = shp == s
            ref[m] = CuckooFilter.from_bytes(blobs[s]).contains_many(probes[m])
        got = _FlatProbe(blobs).contains_u64(probes)
        assert (ref == got).all()
        assert got[: keys.size].all()  # no FN

    # victim-cache branch: overfill until the victim slot is used
    for stable in (False, True):
        f = CuckooFilter.create(256, bits=8, seed=3, stable=stable)
        k = 0
        while not f.victim_used and k < 100_000:
            f.add_many(np.array([k], dtype=np.uint64), raise_on_full=False)
            k += 1
        assert f.victim_used
        ks = np.arange(k + 500, dtype=np.uint64)
        assert (_FlatProbe([f.to_bytes()]).contains_u64(ks)
                == f.contains_many(ks)).all()


# -- CQF regressions (ADVICE r1) ------------------------------------------
def test_cqf_empty_filter_probes():
    f = CountingQuotientFilter()
    ks = np.array([1, 2, 3], dtype=np.uint64)
    assert (f.count_many(ks) == 0).all()
    assert not f.contains_many(ks).any()
    f.delete_many(ks)  # no crash on empty


def test_cqf_duplicate_delete_clamps_jointly():
    f = CountingQuotientFilter()
    f.add_many(np.array([7], dtype=np.uint64), np.array([3]))
    f.delete_many(np.array([7, 7], dtype=np.uint64), np.array([2, 2]))
    assert f.count_many(np.array([7], dtype=np.uint64))[0] == 0
    assert f.total == 0  # never negative
    f = CountingQuotientFilter()
    f.add_many(np.array([7], dtype=np.uint64), np.array([5]))
    f.delete_many(np.array([7, 7], dtype=np.uint64), np.array([1, 2]))
    assert f.count_many(np.array([7], dtype=np.uint64))[0] == 2


def test_cuckoo_bits13_single_rejected():
    with pytest.raises(ValueError):
        CuckooFilter.create(100, bits=13, seed=1)
    # semisort path still fine
    CuckooFilter.create(100, bits=13, seed=1, mode="semisort")


# -- LSH bucket cap (adversarial: 1k identical docs) -----------------------
def test_bucket_cap_identical_docs_same_output(spark):
    from cuckoofilter_spark.ops.dedup import bucket_self_join_pairs

    # 1000 rows in ONE bucket: with cap=64 the join is salted into blocked
    # cells; output must equal the plain all-pairs set
    n = 1000
    df = spark.range(n).select(
        F.lit(0).alias("band"), F.lit(123).alias("bucket"),
        F.col("id").alias("doc"))
    pairs = bucket_self_join_pairs(df, ["band", "bucket"], cap=64)
    assert pairs.count() == n * (n - 1) // 2
    # spot-check orientation and a few pairs
    got = {(r["doc_a"], r["doc_b"]) for r in pairs.where("doc_b - doc_a <= 2").collect()}
    for a in range(0, 20):
        assert (a, a + 1) in got and (a, a + 2) in got


def test_minhash_identical_docs_bounded(spark):
    from cuckoofilter_spark.ops.dedup import minhash_lsh_pairs

    rows = [(f"d{i:04d}", "the same exact document body repeated here")
            for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    out = minhash_lsh_pairs(df, "doc_id", "text", threshold=0.8)
    assert out.count() == 200 * 199 // 2  # all pairs, nothing dropped


# -- checkpoint source-fingerprint guard ----------------------------------
def test_checkpoint_refuses_changed_source(spark, tmp_path):
    import pandas as pd

    from cuckoofilter_spark.plans.checkpoint import cuckoo_build_checkpointed

    src = str(tmp_path / "src")
    ck = str(tmp_path / "ck")
    pd.DataFrame({"k": np.arange(500, dtype=np.int64)}).to_parquet(
        src, engine="pyarrow")
    df = spark.read.parquet(src)
    f1 = cuckoo_build_checkpointed(spark, df, "k", ck, capacity=600, bits=12,
                                   seed=7, num_shards=8)
    assert f1.num_items() == 500
    # same source: resume silently (stage 1 skipped)
    cuckoo_build_checkpointed(spark, spark.read.parquet(src), "k", ck,
                              capacity=600, bits=12, seed=7, num_shards=8)
    # changed source content -> refused
    pd.DataFrame({"k": np.arange(1000, dtype=np.int64)}).to_parquet(
        src, engine="pyarrow")
    with pytest.raises(ValueError, match="different parameters"):
        cuckoo_build_checkpointed(spark, spark.read.parquet(src), "k", ck,
                                  capacity=600, bits=12, seed=7, num_shards=8)


# -- planted-pair near-dup recall (ADVICE r1) ------------------------------
def test_embedding_neardup_planted_pairs(spark):
    from cuckoofilter_spark.ops.similarity import embedding_neardup_pairs

    rng = np.random.default_rng(11)
    dim = 32
    base = rng.normal(size=(60, dim))
    rows = []
    vid = 0
    planted = []
    for i in range(60):
        v = base[i] / np.linalg.norm(base[i])
        rows.append((vid, [float(x) for x in v]))
        a = vid
        vid += 1
        if i < 20:  # plant a >=0.95-cosine twin for the first 20
            w = v + rng.normal(scale=0.04, size=dim)
            w = w / np.linalg.norm(w)
            if float(v @ w) >= 0.96:
                rows.append((vid, [float(x) for x in w]))
                planted.append((a, vid))
                vid += 1
    assert len(planted) >= 10
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {(r["vec_a"], r["vec_b"])
           for r in embedding_neardup_pairs(emb, threshold=0.95, seed=0x5EED)
           .collect()}
    found = sum(1 for p in planted if p in got)
    # 8x6-bit banding: miss probability ~0.25%/pair at cos .95 — demand all
    assert found == len(planted), (found, len(planted))

def test_xor_pow2_blocks_variant():
    # XorFilter2n (xorfilter_2n.h): pow2 block length, mask-based cells
    rng = np.random.default_rng(12)
    keys = np.unique(rng.integers(0, 1 << 62, size=30_000, dtype=np.uint64))
    neg = rng.integers(1 << 62, 1 << 63, size=100_000, dtype=np.uint64)
    f = XorFilter.build(keys, fp_bits=8, seed=0x5EED, pow2_blocks=True)
    assert f.block_length & (f.block_length - 1) == 0
    assert f.contains_many(keys).all()
    assert f.contains_many(neg).mean() <= 3 * f.expected_fpp() + 1e-4
    g = XorFilter.from_bytes(f.to_bytes())
    assert g.pow2_blocks and (g.fingerprints == f.fingerprints).all()
    # rounding trade-off: more space than the Lemire-reduce sizing
    plain = XorFilter.build(keys, fp_bits=8, seed=0x5EED)
    assert f.bits_per_item() >= plain.bits_per_item()


def test_cqf_resize_preserves_contents():
    rng = np.random.default_rng(13)
    keys = rng.integers(0, 1 << 40, size=5000, dtype=np.uint64)
    f = CountingQuotientFilter(q=16, r=32, seed=5)
    f.add_many(keys)
    before = f.count_many(keys[:500]).copy()
    fsz = f.size_in_bytes()
    f.resize(20)  # grow quotient space (gqf.h qf_resize)
    assert f.q == 20 and f.r == 28
    assert (f.count_many(keys[:500]) == before).all()  # contents preserved
    assert f.size_in_bytes() != 0 and fsz > 0
    with pytest.raises(ValueError):
        f.resize(16)  # only grows
    with pytest.raises(ValueError):
        f.resize(48)  # must keep a remainder


def test_connected_components_planted(spark):
    """Min-label propagation equals brute-force union-find on planted
    components (chain, triangle, singletons)."""
    from cuckoofilter_spark.ops.dedup import connected_components

    # components: {1,2,3,4 chain}, {10,11,12 triangle}, {20-21}, {30}, {31}
    edges = [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)]
    all_ids = [1, 2, 3, 4, 10, 11, 12, 20, 21, 30, 31]
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    ids = spark.createDataFrame([(i,) for i in all_ids], "doc long")
    got = {r["doc_id"]: r["cluster_id"]
           for r in connected_components(pairs, ids).collect()}
    want = {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10,
            20: 20, 21: 20, 30: 30, 31: 31}
    assert got == want


# -- hypothesis property tests for round-2 kernels -------------------------
from hypothesis import given, settings, strategies as st


@settings(max_examples=30, deadline=None)
@given(st.integers(4, 32),
       st.lists(st.integers(0, 2**32 - 1), min_size=0, max_size=500))
def test_pack_nbits_roundtrip_property(bits, vals):
    v = (np.array(vals, dtype=np.uint64) & ((1 << bits) - 1)).astype(np.uint32)
    assert (unpack_nbits(pack_nbits(v, bits), bits, v.size) == v).all()


@settings(max_examples=20, deadline=None)
@given(st.integers(1, 2000), st.integers(0, 2**32 - 1))
def test_rank9_property(bitcount, seed):
    rng = np.random.default_rng(seed)
    words = (bitcount + 63) // 64
    bits = rng.integers(0, 1 << 63, size=words, dtype=np.uint64)
    tail = bitcount & 63
    if tail:
        bits[-1] &= (np.uint64(1) << np.uint64(tail)) - np.uint64(1)
    r = Rank9(bits, bitcount)
    pos = np.arange(bitcount)
    flat = ((bits[pos >> 6] >> (pos & 63).astype(np.uint64)) & np.uint64(1)
            ).astype(bool)
    brute = np.concatenate(([0], np.cumsum(flat)))[:-1]
    assert (r.rank(pos) == brute).all()
    assert (r.get(pos) == flat).all()


@settings(max_examples=15, deadline=None)
@given(st.integers(0, 5000), st.integers(0, 2**31 - 1), st.sampled_from([8, 16]))
def test_xorplus_never_false_negative_property(n, seed, fp_bits):
    rng = np.random.default_rng(seed)
    keys = np.unique(rng.integers(0, 1 << 62, size=n, dtype=np.uint64))
    f = XorFilterPlus.build(keys, fp_bits=fp_bits, seed=seed)
    if keys.size:
        assert f.contains_many(keys).all()
    g = XorFilterPlus.from_bytes(f.to_bytes())
    assert g.to_bytes() == f.to_bytes()


@settings(max_examples=15, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 2**40), st.integers(1, 50)),
                min_size=0, max_size=200),
       st.lists(st.tuples(st.integers(0, 2**40), st.integers(1, 50)),
                min_size=0, max_size=200))
def test_cqf_delete_never_negative_property(adds, dels):
    f = CountingQuotientFilter(q=16, r=30, seed=1)
    if adds:
        k = np.array([a[0] for a in adds], dtype=np.uint64)
        c = np.array([a[1] for a in adds], dtype=np.int64)
        f.add_many(k, c)
    if dels:
        k = np.array([d[0] for d in dels], dtype=np.uint64)
        c = np.array([d[1] for d in dels], dtype=np.int64)
        f.delete_many(k, c)
    assert f.total >= 0
    assert (f.counts > 0).all()  # zero-count entries are dropped, never negative
