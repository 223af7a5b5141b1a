"""Round-3 additions: GCS succinct offset list (space parity with
gcs.h's MultiStageMonotoneList target), blob back-compat, the CQF
enumeration surface, and the Shingle filter family (shingle.h)."""

import struct

import numpy as np
import pytest

from cuckoofilter_spark.kernels.cqf import CountingQuotientFilter
from cuckoofilter_spark.kernels.gcs import _FMT, GcsFilter
from cuckoofilter_spark.kernels.shingle import (
    MAX_LOAD, ShingleFilter, ShingleFullError)


def _rand_keys(n, seed):
    rng = np.random.default_rng(seed)
    return np.unique(rng.integers(0, 1 << 62, size=n, dtype=np.uint64))


# -- GCS succinct offsets --------------------------------------------------
def test_gcs_space_parity():
    """Serialized footprint must hit the reference's ~log2fpp + 2.5
    bits/key (gcs.h target); plain int64 offsets were log2fpp + ~5.5."""
    keys = _rand_keys(200_000, 3)
    for log2fpp in (8, 10, 13):
        f = GcsFilter.build(keys, log2fpp=log2fpp, seed=0x5EED)
        assert f.bits_per_item() <= log2fpp + 3.0, (log2fpp, f.bits_per_item())
        # and the blob itself is what bits_per_item accounts (plus header)
        assert abs(len(f.to_bytes()) - f.size_in_bytes()) < 64


def test_gcs_v2_roundtrip_and_v1_compat():
    keys = _rand_keys(50_000, 4)
    f = GcsFilter.build(keys, log2fpp=10, seed=0x5EED)
    g = GcsFilter.from_bytes(f.to_bytes())
    assert (g.offsets == f.offsets).all() and (g.bits == f.bits).all()
    assert g.contains_many(keys).all()
    # pre-succinct blobs (ver=1, plain int64 offsets) must still read
    hdr = struct.pack(_FMT, b"GCS1", 1, f.log2fpp, f.log2bucket, f.n,
                      f.bits.size, f.seed)
    v1 = hdr + f.offsets.astype("<i8").tobytes() + np.packbits(f.bits).tobytes()
    h = GcsFilter.from_bytes(v1)
    assert (h.offsets == f.offsets).all() and (h.bits == f.bits).all()


def test_gcs_empty_roundtrip():
    e = GcsFilter.build(np.array([], dtype=np.uint64))
    e2 = GcsFilter.from_bytes(e.to_bytes())
    assert e2.contains_many(_rand_keys(1000, 5)).sum() == 0


# -- Shingle filter (shingle.h overlapping-bucket cuckoo) ------------------
def test_shingle_no_false_negatives_and_fpr():
    keys = _rand_keys(120_000, 7)
    f = ShingleFilter.create(keys.size, slot_bits=12, seed=0x5EED)
    assert f.add_many(keys) == keys.size
    assert f.contains_many(keys).all()
    rng = np.random.default_rng(8)
    neg = rng.integers(1 << 62, 1 << 63, size=500_000, dtype=np.uint64)
    fpr = f.contains_many(neg).mean()
    assert fpr <= 1.5 * f.expected_fpp(), fpr


def test_shingle_full_load_and_refusal():
    """The structure must actually reach the 12/12.75 (94.1%) load the
    reference claims (shingle.h:172), then refuse further adds."""
    f = ShingleFilter(14, 12, 0x5EED)  # m=16384
    cap = int(MAX_LOAD * 2 * f.m)
    keys = _rand_keys(cap + 9_999, 9)[:cap]
    assert f.add_many(keys) == cap
    assert abs(f.load_factor() - MAX_LOAD) < 1e-4
    assert f.contains_many(keys).all()
    assert f.bits_per_item() < 12.8
    with pytest.raises(ShingleFullError):
        f.add_many(np.array([1, 2, 3], dtype=np.uint64))


def test_shingle_delete_and_roundtrip():
    keys = _rand_keys(50_000, 10)
    f = ShingleFilter.create(keys.size, seed=0x5EED)
    f.add_many(keys)
    g = ShingleFilter.from_bytes(f.to_bytes())
    assert (g.tables == f.tables).all() and g.filled == f.filled
    half = keys[: keys.size // 2]
    assert f.delete_many(half).all()
    assert f.contains_many(keys[keys.size // 2:]).all()
    assert f.filled == keys.size - half.size


def test_shingle_build_deterministic_and_merge_commutative():
    keys = _rand_keys(40_000, 11)
    a = ShingleFilter.create(keys.size, seed=0x5EED)
    a.add_many(keys)
    b = ShingleFilter.create(keys.size, seed=0x5EED)
    b.add_many(keys)
    assert a.to_bytes() == b.to_bytes()  # same keys -> identical blobs
    log2m = a.log2m
    p1 = ShingleFilter(log2m, 12, 0x5EED)
    p1.add_many(keys[::2])
    p2 = ShingleFilter(log2m, 12, 0x5EED)
    p2.add_many(keys[1::2])
    m12 = ShingleFilter.merge(p1, p2)
    m21 = ShingleFilter.merge(p2, p1)
    assert m12.to_bytes() == m21.to_bytes()  # content-canonical
    assert m12.contains_many(keys).all()
    with pytest.raises(ValueError):
        ShingleFilter.merge(p1, ShingleFilter(log2m, 12, 99))


def test_shingle_sharded_build_spark(spark):
    from pyspark.sql import functions as F

    from cuckoofilter_spark.sketch.membership import (
        shingle_build, shingle_contains_col)

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet") \
        .where(F.col("l_partkey") < 800)
    filt = shingle_build(li, "l_partkey", capacity=800, slot_bits=16,
                         seed=0x5EED, num_shards=4)
    part = spark.read.parquet("/root/testdata/sf0.001/part.parquet")
    got = {r[0] for r in part.where(
        shingle_contains_col(spark, filt, "p_partkey"))
        .select("p_partkey").collect()}
    want = {r[0] for r in li.select("l_partkey").distinct().collect()
            if r[0] is not None}
    present = {r[0] for r in part.select("p_partkey").collect()}
    assert got == (want & present)  # zero FP at 15-bit fp on this keyspace
    # delete maintenance across shards
    some = np.array(sorted(want)[:100], dtype=np.uint64)
    assert filt.delete_u64(some).all()
    got2 = {r[0] for r in part.where(
        shingle_contains_col(spark, filt, "p_partkey"))
        .select("p_partkey").collect()}
    assert got2 == ((want - set(some.tolist())) & present)


# -- canonical sequence-table reader ----------------------------------------
def test_read_sequences_parquet_and_projection(spark, tmp_path):
    from cuckoofilter_spark.sources.catalog import read_sequences
    from cuckoofilter_spark.sources.tokens import tokens_table

    p = str(tmp_path / "seq.parquet")
    tokens_table(spark, 200, seed=42).write.parquet(p)
    df = read_sequences(spark, p)
    assert df.columns == ["doc_id", "tokens", "n_tok", "source"]
    assert df.count() == 200
    # projection reaches the scan (column pruning at the source)
    narrow = read_sequences(spark, p, columns=("n_tok",))
    plan = narrow._jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema: struct<n_tok:int>" in plan, plan
    with pytest.raises(ValueError):
        read_sequences(spark, p, columns=("nope",))


def test_read_sequences_iceberg_gate(spark):
    from cuckoofilter_spark.sources.catalog import read_sequences

    with pytest.raises(RuntimeError, match="[Ii]ceberg"):
        read_sequences(spark, "catalog.db.sequences")


# -- CQF enumeration (gqf.h:243-291 qf_iterator surface) -------------------
def test_cqf_items_enumeration():
    f = CountingQuotientFilter(q=20, r=28, seed=0x5EED)
    keys = np.array([1, 2, 2, 3, 3, 3, 4, 4, 4, 4], dtype=np.uint64)
    f.add_many(keys)
    fps, counts = f.items()
    assert fps.size == 4
    assert (np.sort(counts) == np.array([1, 2, 3, 4])).all()
    assert (np.diff(fps.view(np.uint64)) > 0).all()  # sorted order
    # enumeration is lossless: rebuilding from items() is identity
    g = CountingQuotientFilter(q=20, r=28, seed=0x5EED)
    g._fold(fps, counts)
    assert (g.fingerprints == f.fingerprints).all()
    assert (g.counts == f.counts).all()
    # delete reflects in enumeration
    f.delete_many(np.array([4], dtype=np.uint64))
    _, counts2 = f.items()
    assert sorted(counts2.tolist()) == [1, 2, 3, 3]


def test_cqf_escaped_count_blob():
    """v2 blobs store counts as uint8 with a 0xFF escape to int64 (the
    slot-embedded small-count analogue, gqf.h:49-66); v1 plain-int64
    blobs must still read."""
    rng = np.random.default_rng(3)
    keys = rng.integers(0, 1 << 50, size=50_000, dtype=np.uint64)
    counts = np.where(rng.random(50_000) < 0.01,
                      rng.integers(255, 100_000, 50_000),
                      rng.integers(1, 254, 50_000)).astype(np.int64)
    f = CountingQuotientFilter(q=20, r=28, seed=1)
    f.add_many(keys, counts)
    g = CountingQuotientFilter.from_bytes(f.to_bytes())
    assert (g.fingerprints == f.fingerprints).all()
    assert (g.counts == f.counts).all() and g.total == f.total
    # boundary: 254 packs, 255 escapes
    f2 = CountingQuotientFilter(q=10, r=20, seed=1)
    f2.add_many(np.array([1, 2, 3], dtype=np.uint64),
                np.array([254, 255, 300], dtype=np.int64))
    g2 = CountingQuotientFilter.from_bytes(f2.to_bytes())
    assert sorted(g2.counts.tolist()) == [254, 255, 300]
    # v1 compat
    from cuckoofilter_spark.kernels.cqf import _FMT as CFMT, _MAGIC as CMAGIC
    hdr = struct.pack(CFMT, CMAGIC, 1, f.q, f.r, f.seed,
                      f.fingerprints.size, f.total)
    v1 = (hdr + f.fingerprints.astype("<u8").tobytes()
          + f.counts.astype("<i8").tobytes())
    h = CountingQuotientFilter.from_bytes(v1)
    assert (h.counts == f.counts).all()
    # serialized footprint beats plain int64 counts
    assert len(f.to_bytes()) < len(v1)
