"""Round-4 code-review regressions: tree-merge balance keying, NULL
text/keys, signed-mod sampling, component seeding, minhash byte
budget, LSH radius."""

import numpy as np
import pytest
from pyspark.sql import functions as F


def _hll_agg(df, fanout):
    from cuckoofilter_spark.kernels.hll import HyperLogLog
    from cuckoofilter_spark.sketch.udaf import aggregate_sketch

    return aggregate_sketch(
        df, "k",
        make=lambda: HyperLogLog(p=14, seed=7),
        update=lambda k, s: k.add_many(
            s.to_numpy("int64").view("uint64")),
        merge=HyperLogLog.merge,
        from_bytes=HyperLogLog.from_bytes, fanout=fanout)


def test_tree_merge_balanced_and_exact(spark):
    """The tree merge must produce the flat-merge blob at ANY
    partition count — including the even-groups shapes where the old
    monotonically_increasing_id keying collapsed every blob into ONE
    pmod bucket (pmod(p << 33, even) == 0 for all p)."""
    df = spark.range(0, 120000).select(F.col("id").alias("k"))
    flat = _hll_agg(df.coalesce(1), 64)
    for parts, fanout in ((32, 16), (33, 4), (18, 2)):
        tree = _hll_agg(df.repartition(parts), fanout)
        assert tree.to_bytes() == flat.to_bytes(), (parts, fanout)


def test_aggregate_sketch_ignores_null_keys(spark):
    """NULL scalar keys and NULL array ELEMENTS contribute nothing —
    no garbage INT64_MIN keys from NaN casts, no misleading float64
    type error for an integer column that merely has NULLs."""
    from cuckoofilter_spark.sketch.aggregates import hll_sketch

    base = spark.range(0, 5000).select(F.col("id").alias("k"))
    with_nulls = base.unionAll(spark.sql("SELECT CAST(NULL AS LONG) AS k"))
    a = hll_sketch(base, "k")
    b = hll_sketch(with_nulls, "k")
    assert a.to_bytes() == b.to_bytes()

    arr = spark.range(0, 1000).select(
        F.array(F.col("id"), F.col("id") + 100000).alias("k"))
    arr_nulls = spark.range(0, 1000).select(
        F.array(F.col("id"), F.lit(None).cast("long"),
                F.col("id") + 100000).alias("k"))
    assert hll_sketch(arr, "k").to_bytes() == \
        hll_sketch(arr_nulls, "k").to_bytes()


def test_deterministic_sample_negative_keys(spark):
    """pmod thresholding: pct=0 keeps NOTHING and pct=100 keeps all,
    for negative keys too (signed % admitted ~every negative key at
    any pct — xxhash64-keyified columns are ~half negative)."""
    from cuckoofilter_spark.ops.dataflow import deterministic_sample

    df = spark.range(0, 4000).select(
        (F.xxhash64("id")).alias("k"))  # ~half negative
    n_neg = df.where("k < 0").count()
    assert n_neg > 1000
    assert deterministic_sample(df, "k", 0).count() == 0
    assert deterministic_sample(df, "k", 100).count() == 4000
    half = deterministic_sample(df, "k", 50).count()
    assert 0.35 * 4000 < half < 0.65 * 4000


def test_simhash_null_text(spark):
    """A NULL text row is an empty doc (signature 0), not a pandas-UDF
    crash."""
    from cuckoofilter_spark.ops.dedup import simhash_signatures

    df = spark.createDataFrame(
        [("a", "the quick brown fox"), ("b", None), ("c", "")],
        "doc string, text string")
    rows = {r["doc"]: r["simhash"] for r in
            simhash_signatures(df, "doc", "text").collect()}
    assert set(rows) == {"a", "b", "c"}
    assert rows["b"] == rows["c"]


def test_connected_components_covers_pair_endpoints(spark):
    """An endpoint absent from ids must still resolve to the true
    component minimum (the old inner-join fixpoint test couldn't see
    vertices that first appear mid-round and stopped early)."""
    from cuckoofilter_spark.ops.dedup import connected_components

    ids = spark.createDataFrame([(2,), (3,)], "doc long")
    pairs = spark.createDataFrame([(1, 2), (1, 3)],
                                  "doc_a long, doc_b long")
    got = {r["doc_id"]: r["cluster_id"] for r in
           connected_components(pairs, ids).collect()}
    assert got == {1: 1, 2: 1, 3: 1}


def test_minhash_huge_doc_subchunked(spark):
    """A single doc over the 32k-shingle chunk cap must produce the
    same signature the whole-matrix arithmetic gives (sub-chunked
    minima, bounded worker memory)."""
    from cuckoofilter_spark.ops.dedup import (_MERSENNE, _minhash_params,
                                              minhash_signatures)

    big = " ".join(f"w{i}" for i in range(40000))
    df = spark.createDataFrame([("big", big)], "doc string, text string")
    row = minhash_signatures(df, "doc", "text", num_hashes=16,
                             window=3).collect()[0]
    sig = row["sig"]
    assert len(sig) == 16
    # whole-matrix oracle over the op's own shingle hashes
    a, b = _minhash_params(16, 0x5EED)
    x = (np.asarray(row["shingle_hashes"], dtype=np.int64)
         .view(np.uint64) % np.uint64(_MERSENNE))
    assert x.size > (1 << 15)  # actually exercises the sub-chunk path
    exp = ((a[:, None] * x[None, :] + b[:, None])
           % np.uint64(_MERSENNE)).min(axis=1)
    assert list(exp.astype(np.int64)) == list(sig)


def test_lsh_topk_radius_above_two(spark):
    """max_hamming=3 must actually widen the candidate ball (it was
    silently capped at 2)."""
    from cuckoofilter_spark.ops.similarity import lsh_topk

    rng = np.random.default_rng(9)
    emb = spark.createDataFrame(
        [(int(i), [float(x) for x in rng.normal(size=8)])
         for i in range(300)], "vec_id long, embedding array<double>")
    q = spark.createDataFrame(
        [(0, [float(x) for x in rng.normal(size=8)])],
        "q_id long, q_vec array<double>")
    n2 = lsh_topk(spark, emb, q, k=300, nbits=10, max_hamming=2).count()
    n3 = lsh_topk(spark, emb, q, k=300, nbits=10, max_hamming=3).count()
    assert n3 >= n2


def test_minhash_bands_must_divide(spark):
    from cuckoofilter_spark.ops.dedup import minhash_lsh_pairs

    df = spark.createDataFrame([("a", "x y z")], "doc string, text string")
    with pytest.raises(ValueError, match="divide"):
        minhash_lsh_pairs(df, "doc", "text", num_hashes=64, bands=12)
