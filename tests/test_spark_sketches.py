"""Spark-layer integration tests: distributed builds vs exact oracles.

Every distributed sketch is checked against the exact Spark/numpy
answer on the same data — the same oracle discipline the driver's
CORRECTNESS gate applies via DuckDB.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from cuckoofilter_spark.kernels.hashing import splitmix64_seq
from cuckoofilter_spark.sketch.aggregates import (
    bloom_contains_col,
    bloom_sketch,
    cms_lookup_col,
    cms_sketch,
    hll_sketch,
    kll_sketch,
)
from cuckoofilter_spark.sketch.membership import (
    approx_anti_join,
    approx_semi_join,
    cuckoo_build,
    cuckoo_contains_col,
)
from cuckoofilter_spark.sources.tokens import tokens_table


@pytest.fixture(scope="module")
def toks(spark):
    df = tokens_table(spark, num_docs=2000, seed=42, vocab_size=5000, partitions=8)
    df.cache().count()
    return df


def test_tokens_table_deterministic(spark):
    a = tokens_table(spark, 50, seed=42, vocab_size=100, partitions=2).orderBy("doc_id").collect()
    b = tokens_table(spark, 50, seed=42, vocab_size=100, partitions=5).orderBy("doc_id").collect()
    assert [r["tokens"] for r in a] == [r["tokens"] for r in b]  # per-row token-array equality
    assert a[0]["doc_id"] == "doc000000000000"
    assert all(r["n_tok"] == len(r["tokens"]) for r in a)


def test_cuckoo_build_and_probe_lineitem(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    filt = cuckoo_build(li, "l_partkey", bits=16, seed=7, num_shards=8)
    true_keys = {r[0] for r in li.select("l_partkey").distinct().collect()}
    assert filt.num_items() == len(true_keys)
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    got = part.withColumn("hit", cuckoo_contains_col(spark, filt, "p_partkey"))
    rows = got.select("p_partkey", "hit").collect()
    # no false negatives, FPs bounded
    fn = [r for r in rows if r["p_partkey"] in true_keys and not r["hit"]]
    assert not fn
    fp = [r for r in rows if r["p_partkey"] not in true_keys and r["hit"]]
    assert len(fp) <= max(2, filt.expected_fpp() * len(rows) * 5)


def test_cuckoo_tokens_membership(spark, toks):
    filt = cuckoo_build(
        toks.select(F.explode("tokens").alias("t")), "t",
        capacity=5000, bits=12, seed=3, num_shards=4)
    # every distinct token must be found (vocab 5000, all present at 2000 docs)
    probe = spark.range(5000).withColumn(
        "hit", cuckoo_contains_col(spark, filt, "id"))
    present = {r[0] for r in toks.select(F.explode("tokens")).distinct().collect()}
    miss = probe.where(~F.col("hit")).select("id").collect()
    assert all(r["id"] not in present for r in miss)
    # absent range: FP rate within bound (deterministic seed; generous 5x slack)
    absent = spark.range(1_000_000, 1_100_000).withColumn(
        "hit", cuckoo_contains_col(spark, filt, "id"))
    fpr = absent.where("hit").count() / 100_000
    assert fpr <= 5 * filt.expected_fpp()


def test_semi_and_anti_join(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    small = li.where("l_partkey < 100")
    filt = cuckoo_build(small, "l_partkey", bits=16, seed=11, num_shards=4)
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    semi = approx_semi_join(spark, part, "p_partkey", filt)
    anti = approx_anti_join(spark, part, "p_partkey", filt)
    true_set = {r[0] for r in small.select("l_partkey").distinct().collect()}
    semi_keys = {r["p_partkey"] for r in semi.collect()}
    anti_keys = {r["p_partkey"] for r in anti.collect()}
    assert true_set <= semi_keys            # no false negatives
    assert not (true_set & anti_keys)       # anti never returns members
    assert semi_keys.isdisjoint(anti_keys)
    assert len(semi_keys) + len(anti_keys) == part.count()


def test_hll_vs_exact(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    sk = hll_sketch(orders, "o_custkey", p=14, seed=5)
    exact = orders.select(F.countDistinct("o_custkey")).first()[0]
    assert abs(sk.estimate() - exact) / exact <= 3 * sk.rel_error()


def test_hll_on_token_arrays(spark, toks):
    sk = hll_sketch(toks, "tokens", p=14, seed=5)
    exact = toks.select(F.explode("tokens").alias("t")).select(
        F.countDistinct("t")).first()[0]
    assert abs(sk.estimate() - exact) / exact <= 3 * sk.rel_error()


def test_cms_vs_exact(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    sk = cms_sketch(li, "l_partkey", eps=0.001, delta=0.01, seed=5)
    exact = dict(li.groupBy("l_partkey").count().collect())
    keys = np.array(sorted(exact), dtype=np.int64)
    est = sk.query_many(keys.view(np.uint64))
    true = np.array([exact[int(k)] for k in keys])
    assert (est >= true).all()
    assert (est - true).max() <= sk.eps * sk.total
    assert sk.total == li.count()


def test_cms_lookup_col(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    sk = cms_sketch(li, "l_suppkey", eps=0.001, delta=0.01, seed=5)
    got = (li.groupBy("l_suppkey").count()
           .withColumn("est", cms_lookup_col(spark, sk, "l_suppkey")))
    bad = got.where(F.col("est") < F.col("count")).count()
    assert bad == 0


def test_kll_vs_exact(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    sk = kll_sketch(li, "l_extendedprice", k=200, seed=5)
    n = li.count()
    assert sk.n == n
    for q in (0.1, 0.5, 0.9):
        v = float(sk.quantile(q)[0])
        true_rank = li.where(F.col("l_extendedprice") <= v).count() / n
        assert abs(true_rank - q) <= sk.eps


def test_kll_on_n_tok(spark, toks):
    sk = kll_sketch(toks, "n_tok", k=200, seed=5)
    n = toks.count()
    med = float(sk.quantile(0.5)[0])
    true_rank = toks.where(F.col("n_tok") <= med).count() / n
    assert abs(true_rank - 0.5) <= sk.eps


def test_bloom_spark_build(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    sk = bloom_sketch(li, "l_partkey", capacity=2000, bits_per_item=12, seed=5)
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    present = {r[0] for r in li.select("l_partkey").distinct().collect()}
    rows = part.withColumn("hit", bloom_contains_col(spark, sk, "p_partkey")).collect()
    assert all(r["hit"] for r in rows if r["p_partkey"] in present)


def test_distributed_equals_single_node(spark):
    """Partial+merge over 8 partitions == one-shot kernel build (HLL/CMS bit-exact)."""
    from cuckoofilter_spark.kernels.cms import CountMinSketch
    from cuckoofilter_spark.kernels.hll import HyperLogLog

    keys = splitmix64_seq(0, 20_000).view(np.int64)
    df = spark.createDataFrame([(int(k),) for k in keys], "k long").repartition(8)
    hs = hll_sketch(df, "k", p=12, seed=9)
    href = HyperLogLog(p=12, seed=9)
    href.add_many(keys.view(np.uint64))
    assert np.array_equal(hs.registers, href.registers)
    cs = cms_sketch(df, "k", eps=0.01, delta=0.01, seed=9)
    cref = CountMinSketch.create(eps=0.01, delta=0.01, seed=9)
    cref.add_many(keys.view(np.uint64))
    assert np.array_equal(cs.table, cref.table)


def test_gcs_distributed_build_matches_kernel(spark):
    """Distributed sort-encode build must be bit-identical to the
    single-node kernel build over the same key set."""
    import numpy as np
    from pyspark.sql import functions as F

    from cuckoofilter_spark.kernels.gcs import GcsFilter
    from cuckoofilter_spark.sketch.gcsfilter import gcs_build

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    f = gcs_build(li, "l_partkey", log2fpp=10, seed=17, buckets_per_group=8)
    keys = np.array(sorted(
        r["k"] for r in li.select(F.col("l_partkey").alias("k")).distinct().collect()),
        dtype=np.int64).view(np.uint64)
    g = GcsFilter.build(keys, log2fpp=10, seed=17)
    assert f.to_bytes() == g.to_bytes()
    assert f.contains_many(keys).all()
    neg = np.setdiff1d(np.arange(10**7, 10**7 + 50_000, dtype=np.uint64), keys)
    fpp = f.contains_many(neg).mean()
    assert fpp <= 3 * f.expected_fpp()
