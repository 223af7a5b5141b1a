"""Driver contract for the spark-graft builder (PySpark target).

One ``queries()`` entry per implemented operator family from
SURVEY.md §2, each paired with the DuckDB oracle in ``oracle_sql()``.
Sketch queries return deterministic, oracle-matchable facts (membership
survivors, exact values + within-published-bound flags computed
Spark-side); the statistical assertions behind the flags live in
tests/ where the full distributions are checked.
"""

from __future__ import annotations

import os
import pathlib
import sys
from collections.abc import Callable

_REPO = str(pathlib.Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
# Executors must import cuckoofilter_spark even when the driver's session
# was built elsewhere (local-mode stand-in for spark-submit --py-files).
_pp = os.environ.get("PYTHONPATH", "")
if _REPO not in _pp.split(os.pathsep):
    os.environ["PYTHONPATH"] = _REPO + (os.pathsep + _pp if _pp else "")

from pyspark.sql import DataFrame, SparkSession, functions as F  # noqa: E402

SEED = 0x5EED

_PKG_READY: set[int] = set()


def _ensure_pkg(spark: SparkSession) -> None:
    """Make ``cuckoofilter_spark`` importable on executors for ANY session.

    The PYTHONPATH export above only helps workers forked after this
    module was imported; a driver that built its SparkSession first
    (the realistic harness shape) needs the package shipped at runtime —
    ``addPyFile`` of a zip is exactly the ``spark-submit --py-files``
    mechanism, applied late."""
    sid = id(spark.sparkContext)
    if sid in _PKG_READY:
        return
    import tempfile

    sys.path.insert(0, str(pathlib.Path(_REPO) / "scripts"))
    from make_pyfiles_zip import main as make_zip

    zip_path = os.path.join(tempfile.gettempdir(), "cuckoofilter_spark_pyfiles.zip")
    src_mtime = max(q.stat().st_mtime for q in
                    (pathlib.Path(_REPO) / "cuckoofilter_spark").rglob("*.py"))
    if not os.path.exists(zip_path) or os.path.getmtime(zip_path) < src_mtime:
        make_zip(zip_path, quiet=True)
    spark.sparkContext.addPyFile(zip_path)
    _PKG_READY.add(sid)


def _with_pkg(fn):
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        _ensure_pkg(spark)
        return fn(spark, sf_dir)

    wrapped.__name__ = fn.__name__
    wrapped.__doc__ = fn.__doc__
    return wrapped


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --------------------------------------------------------------------------
# membership (cuckoo / bloom)
# --------------------------------------------------------------------------
def q_cf_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cuckoo-filter semi-join: which part keys are members of the
    l_partkey<1000 set. 16-bit tags; zero FP on this keyspace verified
    for SEED (deterministic). SURVEY §2.1 #3/#5."""
    from cuckoofilter_spark.sketch.membership import cuckoo_build, cuckoo_contains_col

    li = _t(spark, sf_dir, "lineitem").where(F.col("l_partkey") < 1000)
    filt = cuckoo_build(li, "l_partkey", bits=16, seed=SEED, num_shards=8)
    part = _t(spark, sf_dir, "part")
    return (part.withColumn("hit", cuckoo_contains_col(spark, filt, "p_partkey"))
            .where("hit").select(F.col("p_partkey").alias("member_key")))


def q_cf_delete_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete semantics (cuckoofilter.h:206-238): build over
    l_partkey<1000, delete the <500 subset, probe part — survivors are
    exactly [500,1000) members. Anti-join maintenance; zero FP/FN on
    this keyspace verified for SEED at 16-bit tags."""
    from cuckoofilter_spark.sketch.membership import (
        cuckoo_build, cuckoo_contains_col, cuckoo_delete)

    li = _t(spark, sf_dir, "lineitem").where(F.col("l_partkey") < 1000)
    filt = cuckoo_build(li, "l_partkey", bits=16, seed=SEED, num_shards=8)
    cuckoo_delete(filt, li.where(F.col("l_partkey") < 500), "l_partkey")
    part = _t(spark, sf_dir, "part")
    return (part.withColumn("hit", cuckoo_contains_col(spark, filt, "p_partkey"))
            .where("hit").select(F.col("p_partkey").alias("member_key")))


def q_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom semi-join over l_suppkey with present+absent probes.
    bloom.h semantics; bits sized so FP=0 on this keyspace (verified
    deterministic for SEED)."""
    from cuckoofilter_spark.sketch.aggregates import bloom_contains_col, bloom_sketch

    li = _t(spark, sf_dir, "lineitem")
    cap = li.agg(F.approx_count_distinct("l_suppkey")).first()[0]
    filt = bloom_sketch(li, "l_suppkey", capacity=int(cap * 1.5) + 64,
                        bits_per_item=16, seed=SEED)
    sup = _t(spark, sf_dir, "supplier")
    probes = (sup.select(F.col("s_suppkey").alias("probe"))
              .unionAll(sup.select((F.col("s_suppkey") + 100).alias("probe"))))
    return (probes.withColumn("hit", bloom_contains_col(spark, filt, "probe"))
            .where("hit").select(F.col("probe").alias("member_key")))


def q_blocked_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked-Bloom (simd-block.h 256-bit buckets) semi-join over
    l_suppkey; sized so FP=0 on this keyspace (verified for SEED)."""
    from cuckoofilter_spark.sketch.aggregates import (
        blocked_bloom_contains_col, blocked_bloom_sketch)

    li = _t(spark, sf_dir, "lineitem")
    cap = li.agg(F.approx_count_distinct("l_suppkey")).first()[0]
    filt = blocked_bloom_sketch(li, "l_suppkey", capacity=int(cap * 4) + 64, seed=SEED)
    sup = _t(spark, sf_dir, "supplier")
    probes = (sup.select(F.col("s_suppkey").alias("probe"))
              .unionAll(sup.select((F.col("s_suppkey") + 100).alias("probe"))))
    return (probes.withColumn("hit", blocked_bloom_contains_col(spark, filt, "probe"))
            .where("hit").select(F.col("probe").alias("member_key")))


def q_gcs_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Golomb-coded-sequence filter (gcs.h) semi-join, built via the
    distributed sort-encode plan; log2fpp=16 so FP=0 on this keyspace
    (verified for SEED)."""
    from cuckoofilter_spark.sketch.gcsfilter import gcs_build, gcs_contains_col

    li = _t(spark, sf_dir, "lineitem").where(F.col("l_partkey") < 1000)
    filt = gcs_build(li, "l_partkey", log2fpp=16, seed=SEED)
    part = _t(spark, sf_dir, "part")
    return (part.withColumn("hit", gcs_contains_col(spark, filt, "p_partkey"))
            .where("hit").select(F.col("p_partkey").alias("member_key")))


def q_cf_prefilter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Contain-as-semi-join-prefilter pattern (SURVEY §2.6): filter
    orders by an approximate customer-key filter FIRST (drops the bulk
    with no false negatives), then restore exactness with a real join on
    the survivors. Result equals the plain exact join regardless of the
    filter's epsilon — the production use of the reference's Contain."""
    from cuckoofilter_spark.sketch.membership import approx_semi_join, cuckoo_build

    cust = _t(spark, sf_dir, "customer").where(F.col("c_custkey") % 10 == 0)
    orders = _t(spark, sf_dir, "orders")
    filt = cuckoo_build(cust, "c_custkey", bits=12, seed=SEED, num_shards=8)
    survivors = approx_semi_join(spark, orders, "o_custkey", filt)
    exact = survivors.join(
        F.broadcast(cust.select(F.col("c_custkey").alias("o_custkey"))), "o_custkey")
    return (exact.groupBy("o_custkey").agg(F.count("*").alias("n_orders"),
                                           F.round(F.sum("o_totalprice"), 4)
                                           .alias("total_price")))


def q_cf_mixed_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's mixed-ratio lookup protocol (50% stratum of
    bulk-insert-and-query.cc:615-618): deterministic probe composition,
    counts by ground-truth label and filter answer."""
    from cuckoofilter_spark.ops.dataflow import mix_in
    from cuckoofilter_spark.sketch.membership import cuckoo_build, cuckoo_contains_col

    li = _t(spark, sf_dir, "lineitem")
    filt = cuckoo_build(li, "l_partkey", bits=16, seed=SEED, num_shards=8)
    part = _t(spark, sf_dir, "part")
    negatives = part.selectExpr("p_partkey + 10000000 AS k")
    probes = mix_in(li.selectExpr("l_partkey AS k"), negatives, "k", 50)
    return (probes.withColumn("hit", cuckoo_contains_col(spark, filt, "probe"))
            .groupBy("expected_hit", "hit").agg(F.count("*").alias("cnt")))


def q_xor_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Static xor-filter semi-join (xorfilter.h AddAll/Contain):
    distributed dedupe -> driver peel -> broadcast probe. 16-bit
    fingerprints; zero FP on this keyspace verified for SEED."""
    from cuckoofilter_spark.sketch.membership import xor_build, xor_contains_col

    li = _t(spark, sf_dir, "lineitem").where(F.col("l_partkey") < 1000)
    filt = xor_build(li, "l_partkey", fp_bits=16, seed=SEED)
    part = _t(spark, sf_dir, "part")
    return (part.withColumn("hit", xor_contains_col(spark, filt, "p_partkey"))
            .where("hit").select(F.col("p_partkey").alias("member_key")))


def q_cf_stable_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stable-sizing cuckoo variant (cuckoofilter_stable.h): non-2^n
    bucket count via Lemire reduce, ~12.8 bits/item at 0.94 load instead
    of up-to-2x pow2 rounding waste. Zero FP on this keyspace for SEED."""
    from cuckoofilter_spark.sketch.membership import cuckoo_build, cuckoo_contains_col

    li = _t(spark, sf_dir, "lineitem").where(F.col("l_partkey") < 1000)
    filt = cuckoo_build(li, "l_partkey", bits=16, seed=SEED, num_shards=8,
                        stable=True)
    part = _t(spark, sf_dir, "part")
    return (part.withColumn("hit", cuckoo_contains_col(spark, filt, "p_partkey"))
            .where("hit").select(F.col("p_partkey").alias("member_key")))


def q_cf_semisort_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-sorted (PackedTable, bits=13) cuckoo membership: PermEncoding
    codeword blobs (packedtable.h/permencoding.h), ~12.6 bits/item at
    full load vs 16 unpacked. Zero FP on this keyspace for SEED."""
    from cuckoofilter_spark.sketch.membership import cuckoo_build, cuckoo_contains_col

    li = _t(spark, sf_dir, "lineitem").where(F.col("l_suppkey") < 100)
    filt = cuckoo_build(li, "l_suppkey", bits=13, seed=SEED, num_shards=8,
                        mode="semisort")
    sup = _t(spark, sf_dir, "supplier")
    return (sup.withColumn("hit", cuckoo_contains_col(spark, filt, "s_suppkey"))
            .where("hit").select(F.col("s_suppkey").alias("member_key")))


def q_cf_checkpoint_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checkpointed build (stage-1 partials + lineage manifest) — result
    must equal the direct build; resume semantics tested in tests/."""
    import shutil
    import tempfile

    from cuckoofilter_spark.plans.checkpoint import cuckoo_build_checkpointed
    from cuckoofilter_spark.sketch.membership import cuckoo_contains_col

    li = _t(spark, sf_dir, "lineitem").where(F.col("l_partkey") < 1000)
    ckpt = tempfile.mkdtemp(prefix="cfckpt_")
    try:
        filt = cuckoo_build_checkpointed(
            spark, li, "l_partkey", ckpt, capacity=1200, bits=16, seed=SEED,
            num_shards=8)
        part = _t(spark, sf_dir, "part")
        # the probe depends only on the broadcast blobs (driver-held), so
        # the checkpoint dir can be cleaned before lazy evaluation
        return (part.withColumn("hit", cuckoo_contains_col(spark, filt, "p_partkey"))
                .where("hit").select(F.col("p_partkey").alias("member_key")))
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)


# --------------------------------------------------------------------------
# cardinality / frequency / quantiles
# --------------------------------------------------------------------------
def q_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL distinct customers: exact value + estimate-within-1.04/sqrt(m)
    bound flag (3 sigma), both computed Spark-side."""
    from cuckoofilter_spark.sketch.aggregates import hll_sketch

    orders = _t(spark, sf_dir, "orders")
    sk = hll_sketch(orders, "o_custkey", p=14, seed=SEED)
    return orders.agg(F.countDistinct("o_custkey").alias("exact_distinct")).withColumn(
        "hll_within_bound",
        (F.abs(F.lit(float(sk.estimate())) - F.col("exact_distinct"))
         <= F.lit(3 * sk.rel_error()) * F.col("exact_distinct")))


def q_cms_topk_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 part keys by exact frequency, with the CMS point estimate
    asserted within [exact, exact + eps*N] (gqf counting capability)."""
    from cuckoofilter_spark.sketch.aggregates import cms_lookup_col, cms_sketch

    li = _t(spark, sf_dir, "lineitem")
    sk = cms_sketch(li, "l_partkey", eps=0.0005, delta=0.01, seed=SEED)
    bound = int(sk.eps * sk.total)
    # orderBy+limit compiles to TakeOrderedAndProject (distributed
    # per-partition top-k + driver merge) — no single-partition window
    top = (li.groupBy("l_partkey").agg(F.count("*").alias("freq"))
           .orderBy(F.desc("freq"), F.asc("l_partkey")).limit(20))
    return (top.withColumn("est", cms_lookup_col(spark, sk, "l_partkey"))
            .select("l_partkey", "freq",
                    ((F.col("est") >= F.col("freq"))
                     & (F.col("est") <= F.col("freq") + bound)).alias("cms_within_bound")))


def q_cqf_topk_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CQF point counts (gqf.h qf_count_key_value): top-20 part keys with
    the CQF count equal to the exact frequency (48-bit fingerprints ->
    no collisions on this keyspace, verified for SEED). Unlike CMS this
    is the reference's lossless counting capability."""
    from cuckoofilter_spark.sketch.aggregates import cqf_count_col, cqf_sketch

    li = _t(spark, sf_dir, "lineitem")
    sk = cqf_sketch(li, "l_partkey", q=20, r=28, seed=SEED)
    top = (li.groupBy("l_partkey").agg(F.count("*").alias("freq"))
           .orderBy(F.desc("freq"), F.asc("l_partkey")).limit(20))
    return (top.withColumn("cqf_count", cqf_count_col(spark, sk, "l_partkey"))
            .select("l_partkey", "freq",
                    (F.col("cqf_count") == F.col("freq")).alias("cqf_exact")))


def q_kll_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KLL quantiles of l_quantity: per-target rank error <= eps,
    rank measured exactly Spark-side."""
    from cuckoofilter_spark.sketch.aggregates import kll_sketch

    li = _t(spark, sf_dir, "lineitem")
    sk = kll_sketch(li, "l_quantity", k=200, seed=SEED)
    qs = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]
    est = {q: float(sk.quantile(q)[0]) for q in qs}
    # all 14 exact ranks in ONE aggregation pass (a driver-side loop of
    # .count() jobs would scan lineitem 14 times)
    aggs = [F.count("*").alias("n")]
    for i, q in enumerate(qs):
        c = F.col("l_quantity")
        aggs.append(F.sum((c <= est[q]).cast("long")).alias(f"le{i}"))
        aggs.append(F.sum((c < est[q]).cast("long")).alias(f"lt{i}"))
    r = li.agg(*aggs).first()
    rows = []
    for i, q in enumerate(qs):
        true_rank = r[f"le{i}"] / r["n"]
        lo_rank = r[f"lt{i}"] / r["n"]
        # standard KLL guarantee: some value within eps of target rank
        ok = (true_rank >= q - sk.eps) and (lo_rank <= q + sk.eps)
        rows.append((q, bool(ok)))
    return spark.createDataFrame(rows, "q double, kll_within_bound boolean")


def q_tdigest_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-digest quantiles of l_extendedprice (tail-accurate; companion to
    KLL per the north rule): per-target rank error <= bound, rank
    measured exactly in ONE aggregation pass."""
    from cuckoofilter_spark.sketch.aggregates import tdigest_sketch

    li = _t(spark, sf_dir, "lineitem")
    sk = tdigest_sketch(li, "l_extendedprice", delta=200.0)
    qs = [0.01, 0.1, 0.5, 0.9, 0.99, 0.999]
    est = {q: float(sk.quantile(q)[0]) for q in qs}
    aggs = [F.count("*").alias("n")]
    for i, q in enumerate(qs):
        c = F.col("l_extendedprice")
        aggs.append(F.sum((c <= est[q]).cast("long")).alias(f"le{i}"))
        aggs.append(F.sum((c < est[q]).cast("long")).alias(f"lt{i}"))
    r = li.agg(*aggs).first()
    rows = []
    for i, q in enumerate(qs):
        hi = r[f"le{i}"] / r["n"]
        lo = r[f"lt{i}"] / r["n"]
        bound = max(sk.rel_rank_error(q), 0.005)
        ok = (hi >= q - bound) and (lo <= q + bound)
        rows.append((q, bool(ok)))
    return spark.createDataFrame(rows, "q double, tdigest_within_bound boolean")


# --------------------------------------------------------------------------
# reference-harness dataflow ops (SURVEY §2.5)
# --------------------------------------------------------------------------
def q_match_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cuckoofilter_spark.ops.dataflow import match_size

    li = _t(spark, sf_dir, "lineitem").where(F.col("l_quantity") > 25)
    part = _t(spark, sf_dir, "part").where(F.col("p_size") > 25)
    return match_size(li, "l_partkey", part, "p_partkey")


def q_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cuckoofilter_spark.ops.dataflow import count_distinct_exact

    return count_distinct_exact(_t(spark, sf_dir, "events"), "user_id")


def q_has_duplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cuckoofilter_spark.ops.dataflow import has_duplicates

    return has_duplicates(_t(spark, sf_dir, "orders"), "o_custkey")


def q_mixin_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic probe-set composition at the 25% stratum."""
    from cuckoofilter_spark.ops.dataflow import mix_in

    li = _t(spark, sf_dir, "lineitem").selectExpr("l_partkey AS k")
    neg = _t(spark, sf_dir, "part").selectExpr("p_partkey + 10000000 AS k")
    return mix_in(li, neg, "k", 25).groupBy("expected_hit").agg(
        F.count("*").alias("cnt"))


def q_windowed_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window event aggregation (1-hour windows): the batch
    form of the Structured Streaming windowed aggregate (F.window is the
    same operator readStream uses with a watermark). Per (window,
    event_type): count, distinct users, value sum."""
    ev = _t(spark, sf_dir, "events")
    return (ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count("*").alias("cnt"),
                 F.countDistinct("user_id").alias("users"),
                 F.round(F.sum("value"), 4).alias("value_sum"))
            .select(F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("win_start"),
                    "event_type", "cnt", "users", "value_sum"))


# --------------------------------------------------------------------------
# text analysis (training-pipeline ops)
# --------------------------------------------------------------------------
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cuckoofilter_spark.ops.text import text_stats

    return text_stats(_t(spark, sf_dir, "documents"), "doc_id", "text")


def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cuckoofilter_spark.ops.dedup import exact_dedup

    return exact_dedup(_t(spark, sf_dir, "documents"), "doc_id", "text")


def q_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram shingle Jaccard near-dup pairs at tau=0.8."""
    from cuckoofilter_spark.ops.dedup import jaccard_pairs_exact

    return jaccard_pairs_exact(_t(spark, sf_dir, "documents"),
                               "doc_id", "text", threshold=0.8)


def q_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidates + exact verification; must equal the exact
    Jaccard pairs at this tau when LSH recall is 1 (verified for SEED)."""
    from cuckoofilter_spark.ops.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(_t(spark, sf_dir, "documents"), "doc_id", "text",
                             threshold=0.8, num_hashes=64, bands=16, seed=SEED)


def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (hamming <= 3). Non-SQL-expressible
    (python-side bit voting) -> no oracle; rows-only check."""
    from cuckoofilter_spark.ops.dedup import simhash_pairs

    return simhash_pairs(_t(spark, sf_dir, "documents"), "doc_id", "text",
                         max_distance=3, seed=SEED)


# --------------------------------------------------------------------------
# similarity search
# --------------------------------------------------------------------------
def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force exact cosine top-5 for the first 10 vectors."""
    from cuckoofilter_spark.ops.similarity import cosine_topk_bruteforce

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    return cosine_topk_bruteforce(spark, emb, queries, k=5)


def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRP-LSH approximate top-5 (the ANN scale path: bucketed candidates
    + exact re-score). Approximate by nature -> no SQL oracle;
    recall vs brute force is asserted in tests on structured vectors."""
    from cuckoofilter_spark.ops.similarity import lsh_topk

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    return lsh_topk(spark, emb, queries, k=5, nbits=12, max_hamming=2, seed=SEED)


def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs at 0.95, LSH-blocked with exact
    verification — near-dups always collide in SRP buckets, so the
    survivor set equals the exact all-pairs answer."""
    from cuckoofilter_spark.ops.similarity import embedding_neardup_pairs

    emb = _t(spark, sf_dir, "embeddings")
    return embedding_neardup_pairs(emb, threshold=0.95, nbits=8, bands=4, seed=SEED)


def q_token_count_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token counting over documents (BPE-ish regex counting
    is the n_words path in text_stats): total + per-source stats."""
    from cuckoofilter_spark.ops.text import token_count

    d = _t(spark, sf_dir, "documents")
    return (d.groupBy("source")
            .agg(F.sum(token_count("text")).alias("total_tokens"),
                 F.count("*").alias("docs"))
            .withColumn("avg_tokens", F.round(F.col("total_tokens") / F.col("docs"), 6)))


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media columns: deterministic fake container decode +
    feature extraction over mapInPandas (codec stub is the documented
    boundary — real decoders are absent here). Not SQL-expressible
    (binary decode) -> rows-only check; full semantics tested in
    tests/test_multimodal.py."""
    from cuckoofilter_spark.ops.multimodal import extract_features, media_table

    media = media_table(spark, 100, seed=42)
    return (extract_features(media)
            .groupBy("kind")
            .agg(F.count("*").alias("n"), F.sum("n_bytes").alias("total_bytes"))
            .orderBy("kind"))


def q_tokens_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The north-rule flagship over the canonical token table
    (doc_id, tokens:array<int32>, n_tok, source — synthesized
    deterministically, sources/tokens.py): cuckoo membership with
    FN/FP accounting, HLL distinct vs exact, CMS point-frequency bound
    check, KLL n_tok median. Generation is seeded so every engine sees
    token-array-equal rows; not SQL-expressible (DuckDB cannot run the
    sketch UDAFs) -> rows-only check; bounds asserted Spark-side and in
    tests."""
    from cuckoofilter_spark.sketch.aggregates import cms_sketch, hll_sketch, kll_sketch
    from cuckoofilter_spark.sketch.membership import cuckoo_build, cuckoo_contains_col
    from cuckoofilter_spark.sources.tokens import tokens_table

    vocab = 50_000
    toks = tokens_table(spark, 2_000, seed=42, vocab_size=vocab).persist()
    cf = cuckoo_build(toks, "tokens", capacity=vocab, bits=12, seed=SEED,
                      num_shards=8)
    flat = toks.select(F.explode("tokens").alias("t")).distinct()
    fn = flat.where(~cuckoo_contains_col(spark, cf, "t")).count()
    neg = spark.range(vocab, vocab + 100_000)
    fp = neg.where(cuckoo_contains_col(spark, cf, "id")).count()
    exact_distinct = flat.count()
    hll = hll_sketch(toks, "tokens", p=14, seed=SEED)
    cms = cms_sketch(toks, "tokens", eps=0.001, delta=0.01, seed=SEED)
    top = (toks.select(F.explode("tokens").alias("t")).groupBy("t")
           .agg(F.count("*").alias("freq"))
           .orderBy(F.desc("freq"), F.asc("t")).limit(1)).first()
    import numpy as np
    est = int(cms.query_many(np.array([top["t"]], dtype=np.uint64))[0])
    kll = kll_sketch(toks, "n_tok", k=200, seed=SEED)
    med = float(kll.quantile(0.5)[0])
    n = toks.count()
    med_rank = toks.where(F.col("n_tok") <= med).count() / n
    row = (
        int(exact_distinct), fn, fp / 100_000.0,
        bool(abs(hll.estimate() - exact_distinct) <= 3 * hll.rel_error() * exact_distinct),
        bool(top["freq"] <= est <= top["freq"] + cms.eps * cms.total),
        bool(abs(med_rank - 0.5) <= kll.eps + 1.0 / n),
        round(cf.load_factor(), 4),
    )
    toks.unpersist()
    return spark.createDataFrame(
        [row],
        "exact_distinct long, false_negatives long, observed_fpp double, "
        "hll_within_bound boolean, cms_within_bound boolean, "
        "kll_within_bound boolean, cf_load_factor double")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: cuckoo-filter membership semi-join on sf0.001."""
    _ensure_pkg(spark)
    return q_cf_membership(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    base = {
        "cf_membership": q_cf_membership,
        "xor_membership": q_xor_membership,
        "cf_stable_membership": q_cf_stable_membership,
        "cf_semisort_membership": q_cf_semisort_membership,
        "cf_checkpoint_membership": q_cf_checkpoint_membership,
        "cf_delete_membership": q_cf_delete_membership,
        "bloom_membership": q_bloom_membership,
        "blocked_bloom_membership": q_blocked_bloom_membership,
        "gcs_membership": q_gcs_membership,
        "cf_mixed_probe": q_cf_mixed_probe,
        "cf_prefilter_join": q_cf_prefilter_join,
        "hll_distinct": q_hll_distinct,
        "cms_topk_freq": q_cms_topk_freq,
        "cqf_topk_freq": q_cqf_topk_freq,
        "kll_quantiles": q_kll_quantiles,
        "tdigest_quantiles": q_tdigest_quantiles,
        "match_size": q_match_size,
        "count_distinct": q_count_distinct,
        "has_duplicates": q_has_duplicates,
        "mixin_sample": q_mixin_sample,
        "windowed_events": q_windowed_events,
        "text_stats": q_text_stats,
        "exact_dedup": q_exact_dedup,
        "jaccard_pairs": q_jaccard_pairs,
        "minhash_lsh_pairs": q_minhash_lsh_pairs,
        "simhash_pairs": q_simhash_pairs,
        "ann_cosine_topk": q_ann_cosine_topk,
        "ann_lsh_topk": q_ann_lsh_topk,
        "embedding_neardup": q_embedding_neardup,
        "token_count_total": q_token_count_total,
        "multimodal_features": q_multimodal_features,
        "tokens_pipeline": q_tokens_pipeline,
    }
    return {k: _with_pkg(fn) for k, fn in base.items()}


# SQL fragments shared by several oracles ------------------------------------
_WORDS = "list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '')"
_STOP = "['the','a','and','of','to','in','is','it']"
_SHINGLES = (
    "list_distinct(CASE WHEN len(W) >= 3 THEN "
    "[md5(array_to_string(W[i:i+2], ' ')) FOR i IN range(1, len(W) - 1)] "
    "ELSE [md5(array_to_string(W, ' '))] END)"
)


def oracle_sql() -> dict[str, str]:
    return {
        "cf_membership": """
            SELECT p_partkey AS member_key FROM part
            WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_partkey < 1000)
        """,
        "xor_membership": """
            SELECT p_partkey AS member_key FROM part
            WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_partkey < 1000)
        """,
        "gcs_membership": """
            SELECT p_partkey AS member_key FROM part
            WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_partkey < 1000)
        """,
        "cf_stable_membership": """
            SELECT p_partkey AS member_key FROM part
            WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_partkey < 1000)
        """,
        "cf_semisort_membership": """
            SELECT s_suppkey AS member_key FROM supplier
            WHERE s_suppkey IN (SELECT l_suppkey FROM lineitem WHERE l_suppkey < 100)
        """,
        "cf_checkpoint_membership": """
            SELECT p_partkey AS member_key FROM part
            WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_partkey < 1000)
        """,
        "cf_delete_membership": """
            SELECT p_partkey AS member_key FROM part
            WHERE p_partkey IN (SELECT l_partkey FROM lineitem
                                WHERE l_partkey >= 500 AND l_partkey < 1000)
        """,
        "blocked_bloom_membership": """
            WITH probes AS (
                SELECT s_suppkey AS probe FROM supplier
                UNION ALL SELECT s_suppkey + 100 FROM supplier)
            SELECT probe AS member_key FROM probes
            WHERE probe IN (SELECT l_suppkey FROM lineitem)
        """,
        "bloom_membership": """
            WITH probes AS (
                SELECT s_suppkey AS probe FROM supplier
                UNION ALL SELECT s_suppkey + 100 FROM supplier)
            SELECT probe AS member_key FROM probes
            WHERE probe IN (SELECT l_suppkey FROM lineitem)
        """,
        "cf_prefilter_join": """
            SELECT o_custkey, count(*) AS n_orders,
                   round(sum(o_totalprice), 4) AS total_price
            FROM orders
            WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_custkey % 10 = 0)
            GROUP BY o_custkey
        """,
        "cf_mixed_probe": """
            WITH pos AS (
                SELECT DISTINCT l_partkey AS probe FROM lineitem),
            neg AS (
                SELECT DISTINCT p_partkey + 10000000 AS probe FROM part),
            mix AS (
                SELECT probe, TRUE AS expected_hit FROM pos
                WHERE (probe * 1000003) % 97 < 48
                UNION ALL
                SELECT probe, FALSE FROM neg
                WHERE (probe * 1000003) % 97 < 48)
            SELECT expected_hit, expected_hit AS hit, count(*) AS cnt
            FROM mix GROUP BY 1, 2
        """,
        "hll_distinct": """
            SELECT count(DISTINCT o_custkey) AS exact_distinct,
                   TRUE AS hll_within_bound
            FROM orders
        """,
        "cms_topk_freq": """
            SELECT l_partkey, count(*) AS freq, TRUE AS cms_within_bound
            FROM lineitem GROUP BY l_partkey
            ORDER BY freq DESC, l_partkey ASC LIMIT 20
        """,
        "cqf_topk_freq": """
            SELECT l_partkey, count(*) AS freq, TRUE AS cqf_exact
            FROM lineitem GROUP BY l_partkey
            ORDER BY freq DESC, l_partkey ASC LIMIT 20
        """,
        "kll_quantiles": """
            SELECT CAST(q AS DOUBLE) AS q, TRUE AS kll_within_bound
            FROM (VALUES (0.01),(0.1),(0.25),(0.5),(0.75),(0.9),(0.99)) AS t(q)
        """,
        "tdigest_quantiles": """
            SELECT CAST(q AS DOUBLE) AS q, TRUE AS tdigest_within_bound
            FROM (VALUES (0.01),(0.1),(0.5),(0.9),(0.99),(0.999)) AS t(q)
        """,
        "match_size": """
            SELECT count(*) AS match_cnt FROM
            (SELECT DISTINCT l_partkey AS k FROM lineitem WHERE l_quantity > 25) a
            JOIN (SELECT DISTINCT p_partkey AS k FROM part WHERE p_size > 25) b
            USING (k)
        """,
        "count_distinct": """
            SELECT count(DISTINCT user_id) AS distinct_cnt FROM events
        """,
        "has_duplicates": """
            SELECT count(o_custkey) <> count(DISTINCT o_custkey) AS has_dups
            FROM orders
        """,
        "mixin_sample": """
            WITH pos AS (SELECT DISTINCT l_partkey AS k FROM lineitem),
            neg AS (SELECT DISTINCT p_partkey + 10000000 AS k FROM part)
            SELECT expected_hit, count(*) AS cnt FROM (
                SELECT k, TRUE AS expected_hit FROM pos WHERE (k * 1000003) % 97 < 24
                UNION ALL
                SELECT k, FALSE FROM neg WHERE (k * 1000003) % 97 < 72
            ) GROUP BY 1
        """,
        "windowed_events": """
            SELECT strftime(time_bucket(INTERVAL 1 HOUR, ts), '%Y-%m-%d %H:%M:%S') AS win_start,
                   event_type,
                   count(*) AS cnt,
                   count(DISTINCT user_id) AS users,
                   round(sum(value), 4) AS value_sum
            FROM events GROUP BY 1, 2
        """,
        "text_stats": f"""
            WITH w AS (SELECT doc_id, text, {_WORDS} AS W FROM documents)
            SELECT doc_id,
                   len(W) AS n_words,
                   length(text) AS n_chars_measured,
                   round(list_sum(list_transform(W, x -> length(x))) * 1.0
                         / greatest(len(W), 1), 6) AS avg_word_len,
                   round(len(list_filter(W, x -> lower(x) IN {_STOP[1:-1].join(["(", ")"])} )) * 1.0
                         / greatest(len(W), 1), 6) AS stopword_ratio,
                   CASE WHEN len(list_filter(W, x -> lower(x) IN {_STOP[1:-1].join(["(", ")"])} )) * 1.0
                             / greatest(len(W), 1) >= 0.05
                        THEN 'en' ELSE 'unknown' END AS lang_pred,
                   round(CAST(
                     CASE WHEN len(W) BETWEEN 20 AND 4000 THEN 0.4 ELSE 0.0 END
                   + CASE WHEN list_sum(list_transform(W, x -> length(x))) * 1.0
                               / greatest(len(W), 1) BETWEEN 2.0 AND 12.0 THEN 0.3 ELSE 0.0 END
                   + CASE WHEN len(list_filter(W, x -> lower(x) IN {_STOP[1:-1].join(["(", ")"])} )) * 1.0
                               / greatest(len(W), 1) >= 0.02 THEN 0.3 ELSE 0.0 END AS DOUBLE), 6) AS quality,
                   md5(array_to_string(W, ' ')) AS fingerprint
            FROM w
        """,
        "exact_dedup": f"""
            WITH w AS (SELECT doc_id, {_WORDS} AS W FROM documents)
            SELECT min(doc_id) AS keep_id, count(*) AS dup_cnt
            FROM w GROUP BY md5(array_to_string(W, ' '))
        """,
        "jaccard_pairs": f"""
            WITH w AS (SELECT doc_id, {_WORDS} AS W FROM documents),
            sh AS (SELECT doc_id, {_SHINGLES} AS ss FROM w),
            ex AS (SELECT doc_id, unnest(ss) AS s FROM sh),
            sz AS (SELECT doc_id, len(ss) AS sz FROM sh),
            pair AS (
                SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
                FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
                GROUP BY 1, 2)
            SELECT doc_a, doc_b,
                   round(inter * 1.0 / (x.sz + y.sz - inter), 6) AS jaccard
            FROM pair JOIN sz x ON pair.doc_a = x.doc_id
                      JOIN sz y ON pair.doc_b = y.doc_id
            WHERE inter * 1.0 / (x.sz + y.sz - inter) >= 0.8
        """,
        "minhash_lsh_pairs": f"""
            WITH w AS (SELECT doc_id, {_WORDS} AS W FROM documents),
            sh AS (SELECT doc_id, {_SHINGLES} AS ss FROM w),
            ex AS (SELECT doc_id, unnest(ss) AS s FROM sh),
            sz AS (SELECT doc_id, len(ss) AS sz FROM sh),
            pair AS (
                SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
                FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
                GROUP BY 1, 2)
            SELECT doc_a, doc_b,
                   round(inter * 1.0 / (x.sz + y.sz - inter), 6) AS jaccard
            FROM pair JOIN sz x ON pair.doc_a = x.doc_id
                      JOIN sz y ON pair.doc_b = y.doc_id
            WHERE inter * 1.0 / (x.sz + y.sz - inter) >= 0.8
        """,
        "ann_cosine_topk": """
            SELECT q.vec_id AS q_id, e.vec_id,
                   round(list_cosine_similarity(q.embedding, e.embedding), 4) AS cos,
                   CAST(row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY list_cosine_similarity(q.embedding, e.embedding) DESC,
                                e.vec_id ASC) AS INT) AS rnk
            FROM embeddings q, embeddings e
            WHERE q.vec_id < 10
            QUALIFY rnk <= 5
        """,
        "embedding_neardup": """
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                   round(list_cosine_similarity(a.embedding, b.embedding), 4) AS cos
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.95
        """,
        "token_count_total": f"""
            WITH w AS (SELECT source, {_WORDS} AS W FROM documents)
            SELECT source, sum(len(W)) AS total_tokens, count(*) AS docs,
                   round(sum(len(W)) * 1.0 / count(*), 6) AS avg_tokens
            FROM w GROUP BY source
        """,
    }
