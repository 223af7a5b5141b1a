"""Column-level sketch aggregates: HLL, count-min, KLL, Bloom.

Thin wrappers binding the numpy kernels into the partial/tree-merge
protocol of ``udaf.aggregate_sketch``. Each accepts either a scalar
integer key column or a pre-tokenized ``array<int>`` column (flattened
inside the Arrow batch — the 10^12-sequence token table never pays a
Spark-side explode, which would multiply shuffle rows by ~250x).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession, functions as F, types as T

from ..kernels.bloom import BloomFilter
from ..kernels.cms import CountMinSketch
from ..kernels.hll import HyperLogLog
from ..kernels.kll import KLLSketch
from ..kernels.mg import MisraGries
from .udaf import aggregate_sketch, grouped_aggregate_sketch, keys_to_u64, \
    require_key_col, tokens_to_u64


def _series_to_keys(s: pd.Series, is_array: bool) -> np.ndarray:
    return tokens_to_u64(s) if is_array else keys_to_u64(s)


def _is_array_col(df: DataFrame, col: str) -> bool:
    return require_key_col(df, col)


def hll_sketch(df: DataFrame, col: str, p: int = 14, seed: int = 0x5EED,
               fanout: int = 16) -> HyperLogLog:
    """Distributed distinct-count sketch (count_distinct analogue,
    bulk-insert-and-query.cc:456-468, as a mergeable aggregate)."""
    arr = _is_array_col(df, col)
    return aggregate_sketch(
        df, col,
        make=lambda: HyperLogLog(p=p, seed=seed),
        update=lambda k, s: k.add_many(_series_to_keys(s, arr)),
        merge=HyperLogLog.merge,
        from_bytes=HyperLogLog.from_bytes,
        fanout=fanout,
    )


def mg_sketch(df: DataFrame, col: str, k: int = 256, fanout: int = 16,
              final_compact: bool = False) -> MisraGries:
    """Distributed Misra-Gries heavy hitters (the deterministic top-k
    companion to ``cms_sketch``: exact keys, guaranteed undercount
    bound). Per-partition compaction keeps each partial at <= k
    counters; the tree merge is the exact sparse sum (associative), so
    the result is partition-order independent and holds at most
    ``num_partials * k`` entries. ``final_compact=True`` re-bounds the
    returned summary to k entries (adds one more decrement step)."""
    arr = _is_array_col(df, col)
    out = aggregate_sketch(
        df, col,
        make=lambda: MisraGries(k=k),
        update=lambda s, col_s: s.add_many(_series_to_keys(col_s, arr)),
        merge=MisraGries.merge,
        from_bytes=MisraGries.from_bytes,
        fanout=fanout,
    )
    if final_compact:
        out.compact()
    return out


def grouped_hll_sketch(df: DataFrame, group_col: str, col: str, p: int = 14,
                       seed: int = 0x5EED) -> DataFrame:
    """Per-group HLL blobs: ``(group, blob)``, one row per distinct
    ``group_col`` value (the corpus-accounting axis: distinct tokens
    per source / language / date shard). Map-side combine — shuffle
    carries at most partitions x groups blobs, never rows."""
    arr = _is_array_col(df, col)
    return grouped_aggregate_sketch(
        df, group_col, col,
        make=lambda: HyperLogLog(p=p, seed=seed),
        update=lambda k, s: k.add_many(_series_to_keys(s, arr)),
        merge=HyperLogLog.merge,
        from_bytes=HyperLogLog.from_bytes,
    ).withColumnRenamed("g", group_col)


def grouped_hll_distinct(df: DataFrame, group_col: str, col: str, p: int = 14,
                         seed: int = 0x5EED) -> DataFrame:
    """Per-group distinct-count estimates: ``(group, est_distinct)``."""
    @F.pandas_udf(T.DoubleType())
    def est(b: pd.Series) -> pd.Series:
        return b.map(lambda x: HyperLogLog.from_bytes(bytes(x)).estimate())

    return (grouped_hll_sketch(df, group_col, col, p=p, seed=seed)
            .select(F.col(group_col), est(F.col("blob")).alias("est_distinct")))


def grouped_kll_quantiles(df: DataFrame, group_col: str, col: str,
                          qs: tuple = (0.25, 0.5, 0.75), k: int = 200,
                          seed: int = 0x5EED) -> DataFrame:
    """Per-group KLL quantiles over a numeric column:
    ``(group, q, value)`` — the sequence-length-distribution-per-source
    question. Same blob-only shuffle as grouped_hll_sketch."""
    def upd(kern, s: pd.Series):
        kern.add_many(s.to_numpy(dtype=np.float64, na_value=np.nan))

    blobs = grouped_aggregate_sketch(
        df, group_col, col,
        make=lambda: KLLSketch(k=k, seed=seed),
        update=upd,
        merge=KLLSketch.merge,
        from_bytes=KLLSketch.from_bytes,
    )
    gtype = df.schema[group_col].dataType.simpleString()
    qlist = [float(q) for q in qs]

    def explode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for g, blob in zip(pdf["g"], pdf["blob"]):
                sk = KLLSketch.from_bytes(bytes(blob))
                yield pd.DataFrame(
                    {"g": pd.Series([g] * len(qlist), dtype=object),
                     "q": qlist,
                     "value": sk.quantile(np.array(qlist)).astype(float)})

    # string-encode integer groups through the pandas stage (exact; a
    # nullable int64 would arrive as float64 — see grouped_aggregate_sketch)
    return (blobs.select(F.col("g").cast("string").alias("g"), "blob")
            .mapInPandas(explode, schema="g string, q double, value double")
            .select(F.col("g").cast(gtype).alias(group_col), "q", "value"))


def grouped_mg_topk(df: DataFrame, group_col: str, col: str, k: int = 256,
                    topn: int = 10) -> DataFrame:
    """Per-group Misra-Gries heavy hitters: ``(group, key, est)`` with
    the ``topn`` largest surviving counters per group (``est`` is the
    guaranteed undercount; true count is in ``[est, est + n_g/(k+1)]``).
    Compact-after-merge bounds every shuffled blob to k entries."""
    arr = _is_array_col(df, col)

    def fin(kern):
        kern.compact()
        return kern

    blobs = grouped_aggregate_sketch(
        df, group_col, col,
        make=lambda: MisraGries(k=k),
        update=lambda s, col_s: s.add_many(_series_to_keys(col_s, arr)),
        merge=MisraGries.merge,
        from_bytes=MisraGries.from_bytes,
        finalize=fin,
    )
    gtype = df.schema[group_col].dataType.simpleString()

    def explode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for g, blob in zip(pdf["g"], pdf["blob"]):
                mg = MisraGries.from_bytes(bytes(blob))
                order = np.argsort(-mg.counts, kind="stable")[:topn]
                yield pd.DataFrame(
                    {"g": pd.Series([g] * order.size, dtype=object),
                     "key": mg.keys[order].view(np.int64),
                     "est": mg.counts[order]})

    # string-encode integer groups through the pandas stage (exact; a
    # nullable int64 would arrive as float64 — see grouped_aggregate_sketch)
    return (blobs.select(F.col("g").cast("string").alias("g"), "blob")
            .mapInPandas(explode, schema="g string, key long, est long")
            .select(F.col("g").cast(gtype).alias(group_col), "key", "est"))


def cms_sketch(df: DataFrame, col: str, eps: float = 0.0005, delta: float = 0.01,
               seed: int = 0x5EED, fanout: int = 16) -> CountMinSketch:
    """Distributed point-frequency sketch (CQF counting capability,
    gqf.h:137-201, as an elementwise-add mergeable aggregate)."""
    arr = _is_array_col(df, col)
    return aggregate_sketch(
        df, col,
        make=lambda: CountMinSketch.create(eps=eps, delta=delta, seed=seed),
        update=lambda k, s: k.add_many(_series_to_keys(s, arr)),
        merge=CountMinSketch.merge,
        from_bytes=CountMinSketch.from_bytes,
        fanout=fanout,
    )


def ams_f2_sketch(df: DataFrame, col: str, width: int = 4096,
                  depth: int = 5, seed: int = 0x5EED,
                  fanout: int = 16) -> "AmsF2":
    """Distributed second-moment (F2 / self-join size / key-skew)
    sketch: one AMS tug-of-war table per partition, tree-merged by
    elementwise add (kernels/ams.py). Blob-only shuffle — the key
    column never re-partitions."""
    from ..kernels.ams import AmsF2

    arr = _is_array_col(df, col)
    return aggregate_sketch(
        df, col,
        make=lambda: AmsF2(width=width, depth=depth, seed=seed),
        update=lambda k_, s: k_.add_many(_series_to_keys(s, arr)),
        merge=AmsF2.merge,
        from_bytes=AmsF2.from_bytes,
        fanout=fanout,
    )


def kll_sketch(df: DataFrame, col: str, k: int = 200, seed: int = 0x5EED,
               fanout: int = 16) -> KLLSketch:
    """Distributed quantile sketch over a numeric column."""
    def upd(kern, s: pd.Series):
        kern.add_many(s.to_numpy(dtype=np.float64, na_value=np.nan))
    return aggregate_sketch(
        df, col,
        make=lambda: KLLSketch(k=k, seed=seed),
        update=upd,
        merge=KLLSketch.merge,
        from_bytes=KLLSketch.from_bytes,
        fanout=fanout,
    )


def cqf_sketch(df: DataFrame, col: str, q: int = 20, r: int = 28,
               seed: int = 0x5EED, fanout: int = 16) -> "CountingQuotientFilter":
    """Distributed counting-quotient-filter build (gqf.h semantics:
    exact multiset counts at fingerprint resolution, lossless merge)."""
    from ..kernels.cqf import CountingQuotientFilter

    arr = _is_array_col(df, col)
    return aggregate_sketch(
        df, col,
        make=lambda: CountingQuotientFilter(q=q, r=r, seed=seed),
        update=lambda k, s: k.add_many(_series_to_keys(s, arr)),
        merge=CountingQuotientFilter.merge,
        from_bytes=CountingQuotientFilter.from_bytes,
        fanout=fanout,
    )


def cqf_count_col(spark: SparkSession, sketch, col) -> Column:
    """Exact-at-fingerprint-resolution count Column (qf_count_key_value)."""
    from ..kernels.cqf import CountingQuotientFilter
    from .membership import _blob_method_col

    return _blob_method_col(spark, sketch, col, CountingQuotientFilter,
                            method="count_many", rettype=T.LongType())


def tdigest_sketch(df: DataFrame, col: str, delta: float = 200.0,
                   fanout: int = 16) -> "TDigest":
    """Distributed t-digest over a numeric column (tail-accurate
    quantiles; the north rule's companion to KLL)."""
    from ..kernels.tdigest import TDigest

    def upd(kern, s: pd.Series):
        kern.add_many(s.to_numpy(dtype=np.float64, na_value=np.nan))

    return aggregate_sketch(
        df, col,
        make=lambda: TDigest(delta=delta),
        update=upd,
        merge=TDigest.merge,
        from_bytes=TDigest.from_bytes,
        fanout=fanout,
    )


def bloom_sketch(df: DataFrame, col: str, capacity: int, bits_per_item: int = 10,
                 seed: int = 0x5EED, fanout: int = 16) -> BloomFilter:
    """Distributed Bloom build (bloom.h semantics, OR-mergeable)."""
    arr = _is_array_col(df, col)
    return aggregate_sketch(
        df, col,
        make=lambda: BloomFilter.create(capacity, bits_per_item, seed=seed),
        update=lambda k, s: k.add_many(_series_to_keys(s, arr)),
        merge=BloomFilter.merge,
        from_bytes=BloomFilter.from_bytes,
        fanout=fanout,
    )


def blocked_bloom_sketch(df: DataFrame, col: str, capacity: int,
                         seed: int = 0x5EED, fanout: int = 16,
                         bits_per_key: int | None = None) -> "BlockedBloomFilter":
    """Distributed blocked-Bloom build (simd-block.h semantics,
    OR-mergeable 256-bit buckets). ``bits_per_key=8`` matches the
    reference benchmark's 2^ceil(log2(n))-byte sizing."""
    from ..kernels.blocked_bloom import BlockedBloomFilter

    arr = _is_array_col(df, col)
    return aggregate_sketch(
        df, col,
        make=lambda: BlockedBloomFilter.create(capacity, seed=seed,
                                               bits_per_key=bits_per_key),
        update=lambda k, s: k.add_many(_series_to_keys(s, arr)),
        merge=BlockedBloomFilter.merge,
        from_bytes=BlockedBloomFilter.from_bytes,
        fanout=fanout,
    )


def blocked_bloom_contains_col(spark: SparkSession, filt, col) -> Column:
    """Boolean membership Column against a broadcast blocked-Bloom blob."""
    from ..kernels.blocked_bloom import BlockedBloomFilter
    from .membership import _blob_method_col

    return _blob_method_col(spark, filt, col, BlockedBloomFilter,
                            method="contains_many")


def blocked_bloom_jvm_sketch(df: DataFrame, col: str, capacity: int,
                             seed: int = 0x5EED, fanout: int = 16,
                             bits_per_key: int | None = None
                             ) -> "JvmBlockedBloomFilter":
    """Distributed build of the JVM-probeable blocked Bloom (same
    simd-block.h bucket layout as blocked_bloom_sketch; key hash =
    Spark xxhash64 so the probe side compiles to codegen + one
    broadcast join — see sketch/membership.blocked_bloom_jvm_filter)."""
    from ..kernels.blocked_bloom import JvmBlockedBloomFilter

    arr = _is_array_col(df, col)
    return aggregate_sketch(
        df, col,
        make=lambda: JvmBlockedBloomFilter.create(capacity, seed=seed,
                                                  bits_per_key=bits_per_key),
        update=lambda k, s: k.add_many(_series_to_keys(s, arr)),
        merge=JvmBlockedBloomFilter.merge,
        from_bytes=JvmBlockedBloomFilter.from_bytes,
        fanout=fanout,
    )


def blocked_bloom_jvm_contains_col(spark: SparkSession, filt, col) -> Column:
    """Boolean membership Column for the JVM-hash variant through the
    BLOB path (pandas probe) — the parity twin of the pure-JVM join in
    sketch/membership.py; answers are bit-identical by construction."""
    from ..kernels.blocked_bloom import JvmBlockedBloomFilter
    from .membership import _blob_method_col

    return _blob_method_col(spark, filt, col, JvmBlockedBloomFilter,
                            method="contains_many")


def blocked_bloom64_sketch(df: DataFrame, col: str, capacity: int,
                           seed: int = 0x5EED, fanout: int = 16,
                           bits_per_key: int | None = None
                           ) -> "BlockedBloomFilter64":
    """Distributed 64-byte-block blocked-Bloom build (SimdBlockFilter64,
    simd-block.h:213-375): 512-bit buckets, 8 one-bit probes one per
    64-bit lane; OR-mergeable like the 256-bit variant."""
    from ..kernels.blocked_bloom import BlockedBloomFilter64

    arr = _is_array_col(df, col)
    return aggregate_sketch(
        df, col,
        make=lambda: BlockedBloomFilter64.create(capacity, seed=seed,
                                                 bits_per_key=bits_per_key),
        update=lambda k, s: k.add_many(_series_to_keys(s, arr)),
        merge=BlockedBloomFilter64.merge,
        from_bytes=BlockedBloomFilter64.from_bytes,
        fanout=fanout,
    )


def blocked_bloom64_contains_col(spark: SparkSession, filt, col) -> Column:
    """Boolean membership Column against a broadcast 64B-block blob."""
    from ..kernels.blocked_bloom import BlockedBloomFilter64
    from .membership import _blob_method_col

    return _blob_method_col(spark, filt, col, BlockedBloomFilter64,
                            method="contains_many")


def fixed_blocked_bloom_sketch(df: DataFrame, col: str, capacity: int,
                               seed: int = 0x5EED, fanout: int = 16,
                               bits_per_key: int = 12
                               ) -> "FixedBlockedBloomFilter":
    """Distributed fixed-fpp blocked-Bloom build (SimdBlockFilterFixed,
    simd-block-fixed-fpp.h:43-138): exact non-pow2 directory sized at
    ``capacity * bits_per_key`` bits, Lemire-reduced bucket index."""
    from ..kernels.blocked_bloom import FixedBlockedBloomFilter

    arr = _is_array_col(df, col)
    return aggregate_sketch(
        df, col,
        make=lambda: FixedBlockedBloomFilter.create(
            capacity, seed=seed, bits_per_key=bits_per_key),
        update=lambda k, s: k.add_many(_series_to_keys(s, arr)),
        merge=FixedBlockedBloomFilter.merge,
        from_bytes=FixedBlockedBloomFilter.from_bytes,
        fanout=fanout,
    )


def fixed_blocked_bloom_contains_col(spark: SparkSession, filt,
                                     col) -> Column:
    """Boolean membership Column against a broadcast fixed-fpp blob."""
    from ..kernels.blocked_bloom import FixedBlockedBloomFilter
    from .membership import _blob_method_col

    return _blob_method_col(spark, filt, col, FixedBlockedBloomFilter,
                            method="contains_many")


def grow_blocked_bloom_sketch(df: DataFrame, col: str,
                              initial_capacity: int = 1024,
                              seed: int = 0x5EED) -> "GrowBlockedBloomFilter":
    """Size-unknown AMQ build (growable-simd-block.h:22-74, Pagh et al.):
    the filter takes NO capacity parameter — it is fed the distinct key
    stream and opens doubling blocked-Bloom levels as each level's
    insert budget exhausts. The distinct keys arrive via the
    vocab-bounded two-stage distinct (``distinct_keys_u64`` — driver
    memory = key universe, the broadcast-build-side contract); the
    growth loop itself is inherently sequential (each level's existence
    depends on everything inserted before it), so this family has no
    tree-merge UDAF — the reference structure is single-writer too."""
    from ..kernels.blocked_bloom import GrowBlockedBloomFilter
    from .membership import distinct_keys_u64

    keys = distinct_keys_u64(df, col)
    f = GrowBlockedBloomFilter(initial_capacity=initial_capacity, seed=seed)
    f.add_many(keys)
    return f


def grow_blocked_bloom_contains_col(spark: SparkSession, filt, col) -> Column:
    """Boolean membership Column against a broadcast growable
    blocked-Bloom blob (Find = OR over all levels)."""
    from ..kernels.blocked_bloom import GrowBlockedBloomFilter
    from .membership import _blob_method_col

    return _blob_method_col(spark, filt, col, GrowBlockedBloomFilter,
                            method="contains_many")


def bloom_contains_col(spark: SparkSession, filt: BloomFilter, col) -> Column:
    """Boolean membership Column against a broadcast Bloom blob."""
    from .membership import _blob_method_col

    return _blob_method_col(spark, filt, col, BloomFilter,
                            method="contains_many")


def cms_lookup_col(spark: SparkSession, sketch: CountMinSketch, col) -> Column:
    """Estimated frequency Column against a broadcast CMS blob."""
    from .membership import _blob_method_col

    return _blob_method_col(spark, sketch, col, CountMinSketch,
                            method="query_many", rettype=T.LongType())


