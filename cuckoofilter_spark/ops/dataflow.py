"""The reference benchmark harness's dataflow operators, Spark-first.

The reference's benchmark driver contains the only relational
operators in the repo (SURVEY.md §2.5): sort-merge intersection count,
distinct count, duplicate detection, and sampled union (mix-in). Here
each is a declarative DataFrame plan — Catalyst picks the physical
strategy (broadcast vs sort-merge join, partial aggregation), which is
the whole point of re-expressing them Spark-first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def match_size(a: DataFrame, a_col: str, b: DataFrame, b_col: str) -> DataFrame:
    """Intersection size of two key sets.

    ``match_size`` in the reference sorts both vectors and sort-merge
    counts (bulk-insert-and-query.cc:439-479) — the literal equivalent
    of a distinct inner equi-join count. One row: ``match_cnt``.
    """
    da = a.select(F.col(a_col).alias("k")).distinct()
    db = b.select(F.col(b_col).alias("k")).distinct()
    return da.join(db, "k", "inner").agg(F.count("*").alias("match_cnt"))


def count_distinct_exact(df: DataFrame, col: str) -> DataFrame:
    """Exact distinct count (count_distinct, bulk-insert-and-query.cc:456-468)."""
    return df.agg(F.countDistinct(col).alias("distinct_cnt"))


def count_distinct_both(df: DataFrame, col: str, rsd: float = 0.02) -> DataFrame:
    """Exact + built-in HLL++ estimate side by side (one pass each)."""
    return df.agg(
        F.countDistinct(col).alias("distinct_cnt"),
        F.approx_count_distinct(col, rsd).alias("approx_cnt"),
    )


def has_duplicates(df: DataFrame, col: str) -> DataFrame:
    """``has_duplicates`` (bulk-insert-and-query.cc:481-484): one bool row."""
    return df.agg(
        (F.count(col) != F.countDistinct(col)).alias("has_dups"))


def deterministic_sample(df: DataFrame, col: str, pct: int, modulus: int = 97,
                         mult: int = 1000003) -> DataFrame:
    """Deterministic pseudo-sample: keep rows where
    ``(key * mult) % modulus < pct * modulus / 100``.

    Replaces the reference's reservoir sampling (benchmarks/random.h:73-93)
    with a stateless hash threshold — the distributed-friendly version
    (no sequential reservoir state), reproducible across engines.
    ``mult``/``modulus`` are small enough that int64 never overflows for
    key ranges up to ~9e12.
    """
    thresh = pct * modulus // 100
    return df.where((F.col(col) * F.lit(mult)) % F.lit(modulus) < F.lit(thresh))


def mix_in(positive: DataFrame, negative: DataFrame, col: str, found_pct: int) -> DataFrame:
    """Probe-set composition (``MixIn``, benchmarks/random.h:98-156):
    ``found_pct``% sampled members + (100-found_pct)% non-members,
    labeled with ground truth. Uses the deterministic sampler so the
    same probe set is reproducible by any engine.
    """
    pos = (deterministic_sample(positive.select(F.col(col).alias("probe")).distinct(),
                                "probe", found_pct)
           .withColumn("expected_hit", F.lit(True)))
    neg = (deterministic_sample(negative.select(F.col(col).alias("probe")).distinct(),
                                "probe", 100 - found_pct)
           .withColumn("expected_hit", F.lit(False)))
    return pos.unionAll(neg)
