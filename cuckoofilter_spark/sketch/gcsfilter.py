"""Distributed GCS build — the sort-aggregation pathway (SURVEY §2.2 #26).

The reference builds its GCS by qsort-ing the fingerprint vector then
rice-encoding bucket runs (gcs.h:289-343). The Spark-first equivalent
is the declarative sort-agg plan:

    distinct keys -> (bucket, value) fingerprints (vectorized UDF)
    -> range-repartition + sort by (bucket, value)   [Catalyst sort]
    -> per bucket-group rice encode (applyInPandas)  [grouped agg]
    -> driver assembles bit stream + offsets in group order

Because rice deltas reset at every bucket boundary, each contiguous
bucket-group encodes independently and the concatenated stream is
bit-identical to a single-node encode of the whole sorted sequence —
asserted in tests against ``GcsFilter.build``.

Scale: the only full-data shuffles are the ``distinct()`` dedupe and
the range partitioning by bucket — both standard Catalyst exchanges;
the grouped encode emits one packed row per bucket-group and the
driver assembles ~num_buckets/group_size rows of a few KB.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession, functions as F, types as T

from ..kernels.gcs import GcsFilter
from .udaf import keys_to_u64, require_key_col


def gcs_build(df: DataFrame, col: str, log2fpp: int = 10, log2bucket: int = 4,
              seed: int = 0x5EED, buckets_per_group: int = 4096,
              layout: int = 3) -> GcsFilter:
    """Build a GcsFilter with the distributed sort-encode plan."""
    if require_key_col(df, col):
        raise TypeError("gcs_build takes a scalar integer column; explode or "
                        "flatten token arrays upstream")
    uniq = df.select(F.col(col).cast("long").alias("k")) \
             .where(F.col(col).isNotNull()).distinct()
    n = uniq.count()
    proto = GcsFilter(log2fpp, log2bucket, seed, layout=layout)
    num_buckets = proto.num_buckets_for(n)
    if n == 0:
        return proto

    def fingerprint(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        f = GcsFilter(log2fpp, log2bucket, seed, layout=layout)
        for pdf in batches:
            b, v = f._fingerprints(keys_to_u64(pdf["k"]), n)
            yield pd.DataFrame({"bucket": b, "value": v.view(np.int64),
                                "grp": b // buckets_per_group})

    fps = uniq.mapInPandas(fingerprint, schema="bucket long, value long, grp long")

    def encode_group(pdf: pd.DataFrame) -> pd.DataFrame:
        f = GcsFilter(log2fpp, log2bucket, seed, layout=layout)
        grp = int(pdf["grp"].iloc[0])
        lo = grp * buckets_per_group
        hi = min(lo + buckets_per_group, num_buckets)
        bucket = pdf["bucket"].to_numpy() - lo  # group-local bucket ids
        value = pdf["value"].to_numpy().view(np.uint64)
        bits, offsets = f._encode_all(bucket, value, hi - lo)
        return pd.DataFrame({
            "grp": [grp],
            "nbits": [int(bits.size)],
            "bits": [np.packbits(bits).tobytes()],
            "lengths": [np.diff(offsets).astype("<i8").tobytes()],
        })

    rows = (fps.groupBy("grp")
            .applyInPandas(encode_group, "grp long, nbits long, bits binary, lengths binary")
            .collect())
    by_grp = {int(r["grp"]): r for r in rows}

    # driver assembly in group order. Empty groups still carry bits in
    # the v3 split layout: every bucket spends exactly m - 1 padding
    # ones even at count 0 (fixed-length unary section).
    num_groups = (num_buckets + buckets_per_group - 1) // buckets_per_group
    pad = (1 << log2bucket) - 1 if layout == 3 else 0
    all_bits, all_lengths = [], []
    for g in range(num_groups):
        lo = g * buckets_per_group
        hi = min(lo + buckets_per_group, num_buckets)
        r = by_grp.get(g)
        if r is None:
            if pad:
                all_bits.append(np.ones((hi - lo) * pad, dtype=np.uint8))
            all_lengths.append(np.full(hi - lo, pad, dtype=np.int64))
            continue
        all_bits.append(np.unpackbits(
            np.frombuffer(bytes(r["bits"]), dtype=np.uint8), count=int(r["nbits"])))
        all_lengths.append(np.frombuffer(bytes(r["lengths"]), dtype="<i8"))
    bits = (np.concatenate(all_bits) if all_bits else np.zeros(0, dtype=np.uint8))
    offsets = np.concatenate(([0], np.cumsum(np.concatenate(all_lengths))))
    proto._assemble(n, bits, offsets.astype(np.int64))
    return proto


def gcs_contains_col(spark: SparkSession, filt: GcsFilter, col) -> Column:
    """Boolean membership Column against a broadcast GCS blob."""
    bc = spark.sparkContext.broadcast(filt.to_bytes())

    @F.pandas_udf(T.BooleanType())
    def probe(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        local = GcsFilter.from_bytes(bc.value)
        for s in it:
            yield pd.Series(local.contains_many(keys_to_u64(s)))

    return probe(F.col(col).cast("long") if isinstance(col, str) else col)
