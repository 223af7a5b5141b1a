"""Canonical sequence-table reader: Iceberg catalog or Parquet path.

The north-rule input is an Iceberg table of pre-tokenized training
sequences (doc_id string, tokens array<int32>, n_tok int32, source
string). On a real cluster the table is addressed through a configured
Iceberg catalog (``spark.sql.catalog.<name>`` + the iceberg-spark
runtime jar) and read with ``spark.read.table`` — Iceberg's Spark
source does partition pruning, hidden-partition transforms, and
column-projection pushdown through the normal DataFrame scan, so
everything downstream here is identical for both sources. This sandbox
has no Iceberg runtime jar, so the Iceberg branch is import-gated with
a clear error, and the Parquet branch (same schema, same pruning
semantics at the file-format level) is the tested path.

``columns`` matters at 10^12 rows: membership/frequency sketches read
only (doc_id, tokens); the KLL/n_tok quantile path reads only n_tok —
passing the projection here keeps it inside the scan (ReadSchema in the
physical plan) instead of after it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

CANONICAL_COLUMNS = ("doc_id", "tokens", "n_tok", "source")


def read_sequences(
    spark: SparkSession,
    source: str,
    fmt: str | None = None,
    columns: tuple[str, ...] | list[str] | None = None,
) -> DataFrame:
    """Read the canonical sequence table from an Iceberg identifier or a
    Parquet path.

    ``fmt``: "iceberg", "parquet", or None to infer — dotted identifiers
    (catalog.db.table) read as Iceberg tables, everything else as a
    Parquet path. Projects to ``columns`` (default: the canonical four)
    inside the scan.
    """
    if fmt is None:
        fmt = "parquet" if ("/" in source or source.endswith(".parquet")) \
            else "iceberg"
    if fmt == "iceberg":
        try:
            df = spark.read.table(source)
        except Exception as exc:  # connector jar / catalog not configured
            raise RuntimeError(
                "Iceberg read failed — the iceberg-spark runtime jar and a "
                "spark.sql.catalog.* entry must be on the cluster (absent "
                f"in this sandbox): {exc}") from exc
    elif fmt == "parquet":
        df = spark.read.parquet(source)
    else:
        raise ValueError(f"unknown format {fmt!r}")
    cols = tuple(columns) if columns else tuple(
        c for c in CANONICAL_COLUMNS if c in df.columns)
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"sequence table at {source!r} is missing "
                         f"canonical columns {missing}")
    return df.select(*[F.col(c) for c in cols])
