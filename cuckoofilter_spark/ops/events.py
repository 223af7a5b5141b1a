"""Event-stream operators: gap sessionization and as-of join.

Two classic event-table operators a training-data / analytics pipeline
runs over append-only logs, re-expressed Spark-first:

- ``sessionize``: gap-based session windows via ``F.session_window`` —
  literally the Structured Streaming session operator (readStream +
  withWatermark + the same groupBy runs incrementally with state
  eviction); here in its batch form. One shuffle on the session key;
  the aggregate is partial-merge (SessionWindowStateStore does the same
  merge incrementally), so a hot user never materializes its raw rows
  in one task beyond the sort the session assignment needs.
- ``asof_join``: for every left row, the latest right row with
  ``right_ts <= left_ts`` per key (backward as-of, inclusive — the
  attribution / point-in-time-lookup join). Spark has no native ASOF;
  the composition below is the standard scalable form: union the two
  sides, one window per key ordered by (ts, side) carrying the last
  non-null right payload forward, keep left rows. ONE shuffle + sort
  on the key — same exchange count as the sort-merge join Catalyst
  would pick for an equi-join, no range explosion, no per-row Python.

Semantics notes (pinned by tests/test_events.py):

- ``session_window`` merges a successor at exactly ``prev + gap`` into
  the SAME session (inclusive boundary — measured on Spark 4.1.2: events
  at 0:00 / 1:00 / 1:59:59 with a 1-hour gap form ONE session ending
  2:59:59). The DuckDB oracle's gap-and-islands restatement therefore
  flags a new session on ``diff > gap``, strict. ``session_end`` is
  ``last event ts + gap`` (the window close), not the last event.
- ``asof_join`` ties: a right row at exactly ``left_ts`` matches
  (right sorts before left at equal ts). Multiple right rows sharing
  (key, ts) make the match non-deterministic in ANY engine — callers
  must canonicalize the right side to one row per (key, ts) first
  (the query wrappers aggregate with max()).
- NULLs: standard three-valued join logic. Right rows with a NULL key
  or NULL timestamp are dropped (``l.ts >= NULL`` is never true);
  left rows always survive — a NULL-key or NULL-ts left row simply
  gets a NULL payload. Note DuckDB's native ASOF diverges on NULL
  TIMESTAMPS (measured 1.0.0: it treats NULL ts as sort-largest and
  matches a NULL-ts left to a NULL-ts right), so the oracle queries
  keep NULL-free join columns. NULL-KEY behavior matches DuckDB (no
  match). ``sessionize`` inherits
  ``session_window``'s behavior: NULL-timestamp rows are DROPPED from
  the aggregation (measured; pinned in tests) — pre-filter if they
  must be accounted.

Scale: both ops shuffle once on the key. A pathologically hot key
(one user with a billion events) serializes that key's sort into one
task — for event logs keyed by user/session this is bounded by
nature; if a key can be unbounded, pass ``bucket_seconds`` to
``asof_join`` for the two-level form: the prefix window runs per
(key, time bucket) — parallel across a hot key's buckets — and a
second, buckets-only window carries the last right value across
bucket boundaries, so no task ever sees more than one bucket of one
key plus a #buckets-sized carry row set. Identical answers (pinned by
test at several widths, including one bucket == the plain path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# internal column names used by the asof union/bucket plans; asserted
# absent from the caller's frames (Spark column resolution is
# case-insensitive, so a caller's "_SIDE" would silently collide with
# "_side")
_ASOF_INTERNAL = ("_k", "_ts", "_side", "_b", "_cin", "_s")


def sessionize(df: DataFrame, key_col: str, ts_col: str,
               gap: str = "4 hours", value_col: str | None = None,
               ) -> DataFrame:
    """Per-(key, session) stats under a gap-based session window.

    Returns one row per session: ``key_col``, ``session_start`` (first
    event ts), ``session_end`` (last event ts + gap — the window-close
    semantics of ``F.session_window``), ``n_events``, and — when
    ``value_col`` is given — ``value_sum``.

    This is the exact operator Structured Streaming executes for
    ``readStream ... groupBy(session_window(ts, gap), key)`` with a
    watermark; batch form here, so late data is simply present.
    """
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("value_sum"))
    return (df.groupBy(F.session_window(ts_col, gap).alias("_w"),
                       F.col(key_col))
            .agg(*aggs)
            .select(key_col,
                    F.col("_w.start").alias("session_start"),
                    F.col("_w.end").alias("session_end"),
                    *[F.col(a) for a in
                      (("n_events", "value_sum") if value_col is not None
                       else ("n_events",))]))


def asof_join(left: DataFrame, right: DataFrame, on: str,
              left_ts: str, right_ts: str,
              right_vals: list[str] | tuple[str, ...],
              matched_ts_col: str = "asof_ts",
              bucket_seconds: int | None = None) -> DataFrame:
    """Backward as-of join (inclusive): attach to every left row the
    payload of the latest right row with ``right_ts <= left_ts`` for
    the same ``on`` key; NULL payload when no right row precedes.

    All left columns are preserved; appended columns are ``right_vals``
    (right payload at the matched row) plus ``matched_ts_col`` (the
    matched right timestamp). Right side must be unique per
    (``on``, ``right_ts``) for deterministic output — see module doc.

    Plan shape, default (``bucket_seconds=None``): one union, ONE
    exchange (hashpartitioning on the key), one sort per partition, a
    running ``last(..., ignorenulls=True)`` window, then a filter back
    to left rows. The window frame is growing-prefix, so Spark streams
    it without buffering whole partitions
    (UnboundedPrecedingWindowFunctionFrame).

    Hot-key scale path (``bucket_seconds=N``): the prefix window runs
    per (key, floor(ts/N)) — a hot key's rows spread across its time
    buckets — and the cross-bucket carry is a second window over ONE
    summary row per non-empty (key, bucket) (the last right row of the
    bucket, taken as max-by-ts struct), shifted one bucket back
    (``rowsBetween(unbounded, -1)``). Final value = within-bucket
    prefix, else carry-in. Costs two more exchanges than the plain
    form; per-task input is one bucket of one key plus the
    buckets-per-key carry rows.
    """
    clash = [c for c in left.columns
             if c.lower() in _ASOF_INTERNAL
             or c.lower().startswith(("_r_", "_p_"))]
    if clash:
        raise ValueError(f"left columns collide with asof internals: {clash}")
    missing = [c for c in right_vals if c not in right.columns]
    if missing:
        raise ValueError(f"right_vals not in right side: {missing}")

    l2 = (left
          .withColumn("_k", F.col(on))
          .withColumn("_ts", F.col(left_ts))
          .withColumn("_side", F.lit(1)))
    # "__ts" rides along as a pseudo right-val so both code paths carry
    # the matched right timestamp exactly like a payload column
    rcols = [*right_vals, "__ts"]
    out_names = [*right_vals, matched_ts_col]
    # three-valued join logic: a NULL key or NULL timestamp on the
    # right can never be anyone's match (l.ts >= NULL is never true).
    # Without this filter the window path would pair NULL-key lefts
    # with NULL-key rights (partitionBy groups NULLs together) — and
    # the plain and bucketed forms would even disagree with each
    # other, because the bucketed carry JOIN drops NULL keys.
    r2 = (right
          .where(F.col(on).isNotNull() & F.col(right_ts).isNotNull())
          .select(
              F.col(on).alias("_k"),
              F.col(right_ts).alias("_ts"),
              F.lit(0).alias("_side"),
              F.col(right_ts).alias("_r___ts"),
              *[F.col(c).alias(f"_r_{c}") for c in right_vals]))
    un = l2.unionByName(r2, allowMissingColumns=True)

    if bucket_seconds is None:
        w = (Window.partitionBy("_k")
             .orderBy(F.col("_ts").asc(), F.col("_side").asc())
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        carried = [F.last(f"_r_{c}", ignorenulls=True).over(w).alias(name)
                   for c, name in zip(rcols, out_names)]
        out = un.select("*", *carried).where(F.col("_side") == 1)
        return out.select(*left.columns, *out_names)

    if bucket_seconds <= 0:
        raise ValueError("bucket_seconds must be positive")
    # NULL-ts left rows can never match (NULL sorts before every right
    # row), but F.window's plan rewrite injects a not-null filter that
    # would DROP them from the bucketed plan — answer them directly
    # with NULL payloads and union back at the end (plain path keeps
    # them in the window naturally)
    rtype = right.schema[right_ts].dataType
    null_left = (l2.where(F.col("_ts").isNull())
                 .select(*left.columns,
                         *[F.lit(None).cast(right.schema[c].dataType)
                           .alias(name)
                           for c, name in zip(right_vals, out_names)],
                         F.lit(None).cast(rtype).alias(matched_ts_col)))
    un = un.where(F.col("_ts").isNotNull())
    # bucket id = tumbling-window start: works for BOTH TimestampType
    # and TimestampNTZType (a numeric cast of TIMESTAMP_NTZ is refused
    # by the analyzer — caught by the /tmp verify drive, not the test
    # fixture, whose session reads parquet as LTZ), and window-start is
    # monotone in ts so bucket order == time order
    un = un.withColumn(
        "_b", F.window(F.col("_ts"), f"{bucket_seconds} seconds")["start"])

    # stage 1: within-bucket growing prefix (parallel across buckets)
    w1 = (Window.partitionBy("_k", "_b")
          .orderBy(F.col("_ts").asc(), F.col("_side").asc())
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    pre = un.select("*", *[
        F.last(f"_r_{c}", ignorenulls=True).over(w1).alias(f"_p_{c}")
        for c in rcols])

    # stage 2: one row per non-empty right bucket — its LAST right row
    # (struct max orders by _ts first; (key, ts) is unique on the right)
    summ = (un.where(F.col("_side") == 0)
            .groupBy("_k", "_b")
            .agg(F.max(F.struct("_ts", *[f"_r_{c}" for c in rcols]))
                 .alias("_s")))
    # carry-in for EVERY bucket the union touches: last summary strictly
    # before it — a buckets-only window (the hot-key reduction)
    wb = (Window.partitionBy("_k").orderBy(F.col("_b").asc())
          .rowsBetween(Window.unboundedPreceding, -1))
    carry = (un.select("_k", "_b").distinct()
             .join(summ, ["_k", "_b"], "left")
             .select("_k", "_b",
                     F.last("_s", ignorenulls=True).over(wb).alias("_cin")))

    out = (pre.where(F.col("_side") == 1)
           .join(carry, ["_k", "_b"], "left")
           .select(*left.columns,
                   *[F.coalesce(F.col(f"_p_{c}"),
                                F.col("_cin").getField(f"_r_{c}"))
                     .alias(name)
                     for c, name in zip(rcols, out_names)]))
    return out.unionByName(null_left)
