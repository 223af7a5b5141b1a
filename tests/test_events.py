"""ops/events: gap sessionization + as-of join.

Pins the two cross-engine-sensitive semantics the DuckDB oracles rely
on (session_window's INCLUSIVE exact-gap merge; asof's inclusive
backward match with right-sorts-first ties), checks the asof answer
against an independent pandas merge_asof oracle on a randomized
workload, and asserts the one-exchange plan shape of the asof
composition.
"""

import datetime as dt
import re

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from cuckoofilter_spark.ops.events import asof_join, sessionize


def _plan(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_session_window_exact_gap_merges(spark):
    """An event at exactly prev + gap joins the SAME session (inclusive
    boundary), and session_end is last-event + gap. This is the measured
    Spark 4.1.2 semantics the DuckDB oracle's strict `diff > gap`
    restatement depends on — if this test ever fails, the sessionize
    oracle in __spark_entry__ must flip to `>=`."""
    rows = [(1, dt.datetime(2024, 1, 1, 0, 0, 0)),
            (1, dt.datetime(2024, 1, 1, 1, 0, 0)),       # exactly +gap
            (1, dt.datetime(2024, 1, 1, 1, 59, 59)),     # within gap
            (1, dt.datetime(2024, 1, 1, 3, 0, 0)),       # 1s past gap: new
            (2, dt.datetime(2024, 1, 1, 0, 0, 0, 123456))]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {(r.user_id, r.session_start, r.session_end, r.n_events)
           for r in sessionize(df, "user_id", "ts", gap="1 hour").collect()}
    assert got == {
        (1, dt.datetime(2024, 1, 1, 0, 0, 0),
         dt.datetime(2024, 1, 1, 2, 59, 59), 3),
        (1, dt.datetime(2024, 1, 1, 3, 0, 0),
         dt.datetime(2024, 1, 1, 4, 0, 0), 1),
        (2, dt.datetime(2024, 1, 1, 0, 0, 0, 123456),
         dt.datetime(2024, 1, 1, 1, 0, 0, 123456), 1),
    }


def test_sessionize_value_sum(spark):
    rows = [(1, dt.datetime(2024, 1, 1, 0, 0, 0), 1.5),
            (1, dt.datetime(2024, 1, 1, 0, 30, 0), 2.5)]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = sessionize(df, "user_id", "ts", gap="1 hour",
                     value_col="value").collect()
    assert len(out) == 1 and out[0].n_events == 2 and out[0].value_sum == 4.0


def test_asof_join_matches_pandas_merge_asof(spark):
    """Randomized parity with pandas merge_asof (backward, inclusive):
    8 keys, duplicate left timestamps, left rows with no preceding
    right row (NULL path), and a canonicalized right side."""
    rng = np.random.default_rng(20260819)
    n_l, n_r = 500, 350
    lp = pd.DataFrame({
        "k": rng.integers(0, 8, n_l),
        "lts": pd.to_datetime(rng.integers(0, 10**6, n_l), unit="s"),
        "lid": np.arange(n_l)})
    rp = pd.DataFrame({
        "k": rng.integers(0, 8, n_r),
        "rts": pd.to_datetime(rng.integers(0, 10**6, n_r), unit="s"),
        "v": rng.integers(0, 1000, n_r)})
    rp = rp.groupby(["k", "rts"], as_index=False).agg(v=("v", "max"))

    out = asof_join(spark.createDataFrame(lp), spark.createDataFrame(rp),
                    on="k", left_ts="lts", right_ts="rts",
                    right_vals=["v"]).toPandas()
    exp = pd.merge_asof(lp.sort_values("lts"), rp.sort_values("rts"),
                        left_on="lts", right_on="rts", by="k",
                        allow_exact_matches=True, direction="backward")
    got = out.sort_values("lid").reset_index(drop=True)
    exp = exp.sort_values("lid").reset_index(drop=True)
    assert exp["v"].isna().sum() > 0  # the NULL path is exercised
    assert (got["v"].fillna(-1).to_numpy()
            == exp["v"].fillna(-1).to_numpy()).all()
    assert (got["asof_ts"].fillna(pd.Timestamp(0)).to_numpy()
            == exp["rts"].fillna(pd.Timestamp(0)).to_numpy()).all()


def test_asof_join_exact_tie_matches(spark):
    """A right row at exactly left_ts is matched (inclusive backward)."""
    t = dt.datetime(2024, 1, 1, 12, 0, 0)
    left = spark.createDataFrame([(1, t, 10)], "k long, lts timestamp, lid long")
    right = spark.createDataFrame([(1, t, 99)], "k long, rts timestamp, v long")
    out = asof_join(left, right, on="k", left_ts="lts", right_ts="rts",
                    right_vals=["v"]).collect()
    assert out[0].v == 99 and out[0].asof_ts == t


def test_asof_join_rejects_internal_collisions(spark):
    t = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame([(1, t, 0)], "k long, lts timestamp, _SIDE long")
    right = spark.createDataFrame([(1, t, 1)], "k long, rts timestamp, v long")
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right, on="k", left_ts="lts", right_ts="rts",
                  right_vals=["v"])
    with pytest.raises(ValueError, match="right_vals"):
        asof_join(left.drop("_SIDE"), right, on="k", left_ts="lts",
                  right_ts="rts", right_vals=["nope"])


@pytest.mark.parametrize("bucket_seconds", [3600, 86400, 10**9])
def test_asof_join_bucketed_equals_plain(spark, bucket_seconds):
    """The hot-key two-level form (per-(key, time-bucket) prefix window
    + buckets-only carry window) returns EXACTLY the plain path's
    answer — at a fine width, a coarse width, and one giant bucket
    (which degenerates to the plain form). Workload includes a hot key
    holding half of all rows, exact ties, and left rows before any
    right row."""
    rng = np.random.default_rng(42)
    n_l, n_r = 600, 400
    hot = np.where(rng.random(n_l) < 0.5, 0, rng.integers(1, 6, n_l))
    lp = pd.DataFrame({
        "k": hot,
        "lts": pd.to_datetime(rng.integers(0, 30 * 86400, n_l), unit="s"),
        "lid": np.arange(n_l)})
    rp = pd.DataFrame({
        "k": np.where(rng.random(n_r) < 0.5, 0, rng.integers(1, 6, n_r)),
        "rts": pd.to_datetime(rng.integers(0, 30 * 86400, n_r), unit="s"),
        "v": rng.integers(0, 1000, n_r)})
    rp = rp.groupby(["k", "rts"], as_index=False).agg(v=("v", "max"))
    L, R = spark.createDataFrame(lp), spark.createDataFrame(rp)

    plain = asof_join(L, R, on="k", left_ts="lts", right_ts="rts",
                      right_vals=["v"]).toPandas()
    bucketed = asof_join(L, R, on="k", left_ts="lts", right_ts="rts",
                         right_vals=["v"],
                         bucket_seconds=bucket_seconds).toPandas()
    a = plain.sort_values("lid").reset_index(drop=True)
    b = bucketed.sort_values("lid").reset_index(drop=True)
    assert (a["v"].fillna(-1).to_numpy() == b["v"].fillna(-1).to_numpy()).all()
    assert (a["asof_ts"].fillna(pd.Timestamp(0)).to_numpy()
            == b["asof_ts"].fillna(pd.Timestamp(0)).to_numpy()).all()


def test_asof_join_null_semantics_match_sql(spark):
    """Three-valued join logic for NULLs: NULL-key or NULL-ts right
    rows are never matchable (l.ts >= NULL is never true); NULL-key /
    NULL-ts left rows survive with NULL payload. Plain and bucketed
    agree — without the right-side filter they would not even agree
    with each other (the window groups NULL keys together; the
    bucketed carry join drops them). NULL-KEY behavior matches DuckDB
    ASOF; NULL-TS deliberately does not (DuckDB 1.0 treats NULL ts as
    sort-largest and matches NULL-ts pairs — a quirk, not standard
    ternary logic), so oracle queries keep join columns NULL-free."""
    t = dt.datetime(2024, 1, 1, 12)
    left = spark.createDataFrame(
        [(None, t, 1), (1, t, 2), (1, None, 3)],
        "k long, lts timestamp, lid long")
    right = spark.createDataFrame(
        [(None, t, 99), (1, None, 88), (1, t, 77)],
        "k long, rts timestamp, v long")
    for kw in ({}, {"bucket_seconds": 3600}):
        got = sorted((r.lid, r.v) for r in
                     asof_join(left, right, on="k", left_ts="lts",
                               right_ts="rts", right_vals=["v"],
                               **kw).collect())
        assert got == [(1, None), (2, 77), (3, None)], (kw, got)


def test_sessionize_drops_null_timestamps(spark):
    """session_window silently DROPS NULL-timestamp rows (measured
    Spark 4.1.2 behavior the module docstring documents); NULL keys
    form their own group."""
    t = dt.datetime(2024, 1, 1, 12)
    df = spark.createDataFrame([(1, None), (1, t), (None, t)],
                               "user_id long, ts timestamp")
    out = sessionize(df, "user_id", "ts", gap="1 hour").collect()
    assert sum(r.n_events for r in out) == 2  # the (1, NULL) row is gone
    assert {r.user_id for r in out} == {1, None}


def test_asof_join_bucketed_ntz_timestamps(spark):
    """Parquet timestamps written without UTC adjustment read as
    TIMESTAMP_NTZ in Spark 4 (inferTimestampNTZ default) — and NTZ
    refuses numeric casts, which the first bucketing implementation
    used (caught by the verify drive, not by createDataFrame-based
    tests, which produce LTZ). Pin the whole asof surface on NTZ."""
    t0 = dt.datetime(2024, 1, 1)
    left = (spark.createDataFrame(
        [(0, t0 + dt.timedelta(minutes=7 * i), i) for i in range(40)],
        "k long, lts timestamp, lid long")
        .withColumn("lts", F.col("lts").cast("timestamp_ntz")))
    right = (spark.createDataFrame(
        [(0, t0 + dt.timedelta(minutes=11 * i), i) for i in range(20)],
        "k long, rts timestamp, v long")
        .withColumn("rts", F.col("rts").cast("timestamp_ntz")))
    plain = {(r.lid, r.v) for r in
             asof_join(left, right, on="k", left_ts="lts", right_ts="rts",
                       right_vals=["v"]).collect()}
    bucketed = {(r.lid, r.v) for r in
                asof_join(left, right, on="k", left_ts="lts",
                          right_ts="rts", right_vals=["v"],
                          bucket_seconds=1800).collect()}
    assert plain == bucketed and len(plain) == 40
    # sessionize over NTZ as well (session_window accepts both)
    sess = sessionize(left, "k", "lts", gap="10 minutes").collect()
    assert sum(r.n_events for r in sess) == 40


def test_asof_join_bucketed_window_partitions_by_bucket(spark):
    """The scale property itself: the bucketed form's big window
    partitions by (key, bucket) — a hot key's rows spread over its
    buckets — and the only key-wide window runs over bucket summaries,
    not rows."""
    t0 = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [(0, t0 + dt.timedelta(minutes=i), i) for i in range(50)],
        "k long, lts timestamp, lid long")
    right = spark.createDataFrame(
        [(0, t0 + dt.timedelta(minutes=2 * i), i) for i in range(25)],
        "k long, rts timestamp, v long")
    df = asof_join(left, right, on="k", left_ts="lts", right_ts="rts",
                   right_vals=["v"], bucket_seconds=600)
    executed = df._jdf.queryExecution().executedPlan().toString()
    # the row-bearing prefix window partitions by (key, bucket)...
    assert re.search(r"windowspecdefinition\(_k#\d+L, _b#\d+, _ts#",
                     executed), executed
    # ...no window orders a whole key's ROWS (the plain hot-key shape)...
    assert not re.search(r"windowspecdefinition\(_k#\d+L, _ts#",
                         executed), executed
    # ...and the only key-wide window walks bucket summaries (ordered
    # by _b), one row per non-empty bucket
    assert re.search(r"windowspecdefinition\(_k#\d+L, _b#\d+ ASC",
                     executed), executed


def test_streaming_sessionize_matches_batch(spark, tmp_path):
    """sessionize IS the Structured Streaming session operator: the
    same call over readStream + withWatermark, append mode. Three
    micro-batches (maxFilesPerTrigger=1); user 2's events arrive in
    DIFFERENT batches and must merge into one session (the state-store
    session merge); a far-future sentinel advances the watermark so
    every real session closes and is emitted. Streamed rows == the
    batch run over the same events."""
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows1 = [(1, t0), (1, t0 + dt.timedelta(minutes=30)), (2, t0)]
    rows2 = [(1, t0 + dt.timedelta(hours=3)),
             (2, t0 + dt.timedelta(minutes=20))]   # merges with batch-1 row
    sentinel = [(999, t0 + dt.timedelta(days=2))]  # watermark flush
    schema = "user_id long, ts timestamp"
    src = str(tmp_path / "src")
    for chunk in (rows1, rows2, sentinel):
        (spark.createDataFrame(chunk, schema)
         .coalesce(1).write.mode("append").parquet(src))

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "1").parquet(src))
    sess = sessionize(stream.withWatermark("ts", "10 minutes"),
                      "user_id", "ts", gap="1 hour")
    q = (sess.writeStream.format("memory").queryName("sess_stream")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    assert not q.isActive

    got = {tuple(r) for r in spark.sql("SELECT * FROM sess_stream").collect()}
    exp = {tuple(r) for r in
           sessionize(spark.createDataFrame(rows1 + rows2, schema),
                      "user_id", "ts", gap="1 hour").collect()}
    assert got == exp
    # the cross-batch merge really happened: user 2 has ONE session of 2
    assert sum(1 for r in got if r[0] == 2) == 1
    assert next(r[3] for r in got if r[0] == 2) == 2


def test_asof_join_single_exchange_no_python(spark):
    """The asof composition's physical plan: exactly ONE exchange (the
    key hashpartitioning the window needs — the union reads feed it
    directly) and no Python evaluation anywhere."""
    t0 = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [(i % 5, t0 + dt.timedelta(seconds=i), i) for i in range(100)],
        "k long, lts timestamp, lid long")
    right = spark.createDataFrame(
        [(i % 5, t0 + dt.timedelta(seconds=3 * i), i) for i in range(40)],
        "k long, rts timestamp, v long")
    df = asof_join(left, right, on="k", left_ts="lts",
                   right_ts="rts", right_vals=["v"])
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert executed.count("Exchange") == 1, executed
    assert "hashpartitioning(_k" in executed, executed
    assert "Python" not in executed, executed
