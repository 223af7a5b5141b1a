"""Streaming sketch state: foreachBatch merge, replay idempotence, and a
real Structured Streaming run over a file source."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from cuckoofilter_spark.kernels.hll import HyperLogLog
from cuckoofilter_spark.sketch.aggregates import hll_sketch
from cuckoofilter_spark.sources.tokens import tokens_table
from cuckoofilter_spark.streaming.sketch_stream import StreamingSketchState


def test_foreachbatch_merge_and_replay(spark, tmp_path):
    toks = tokens_table(spark, 600, seed=42).persist()
    b0 = toks.where("doc_id < 'doc000000000200'")
    b1 = toks.where("doc_id >= 'doc000000000200' AND doc_id < 'doc000000000400'")
    b2 = toks.where("doc_id >= 'doc000000000400'")

    st = StreamingSketchState(str(tmp_path / "hll"), "hll", "tokens", p=13, seed=3)
    st.update(b0, 0)
    st.update(b1, 1)
    st.update(b1, 1)  # replayed micro-batch must be a no-op
    st.update(b0, 0)  # stale replay must be a no-op
    st.update(b2, 2)

    streamed = st.load()
    whole = hll_sketch(toks, "tokens", p=13, seed=3)
    # incremental merge over disjoint batches == one-shot build, bit-exact
    assert np.array_equal(streamed.registers, whole.registers)
    assert st.last_batch_id() == 2


def test_cms_replay_guard_protects_counts(spark, tmp_path):
    toks = tokens_table(spark, 200, seed=42).persist()
    st = StreamingSketchState(str(tmp_path / "cms"), "cms", "tokens",
                              eps=0.01, delta=0.01, seed=3)
    st.update(toks, 0)
    total_once = st.load().total
    st.update(toks, 0)  # replay
    assert st.load().total == total_once  # counts not doubled


def test_real_stream_file_source(spark, tmp_path):
    # write the token table as a parquet "stream" directory, read it as a
    # stream, run one availableNow pass through foreachBatch
    toks = tokens_table(spark, 300, seed=42)
    src = str(tmp_path / "src")
    toks.write.parquet(src)
    stream = (spark.readStream.schema(toks.schema)
              .option("maxFilesPerTrigger", "2").parquet(src))
    st = StreamingSketchState(str(tmp_path / "st"), "hll", "tokens", p=13, seed=5)
    q = st.attach(stream, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    assert not q.isActive
    streamed = st.load()
    whole = hll_sketch(toks, "tokens", p=13, seed=5)
    assert np.array_equal(streamed.registers, whole.registers)
    assert st.last_batch_id() >= 0
