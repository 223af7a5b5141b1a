"""Sequence packing + stratified sampling (ops/packing.py) and
vocab coverage (ops/text.py vocab_coverage)."""

import pytest
from pyspark.sql import functions as F

from cuckoofilter_spark.ops.packing import pack_chunks, stratified_sample
from cuckoofilter_spark.ops.text import vocab_coverage

CHUNK = 100


@pytest.fixture(scope="module")
def docs(spark):
    # 60 docs, lengths 1..60 (total 1830 tokens), a zero-length doc mixed in
    rows = [(i, (i % 60) + 1) for i in range(60)] + [(999, 0)]
    return spark.createDataFrame(rows, "doc_id long, n long")


def test_pack_conservation_and_fullness(docs):
    out = pack_chunks(docs, "doc_id", "n", chunk_size=CHUNK,
                      bucket_docs=16).collect()
    total = sum(r.n for r in docs.collect())
    assert sum(r.tok_filled for r in out) == total
    # chunk ids contiguous from 0
    ids = [r.chunk_id for r in out]
    assert ids == list(range(len(out)))
    # every chunk but the last is exactly full
    for r in out[:-1]:
        assert r.tok_filled == CHUNK
    assert 0 < out[-1].tok_filled <= CHUNK
    for r in out:
        assert r.n_docs >= 1 and r.first_doc <= r.last_doc


def test_pack_bucket_size_invariance(docs):
    """The hierarchical prefix sum must equal the textbook global scan:
    any bucket_docs partitioning gives bit-identical chunks."""
    a = pack_chunks(docs, "doc_id", "n", chunk_size=CHUNK, bucket_docs=7)
    b = pack_chunks(docs, "doc_id", "n", chunk_size=CHUNK, bucket_docs=1000)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_pack_plan_broadcasts_offsets(docs):
    """The bucket-offset side must broadcast (no wide shuffle of the doc
    stream onto the offsets), and the doc-side running sum must be a
    window PARTITIONED by bucket — never the one-task global window."""
    plan = pack_chunks(docs, "doc_id", "n", chunk_size=CHUNK,
                       bucket_docs=16)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # the window spec carries the bucket partition key
    assert "windowspecdefinition(_b" in plan


def test_pack_doc_split_across_boundary(spark):
    # one 250-token doc at offset 0 with chunk 100 -> spans chunks 0,1,2
    df = spark.createDataFrame([(1, 250)], "doc_id long, n long")
    out = pack_chunks(df, "doc_id", "n", chunk_size=100).collect()
    assert [(r.chunk_id, r.tok_filled, r.n_docs) for r in out] == [
        (0, 100, 1), (1, 100, 1), (2, 50, 1)]


def test_stratified_sample_deterministic_subset(spark):
    df = spark.createDataFrame(
        [(i, "en" if i % 2 else "zh") for i in range(400)],
        "doc_id long, lang string")
    rates = {"en": 30, "zh": 100}
    a = {tuple(r) for r in stratified_sample(df, "doc_id", "lang", rates).collect()}
    b = {tuple(r) for r in stratified_sample(df, "doc_id", "lang", rates).collect()}
    assert a == b  # replay-stable
    full = {tuple(r) for r in df.collect()}
    assert a <= full
    zh = {r for r in a if r[1] == "zh"}
    en = {r for r in a if r[1] == "en"}
    assert len(zh) == 200  # 100% stratum keeps everything
    assert 30 <= len(en) <= 90  # ~30% of 200, generous slack
    # unknown stratum defaults to drop
    df2 = df.withColumn("lang", F.lit("xx"))
    assert stratified_sample(df2, "doc_id", "lang", rates).count() == 0


def test_vocab_coverage_tie_break_and_rates(spark):
    # words: 'b' x3, 'c' x3 (tie), 'a' x2 — V=1 must pick 'b' (count
    # desc, word asc), so oov = 5 of 8
    df = spark.createDataFrame(
        [("g", "b b b c"), ("g", "c c a a")], "grp string, text string")
    out = vocab_coverage(df, "text", "grp", vocab_size=1).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.total_tokens, r.oov_tokens) == (8, 5)
    assert r.oov_rate_e6 == 5 * 1_000_000 // 8


def test_per_key_topk_plain_equals_salted_with_hot_key(spark):
    """The two-level salted quota cut is EXACT: a key's global top-k is
    top-k within its salt bucket. Hot key 'h' holds 500 of 700 rows;
    both forms must keep the identical row set, k per key, best-first
    with a unique tiebreak."""
    import numpy as np
    from cuckoofilter_spark.ops.packing import per_key_topk

    rng = np.random.default_rng(7)
    rows = [("h" if i < 500 else f"s{i % 7}", int(rng.integers(0, 50)), i)
            for i in range(700)]
    df = spark.createDataFrame(rows, "src string, score long, id long")
    order = [F.col("score").desc(), F.col("id").asc()]
    plain = {tuple(r) for r in per_key_topk(df, "src", order, k=5).collect()}
    salted = {tuple(r) for r in
              per_key_topk(df, "src", order, k=5, salt_buckets=8,
                           salt_on="id").collect()}
    assert plain == salted
    # exactness vs brute force
    import collections
    best = collections.defaultdict(list)
    for src, score, i in rows:
        best[src].append((-score, i))
    exp = {(src, -ns, i)
           for src, lst in best.items()
           for ns, i in sorted(lst)[:5]}
    assert plain == {(r[0], r[1], r[2]) for r in plain} and plain == exp


def test_per_key_topk_validation(spark):
    from cuckoofilter_spark.ops.packing import per_key_topk

    df = spark.createDataFrame([("a", 1)], "src string, id long")
    with pytest.raises(ValueError, match="order_by"):
        per_key_topk(df, "src", [], k=1)
    with pytest.raises(ValueError, match="salt_on"):
        per_key_topk(df, "src", [F.col("id")], k=1, salt_buckets=4)
    with pytest.raises(ValueError, match="positive"):
        per_key_topk(df, "src", [F.col("id")], k=1, salt_buckets=0,
                     salt_on="id")
