"""Replicates the driver's CORRECTNESS gate locally: every queries()
entry at sf0.01 must match its oracle_sql() via DuckDB on row count,
schema width, and order-insensitive value hash (columns sorted by
name, rows sorted, values stringified with float rounding).

The oracle is fetched through pandas (``.df()``), NOT ``fetchall()``,
to mirror the driver's fetch path: DuckDB ``sum()`` over integers is
HUGEINT, and the pandas/Arrow conversion coerces HUGEINT to float64
(pandas has no int128) — a type drift ``fetchall()``'s Python ints
never show (the round-2 red rows hid behind exactly that gap). The
hash is also TYPE-TAGGED (int vs float vs bool) so an engine-side
float where Spark emits int64 mismatches even when the values print
identically."""

import hashlib
import math

import duckdb
import numpy as np
import pytest

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _norm_cell(v):
    if isinstance(v, np.generic):
        v = v.item()  # AFTER the pandas fetch, so HUGEINT->float64 shows
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "b:" + str(bool(v)).lower()
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        return f"f:{v:.6g}"
    if isinstance(v, int):
        return f"i:{v}"
    return "s:" + str(v)


def _hash_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(_norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


@pytest.fixture(scope="module")
def ducks():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


@pytest.fixture(scope="module")
def contract():
    import __spark_entry__ as e

    return e


def test_entry_smoke(spark, contract):
    df = contract.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0 and len(df.columns) > 0


def _compare(spark, ducks, contract, name):
    q = contract.queries()[name]
    sdf = q(spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    scols = list(sdf.columns)
    sql = contract.oracle_sql().get(name)
    if sql is None:
        assert len(srows) >= 0  # rows-only check
        return
    odf = ducks.execute(sql).df()  # pandas fetch = the driver's path
    ocols = list(odf.columns)
    ores = [tuple(r) for r in odf.itertuples(index=False, name=None)]
    assert sorted(scols) == sorted(ocols), f"{name}: columns {scols} vs {ocols}"
    assert len(srows) == len(ores), f"{name}: rows {len(srows)} vs {len(ores)}"
    hs, ho = _hash_rows(scols, srows), _hash_rows(ocols, ores)
    if hs != ho:
        sset = {tuple(_norm_cell(v) for v in r) for r in srows}
        oset = {tuple(_norm_cell(v) for v in r) for r in ores}
        diff_s = list(sset - oset)[:5]
        diff_o = list(oset - sset)[:5]
        raise AssertionError(
            f"{name}: value hash mismatch\n only-spark={diff_s}\n only-oracle={diff_o}")


ALL_QUERIES = [
    "cf_membership", "xor_membership", "xorplus_membership", "cf_stable_membership",
    "cf_semisort_membership", "shingle_membership",
    "tail_membership", "crate_membership",
    "cf_checkpoint_membership", "cf_delete_membership", "bloom_membership",
    "blocked_bloom_membership", "grow_bloom_membership", "gcs_membership",
    "cf_mixed_probe", "cf_prefilter_join", "cf_prefilter_anti_join",
    "hll_distinct", "hll_overlap", "grouped_distinct", "repetition_stats", "unigram_xent",
    "cms_topk_freq", "mg_topk_freq", "cqf_topk_freq", "cqf_enumerate",
    "kll_quantiles", "grouped_quantiles",
    "tdigest_quantiles", "match_size", "count_distinct",
    "has_duplicates", "mixin_sample", "windowed_events", "text_stats",
    "winnow_fingerprint", "spooky_membership",
    "sequence_pack", "stratified_sample",
    "vocab_coverage", "exact_dedup", "dup_spans", "contamination",
    "corpus_filter",
    "jaccard_pairs", "minhash_lsh_pairs", "dedup_clusters", "simhash_pairs",
    "ann_cosine_topk", "ann_lsh_topk", "ann_ivf_topk", "embedding_neardup",
    "token_count_total", "bpe_token_count",
    "multimodal_features", "tokens_pipeline",
]


@pytest.mark.parametrize("name", ALL_QUERIES)
def test_query_vs_oracle(spark, ducks, contract, name):
    _compare(spark, ducks, contract, name)


def test_all_queries_have_entries(contract):
    qs = contract.queries()
    assert set(ALL_QUERIES) == set(qs)
    # round 2: every query has a DuckDB oracle (the former no_oracle
    # queries were re-expressed as exact facts + Spark-verified bound
    # flags via the cross-engine md5-LE64 hash)
    assert set(qs) - set(contract.oracle_sql()) == set()
