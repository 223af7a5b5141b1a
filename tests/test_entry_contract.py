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


# derived from the contract itself so a new query can never be
# forgotten here (the r3 driver gate silently covered 50/56 — the
# local replica must always parametrize over EVERYTHING)
import __spark_entry__ as _entry_mod

ALL_QUERIES = list(_entry_mod.queries())


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


# the driver gate records only the first GATE_CAP queries() entries
# (observed cap at both r3 and r4; not under builder control)
GATE_CAP = 50


def test_driver_gate_rotation(contract):
    """Rotation invariant for the driver's 50-row gate cap (VERDICT r4
    #1). The r3/r4 gates each recorded exactly the FIRST 50 queries()
    entries, so full coverage of a single artifact is unattainable once
    queries() > 50. What IS attainable, and what this test pins:

    1. every row any artifact recorded is green (err-free, all three
       matches) — a red driver row is always a failure here;
    2. every query missing from the union of the LAST TWO artifacts
       sits inside the first GATE_CAP positions of the CURRENT
       queries() order — i.e. it will be gated at the next driver run,
       so the rolling union of consecutive gates covers everything.

    (2) holds before and after a driver run: adding a query past
    position 50, or letting a never-gated query slip out of the
    window, fails immediately."""
    import glob
    import json
    import os

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    files = sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json")))
    if not files:
        pytest.skip("no driver gate artifact yet")
    latest = json.load(open(files[-1]))
    for name, rec in latest.items():
        assert rec.get("err") in (None, ""), f"{files[-1]}:{name}: {rec['err']}"
        assert rec.get("rows_match") and rec.get("schema_match"), \
            f"{files[-1]}:{name}: mismatch recorded"
        assert rec.get("hash_match", True), f"{files[-1]}:{name}: hash mismatch"

    gated = set(latest)
    if len(files) >= 2:
        gated |= set(json.load(open(files[-2])))
    order = list(contract.queries())
    window = set(order[:GATE_CAP])
    ungated = set(order) - gated
    assert ungated <= window, (
        f"queries with no row in the last two gate artifacts must sit in "
        f"the first {GATE_CAP} positions of queries() so the next gate "
        f"records them; out of window: {sorted(ungated - window)}")
