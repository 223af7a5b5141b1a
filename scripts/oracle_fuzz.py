"""Randomized-corpus sweep of the full driver contract.

Usage: ``python scripts/oracle_fuzz.py [master_seed]``

The driver gate (and its pytest replica, tests/test_entry_contract.py)
compares every ``queries()`` entry against its DuckDB oracle on ONE
fixed dataset (sf0.01). This sweep re-runs the identical comparison on
a RANDOM corpus per run: each table of sf0.01 is independently
Bernoulli-subsampled at a random rate in [0.3, 0.9] (fresh printed
master seed; pass it back as argv[1] to replay), which shifts every
join cardinality, filter selectivity, LSH bucket content, gram set,
and sketch load — while preserving schemas and key ranges, so no query
degenerates to empty-vs-empty.

Catches data-dependent bugs the fixed gate can't: a hash-collision
path that only trips on a particular key draw, a bound flag that is
tighter than its stated slack, an oracle that silently depends on the
fixed row set. Deliberately NOT part of the default pytest run (random
seeds + ~3 min of Spark per sweep); run ad hoc.
"""
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
# tiny dimension tables are kept whole: sampling a 5-row region table
# just deletes query outputs without exercising anything new
KEEP_WHOLE = {"region", "nation"}

MASTER = int(time.time()) if len(sys.argv) < 2 else int(sys.argv[1])
print(f"master seed: {MASTER}", flush=True)
rng = np.random.default_rng(MASTER)


def make_corpus(out_dir: str) -> None:
    import pyarrow.parquet as pq

    for t in TABLES:
        tab = pq.read_table(f"{SF_DIR}/{t}.parquet")
        if t not in KEEP_WHOLE:
            rate = float(rng.uniform(0.3, 0.9))
            mask = rng.random(tab.num_rows) < rate
            tab = tab.filter(mask)
        pq.write_table(tab, os.path.join(out_dir, f"{t}.parquet"))
        print(f"  {t}: {tab.num_rows} rows", flush=True)


def main() -> int:
    import duckdb

    from cuckoofilter_spark.session import get_spark
    # the gate replica's comparison, verbatim
    from tests.test_entry_contract import _hash_rows, _norm_cell

    import __spark_entry__ as e

    out_dir = tempfile.mkdtemp(prefix="oracle_fuzz_")
    make_corpus(out_dir)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{out_dir}/{t}.parquet'")
    spark = get_spark("oracle-fuzz", cores=8, shuffle_partitions=8)

    oracles = e.oracle_sql()
    fails = []
    for name, q in e.queries().items():
        t0 = time.time()
        try:
            sdf = q(spark, out_dir)
            srows = [tuple(r) for r in sdf.collect()]
            scols = list(sdf.columns)
            odf = con.execute(oracles[name]).df()
            ocols = list(odf.columns)
            ores = [tuple(r) for r in odf.itertuples(index=False, name=None)]
            ok = (sorted(scols) == sorted(ocols)
                  and len(srows) == len(ores)
                  and _hash_rows(scols, srows) == _hash_rows(ocols, ores))
            if not ok:
                sset = {tuple(_norm_cell(v) for v in r) for r in srows}
                oset = {tuple(_norm_cell(v) for v in r) for r in ores}
                fails.append((name, f"spark-only={list(sset - oset)[:3]} "
                                    f"oracle-only={list(oset - sset)[:3]}"))
                print(f"FAIL {name}: rows {len(srows)}/{len(ores)} "
                      f"cols {scols}/{ocols}", flush=True)
            else:
                print(f"ok {name} ({len(srows)} rows, "
                      f"{time.time() - t0:.1f}s)", flush=True)
        except Exception as exc:  # noqa: BLE001 — sweep must finish
            fails.append((name, repr(exc)))
            print(f"ERR {name}: {exc!r}", flush=True)
    spark.stop()
    print(f"fails: {len(fails)}")
    for name, detail in fails:
        print(f"  {name}: {detail}")
    if fails:
        return 1
    print("ORACLE-FUZZ-OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
