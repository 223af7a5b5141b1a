#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric (BASELINE.json): tokens/sec sketch-build throughput over
the canonical pre-tokenized sequence table (doc_id, tokens:array<int32>,
n_tok, source — synthesized deterministically, sources/tokens.py) plus
observed false-positive rate vs the 12-bit-fingerprint analytical bound,
and per-query wall times for the driver-contract queries at
$SPARK_GRAFT_SF_DIR.

Modes:
  python bench.py                 # full bench -> one JSON line (driver mode)
  python bench.py --build-only    # token sketch-build suite only -> JSON line
  python bench.py --scaling       # run --build-only at local[8] and local[32]
                                  # subprocesses; report scaling efficiency
                                  # (sandbox stand-in for N vs 4N executors)
"""

from __future__ import annotations

import json
import os
import pathlib
import subprocess
import sys
import time

_REPO = str(pathlib.Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SEED = 0x5EED
VOCAB = 50_000
NEG_PROBES = 200_000


def _sf_of(sf_dir: str) -> float:
    try:
        return float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        return 0.1


def token_build_suite(spark, sf: float) -> dict:
    """North-rule headline: sketch builds over the token table.

    Returns throughput (tokens/sec), observed FPR vs bound, occupancy,
    bits/item — the same stats row shape as the reference's benchmark
    harness (bulk-insert-and-query.cc:146-169).
    """
    from pyspark.sql import functions as F

    from cuckoofilter_spark.sketch.aggregates import (
        cms_sketch, hll_sketch, kll_sketch)
    from cuckoofilter_spark.sketch.membership import (
        cuckoo_build, cuckoo_contains_col)
    from cuckoofilter_spark.sources.tokens import tokens_table

    num_docs = max(1_000, int(200_000 * sf))
    toks = tokens_table(spark, num_docs, seed=42, vocab_size=VOCAB).persist()
    total_tokens = toks.agg(F.sum("n_tok")).first()[0]
    distinct_ub = min(VOCAB, total_tokens)

    out: dict = {"num_docs": num_docs, "total_tokens": int(total_tokens)}

    t0 = time.time()
    cf = cuckoo_build(toks, "tokens", capacity=int(distinct_ub * 1.1) + 64,
                      bits=12, seed=SEED, num_shards=32)
    t_cf = time.time() - t0
    out["cf_build_sec"] = round(t_cf, 3)
    out["tokens_per_sec_cf_build"] = round(total_tokens / t_cf, 1)
    info = cf.info()
    out["cf_load_factor"] = round(info["load_factor"], 4)
    out["cf_bits_per_item"] = round(info["bits_per_item"], 2)

    # FPR: probe keys >= VOCAB are guaranteed negatives (tokens are % VOCAB)
    t0 = time.time()
    probes = spark.range(VOCAB, VOCAB + NEG_PROBES)
    fp = probes.where(cuckoo_contains_col(spark, cf, "id")).count()
    out["cf_probe_sec"] = round(time.time() - t0, 3)
    out["cf_probes_per_sec"] = round(NEG_PROBES / max(out["cf_probe_sec"], 1e-9), 1)
    out["cf_observed_fpp"] = fp / NEG_PROBES
    out["cf_fpp_bound"] = 2.0 * 4 / (1 << 12)  # 2b/2^f, cuckoofilter.h analysis

    t0 = time.time()
    hll = hll_sketch(toks, "tokens", p=14, seed=SEED)
    out["hll_build_sec"] = round(time.time() - t0, 3)
    out["hll_estimate"] = round(hll.estimate(), 1)

    t0 = time.time()
    cms_sketch(toks, "tokens", eps=0.0005, delta=0.01, seed=SEED)
    out["cms_build_sec"] = round(time.time() - t0, 3)

    t0 = time.time()
    kll_sketch(toks, "n_tok", k=200, seed=SEED)
    out["kll_build_sec"] = round(time.time() - t0, 3)

    toks.unpersist()
    total = out["cf_build_sec"] + out["hll_build_sec"] + out["cms_build_sec"] + out["kll_build_sec"]
    out["sketch_build_total_sec"] = round(total, 3)
    # headline: all four sketch passes over the same token stream
    out["tokens_per_sec_all_sketches"] = round(4 * total_tokens / total, 1)
    return out


def query_suite(spark, sf_dir: str) -> dict:
    import __spark_entry__ as entry

    times: dict = {}
    for name, fn in entry.queries().items():
        t0 = time.time()
        fn(spark, sf_dir).collect()
        times[name] = round(time.time() - t0, 3)
    return times


def run_bench(build_only: bool) -> dict:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = _sf_of(sf_dir)

    from cuckoofilter_spark.session import get_spark

    spark = get_spark("bench", cores=cpus)
    t_all = time.time()
    build = token_build_suite(spark, sf)
    queries = {} if build_only else query_suite(spark, sf_dir)
    total = round(time.time() - t_all, 3)

    result = {
        "metric": "tokens/sec sketch-build throughput (cuckoo+HLL+CMS+KLL over token table)",
        "value": build["tokens_per_sec_all_sketches"],
        "unit": "tokens/sec",
        "queries": queries,
        "sf": sf,
        "cpus": cpus,
        "total_bench_sec": total,
        "build": build,
    }
    spark.stop()
    return result


def run_scaling() -> dict:
    """Same job at two parallelism levels (stand-in for N vs 4N executors)."""
    results = {}
    for cpus in (8, 32):
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
        p = subprocess.run(
            [sys.executable, __file__, "--build-only"],
            capture_output=True, text=True, env=env, cwd=_REPO, check=True)
        line = [ln for ln in p.stdout.splitlines() if ln.startswith("{")][-1]
        results[cpus] = json.loads(line)
    thr8 = results[8]["value"]
    thr32 = results[32]["value"]
    speedup = thr32 / thr8
    return {
        "metric": "scaling efficiency local[8] -> local[32]",
        "value": round(speedup / 4.0, 3),
        "unit": "efficiency",
        "throughput_local8_tokens_per_sec": thr8,
        "throughput_local32_tokens_per_sec": thr32,
        "speedup": round(speedup, 2),
        "detail": {str(k): v["build"] for k, v in results.items()},
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench(build_only="--build-only" in sys.argv)))
