"""Randomized replay/crash fuzz of the streaming sketch state.

Usage: ``python scripts/stream_fuzz.py [master_seed]``

Spark's foreachBatch contract: a micro-batch may be re-delivered after
a failure (same batch_id, same data), and a restarted query resumes
from the checkpoint — the state layer must make every replay a no-op
and survive a driver restart between any two updates. The pytest suite
pins fixed replay patterns; this sweep randomizes them:

per trial — random doc partition into B batches; a delivery sequence
that walks batches in order but, with random probability, re-delivers
the current or any earlier batch (stale replays) and, with random
probability, "crashes" (drops the state object and re-opens it from
disk — the restart path) between deliveries. Afterward the streamed
HLL must equal the one-shot batch build BIT-EXACTLY (register arrays)
and last_batch_id() must be B-1; the grouped per-source state is swept
with the same random walk and must reproduce every group's one-shot
estimate. (Fixed replay patterns for cms/kll/mg live in
tests/test_streaming.py — HLL is the canary here because register-
level equality is the strictest cross-check.)

Deliberately NOT part of default pytest (random seeds, ~2 min of
Spark). Run ad hoc.
"""
import sys
import time

import numpy as np

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))

MASTER = int(time.time()) if len(sys.argv) < 2 else int(sys.argv[1])
print(f"master seed: {MASTER}", flush=True)
rng = np.random.default_rng(MASTER)

import tempfile

from cuckoofilter_spark.session import get_spark
from cuckoofilter_spark.sketch.aggregates import hll_sketch
from cuckoofilter_spark.sources.tokens import tokens_table
from cuckoofilter_spark.streaming.sketch_stream import (
    GroupedStreamingSketchState, StreamingSketchState)

spark = get_spark("stream-fuzz", cores=8, shuffle_partitions=8)
fails = []


def check(name, cond, detail=""):
    if not cond:
        fails.append((name, detail))
        print(f"FAIL {name}: {detail}", flush=True)


for trial in range(4):
    n_docs = int(rng.integers(200, 900))
    seed = int(rng.integers(0, 1 << 31))
    toks = tokens_table(spark, n_docs, seed=seed).persist()
    toks.count()
    n_b = int(rng.integers(2, 7))
    # random disjoint partition of docs into n_b batches
    edges = np.sort(rng.choice(np.arange(1, n_docs), size=n_b - 1,
                               replace=False))
    bounds = [0, *edges.tolist(), n_docs]
    batches = [
        toks.where(f"doc_id >= 'doc{bounds[i]:012d}' AND "
                   f"doc_id < 'doc{bounds[i+1]:012d}'")
        for i in range(n_b)
    ]

    p = int(rng.choice([12, 13]))
    hseed = int(rng.integers(0, 1 << 31))
    sdir = tempfile.mkdtemp(prefix="stream_fuzz_")
    st = StreamingSketchState(sdir, "hll", "tokens", p=p, seed=hseed)
    delivered = 0
    seqlog = []
    while delivered < n_b:
        r = rng.random()
        if r < 0.25 and delivered > 0:
            b = int(rng.integers(0, delivered))  # stale replay, no-op
            st.update(batches[b], b)
            seqlog.append(f"replay{b}")
        elif r < 0.4:
            # crash: drop the handle, re-open from disk (restart path)
            st = StreamingSketchState(sdir, "hll", "tokens", p=p, seed=hseed)
            seqlog.append("crash")
        else:
            st.update(batches[delivered], delivered)
            seqlog.append(f"b{delivered}")
            delivered += 1
    streamed = st.load()
    whole = hll_sketch(toks, "tokens", p=p, seed=hseed)
    check(f"trial{trial} hll bit-exact",
          bool(np.array_equal(streamed.registers, whole.registers)),
          f"seq={seqlog}")
    check(f"trial{trial} last_batch_id", st.last_batch_id() == n_b - 1,
          f"{st.last_batch_id()} != {n_b - 1} seq={seqlog}")

    # grouped variant: per-source distinct, same random delivery walk
    gdir = tempfile.mkdtemp(prefix="stream_fuzz_g_")
    gst = GroupedStreamingSketchState(gdir, "hll", "source", "tokens",
                                      p=p, seed=hseed)
    delivered = 0
    while delivered < n_b:
        r = rng.random()
        if r < 0.25 and delivered > 0:
            b = int(rng.integers(0, delivered))
            gst.update(batches[b], b)
        elif r < 0.4:
            gst = GroupedStreamingSketchState(gdir, "hll", "source",
                                              "tokens", p=p, seed=hseed)
        else:
            gst.update(batches[delivered], delivered)
            delivered += 1
    got = {g: s.estimate() for g, s in gst.load().items()}
    want = {}
    for row in toks.select("source", "tokens").toPandas().itertuples():
        want.setdefault(row.source, None)
    for g in want:
        sub = toks.where(f"source = '{g}'")
        want[g] = hll_sketch(sub, "tokens", p=p, seed=hseed).estimate()
    check(f"trial{trial} grouped bit-exact", got == want,
          f"got={got} want={want}")
    toks.unpersist()
    print(f"trial {trial} ok (docs={n_docs} batches={n_b} seq={seqlog})",
          flush=True)

spark.stop()
print(f"fails: {len(fails)}")
for name, detail in fails:
    print(f"  {name}: {detail}")
if fails:
    sys.exit(1)
print("STREAM-FUZZ-OK")
