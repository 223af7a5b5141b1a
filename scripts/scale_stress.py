"""10x-bench-scale stress of the round-4 scale paths.

Usage: ``python scripts/scale_stress.py`` (~25 s on local[32]).

Validates, at 10M distinct keys / 20M probes:
- xor_build_sharded over 10M distinct keys (task-local peel; the
  driver must never see the key set),
- cuckoo_build at the same scale, plus a sharded cuckoo_delete pass
  (the maintainable family's build/maintain path),
- contains_sharded (store path, colocate) over 20M probes with a
  2-shard LRU cap (bounded per-task filter memory), for both families,
- 10M events through sessionize (conservation), plain-vs-bucketed asof
  with a 50%-hot key, funnel (vs an independent join formulation) and
  retention (cell mass == exact user-day pairs),
- shuffle_shard at 10M rows (dense per-shard ranks, deterministic),
- priority_sample at 10M rows with a 50%-hot stratum (exact k+1 cut
  per stratum, dense ranks, weighted bias, determinism),
- embedding_centroids at 1M x 64-dim synthetic vectors (bit-exact
  numpy parity on every (label, dim) cell),
- MinHash-LSH leakage at 1M docs with planted cross-source duplicates
  and a hot source holding half the corpus (recall == 100% on exact
  dups),
- bounded-memory check: peak RSS of the driver stays far below the
  naive collect-everything path (asserted < 2 GB).
"""
import os, resource, sys, time
import numpy as np
sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))
from cuckoofilter_spark.session import get_spark
from pyspark.sql import functions as F

spark = get_spark("scale-stress", cores=32, shuffle_partitions=64)
N = 10_000_000
PROBES = 20_000_000
keys = spark.range(N).withColumn("id", (F.col("id") * 2654435761) % (1 << 40))
t0 = time.time()
from cuckoofilter_spark.sketch.membership import xor_build_sharded
filt = xor_build_sharded(keys, "id", fp_bits=8, num_shards=32)
t_build = time.time() - t0
size_mb = sum(len(b) for b in filt.blobs) / 1e6
rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
print(f"build: {t_build:.1f}s  {N/t_build/1e6:.1f}M keys/s  filter {size_mb:.0f} MB  driver peak RSS {rss_gb:.2f} GB", flush=True)

# members: same transform domain; negatives: ids > 2^40 (never generated)
member_probe = spark.range(0, PROBES // 2).withColumn(
    "id", (F.col("id") % N * 2654435761) % (1 << 40))
neg_probe = spark.range(PROBES // 2).withColumn(
    "id", F.col("id") + (1 << 41))
from cuckoofilter_spark.sketch.api import contains_sharded
t0 = time.time()
n_member_miss = contains_sharded(member_probe, "id", filt,
                                 max_cached_shards=2, colocate=True) \
    .where("NOT member").count()
t_m = time.time() - t0
t0 = time.time()
n_neg_hit = contains_sharded(neg_probe, "id", filt,
                             max_cached_shards=2, colocate=True) \
    .where("member").count()
t_n = time.time() - t0
fpr = n_neg_hit / (PROBES // 2)
print(f"probe: members {PROBES//2} in {t_m:.1f}s ({PROBES/2/t_m/1e6:.1f}M/s), "
      f"FN={n_member_miss}; negatives FPR={fpr:.5f} (xor8 bound ~0.0039) in {t_n:.1f}s", flush=True)
assert n_member_miss == 0, "FALSE NEGATIVES in sharded xor at 10M keys"
assert fpr <= 3 * 0.0039, f"FPR {fpr} above 3x xor8 bound"
rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
print(f"driver peak RSS {rss_gb:.2f} GB (10M uint64 keys alone would be 0.08 GB; "
      f"the r3 driver-peel path would hold keys + peel arrays driver-side)", flush=True)

# ---- JVM-native cuckoo probe at 10M keys (round 5) ----
# The mirror semi-join path: per-shard packed mirror build keeps the
# driver at one shard's entry arrays (measured 0.42 GB at this size vs
# 2.1 GB for the global-sort form); the ~90 MB mirror broadcast is the
# envelope edge — past the broadcast budget, contains_sharded remains
# the unbounded-size path (SCALE.md).
from cuckoofilter_spark.sketch.membership import (cuckoo_jvm_build,
                                                  cuckoo_jvm_filter)

t0 = time.time()
jf = cuckoo_jvm_build(keys, "id", capacity=N, bits=12, seed=0x5EED,
                      num_shards=64)
t_build = time.time() - t0
print(f"jvm-cuckoo build: {t_build:.1f}s  {N/t_build/1e6:.1f}M keys/s",
      flush=True)
t0 = time.time()
n_member_hit = cuckoo_jvm_filter(spark, jf, member_probe, "id").count()
t_m = time.time() - t0
t0 = time.time()
n_neg_hit = cuckoo_jvm_filter(spark, jf, neg_probe, "id").count()
t_n = time.time() - t0
fpr = n_neg_hit / (PROBES // 2)
print(f"jvm-cuckoo probe: members {n_member_hit}/{PROBES//2} in {t_m:.1f}s "
      f"({PROBES/2/t_m/1e6:.1f}M/s); negatives FPR={fpr:.5f} "
      f"(cuckoo12 bound ~0.00195) in {t_n:.1f}s", flush=True)
assert n_member_hit == PROBES // 2, \
    "FALSE NEGATIVES in the JVM cuckoo probe at 10M keys"
assert fpr <= 3 * 0.00195, f"FPR {fpr} above 3x cuckoo12 bound"
rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
print(f"driver peak RSS {rss_gb:.2f} GB after the mirror build", flush=True)

# ---- cuckoo family: build, sharded-store probe, delete maintenance ----
from cuckoofilter_spark.sketch.membership import cuckoo_build, cuckoo_delete

t0 = time.time()
cf = cuckoo_build(keys, "id", capacity=N, bits=12, seed=0xC0FFEE,
                  num_shards=32)
t_build = time.time() - t0
size_mb = sum(len(b) for b in cf.blobs) / 1e6
print(f"cuckoo build: {t_build:.1f}s  {N/t_build/1e6:.1f}M keys/s  "
      f"filter {size_mb:.0f} MB", flush=True)
t0 = time.time()
n_member_miss = contains_sharded(member_probe, "id", cf,
                                 max_cached_shards=2, colocate=True) \
    .where("NOT member").count()
t_m = time.time() - t0
t0 = time.time()
n_neg_hit = contains_sharded(neg_probe, "id", cf,
                             max_cached_shards=2, colocate=True) \
    .where("member").count()
t_n = time.time() - t0
fpr = n_neg_hit / (PROBES // 2)
print(f"cuckoo probe: members in {t_m:.1f}s ({PROBES/2/t_m/1e6:.1f}M/s), "
      f"FN={n_member_miss}; FPR={fpr:.5f} (12-bit bound 0.00195) "
      f"in {t_n:.1f}s", flush=True)
assert n_member_miss == 0, "FALSE NEGATIVES in sharded cuckoo at 10M keys"
assert fpr <= 3 * 0.00195, f"FPR {fpr} above 3x 12-bit bound"
# delete a 1M-key slice, then the remaining 9M members must all stay
drop = keys.where(F.col("id") % 10 == 3)
t0 = time.time()
cuckoo_delete(cf, drop, "id")
t_d = time.time() - t0
keep_probe = keys.where(F.col("id") % 10 != 3)
n_keep_miss = contains_sharded(keep_probe, "id", cf,
                               max_cached_shards=2, colocate=True) \
    .where("NOT member").count()
print(f"cuckoo delete: {t_d:.1f}s for ~1M keys; survivors FN={n_keep_miss}",
      flush=True)
assert n_keep_miss == 0, "delete broke a surviving member"
# ---- events ops at 10M rows: sessionize + hot-key bucketed asof ----
# user 0 holds HALF of all events (the pathological hot key the
# bucketed asof exists for); timestamps scatter over 30 days
from cuckoofilter_spark.ops.events import asof_join, sessionize

EV = 10_000_000
ev = spark.range(EV).select(
    F.when(F.col("id") % 2 == 0, F.lit(0))
     .otherwise(F.col("id") % 997).alias("user_id"),
    F.timestamp_seconds(
        F.lit(1704067200) + (F.col("id") * 2654435761) % (30 * 86400)
    ).alias("ts"),
    (F.col("id") % 5).alias("etype"),
    F.col("id").alias("event_id"))

t0 = time.time()
sess = sessionize(ev, "user_id", "ts", gap="1 hour")
n_sessions, n_events = sess.agg(
    F.count(F.lit(1)), F.sum("n_events")).collect()[0]
t_s = time.time() - t0
print(f"sessionize: {EV} events -> {n_sessions} sessions in {t_s:.1f}s "
      f"({EV/t_s/1e6:.1f}M events/s); conservation "
      f"{'OK' if n_events == EV else 'BROKEN'}", flush=True)
assert n_events == EV, "sessionize lost/duplicated events"

left = ev.where("etype = 1").select("event_id", "user_id", "ts")
right = (ev.where("etype = 2")
         .groupBy("user_id", "ts").agg(F.max("event_id").alias("rid")))
t0 = time.time()
plain_chk = (asof_join(left, right, on="user_id", left_ts="ts",
                       right_ts="ts", right_vals=["rid"])
             .agg(F.count(F.lit(1)).alias("n"),
                  F.sum("rid").alias("s"),
                  F.count("rid").alias("m")).collect()[0])
t_p = time.time() - t0
t0 = time.time()
buck_chk = (asof_join(left, right, on="user_id", left_ts="ts",
                      right_ts="ts", right_vals=["rid"],
                      bucket_seconds=86400)
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("rid").alias("s"),
                 F.count("rid").alias("m")).collect()[0])
t_b = time.time() - t0
print(f"asof {left.count()} lefts / hot key 50%: plain {t_p:.1f}s, "
      f"bucketed(1d) {t_b:.1f}s; checksums "
      f"{'MATCH' if tuple(plain_chk) == tuple(buck_chk) else 'DIFFER'} "
      f"(matched {plain_chk['m']}/{plain_chk['n']})", flush=True)
assert tuple(plain_chk) == tuple(buck_chk), \
    f"bucketed asof diverged: {tuple(plain_chk)} vs {tuple(buck_chk)}"

# ---- funnel at 10M events, hot user holds 50% (round 5) ----
# independent check: the greedy-earliest chain recomputed with plain
# min-aggregates + joins (a second formulation, not the HOF one)
from cuckoofilter_spark.ops.events import funnel

t0 = time.time()
fun = funnel(ev, "user_id", "ts", "etype", steps=[0, 1, 2]).cache()
n_users_fun = fun.count()
t_f = time.time() - t0
s1 = (ev.where("etype = 0").groupBy("user_id")
      .agg(F.min("ts").alias("step_1_ts")))
s2 = (ev.where("etype = 1").join(s1, "user_id")
      .where(F.col("ts") > F.col("step_1_ts"))
      .groupBy("user_id").agg(F.min("ts").alias("step_2_ts")))
s3 = (ev.where("etype = 2").join(s2, "user_id")
      .where(F.col("ts") > F.col("step_2_ts"))
      .groupBy("user_id").agg(F.min("ts").alias("step_3_ts")))
ref = (ev.select("user_id").distinct()
       .join(s1, "user_id", "left").join(
           s2.select("user_id", "step_2_ts"), "user_id", "left")
       .join(s3.select("user_id", "step_3_ts"), "user_id", "left"))
n_diff = (fun.select("user_id", "step_1_ts", "step_2_ts", "step_3_ts")
          .exceptAll(ref).count()
          + ref.exceptAll(
              fun.select("user_id", "step_1_ts", "step_2_ts",
                         "step_3_ts")).count())
n_dist_users = ev.select("user_id").distinct().count()
print(f"funnel: {EV} events -> {n_users_fun} users in {t_f:.1f}s "
      f"({EV/t_f/1e6:.1f}M events/s); join-formulation diff rows "
      f"{n_diff}", flush=True)
assert n_users_fun == n_dist_users, "funnel lost/duplicated users"
assert n_diff == 0, "funnel HOF chain diverged from the join formulation"
fun.unpersist()

# ---- retention at 10M events (round 5) ----
from cuckoofilter_spark.ops.events import retention_cohorts

t0 = time.time()
ret = retention_cohorts(ev, "user_id", "ts").cache()
tot_cells = ret.count()
t_r = time.time() - t0
sums = ret.agg(F.sum("n_users").alias("s"),
               F.sum(F.when(F.col("day_offset") == 0, F.col("n_users"))
                     .otherwise(0)).alias("c0")).collect()[0]
exact_pairs = (ev.select("user_id", F.to_date("ts").alias("d"))
               .distinct().count())
print(f"retention: {tot_cells} (cohort,offset) cells in {t_r:.1f}s; "
      f"sum(n_users)={sums['s']} vs exact user-day pairs {exact_pairs}; "
      f"offset-0 total {sums['c0']} vs users {n_dist_users}", flush=True)
assert sums["s"] == exact_pairs, "retention cell mass != user-day pairs"
assert sums["c0"] == n_dist_users, "cohort sizes != distinct users"
ret.unpersist()

# ---- shuffle_shard at 10M rows (round 5) ----
from cuckoofilter_spark.ops.packing import shuffle_shard

docs10 = spark.range(N).select(F.col("id").alias("doc_id"))
t0 = time.time()
sh = shuffle_shard(docs10, "doc_id", n_shards=64).cache()
n_rows = sh.count()
t_sh = time.time() - t0
per = sh.groupBy("shard").agg(F.count(F.lit(1)).alias("c"),
                              F.max("pos").alias("mx"),
                              F.count_distinct("pos").alias("dp"))
bad = per.where("mx != c OR dp != c").count()
# bit_xor: order-independent AND overflow-free (ANSI sum of 10M
# xxhash64 values overflows int64)
chk1 = sh.agg(F.bit_xor(F.xxhash64("doc_id", "shard", "pos"))) \
    .collect()[0][0]
chk2 = (shuffle_shard(docs10, "doc_id", n_shards=64)
        .agg(F.bit_xor(F.xxhash64("doc_id", "shard", "pos")))
        .collect()[0][0])
print(f"shuffle_shard: {n_rows} rows -> 64 shards in {t_sh:.1f}s "
      f"({N/t_sh/1e6:.1f}M rows/s); dense-rank shards bad={bad}; "
      f"deterministic {'OK' if chk1 == chk2 else 'BROKEN'}", flush=True)
assert n_rows == N and bad == 0 and chk1 == chk2
sh.unpersist()

# ---- priority_sample at 10M rows, 50%-hot stratum (round 5 s5) ----
from cuckoofilter_spark.ops.packing import priority_sample

# stratum "hot" holds half the corpus; 15 cold strata share the rest.
# weights cycle 1..1000 so the weighted-bias invariant is checkable.
mix = spark.range(N).select(
    F.col("id").alias("doc_id"),
    F.when(F.col("id") % 2 == 0, F.lit("hot"))
     .otherwise(F.concat(F.lit("s"), (F.col("id") % 15).cast("string")))
     .alias("stratum"),
    (F.col("id") % 1000 + 1).alias("w"))
t0 = time.time()
ps = priority_sample(mix, "doc_id", "w", "stratum", k=100,
                     salt_buckets=32).cache()
n_ps = ps.count()
t_ps = time.time() - t0
per = ps.groupBy("stratum").agg(
    F.count(F.lit(1)).alias("c"), F.max("rk").alias("mx"),
    F.count_distinct("rk").alias("dr"),
    F.sum(F.when(F.col("in_sample"), 1).otherwise(0)).alias("ns"),
    F.avg(F.when(F.col("in_sample"), F.col("_w"))).alias("mean_w"))
rows = {r["stratum"]: r for r in per.collect()}
assert len(rows) == 16 and all(
    r["c"] == 101 and r["mx"] == 101 and r["dr"] == 101 and r["ns"] == 100
    for r in rows.values()), rows
# E[w] corpus-wide is 500.5; the DLT sample must skew heavy
mean_w = sum(r["mean_w"] for r in rows.values()) / 16
det1 = ps.agg(F.bit_xor(F.xxhash64("stratum", "doc_id", "rk"))) \
    .collect()[0][0]
det2 = (priority_sample(mix, "doc_id", "w", "stratum", k=100,
                        salt_buckets=32)
        .agg(F.bit_xor(F.xxhash64("stratum", "doc_id", "rk")))
        .collect()[0][0])
print(f"priority_sample: {N} rows -> {n_ps} kept in {t_ps:.1f}s "
      f"({N/t_ps/1e6:.1f}M rows/s); mean sampled w {mean_w:.0f} "
      f"(corpus 500.5); deterministic {'OK' if det1 == det2 else 'BROKEN'}",
      flush=True)
assert mean_w > 650 and det1 == det2
ps.unpersist()

# ---- embedding_centroids at 1M x 64-dim, exact numpy parity ----
from cuckoofilter_spark.ops.similarity import embedding_centroids

D_DIM, N_EMB, G = 64, 1_000_000, 16
# deterministic synthetic embeddings: v[d] = ((id*(d+1)) % 1000)/1000
# - 0.5 — float32 like the real table, closed-form checkable in numpy
vec = F.array(*[
    ((F.col("id") * (d + 1)) % 1000).cast("double") / 1000.0 - 0.5
    for d in range(D_DIM)]).cast("array<float>")
embt = spark.range(N_EMB).select(
    (F.col("id") % G).cast("int").alias("label"), vec.alias("embedding"))
t0 = time.time()
cent = embedding_centroids(embt, "embedding", "label").cache()
n_cent = cent.count()
t_c = time.time() - t0
got = {(r["label"], r["dim"]): (r["n_vecs"], r["centroid_micro"],
                                r["var_micro2"])
       for r in cent.collect()}
ids = np.arange(N_EMB, dtype=np.int64)
labels = ids % G
mism = 0
for d in range(D_DIM):
    x32 = (((ids * (d + 1)) % 1000).astype(np.float64) / 1000.0
           - 0.5).astype(np.float32)
    x = x32.astype(np.float64) * 1e6
    xm = (np.sign(x) * np.floor(np.abs(x) + 0.5)).astype(np.int64)
    for g in range(G):
        col = xm[labels == g]
        n, sx = len(col), int(col.sum())
        # int64 is safe at this scale: xm^2 <= 2.5e11, n*max < 2^63
        sxx = int((col * col).sum())
        want = (n, int(sx // n) if sx >= 0 else -int(-sx // n),
                int((n * sxx - sx * sx) // (n * n)))
        if got[(g, d)] != want:
            mism += 1
print(f"embedding_centroids: {N_EMB}x{D_DIM} -> {n_cent} cells in "
      f"{t_c:.1f}s ({N_EMB*D_DIM/t_c/1e6:.0f}M coords/s); "
      f"numpy mismatches {mism}", flush=True)
assert n_cent == G * D_DIM and mism == 0
cent.unpersist()

# ---- LSH leakage at 1M docs, planted cross-source dups (round 5) ----
# every doc gets 8 near-unique words; docs i and i+500000 (i<1000) are
# exact duplicates planted across sources 0 and 1; source 0 also holds
# HALF the corpus (the hot source)
from cuckoofilter_spark.ops.dedup import near_dup_pairs

D = 1_000_000
PLANT = 1_000
base = spark.range(D).select(
    F.col("id").alias("doc_id"),
    F.when(F.col("id") % 2 == 0, F.lit(0)).otherwise(
        1 + F.col("id") % 3).alias("source"),
    F.when(F.col("id") >= D // 2,
           (F.col("id") - D // 2) % (D // 2)).otherwise(
        F.col("id")).alias("seed_id"))
# text from seed_id: dup pairs (i, i+D/2) share seed_id for i < PLANT;
# all other docs get a distinct word tuple
text = F.concat_ws(" ", *[
    F.concat(F.lit(f"w{j}_"), ((
        F.when((F.col("seed_id") < PLANT) | (F.col("doc_id") < D // 2),
               F.col("seed_id"))
        .otherwise(F.col("doc_id"))) * (2 * j + 1)) % 999983)
    for j in range(8)])
docs = base.select("doc_id", "source", text.alias("text"))
t0 = time.time()
pairs = near_dup_pairs(docs, "doc_id", "text", threshold=0.8,
                       num_hashes=32, bands=8).cache()
n_pairs = pairs.count()
t_l = time.time() - t0
src = docs.select("doc_id", "source")
cross = (pairs
         .join(src.withColumnRenamed("doc_id", "doc_a")
               .withColumnRenamed("source", "sa"), "doc_a")
         .join(src.withColumnRenamed("doc_id", "doc_b")
               .withColumnRenamed("source", "sb"), "doc_b")
         .where("sa <> sb").count())
planted_found = (pairs.where(
    (F.col("doc_b") - F.col("doc_a") == D // 2)
    & (F.col("doc_a") < PLANT)).count())
print(f"leakage: {D} docs -> {n_pairs} near-dup pairs in {t_l:.1f}s "
      f"({D/t_l/1e6:.2f}M docs/s); cross-source {cross}; planted "
      f"{planted_found}/{PLANT}", flush=True)
assert planted_found == PLANT, "LSH missed planted exact duplicates"
pairs.unpersist()

rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
print(f"final driver peak RSS {rss_gb:.2f} GB", flush=True)
assert rss_gb < 2.0, f"driver RSS {rss_gb:.2f} GB — a scale path is " \
    "materializing row data driver-side"
spark.stop()
print("SCALE-STRESS-OK")
