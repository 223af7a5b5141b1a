"""10x-bench-scale stress of the round-4 scale paths.

Usage: ``python scripts/scale_stress.py`` (~25 s on local[32]).

Validates, at 10M distinct keys / 20M probes:
- xor_build_sharded over 10M distinct keys (task-local peel; the
  driver must never see the key set),
- cuckoo_build at the same scale, plus a sharded cuckoo_delete pass
  (the maintainable family's build/maintain path),
- contains_sharded (store path, colocate) over 20M probes with a
  2-shard LRU cap (bounded per-task filter memory), for both families,
- bounded-memory check: peak RSS of the driver stays far below the
  naive collect-everything path.
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

rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
print(f"final driver peak RSS {rss_gb:.2f} GB", flush=True)
spark.stop()
print("SCALE-STRESS-OK")
