"""Corpus packing and sampling operators for training-data pipelines.

Two ops a pre-training data pipeline runs right after dedup/quality
filtering, re-expressed Spark-first:

- ``pack_chunks``: concat-and-chunk sequence packing — lay every
  document's tokens end-to-end in a deterministic global order and cut
  the stream into fixed-size context windows (the GPT-style packing
  step that turns a cleaned corpus into training examples).
- ``stratified_sample``: deterministic per-stratum hash-threshold
  sampling (per-source/per-language mixture control), the stateless
  distributed replacement for the reference harness's reservoir
  sampler (benchmarks/random.h:73-93), extended from the single-rate
  ``mix_in`` to a rate-per-stratum map.

Both are pure Spark built-ins (whole-stage codegen, no Python in the
hot path) and are defined by rules simple enough to restate in ANSI
SQL for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from .text import md5_le64

# 62-bit mask: keeps the cross-engine md5 hash non-negative in BOTH
# Spark's int64 and DuckDB's reading, so `% modulus` agrees (C-style
# signed % differs between engines only on negative operands).
_MASK62 = (1 << 62) - 1


def _require_absent(df: DataFrame, names: tuple[str, ...], op: str) -> None:
    """Refuse input columns that collide with the fixed output/internal
    names an op adds. Spark's column resolution is case-insensitive and
    withColumn/join silently REPLACE a same-named input column (the
    salted-bucket-join trap in CLAUDE.md), so collide loudly instead.
    """
    have = {c.lower() for c in df.columns}
    hit = [n for n in names if n.lower() in have]
    if hit:
        raise ValueError(
            f"{op}: input already has column(s) {hit} (case-insensitive); "
            f"rename them — the op would silently replace them")


def pack_chunks(df: DataFrame, id_col: str, len_col,
                chunk_size: int = 256, bucket_docs: int = 64) -> DataFrame:
    """Concat-and-chunk packing: per-chunk occupancy stats.

    Documents are concatenated in ``id_col`` order (ids must be unique
    NON-NEGATIVE integers — the bucket formula id - id % bucket_docs
    relies on sign-stable %) and the token stream is cut every
    ``chunk_size`` tokens;
    a document whose span crosses a cut contributes to both chunks
    (real pipelines insert the split there). Returns one row per chunk:

      chunk_id, n_docs (documents overlapping the chunk), tok_filled
      (== chunk_size except the last chunk), first_doc, last_doc.

    Scale shape — the textbook formulation is a single global
    cumulative sum, which in Spark is ``Window.orderBy(id)`` with NO
    partitionBy: every row lands in ONE task (Spark even warns). This
    op instead computes the prefix sum hierarchically, the way a
    1000-executor job must:

      1. bucket = id DIV bucket_docs — deterministic, contiguous,
         ORDERED ranges (no sampling-based RangePartitioner, so the
         assignment is reproducible across engines and retries);
      2. within-bucket running sum: a window partitioned BY bucket
         (parallel, each task sees <= bucket_docs rows);
      3. bucket offsets: one tiny aggregate (n/bucket_docs rows) whose
         own prefix sum runs single-task but over thousands of rows,
         then broadcast-joined back.

    At 10^12 docs with bucket_docs=10^6 the offsets frame is 10^6 rows
    (~16 MB broadcast) — pick ``bucket_docs`` ~ sqrt(n) to balance.
    The explode emits ceil(len/chunk_size)+1 rows per doc — linear in
    corpus tokens / chunk_size.

    ``len_col`` may be a column name or Column (e.g. a token count
    expression); rows with len <= 0 carry no tokens and are dropped.
    """
    lc = F.col(len_col) if isinstance(len_col, str) else len_col
    base = (df.select(F.col(id_col).cast("long").alias("_id"),
                      lc.cast("long").alias("_len"))
              .where(F.col("_len") > 0)
              .withColumn("_b", F.col("_id") - (F.col("_id") % bucket_docs)))

    w_in = (Window.partitionBy("_b").orderBy("_id")
            .rowsBetween(Window.unboundedPreceding, -1))
    within = base.withColumn("_wstart", F.coalesce(F.sum("_len").over(w_in),
                                                   F.lit(0)))

    totals = base.groupBy("_b").agg(F.sum("_len").alias("_btot"))
    w_b = (Window.orderBy("_b")
           .rowsBetween(Window.unboundedPreceding, -1))
    offsets = totals.withColumn("_boff", F.coalesce(F.sum("_btot").over(w_b),
                                                    F.lit(0))).drop("_btot")

    placed = (within.join(F.broadcast(offsets), "_b")
              .withColumn("_start", F.col("_boff") + F.col("_wstart"))
              .withColumn("_end", F.col("_start") + F.col("_len")))

    # DIV, not `/`: float division round-trips through double and loses
    # exactness past 2^53 token offsets (a 100 TB corpus is ~10^13-10^14
    # tokens — squarely past it).
    c = F.lit(int(chunk_size)).cast("long")
    spans = placed.select(
        "_id", "_start", "_end",
        F.explode(F.sequence(F.expr(f"_start DIV {int(chunk_size)}L"),
                             F.expr(f"(_end - 1L) DIV {int(chunk_size)}L"))
                  ).alias("chunk_id"))
    overlap = (F.least(F.col("_end"), (F.col("chunk_id") + 1) * c)
               - F.greatest(F.col("_start"), F.col("chunk_id") * c))
    return (spans
            .withColumn("_ov", overlap)
            .groupBy("chunk_id")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("_ov").alias("tok_filled"),
                 F.min("_id").alias("first_doc"),
                 F.max("_id").alias("last_doc"))
            .orderBy("chunk_id"))


def stratum_rate(strata_col: str, rates: dict[str, int],
                 default_pct: int = 0) -> Column:
    """CASE-chain per-stratum keep percentage (0..100)."""
    expr = F.lit(int(default_pct))
    for k, v in sorted(rates.items()):
        expr = F.when(F.col(strata_col) == k, int(v)).otherwise(expr)
    return expr


def stratified_sample(df: DataFrame, id_col: str, strata_col: str,
                      rates: dict[str, int], default_pct: int = 0,
                      salt: str = "#strat") -> DataFrame:
    """Keep each row iff md5-LE64(id || salt) mod 100 < rate[stratum].

    Deterministic mixture control: the same (id, salt) always lands on
    the same side, on any engine (the md5-LE64 cross-engine hash,
    ops/text.py), with no RNG state — so a 10^12-row sample is
    reproducible, resumable, and embarrassingly parallel (pure filter,
    no shuffle, pushed past the scan's column pruning). Replaces the
    sequential reservoir of benchmarks/random.h:73-93 the same way
    ``mix_in`` does, but with a rate per stratum, which is how real
    corpus mixtures (per-source / per-language weights) are specified.

    ``rates``: stratum value -> keep percentage (integer 0..100).
    """
    h = md5_le64(F.col(id_col).cast("string"), salt).bitwiseAND(F.lit(_MASK62))
    keep = (h % 100) < stratum_rate(strata_col, rates, default_pct)
    return df.where(keep)


def temperature_resample(df: DataFrame, id_col: str, strata_col: str,
                         budget_num: int = 1, budget_den: int = 2,
                         salt: str = "#temp") -> DataFrame:
    """Temperature (alpha = 0.5) mixture resampling: keep each row with
    a per-stratum probability COMPUTED from the corpus itself so the
    expected kept count per stratum is proportional to sqrt(c_s) —
    the standard low-resource upsampling rule for per-language /
    per-source training mixes — scaled so the total expected kept
    count is ``budget_num/budget_den`` of the corpus, capped at 1.

    Where ``stratified_sample`` takes caller-given rates, this derives
    them: p_s = min(1, B*N*w_s / (S*c_s)) with w_s = floor(sqrt(c_s) *
    2^20) and S = sum w_s. The membership test is the same stateless
    cross-engine hash threshold (md5-LE64(id || salt) masked to 62
    bits < floor(p_s * 2^62)), so the sample is reproducible,
    resumable, and a pure per-row filter.

    Cross-engine determinism: the sqrt weights are quantized to exact
    integers (IEEE sqrt is correctly rounded, so floor(sqrt(int)*2^20)
    is bit-identical everywhere) and summed as integers (no float
    summation order); the threshold is one fixed left-to-right double
    product/divide chain over those integers, floored once.

    Scale shape: one map-side-combinable count per stratum (strata
    cardinality = languages/sources, tiny), a broadcast join of the
    per-stratum thresholds back onto the corpus (null-safe, so
    NULL-stratum rows are sampled too), and a scan-pushed filter — no
    wide shuffle of the corpus at any width. Replaces the sequential
    reservoir of benchmarks/random.h:73-93 at mixture granularity.
    """
    _require_absent(df, ("_k", "_t"), "temperature_resample")
    c = df.groupBy(strata_col).agg(F.count("*").alias("_c"))
    w = c.withColumn(
        "_w", F.floor(F.sqrt(F.col("_c").cast("double"))
                      * F.lit(float(1 << 20))).cast("long"))
    tot = w.agg(F.sum("_c").alias("_n"), F.sum("_w").alias("_s"))
    p = F.least(
        F.lit(1.0),
        F.lit(float(budget_num)) * F.col("_n") * F.col("_w")
        / (F.lit(float(budget_den)) * F.col("_s")) / F.col("_c"))
    rates = (w.crossJoin(F.broadcast(tot))
             .select(F.col(strata_col).alias("_k"),
                     F.floor(p * F.lit(float(1 << 62)))
                     .cast("long").alias("_t")))
    h = md5_le64(F.col(id_col).cast("string"), salt).bitwiseAND(
        F.lit(_MASK62))
    return (df.join(F.broadcast(rates),
                    F.col(strata_col).eqNullSafe(F.col("_k")))
            .where(h < F.col("_t")).drop("_k", "_t"))


def hash_split(df: DataFrame, id_col: str,
               splits: list[tuple[str, int]] | tuple[tuple[str, int], ...],
               den: int = 100, salt: str = "#split") -> DataFrame:
    """Deterministic train/val/test assignment: adds a ``split`` column
    mapping each row to a named fraction by hash threshold.

    ``splits`` is an ordered list of (label, weight) with integer
    weights summing to ``den`` — e.g. ``[("train", 98), ("val", 1),
    ("test", 1)]`` with ``den=100``. Row lands in the first label whose
    cumulative weight exceeds ``md5-LE64(id || salt) mod den`` (the
    cross-engine hash, ops/text.py), so the assignment is stateless,
    reproducible on any engine, stable under corpus growth (a new row
    never moves an old one — unlike rank- or random()-based splits),
    and resumable.

    Plan shape: a pure projection — no exchange, no Python; survives
    column pruning and rides the scan. The split is a 100 TB no-op.
    """
    _require_absent(df, ("split",), "hash_split")
    if not splits:
        raise ValueError("splits must name at least one label")
    weights = [w for _, w in splits]
    if any(w < 0 for w in weights) or sum(weights) != den:
        raise ValueError(f"split weights must be >= 0 and sum to den={den}")
    h = md5_le64(F.col(id_col).cast("string"), salt).bitwiseAND(
        F.lit(_MASK62)) % den
    expr = None
    cum = 0
    for label, w in splits[:-1]:
        cum += w
        clause = (h < cum, F.lit(label))
        expr = (F.when(*clause) if expr is None else expr.when(*clause))
    last = F.lit(splits[-1][0])
    split = last if expr is None else expr.otherwise(last)
    return df.withColumn("split", split)


def shuffle_shard(df: DataFrame, id_col: str, n_shards: int,
                  salt: str = "#shuf") -> DataFrame:
    """Deterministic global pseudo-shuffle without a global sort: adds
    ``shard`` (which output shard the row belongs to) and ``pos`` (its
    position within the shard), both fully determined by
    ``md5-LE64(id || salt)``.

    This is how a training pipeline materializes "globally shuffled"
    data at corpus scale: a true random permutation needs either RNG
    state or a total order over 10^12 rows; hashing gives the same
    statistical shuffle as ordering the whole corpus by h — shard =
    h mod S is the high-level interleave, pos = rank of h within the
    shard — while never sorting more than one shard in one place.
    Reading shards in (shard, pos) order visits documents in global
    h-order restricted to that shard: i.i.d.-looking batches with zero
    coordination. Re-running on a grown corpus only inserts new rows;
    a fixed doc keeps its shard forever.

    Plan shape: ONE exchange (hash partition on shard — S times finer
    than a global sort's single range partition) and a per-shard sort;
    with ``n_shards`` scaled so a shard is a few GB, every task sorts
    locally and in memory. Ties on h (2^-62) break on id, so the order
    is total and the rank reproducible.
    """
    _require_absent(df, ("_h", "shard", "pos"), "shuffle_shard")
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    h = md5_le64(F.col(id_col).cast("string"), salt).bitwiseAND(
        F.lit(_MASK62))
    out = df.withColumn("_h", h).withColumn(
        "shard", (F.col("_h") % n_shards).cast("long"))
    w = Window.partitionBy("shard").orderBy(F.col("_h").asc(),
                                            F.col(id_col).asc())
    return (out.withColumn("pos", F.row_number().over(w).cast("long"))
            .drop("_h"))


def per_key_topk(df: DataFrame, key_col: str, order_by: list,
                 k: int, salt_buckets: int | None = None,
                 salt_on: str | None = None) -> DataFrame:
    """Keep at most ``k`` rows per key, best-first by ``order_by``
    (a list of Columns forming a TOTAL order — include a unique
    tiebreaker, or ties make the cut non-deterministic in any engine).

    The per-domain/per-source quota cap of corpus mixing (C4-style
    domain caps): "at most K documents per domain, best quality first".

    Plain form: one ``row_number`` window over the key — one exchange,
    but a hot key sorts all its rows in one task. Scale form
    (``salt_buckets=s``, requires ``salt_on`` = a unique id column):
    stage 1 ranks within (key, hash(id) % s) and keeps k per salt
    bucket — the hot key's sort spreads over s tasks — then stage 2
    ranks the survivors (at most s*k rows per key, bounded) over the
    key alone. Any row in a key's global top-k is top-k within its
    salt bucket, so the two-level cut is exact, not approximate
    (pinned equal to the plain form by test).
    """
    if not order_by:
        raise ValueError("order_by must name at least one column")
    w = Window.partitionBy(key_col).orderBy(*order_by)
    if salt_buckets is None:
        return (df.withColumn("_rk", F.row_number().over(w))
                .where(F.col("_rk") <= k).drop("_rk"))
    if salt_on is None:
        raise ValueError("salt_buckets requires salt_on (a unique id col)")
    if salt_buckets <= 0:
        raise ValueError("salt_buckets must be positive")
    salt = F.pmod(F.xxhash64(F.col(salt_on)), F.lit(salt_buckets))
    w1 = Window.partitionBy(key_col, salt).orderBy(*order_by)
    survivors = (df.withColumn("_rk", F.row_number().over(w1))
                 .where(F.col("_rk") <= k).drop("_rk"))
    return (survivors.withColumn("_rk", F.row_number().over(w))
            .where(F.col("_rk") <= k).drop("_rk"))


# 52-bit mask for priority_sample's uniform: keeps u * 1024 < 2^62 so
# the quantized priority key stays exact int64 arithmetic in BOTH
# engines (no HUGEINT intermediate, no float anywhere).
_MASK52 = (1 << 52) - 1


def priority_sample(df: DataFrame, id_col: str, weight_col: str,
                    stratum_col: str, k: int, salt: str = "#prio",
                    salt_buckets: int | None = None) -> DataFrame:
    """Weighted sample without replacement of size ``k`` per stratum by
    priority sampling (Duffield-Lund-Thorup, "Priority sampling for
    estimation of arbitrary subset sums", JACM 2007) — the principled
    way to take a small weighted sample whose subset-sum estimates are
    unbiased with near-optimal variance. The mixing-stage companion to
    ``temperature_resample``: where that op keeps a RATE per stratum,
    this keeps a fixed per-stratum BUDGET, preferring heavy rows.

    Each row draws u = a 52-bit odd uniform from the cross-engine
    md5-LE64 hash of its id, and gets DLT priority q = w / u (heavier
    rows draw larger priorities). The sample is the top-k by q; the
    rank-(k+1) row is kept too (``in_sample = false``) because its
    priority is the DLT threshold tau, from which the unbiased
    subset-sum estimator is w_hat_i = max(w_i, tau).

    Integer-exact on any engine: rows are ranked by the quantized
    inverse key s = (u * 1024) div w ascending (div truncates toward
    zero in Spark and DuckDB alike; all values positive here) — a
    monotone transform of q, so the cut is the DLT cut up to the
    documented 10-bit quantization, and both engines compute
    bit-identical int64 keys (u < 2^52 so u * 1024 < 2^62; ties break
    on id). No float, ln, or exp crosses the engine boundary.

    Plan shape: a pure projection for the keys, then the exact salted
    two-level top-k of ``per_key_topk`` (hot strata spread over
    ``salt_buckets`` tasks) — the final rank window runs on <= k+1
    rows per stratum, bounded regardless of corpus size. Weights are
    clamped to >= 1 (a zero/negative weight would divide-by-zero or
    flip the ordering; clamped rows just sample uniformly).
    """
    _require_absent(df, ("_u", "_w", "_s", "_rk", "rk", "in_sample"),
                    "priority_sample")
    if k <= 0:
        raise ValueError("k must be positive")
    # NULL-id rows can't draw a hash (u would be NULL, and Spark ranks
    # NULL sort keys FIRST while DuckDB ranks them LAST) — exclude them
    # rather than let them deterministically pollute the sample.
    df = df.where(F.col(id_col).isNotNull())
    u = (md5_le64(F.col(id_col).cast("string"), salt)
         .bitwiseAND(F.lit(_MASK52)).bitwiseOR(F.lit(1)))
    keyed = (df.withColumn("_u", u)
             .withColumn("_w", F.greatest(F.col(weight_col).cast("long"),
                                          F.lit(1)))
             .withColumn("_s", F.expr("(_u * 1024) div _w")))
    order = [F.col("_s").asc(), F.col(id_col).asc()]
    kept = per_key_topk(keyed, stratum_col, order, k + 1,
                        salt_buckets=salt_buckets,
                        salt_on=None if salt_buckets is None else id_col)
    w = Window.partitionBy(stratum_col).orderBy(*order)
    return (kept.withColumn("rk", F.row_number().over(w).cast("long"))
            .withColumn("in_sample", F.col("rk") <= k)
            .drop("_u"))


def priority_sum_estimate(df: DataFrame, id_col: str, weight_col: str,
                          stratum_col: str, k: int, salt: str = "#prio",
                          salt_buckets: int | None = None) -> DataFrame:
    """Per-stratum subset-sum estimate from the DLT priority sample —
    the estimator ``priority_sample`` exists to serve (Duffield-Lund-
    Thorup, JACM 2007): with tau = the rank-(k+1) priority,
    E[ sum_{i in sample} max(w_i, tau) ] = the stratum's TOTAL weight.
    This is how a mixing pipeline audits per-source token mass from a
    tiny fixed-budget sample instead of a full pass.

    Returns one row per stratum: ``n_rows`` (sampled row count, <= k),
    ``est_micro`` (the estimate in integer micro-weight units) and
    ``tau_micro``. Strata with <= k rows have no threshold row; the
    estimate is then the exact sampled sum (tau_micro = 0), which is
    the DLT convention (tau = 0 when the sample is exhaustive).

    Engine-reproducibility: tau = w/u recovers from the quantized key
    as 2^62 / s_(k+1) (both engines: one exact int64->double cast,
    one IEEE divide), each max(w, tau) and its micro-quantization is
    one more identical float op, and the per-stratum sum runs over
    <= k pre-quantized int64s — order-free. The corpus-sized pass is
    ``priority_sample``'s; everything here happens on its bounded
    output (<= (k+1) rows per stratum), and tau reaches the sampled
    rows via a window over the SAME stratum partitioning — no join,
    no second derivation of the sample.

    Domain bound: micro-quantization caps at int64, i.e. max(w, tau)
    < ~9.2e12 — tau ~= W_total/(k+1), so a single stratum may carry
    up to ~9.2e12 * (k+1) total weight (~10^15 tokens at k=100)
    before the final cast raises (both engines fail loudly under
    ANSI/strict casts; nothing wraps silently).
    """
    _require_absent(df, ("_tau",), "priority_sum_estimate")
    kept = priority_sample(df, id_col, weight_col, stratum_col, k,
                           salt=salt, salt_buckets=salt_buckets)
    # tau in weight units: q = w/u with u = u_int/2^52 and
    # s = (u_int * 1024) div w  =>  w/u = 2^52 * 1024 / s = 2^62 / s.
    # max() over the stratum window sees only the rank-(k+1) row's
    # value (NULL elsewhere); exhaustive strata (<= k rows) have no
    # threshold row -> tau = 0, the DLT exhaustive convention.
    w_str = Window.partitionBy(stratum_col)
    tau_row = F.when(~F.col("in_sample"),
                     F.lit(float(1 << 62)) / F.col("_s").cast("double"))
    est = (kept.withColumn("_tau", F.coalesce(F.max(tau_row).over(w_str),
                                              F.lit(0.0)))
           .where(F.col("in_sample"))
           .select(F.col(stratum_col),
                   F.round(F.greatest(F.col("_w").cast("double"),
                                      F.col("_tau"))
                           * 1e6).cast("long").alias("_wm"),
                   F.round(F.col("_tau") * 1e6).cast("long").alias("_tm")))
    return (est.groupBy(stratum_col)
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.sum("_wm").alias("est_micro"),
                 F.max("_tm").alias("tau_micro")))
