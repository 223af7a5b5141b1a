"""Session-8 pipeline-breadth ops: funnel, retention cohorts,
hash_split, shuffle_shard, pick_canonical, filter_cascade, zipf_fit,
CMS inner product, AMS F2.

Each op's semantics are pinned on hand-built corner cases (the oracle
replica at sf0.01 covers the bulk parity), plus the plan-shape claims
the docstrings make (hash_split is exchange-free; pick_canonical is an
aggregate, not a window).
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from cuckoofilter_spark.ops.dedup import pick_canonical
from cuckoofilter_spark.ops.events import funnel, retention_cohorts
from cuckoofilter_spark.ops.packing import hash_split, shuffle_shard


def _plan(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _ts(s):
    return dt.datetime.fromisoformat(s)


# ---------------------------------------------------------------- funnel

def test_funnel_strictly_increasing_and_greedy(spark):
    """Equal-ts events do NOT advance the funnel; greedy-earliest picks
    the earliest valid match per step; a stalled step NULLs the rest."""
    rows = [
        # user 1: clean chain, click choice must be the EARLIEST > view
        (1, _ts("2024-01-01T00:00:00"), "view"),
        (1, _ts("2024-01-01T00:01:00"), "click"),
        (1, _ts("2024-01-01T00:05:00"), "click"),
        (1, _ts("2024-01-01T00:02:00"), "purchase"),
        # user 2: click at EXACTLY the view ts -> does not count (strict >)
        (2, _ts("2024-01-01T00:00:00"), "view"),
        (2, _ts("2024-01-01T00:00:00"), "click"),
        # user 3: purchase BEFORE any click -> stalls at step 2
        (3, _ts("2024-01-01T00:00:00"), "purchase"),
        (3, _ts("2024-01-01T00:01:00"), "view"),
        (3, _ts("2024-01-01T00:02:00"), "click"),
        # user 4: no view at all
        (4, _ts("2024-01-01T00:00:00"), "click"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, et string")
    got = {r.user_id: r for r in
           funnel(df, "user_id", "ts", "et",
                  ["view", "click", "purchase"]).collect()}
    r1 = got[1]
    assert (r1.step_1_ts, r1.step_2_ts, r1.step_3_ts) == (
        _ts("2024-01-01T00:00:00"), _ts("2024-01-01T00:01:00"),
        _ts("2024-01-01T00:02:00"))
    assert r1.steps_completed == 3
    r2 = got[2]
    assert r2.step_1_ts is not None and r2.step_2_ts is None
    assert r2.steps_completed == 1
    r3 = got[3]
    assert (r3.step_1_ts, r3.step_2_ts, r3.step_3_ts) == (
        _ts("2024-01-01T00:01:00"), _ts("2024-01-01T00:02:00"), None)
    assert r3.steps_completed == 2
    r4 = got[4]
    assert r4.step_1_ts is None and r4.steps_completed == 0


def test_funnel_greedy_completes_when_any_assignment_does(spark):
    """The adversarial case for greedy: view at t=0 and t=2, click only
    at t=1. Greedy takes view@0 and still finds click@1 — but a
    'latest-view' strategy would stall. Pin that greedy-earliest wins."""
    rows = [(1, _ts("2024-01-01T00:00:00"), "view"),
            (1, _ts("2024-01-01T00:00:02"), "view"),
            (1, _ts("2024-01-01T00:00:01"), "click")]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, et string")
    out = funnel(df, "user_id", "ts", "et", ["view", "click"]).collect()[0]
    assert out.steps_completed == 2
    assert out.step_2_ts == _ts("2024-01-01T00:00:01")


def test_funnel_null_ts_ignored_and_validation(spark):
    rows = [(1, None, "view"), (1, _ts("2024-01-01T00:00:01"), "click")]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, et string")
    out = funnel(df, "user_id", "ts", "et", ["view", "click"]).collect()[0]
    assert out.step_1_ts is None and out.steps_completed == 0
    with pytest.raises(ValueError, match="two steps"):
        funnel(df, "user_id", "ts", "et", ["view"])


def test_funnel_single_aggregate_no_window_no_python(spark):
    df = spark.createDataFrame(
        [(1, _ts("2024-01-01T00:00:00"), "view")],
        "user_id long, ts timestamp, et string")
    executed = (funnel(df, "user_id", "ts", "et",
                       ["view", "click", "purchase"])
                ._jdf.queryExecution().executedPlan().toString())
    assert executed.count("Exchange") == 1, executed
    assert "Window" not in executed, executed
    assert "Python" not in executed, executed


# ---------------------------------------------------- retention cohorts

def test_retention_cohorts_triangle(spark):
    """Two users, known cohorts/offsets; a same-day repeat counts once
    (distinct-day set), NULL ts dropped."""
    rows = [
        (1, _ts("2024-01-01T08:00:00")),
        (1, _ts("2024-01-01T22:00:00")),   # same day: one active day
        (1, _ts("2024-01-03T00:00:00")),   # offset 2
        (2, _ts("2024-01-02T00:00:00")),
        (2, _ts("2024-01-03T00:00:00")),   # offset 1
        (2, None),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {(str(r.cohort_day), r.day_offset): r.n_users
           for r in retention_cohorts(df, "user_id", "ts").collect()}
    assert got == {("2024-01-01", 0): 1, ("2024-01-01", 2): 1,
                   ("2024-01-02", 0): 1, ("2024-01-02", 1): 1}


def test_retention_cohorts_single_user_exchange(spark):
    """The cohort join is fused into ONE user-keyed aggregate: the plan
    has exactly two exchanges (user agg + tiny final agg), no join."""
    df = spark.createDataFrame([(1, _ts("2024-01-01T00:00:00"))],
                               "user_id long, ts timestamp")
    executed = (retention_cohorts(df, "user_id", "ts")
                ._jdf.queryExecution().executedPlan().toString())
    assert executed.count("Exchange") == 2, executed
    assert "Join" not in executed, executed


# ------------------------------------------------------------ hash_split

def test_hash_split_stability_and_fractions(spark):
    """Each id's split is stable under corpus growth (subset agrees with
    superset row-for-row) and fractions land near the weights."""
    big = spark.range(0, 4000).withColumnRenamed("id", "doc_id")
    small = big.where(F.col("doc_id") < 1000)
    splits = [("train", 90), ("val", 5), ("test", 5)]
    a = {r.doc_id: r.split
         for r in hash_split(big, "doc_id", splits).collect()}
    b = {r.doc_id: r.split
         for r in hash_split(small, "doc_id", splits).collect()}
    assert all(a[k] == v for k, v in b.items())
    n_train = sum(1 for v in a.values() if v == "train")
    assert 0.85 * 4000 < n_train < 0.95 * 4000
    assert {"train", "val", "test"} == set(a.values())


def test_hash_split_validation_and_plan(spark):
    df = spark.range(0, 10).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError, match="sum to den"):
        hash_split(df, "doc_id", [("a", 50), ("b", 49)])
    with pytest.raises(ValueError, match="at least one"):
        hash_split(df, "doc_id", [])
    plan = _plan(hash_split(df, "doc_id", [("train", 98), ("val", 1),
                                           ("test", 1)]))
    assert "Exchange" not in plan and "Python" not in plan


# --------------------------------------------------------- shuffle_shard

def test_shuffle_shard_is_permutation_and_deterministic(spark):
    """pos is 1..n_shard_rows within every shard; the full output is a
    permutation of the input ids; re-running reproduces it exactly."""
    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    out = shuffle_shard(df, "doc_id", 8).collect()
    assert sorted(r.doc_id for r in out) == list(range(2000))
    by_shard = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r.pos)
    assert set(by_shard) <= set(range(8))
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    again = {(r.doc_id): (r.shard, r.pos)
             for r in shuffle_shard(df, "doc_id", 8).collect()}
    assert all(again[r.doc_id] == (r.shard, r.pos) for r in out)
    # it actually shuffles: within a shard, pos order != id order
    ids_in_pos_order = [r.doc_id for r in
                        sorted(out, key=lambda r: (r.shard, r.pos))]
    assert ids_in_pos_order != sorted(ids_in_pos_order)
    with pytest.raises(ValueError, match="positive"):
        shuffle_shard(df, "doc_id", 0)


def test_shuffle_shard_stable_under_growth(spark):
    """A doc keeps its shard (not its pos) when the corpus grows."""
    big = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    small = big.where(F.col("doc_id") < 300)
    a = {r.doc_id: r.shard for r in shuffle_shard(big, "doc_id", 8).collect()}
    b = {r.doc_id: r.shard
         for r in shuffle_shard(small, "doc_id", 8).collect()}
    assert all(a[k] == v for k, v in b.items())


# -------------------------------------------------------- pick_canonical

def test_pick_canonical_argmax_and_ties(spark):
    clusters = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 10), (4, 40)], "doc_id long, cluster_id long")
    meta = spark.createDataFrame(
        [(1, 50), (2, 80), (3, 80), (4, 7)], "doc_id long, q long")
    got = {r.cluster_id: r for r in
           pick_canonical(clusters, meta, "doc_id", "q").collect()}
    # cluster 10: max q=80 tie between ids 2,3 -> smallest id wins
    assert got[10].keeper_id == 2 and got[10].keeper_quality == 80
    assert got[10].n_docs == 3
    assert got[40].keeper_id == 4 and got[40].n_docs == 1


def test_pick_canonical_is_aggregate_not_window(spark):
    """min(struct) compiles to a SortAggregate (struct min has no hash
    form), but the scale property holds: a PARTIAL aggregate runs
    before the cluster exchange, so a mega-cluster's rows reduce
    map-side instead of sorting in one window task."""
    clusters = spark.createDataFrame([(1, 10)], "doc_id long, cluster_id long")
    meta = spark.createDataFrame([(1, 5)], "doc_id long, q long")
    executed = (pick_canonical(clusters, meta, "doc_id", "q")
                ._jdf.queryExecution().executedPlan().toString())
    assert "Window" not in executed, executed
    import re
    aggs = re.findall(r"(Sort|Hash|ObjectHash)Aggregate", executed)
    assert len(aggs) >= 2, executed  # partial + final
    assert "partial_min" in executed, executed


# -------------------------------------------------------- filter_cascade

def test_filter_cascade_rules_and_cumulation(spark):
    """Hand-built docs that fail exactly one rule each; survivors
    monotone; words_kept counts only full survivors."""
    from cuckoofilter_spark.ops.text import filter_cascade

    rows = [
        # passes everything: 6 words, awl 4, stopwords 'the a', distinct
        (1, "s", "the red fox ate a pear"),
        # fails r1: too short
        (2, "s", "tiny doc"),
        # fails r2: mean word length > 12
        (3, "s", " ".join(["supercalifragilistic"] * 6)),
        # fails r3: no stopwords
        (4, "s", "red fox ate pear green tree"),
        # fails r4: TTR < 0.1 -> needs > 10x repeats of one word + a stopword
        (5, "s", "the " + " ".join(["word"] * 30)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = filter_cascade(df, "text", "source", min_words=5, max_words=100,
                         ttr_div=10).collect()[0]
    assert out.n_docs == 5
    assert out.pass_1 == 4      # doc 2 out
    assert out.pass_2 == 3      # doc 3 out
    assert out.pass_3 == 2      # doc 4 out
    # doc 5: 31 words, 2 distinct -> 2*10 < 31 -> out
    assert out.pass_4 == 1
    assert out.words_kept == 6  # doc 1 only
    # survivors are monotone by construction
    assert out.pass_1 >= out.pass_2 >= out.pass_3 >= out.pass_4


def test_filter_cascade_single_pass_plan(spark):
    from cuckoofilter_spark.ops.text import filter_cascade

    df = spark.createDataFrame([(1, "s", "the a b")],
                               "doc_id long, source string, text string")
    executed = (filter_cascade(df, "text", "source")
                ._jdf.queryExecution().executedPlan().toString())
    assert executed.count("Exchange") == 1, executed
    assert "Join" not in executed and "Python" not in executed, executed


# --------------------------------------------------------------- zipf_fit

def test_zipf_fit_exact_two_point_slope(spark):
    """Two types with freqs 4 and 1: slope = (ln1-ln4)/(ln1-ln2) ...
    points are (ln1, ln4) and (ln2, ln1) -> slope = -ln4/ln2 = -2."""
    from cuckoofilter_spark.ops.text import zipf_fit

    rows = [(1, "en", "aa aa aa aa bb")]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = zipf_fit(df, "text", "lang").collect()[0]
    assert out.n_types == 2
    assert abs(out.slope_e6 - (-2_000_000)) <= 2  # quantization slack
    # perfectly Zipfian 3 points: freqs 6,3,2 -> ln(c) = ln6 - ln(rank)
    rows = [(1, "fr", " ".join(["x"] * 6 + ["y"] * 3 + ["z"] * 2))]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = zipf_fit(df, "text", "lang").collect()[0]
    assert abs(out.slope_e6 - (-1_000_000)) <= 2


def test_zipf_fit_single_type_null_slope(spark):
    from cuckoofilter_spark.ops.text import zipf_fit

    df = spark.createDataFrame([(1, "en", "solo solo solo")],
                               "doc_id long, lang string, text string")
    out = zipf_fit(df, "text", "lang").collect()[0]
    assert out.n_types == 1 and out.slope_e6 is None


# ------------------------------------------------- CMS inner product

def test_cms_inner_product_bounds_and_merge():
    """est >= exact always; est <= exact + eps*L1a*L1b; distributed
    merge (elementwise add) gives the SAME inner product as a single
    build; param mismatch raises."""
    import numpy as np

    from cuckoofilter_spark.kernels.cms import CountMinSketch

    rng = np.random.default_rng(20260819)
    a = rng.integers(0, 2000, 100_000).astype(np.uint64)
    b = rng.integers(0, 500, 100_000).astype(np.uint64)
    fa = np.bincount(a.astype(int), minlength=2000)
    fb = np.bincount(b.astype(int), minlength=2000)
    exact = int(np.dot(fa.astype(object), fb.astype(object)))

    sa = CountMinSketch.create(eps=0.0001, seed=7)
    sb = CountMinSketch.create(eps=0.0001, seed=7)
    sa.add_many(a)
    sb.add_many(b)
    est = sa.inner_product(sb)
    assert est >= exact
    assert est - exact <= 0.0001 * a.size * b.size

    # mergeability: two half-builds merged == one full build (exact,
    # because the table add is elementwise)
    h1, h2 = (CountMinSketch.create(eps=0.0001, seed=7) for _ in range(2))
    h1.add_many(a[:50_000])
    h2.add_many(a[50_000:])
    merged = CountMinSketch.merge(h1, h2)
    assert merged.inner_product(sb) == est

    other = CountMinSketch.create(eps=0.0001, seed=8)
    import pytest as _pytest
    with _pytest.raises(ValueError, match="incompatible"):
        sa.inner_product(other)


def test_cms_inner_product_exact_when_collision_free():
    """With few distinct keys relative to width, each key owns its
    cells in SOME row w.h.p. — but the deterministic check here is
    self-product >= sum of squares, with equality when no row has a
    collision among the present keys."""
    import numpy as np

    from cuckoofilter_spark.kernels.cms import CountMinSketch

    keys = np.array([1, 1, 1, 2, 2, 7], dtype=np.uint64)
    s = CountMinSketch.create(eps=0.00005, seed=3)  # width >> 3 keys
    s.add_many(keys)
    exact_f2 = 9 + 4 + 1
    est = s.inner_product(s)
    assert est >= exact_f2
    assert est == exact_f2  # collision among 3 keys in all 4 rows ~ 0


# --------------------------------------------------------- AMS F2 sketch

def test_ams_f2_estimate_merge_and_blob():
    """Estimate within 6 sigma of exact F2 on a skewed multiset;
    half-build merge reproduces the full table bit-for-bit; blob
    round-trip; param mismatch raises; degenerate shape raises."""
    import numpy as np

    from cuckoofilter_spark.kernels.ams import AmsF2

    rng = np.random.default_rng(20260819)
    # zipf-ish skew: hot keys dominate F2
    keys = (rng.zipf(1.5, 200_000) % 5000).astype(np.uint64)
    f = np.bincount(keys.astype(int))
    exact = int(np.dot(f.astype(object), f.astype(object)))

    s = AmsF2(width=4096, depth=5, seed=11)
    s.add_many(keys)
    est = s.estimate()
    sigma = (2.0 / 4096) ** 0.5
    assert abs(est - exact) <= 6 * sigma * exact + 8
    assert s.total == keys.size

    h1, h2 = AmsF2(4096, 5, 11), AmsF2(4096, 5, 11)
    h1.add_many(keys[:100_000])
    h2.add_many(keys[100_000:])
    m = AmsF2.merge(h1, h2)
    assert (m.table == s.table).all() and m.total == s.total
    assert m.estimate() == est

    rt = AmsF2.from_bytes(s.to_bytes())
    assert (rt.table == s.table).all() and rt._params() == s._params()
    assert rt.total == s.total

    import pytest as _pytest
    with _pytest.raises(ValueError, match="incompatible"):
        AmsF2.merge(s, AmsF2(4096, 5, 12))
    with _pytest.raises(ValueError, match="degenerate"):
        AmsF2(width=1)


def test_ams_f2_distinct_keys_near_n():
    """All-distinct multiset: F2 = N exactly; the estimate lands within
    the bound of N (the hardest relative case — no hot mass)."""
    import numpy as np

    from cuckoofilter_spark.kernels.ams import AmsF2

    keys = np.arange(50_000, dtype=np.uint64)
    s = AmsF2(width=4096, depth=5, seed=3)
    s.add_many(keys)
    sigma = (2.0 / 4096) ** 0.5
    assert abs(s.estimate() - 50_000) <= 6 * sigma * 50_000 + 8


# ------------------------------------- randomized funnel/retention parity

def test_funnel_matches_bruteforce_on_random_logs(spark):
    """300 users x random events vs a per-user greedy brute force in
    plain Python — catches any drift between the HOF chain and the
    stated greedy-earliest strict-> semantics (duplicate timestamps,
    missing steps, interleavings all arise at this size)."""
    import numpy as np

    rng = np.random.default_rng(20260819)
    types = ["view", "click", "purchase"]
    rows = []
    for u in range(300):
        n = int(rng.integers(0, 12))
        for _ in range(n):
            t = dt.datetime(2024, 1, 1) + dt.timedelta(
                seconds=int(rng.integers(0, 50)))  # many exact ties
            rows.append((u, t, types[int(rng.integers(0, 3))]))
    if not rows:
        rows = [(0, dt.datetime(2024, 1, 1), "view")]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, et string")
    got = {r.user_id: (r.step_1_ts, r.step_2_ts, r.step_3_ts,
                       r.steps_completed)
           for r in funnel(df, "user_id", "ts", "et", types).collect()}

    by_user = {}
    for u, t, et in rows:
        by_user.setdefault(u, []).append((t, et))
    for u, evs in by_user.items():
        matched, prev = [], None
        for step in types:
            cand = [t for t, et in evs
                    if et == step and (prev is None or t > prev)]
            nxt = min(cand) if cand else None
            matched.append(nxt)
            if nxt is None:
                matched.extend([None] * (len(types) - len(matched)))
                break
            prev = nxt
        want = (*matched, sum(1 for m in matched if m is not None))
        assert got[u] == want, (u, got[u], want)


def test_retention_matches_bruteforce_on_random_logs(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    rows = [(int(rng.integers(0, 40)),
             dt.datetime(2024, 1, 1)
             + dt.timedelta(hours=int(rng.integers(0, 24 * 20))))
            for _ in range(600)]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {(str(r.cohort_day), r.day_offset): r.n_users
           for r in retention_cohorts(df, "user_id", "ts").collect()}

    days = {}
    for u, t in rows:
        days.setdefault(u, set()).add(t.date())
    want = {}
    for u, ds in days.items():
        c = min(ds)
        for d in ds:
            k = (str(c), (d - c).days)
            want[k] = want.get(k, 0) + 1
    assert got == want
