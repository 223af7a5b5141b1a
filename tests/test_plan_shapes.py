"""Plan-shape regression gate (VERDICT r4 #6).

``scripts/plan_audit.py`` -> PLANS.md records the compiled plan shape
of every driver query, but nothing FAILED when a plan regressed. This
test re-audits a pinned subset — the shapes that carry the 100 TB
story — and asserts the exchange / Python-stage / pushed-scan counts,
so a Spark-upgrade optimizer change or a refactor cannot silently
double a shuffle, drop a filter pushdown, or push a Python stage into
a hot path.

Counting recipe = scripts/plan_audit.audit on
``executedPlan().toString()`` (explain("formatted") counts each
exchange twice — tree line + detail header; toString() counts once).
Audited at sf0.001 (plan SHAPE is partition-count-independent; the
audit compiles, never runs).
"""
import importlib.util
import os

import pytest

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_spec = importlib.util.spec_from_file_location(
    "plan_audit", os.path.join(_HERE, "scripts", "plan_audit.py"))
_plan_audit = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_plan_audit)
audit = _plan_audit.audit

SF = "/root/testdata/sf0.001"

# name -> exact expectations (a key absent = not pinned for that query).
# These are the plan shapes the SCALE story depends on, from PLANS.md:
#   - membership probes: ZERO exchanges, exactly one Arrow stage
#     (broadcast blobs + per-batch probe — the filter never shuffles
#     the probed table)
#   - text_stats: zero exchanges, zero Python (pure codegen projection
#     + aggregate pattern... it is a per-doc projection, no agg)
#   - funnel/filter_cascade/hash_split/shuffle_shard: exactly ONE
#     shuffle (the single keyed exchange each op is designed around)
#   - pruned_scan: both parquet scans carry pushed filters (the AMQ
#     file-skipping path must not lose scan pushdown)
#   - zipf_fit / skew_f2: two shuffles (vocab agg + moment agg), no
#     Python stage
PINNED = {
    "cf_membership": {"shuffle_ex": 0, "broadcast_ex": 0, "py_stages": 1},
    "xor_membership": {"shuffle_ex": 0, "broadcast_ex": 0, "py_stages": 1},
    "text_stats": {"shuffle_ex": 0, "broadcast_ex": 0, "py_stages": 0},
    "funnel_conversion": {"shuffle_ex": 1, "py_stages": 0},
    "filter_cascade": {"shuffle_ex": 1, "py_stages": 0},
    "hash_split": {"shuffle_ex": 1, "py_stages": 0},
    "shuffle_shard": {"shuffle_ex": 1, "py_stages": 0},
    "sessionize": {"shuffle_ex": 1, "py_stages": 0, "pushed_min": 1},
    "pruned_scan": {"pushed_min": 2},
    "zipf_fit": {"shuffle_ex": 2, "py_stages": 0},
    "skew_f2": {"shuffle_ex": 2, "py_stages": 0},
    "stratified_sample": {"py_stages": 0},
    "temperature_mix": {"py_stages": 0},
}


@pytest.fixture(scope="module")
def shapes(spark):
    import __spark_entry__ as e

    qs = e.queries()
    out = {}
    for name in PINNED:
        plan = qs[name](spark, SF)._jdf.queryExecution() \
            .executedPlan().toString()
        out[name] = audit(plan)
    return out


@pytest.mark.parametrize("name", sorted(PINNED))
def test_plan_shape_pinned(shapes, name):
    got = shapes[name]
    want = PINNED[name]
    for key, val in want.items():
        if key == "pushed_min":
            assert got["pushed"] >= val, (
                f"{name}: pushed-filter scans {got['pushed']} < {val} "
                f"— scan pushdown regressed (full audit: {got})")
        else:
            assert got[key] == val, (
                f"{name}: {key} = {got[key]}, pinned {val} "
                f"— plan regressed (full audit: {got})")
