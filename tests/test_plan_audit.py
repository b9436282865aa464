"""The plan-fingerprint audit (tools/plan_audit.py): the fingerprint
extraction and regression rules are unit-pinned, and the committed
PLANS.json baseline stays in sync with the bench headline and with the
plans the engine actually produces (spot-checked on cheap stable
queries — the full audit is the round-start `--check` run)."""

from __future__ import annotations

import importlib.util
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _tool():
    spec = importlib.util.spec_from_file_location(
        "plan_audit", os.path.join(REPO, "tools", "plan_audit.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


FAKE_PLAN = """
AdaptiveSparkPlan isFinalPlan=false
+- TakeOrderedAndProject(limit=10, orderBy=[t DESC])
   +- Exchange hashpartitioning(k#1, 32)
      +- SortMergeJoin [k#1], [k#2], Inner
         :- Sort [k#1 ASC NULLS FIRST], false, 0
         :  +- Exchange hashpartitioning(k#1, 32)
         +- Sort [k#2 ASC NULLS FIRST], false, 0
            +- Exchange hashpartitioning(k#2, 32)
               +- WindowGroupLimit [p#3], [r#4 ASC], rank, 3
                  +- Window [rank() ...], [p#3], [r#4 ASC]
                     +- BroadcastHashJoin [a#5], [b#6], Inner
                        +- BroadcastExchange HashedRelationBroadcastMode
"""


def test_fingerprint_counts_and_window_group_limit_exclusion():
    pa = _tool()
    fp = pa.fingerprint(FAKE_PLAN)
    assert fp["exchange_hash"] == 3
    assert fp["sort_merge_join"] == 1
    assert fp["sort"] == 2
    assert fp["broadcast_exchange"] == 1
    assert fp["broadcast_hash_join"] == 1
    assert fp["top_k"] == 1
    assert fp["window_group_limit"] == 1
    # WindowGroupLimit is an optimization, not a window-sort cost
    assert fp["window"] == 1


def test_diff_flags_cost_increases_only():
    pa = _tool()
    base = {"q": {"exchange_hash": 2, "sort_merge_join": 0, "window": 1}}
    worse = {"q": {"exchange_hash": 3, "sort_merge_join": 1, "window": 1}}
    better = {"q": {"exchange_hash": 1, "sort_merge_join": 0, "window": 1}}
    reg, imp = pa.diff(base, worse)
    assert len(reg) == 2 and not imp
    reg, imp = pa.diff(base, better)
    assert not reg and len(imp) == 1
    # info features (broadcast_hash_join) never gate
    reg, imp = pa.diff(
        {"q": {"broadcast_hash_join": 2}}, {"q": {"broadcast_hash_join": 0}}
    )
    assert not reg and not imp
    # a new query is an improvement prompt, not a regression
    reg, imp = pa.diff({}, {"new_q": {"exchange_hash": 5}})
    assert not reg and imp == ["new_q: NEW (baseline with --write)"]


def test_committed_baseline_covers_headline_and_matches_cheap_plans(
    spark,
):
    pa = _tool()
    import sys

    if REPO not in sys.path:
        sys.path.insert(0, REPO)
    from bench import HEADLINE
    from filmdatawarehouse_spark.queries.registry import all_queries

    with open(os.path.join(REPO, "PLANS.json")) as f:
        committed = json.load(f)
    registry = all_queries()
    expected = [n for n in HEADLINE if n in registry]
    assert sorted(committed) == sorted(expected)

    sf = "/root/testdata/sf0.001"
    for name in ["filter_pushdown", "top10_parts", "join_inner_equi"]:
        plan = (
            registry[name][0](spark, sf)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert pa.fingerprint(plan) == committed[name], name


def test_check_runtime_diffs_warm_axis_when_cold_absent():
    """ADVICE r13: a record carrying only plans_runtime_warm (the cold
    capture failed after the warm one succeeded) must still get its
    warm-axis diff — presence is per axis, not an early return on the
    cold block."""
    pa = _tool()
    warm_only_disk = {
        "sf": 0.1,
        "plans_runtime_warm": {"q": {"exchange_hash": 3}},
    }
    committed = {
        "sf": 0.1,
        "plans_runtime": {"q": {"exchange_hash": 1}},
        "plans_runtime_warm": {"q": {"exchange_hash": 1}},
    }
    regressions, note = pa.check_runtime(warm_only_disk, committed)
    assert regressions == ["q: runtime_warm exchange_hash 1 -> 3"]
    assert "plans_runtime_warm: 1" in note

    # and when NO axis overlaps, the skip is explicit
    regressions, note = pa.check_runtime({"sf": 0.1}, committed)
    assert regressions == [] and "skipped" in note


def test_check_runtime_cross_sf_records_skip():
    pa = _tool()
    regressions, note = pa.check_runtime(
        {"sf": 0.01, "plans_runtime": {"q": {"sort": 9}}},
        {"sf": 0.1, "plans_runtime": {"q": {"sort": 0}}},
    )
    assert regressions == [] and "different SFs" in note
