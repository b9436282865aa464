"""Physical-plan fingerprint audit — the plan-hygiene analogue of
tools/scale_sweep.py (r10).

tests/test_plan_hygiene.py pins DEEP properties of a hand-picked set
(pushdown reaches the scan, TakeOrderedAndProject, agg-below-join). What
nothing watched until now is plan-shape REGRESSION breadth: a refactor
that silently turns one broadcast join into a sort-merge join, or adds an
exchange to a query that had three, costs nothing at sf0.001 where every
test runs — and a cluster-day at 100 TB. This tool fingerprints every
bench-headline query's executed plan (operator counts that matter at
scale: exchanges, join strategies, windows, sorts, cartesian products)
and diffs against the committed PLANS.json:

    python tools/plan_audit.py --write          # (re)baseline PLANS.json
    python tools/plan_audit.py --check          # exit 1 on any regression

Regression = a COST feature increased vs baseline (more exchanges, more
SMJs, a new cartesian/BNLJ, more windows/sorts) for the same query.
Decreases are improvements: --check reports them as such and asks for a
--write rebaseline, so the file stays the best-known plan, ratcheting
downward only. New queries are baselined on first --write; queries gone
from the headline are dropped.

Fingerprints are taken at sf0.001 (plan shape does not depend on data
volume at fixed schema/stats here — no CBO stats are collected, and AQE
runtime re-plans are a bonus on top of the static shape this pins).
Shared-memo providers persist frames as a side effect; fingerprints are
taken through the same builders the bench times, so InMemoryTableScan
is a legitimate (and stable) part of a shape.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PLANS_PATH = os.path.join(REPO, "PLANS.json")
DEFAULT_SF_DIR = "/root/testdata/sf0.001"

# (json key, substring counted in the executed-plan string). Every one of
# these is a feature whose INCREASE is a scale cost: exchanges are
# shuffles/broadcast builds, SMJ adds sort passes a BHJ avoids, cartesian
# and broadcast-nested-loop are quadratic, windows and global sorts are
# per-partition sort state.
COST_FEATURES = [
    ("exchange_hash", "Exchange hashpartitioning"),
    ("exchange_range", "Exchange rangepartitioning"),
    ("exchange_single", "Exchange SinglePartition"),
    ("broadcast_exchange", "BroadcastExchange"),
    ("sort_merge_join", "SortMergeJoin"),
    ("shuffled_hash_join", "ShuffledHashJoin"),
    ("cartesian", "CartesianProduct"),
    ("bcast_nested_loop", "BroadcastNestedLoopJoin"),
    ("sort", "Sort ["),
]
# Informational (not regression-gated): fewer broadcast joins is only bad
# if a costlier join replaced them, which the cost features already catch;
# WindowGroupLimit is an optimization (partial group limit), not a cost.
INFO_FEATURES = [
    ("broadcast_hash_join", "BroadcastHashJoin"),
    ("top_k", "TakeOrderedAndProject"),
    ("window_group_limit", "WindowGroupLimit"),
]


def fingerprint(plan: str) -> dict[str, int]:
    fp = {k: plan.count(s) for k, s in COST_FEATURES}
    fp.update({k: plan.count(s) for k, s in INFO_FEATURES})
    # "Window" alone would also count WindowGroupLimit rows — an
    # optimization, not a window sort; count true Window operators only
    fp["window"] = plan.count("Window") - fp["window_group_limit"]
    return fp


def audit(sf_dir: str) -> dict[str, dict[str, int]]:
    """Fingerprint every bench-headline query (registry order)."""
    if REPO not in sys.path:
        sys.path.insert(0, REPO)
    from bench import HEADLINE
    from filmdatawarehouse_spark.operators.cache import release_managed
    from filmdatawarehouse_spark.queries.registry import all_queries
    from filmdatawarehouse_spark.session import get_spark

    spark = get_spark()
    registry = all_queries()
    out: dict[str, dict[str, int]] = {}
    for name in HEADLINE:
        if name not in registry:
            continue
        fn = registry[name][0]
        plan = (
            fn(spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        out[name] = fingerprint(plan)
    release_managed()
    return out


def diff(
    committed: dict[str, dict[str, int]],
    current: dict[str, dict[str, int]],
) -> tuple[list[str], list[str]]:
    """(regressions, improvements) as human-readable lines."""
    gated = {k for k, _ in COST_FEATURES}
    regressions, improvements = [], []
    for name, fp in sorted(current.items()):
        base = committed.get(name)
        if base is None:
            improvements.append(f"{name}: NEW (baseline with --write)")
            continue
        for feat in sorted(gated):
            b, c = base.get(feat, 0), fp.get(feat, 0)
            if c > b:
                regressions.append(f"{name}: {feat} {b} -> {c}")
            elif c < b:
                improvements.append(f"{name}: {feat} {b} -> {c}")
    return regressions, improvements


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--write", action="store_true")
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    args = ap.parse_args()
    if args.write == args.check:
        ap.error("pass exactly one of --write / --check")

    current = audit(args.sf_dir)
    if args.write:
        with open(PLANS_PATH, "w") as f:
            json.dump(current, f, indent=1, sort_keys=True)
            f.write("\n")
        print(f"wrote {PLANS_PATH}: {len(current)} plans")
        return 0

    with open(PLANS_PATH) as f:
        committed = json.load(f)
    regressions, improvements = diff(committed, current)
    for line in improvements:
        print(f"[better] {line}")
    for line in regressions:
        print(f"[REGRESSION] {line}")
    gone = sorted(set(committed) - set(current))
    for name in gone:
        print(f"[gone] {name} (rebaseline with --write)")
    print(
        f"plan audit: {len(current)} plans, "
        f"{len(regressions)} regression(s), "
        f"{len(improvements)} improvement(s)"
    )
    return 1 if regressions else 0


if __name__ == "__main__":
    sys.exit(main())
