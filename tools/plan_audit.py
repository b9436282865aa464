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

# r12 (VERDICT r11 item 6): the SMJ/multi-exchange queries — where AQE
# re-planning at real data sizes can regress without moving the bench
# tail. bench.py fingerprints these POST-execution (plans_runtime) in
# every round-final record, on top of the 8 bench-slowest;
# check_runtime() diffs them like any other runtime fingerprint.
EXCHANGE_HEAVY = [
    "join_bigbig_rollup",
    "join_bigbig_bucketed",
    "corpus_mix_sample",
    "incremental_daily_rollup",
    "dq_checks",
]


def final_plan_section(plan: str) -> str:
    """After execution, an AdaptiveSparkPlan's toString carries BOTH a
    '== Final Plan ==' and an '== Initial Plan ==' section; fingerprint
    only the final one or every feature double-counts."""
    i = plan.find("== Initial Plan ==")
    return plan if i < 0 else plan[:i]


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


def check_runtime(
    disk: dict | None = None, committed: dict | None = None
) -> tuple[list[str], str]:
    """(regressions, note) from diffing the on-disk BENCH_full.json's
    ``plans_runtime`` block (VERDICT r10 item 7: POST-execution
    isFinalPlan=true fingerprints of the 8 bench-slowest queries at the
    bench SF, captured by bench.py) against the committed record's. This
    is the one regression class the static sf0.001 audit cannot see —
    AQE re-planning at real data sizes (the class the r10
    shingle-census incident lived in). Missing blocks are a note, not a
    failure: the comparison only exists once two bench records carry
    fingerprints at the same SF. ``disk``/``committed`` are injectable
    for tests; by default they load from BENCH_full.json and
    HEAD:BENCH_full.json."""
    import subprocess

    if disk is None:
        try:
            with open(os.path.join(REPO, "BENCH_full.json")) as f:
                disk = json.load(f)
        except (OSError, ValueError) as e:
            return [], (
                f"runtime check skipped: no readable BENCH_full.json ({e})"
            )
    if committed is None:
        try:
            blob = subprocess.run(
                ["git", "-C", REPO, "show", "HEAD:BENCH_full.json"],
                capture_output=True,
                text=True,
                timeout=30,
            )
            if blob.returncode != 0:
                return [], (
                    "runtime check skipped: no committed BENCH_full.json"
                )
            committed = json.loads(blob.stdout)
        except (OSError, ValueError, subprocess.SubprocessError) as e:
            return [], f"runtime check skipped: git show failed ({e})"
    if disk.get("sf") != committed.get("sf"):
        return [], "runtime check skipped: records are different SFs"
    gated = {k for k, _ in COST_FEATURES}
    regressions = []
    overlaps = []
    # r13 (VERDICT r12 item 8): bench.py records the same fingerprint set
    # captured on the WARM pass too (persisted frames still in the
    # CacheManager) — diff both axes, since the one r12 perf anomaly was
    # warm-only and invisible to the cold-state fingerprints. Presence is
    # checked PER AXIS (ADVICE r13): a record whose cold capture failed
    # after the warm capture succeeded must still get its warm-axis diff,
    # not an early "plans_runtime absent" skip.
    for axis in ("plans_runtime", "plans_runtime_warm"):
        cur, base = disk.get(axis), committed.get(axis)
        if not cur or not base:
            continue  # an axis only diffs once two records carry it
        overlaps.append(f"{axis}: {len(set(cur) & set(base))}")
        for name in sorted(set(cur) & set(base)):
            for feat in sorted(gated):
                b, c = base[name].get(feat, 0), cur[name].get(feat, 0)
                if c > b:
                    regressions.append(
                        f"{name}: {axis.removeprefix('plans_')} "
                        f"{feat} {b} -> {c}"
                    )
    if not overlaps:
        return [], (
            "runtime check skipped: no runtime-fingerprint axis present "
            "in both records"
        )
    return regressions, (
        "runtime check overlapping fingerprints — " + "; ".join(overlaps)
    )


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
    rt_regressions, rt_note = check_runtime()
    print(rt_note)
    for line in rt_regressions:
        print(f"[REGRESSION] {line}")
    print(
        f"plan audit: {len(current)} plans, "
        f"{len(regressions)} static + {len(rt_regressions)} runtime "
        f"regression(s), {len(improvements)} improvement(s)"
    )
    return 1 if regressions or rt_regressions else 0


if __name__ == "__main__":
    sys.exit(main())
