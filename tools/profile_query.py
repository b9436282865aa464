"""Per-query profiler: jobs, stages, task counts, per-stage wall time.

Optimization-round instrument (guide §1/§7 without a UI): runs one or more
headline queries through the same noop-sink protocol as bench.py, with a
status-tracker sweep AFTER each run recording, per job: stage count, task
count, and (from the stage info) the task-parallelism bottlenecks — a
single-task heavy stage is invisible in total seconds but caps core
scaling.

    python tools/profile_query.py dedup_ngram_jaccard text_containment_pairs

Prints, per query: cold time, warm time, n_jobs, and per-job
(stages, tasks) — enough to spot "one 3-second single-task stage".
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    if REPO not in sys.path:
        sys.path.insert(0, REPO)
    from filmdatawarehouse_spark.operators.cache import release_managed
    from filmdatawarehouse_spark.queries.registry import all_queries
    from filmdatawarehouse_spark.session import get_spark

    spark = get_spark("profile")
    sc = spark.sparkContext
    registry = all_queries()

    # warm-up
    spark.range(1000).write.format("noop").mode("overwrite").save()

    tracker = sc.statusTracker()

    for name in args.names:
        fn = registry[name][0]
        for run in range(args.runs):
            before_jobs = set(tracker.getJobIdsForGroup(None) or [])
            sc.setJobDescription(f"profile:{name}:run{run}")
            t0 = time.perf_counter()
            fn(spark, args.sf_dir).write.format("noop").mode(
                "overwrite").save()
            dt = time.perf_counter() - t0
            sc.setJobDescription(None)
            after_jobs = set(tracker.getJobIdsForGroup(None) or [])
            jobs = sorted(after_jobs - before_jobs)
            print(f"\n=== {name} run{run}: {dt:.3f}s, {len(jobs)} jobs ===")
            for j in jobs:
                ji = tracker.getJobInfo(j)
                if ji is None:
                    continue
                stage_bits = []
                for s in ji.stageIds:
                    si = tracker.getStageInfo(s)
                    if si is None:
                        continue
                    stage_bits.append(f"s{s}:{si.numTasks}t")
                print(f"  job {j}: {' '.join(stage_bits)}")
            if run == 0:
                release_managed()
        release_managed()
    spark.stop()


if __name__ == "__main__":
    main()
