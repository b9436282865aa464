"""Per-stage wall/task-time profiler via the Spark UI REST API.

Optimization-round instrument (guide §7.1 without a live UI): runs one
query with the bench cold protocol in a session with the UI enabled,
then dumps every stage's task count, executor-run time, and I/O so a
"one slow single-task stage" is visible with numbers.

    python tools/profile_stages.py text_containment_prefix_pairs
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--min-ms", type=int, default=50,
                    help="hide stages below this executor-run-time")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    if REPO not in sys.path:
        sys.path.insert(0, REPO)
    from filmdatawarehouse_spark.io.sources import read_table
    from filmdatawarehouse_spark.operators.cache import release_managed
    from filmdatawarehouse_spark.queries.registry import all_queries
    from filmdatawarehouse_spark.session import get_spark

    spark = get_spark("profile-stages", extra_conf={
        "spark.ui.enabled": "true", "spark.ui.port": "4123",
    })
    registry = all_queries()
    read_table(spark, args.sf_dir, "lineitem").limit(1000).write.format(
        "noop").mode("overwrite").save()

    app_id = spark.sparkContext.applicationId
    base = f"http://localhost:4123/api/v1/applications/{app_id}"

    def stages() -> list[dict]:
        with urllib.request.urlopen(f"{base}/stages?status=complete") as r:
            return json.loads(r.read())

    for name in args.names:
        fn = registry[name][0]
        for run in range(args.runs):
            seen = {s["stageId"] for s in stages()}
            t0 = time.perf_counter()
            fn(spark, args.sf_dir).write.format("noop").mode(
                "overwrite").save()
            dt = time.perf_counter() - t0
            new = [s for s in stages() if s["stageId"] not in seen]
            new.sort(key=lambda s: -s.get("executorRunTime", 0))
            print(f"\n=== {name} run{run}: {dt:.3f}s, {len(new)} stages ===")
            total_rt = sum(s.get("executorRunTime", 0) for s in new)
            print(f"  total executorRunTime {total_rt} ms")
            for s in new:
                rt = s.get("executorRunTime", 0)
                if rt < args.min_ms:
                    continue
                print(
                    f"  stage {s['stageId']:>4} {s['numCompleteTasks']:>3}t "
                    f"run={rt:>6}ms cpu={s.get('executorCpuTime',0)//1_000_000:>6}ms "
                    f"in={s.get('inputBytes',0):>9} sh_r={s.get('shuffleReadBytes',0):>9} "
                    f"sh_w={s.get('shuffleWriteBytes',0):>9} "
                    f"| {s.get('name','')[:60]}"
                )
            release_managed()
    spark.stop()


if __name__ == "__main__":
    main()
