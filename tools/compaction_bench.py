"""Measure partition-selective compaction (io/maintenance.py) against a
realistically fragmented table — numbers for SCALING.md, the
skew_bench/mg_bench precedent of turning a design argument into a
measurement.

Builds a date-partitioned copy of sf0.1 lineitem (~600k rows) fragmented
the way the streaming MERGE sink fragments hot partitions (many tasks x
many deliveries), then measures the planner (driver-side listing + victim
math) and the one-job rewrite, and verifies row conservation and the
post-state file counts.

    python tools/compaction_bench.py [--sf-dir /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--deliveries", type=int, default=8)
    ap.add_argument("--tasks-per-delivery", type=int, default=16)
    args = ap.parse_args()
    if REPO not in sys.path:
        sys.path.insert(0, REPO)

    from pyspark.sql import functions as F

    from filmdatawarehouse_spark.io import maintenance as mt
    from filmdatawarehouse_spark.io.sources import read_table
    from filmdatawarehouse_spark.session import get_spark

    spark = get_spark()
    table = os.path.join(tempfile.mkdtemp(prefix="compact_bench_"), "t")

    li = read_table(spark, args.sf_dir, "lineitem").select(
        "l_orderkey",
        "l_partkey",
        "l_quantity",
        "l_extendedprice",
        F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"),
    )
    n_rows = li.count()
    # fragment like a micro-batch stream: D deliveries x T tasks each
    # append into every month partition
    t0 = time.time()
    for _ in range(args.deliveries):
        (
            li.sample(1.0 / args.deliveries, seed=_)
            .repartition(args.tasks_per_delivery)
            .write.mode("append")
            .partitionBy("ship_month")
            .parquet(table)
        )
    build_s = time.time() - t0
    written = spark.read.parquet(table).count()

    t0 = time.time()
    plans = mt.compaction_plan(
        spark, table, "ship_month", target_bytes=128 << 20
    )
    plan_s = time.time() - t0
    stats = mt.partition_file_stats(spark, table, "ship_month")
    n_files = sum(n for n, _ in stats.values())
    print(
        f"fragmented table: {written}/{n_rows} rows, {n_files} files "
        f"across {len(stats)} partitions (built in {build_s:.1f}s)"
    )
    print(
        f"planner (ContentSummary, O(partitions) py4j): "
        f"{plan_s*1000:.0f}ms, {len(plans)} victims, "
        f"worst {plans[0].n_files if plans else 0} files -> "
        f"{plans[0].n_out if plans else 0}"
    )
    t0 = time.time()
    files = mt.list_data_files(spark, table)
    list_s = time.time() - t0
    print(
        f"contrast — per-file forensic walk (O(files) py4j): "
        f"{len(files)} files in {list_s:.1f}s "
        f"({list_s*1000/max(1,len(files)):.1f}ms/file)"
    )

    t0 = time.time()
    summary = mt.compact_partitions(
        spark, table, "ship_month", target_bytes=128 << 20
    )
    rewrite_s = time.time() - t0
    after = spark.read.parquet(table).count()
    stats = mt.partition_file_stats(spark, table, "ship_month")
    worst_after = max(n for n, _ in stats.values())
    print(
        f"rewrite: {summary['partitions']} partitions, "
        f"{summary['files_before']} -> {summary['files_after']} files "
        f"in {rewrite_s:.2f}s (one job); worst partition now "
        f"{worst_after} file(s)"
    )
    ok = after == written
    print(f"row conservation: {after}/{written} {'OK' if ok else 'LOST'}")
    import shutil

    shutil.rmtree(os.path.dirname(table), ignore_errors=True)
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
