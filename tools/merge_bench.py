"""Per-batch cost of the two exactly-once MERGE sinks vs target size.

Gives the SCALING.md claims numbers: the snapshot sink's batch cost is
O(target) (full rewrite), the transactional JDBC sink's is O(delta)
for the staging write plus the database's own index-assisted upsert —
so the crossover governs which recipe a given target should use.

Method: fixed 1,000-row delta merged into targets of growing size via
(a) streaming.merge.merge_upsert_batch (parquet snapshot + pointer) and
(b) streaming.jdbc_merge.merge_jdbc_batch (embedded Derby, staging +
single transaction). One warm-up batch each; reported value is the
median of 3 timed batches.

Usage: python tools/merge_bench.py [--sizes 10000,100000,1000000]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DELTA_ROWS = 1_000
SCHEMA = "k long, v long, seq long"


def base_frame(spark, n):
    from pyspark.sql import functions as F

    return spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") * 7).alias("v"),
        F.lit(0).cast("long").alias("seq"),
    )


def delta_frame(spark, n, seq):
    from pyspark.sql import functions as F

    # deltas hit existing keys (updates), spread across the key space
    return spark.range(DELTA_ROWS).select(
        (F.col("id") * max(1, n // DELTA_ROWS)).alias("k"),
        (F.col("id") + seq).alias("v"),
        F.lit(seq).cast("long").alias("seq"),
    )


def time_snapshot(spark, n) -> float:
    from filmdatawarehouse_spark.streaming.merge import merge_upsert_batch

    tmp = tempfile.mkdtemp(prefix="fdw_merge_bench_")
    try:
        merge_upsert_batch(base_frame(spark, n), 0, tmp, ["k"], "seq")
        merge_upsert_batch(delta_frame(spark, n, 1), 1, tmp, ["k"], "seq")
        times = []
        for i in range(2, 5):
            t0 = time.perf_counter()
            merge_upsert_batch(delta_frame(spark, n, i), i, tmp, ["k"], "seq")
            times.append(time.perf_counter() - t0)
        return statistics.median(times)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def time_jdbc(spark, n, tag) -> float:
    from filmdatawarehouse_spark.streaming.jdbc_merge import merge_jdbc_batch

    url = f"jdbc:derby:memory:mergebench{tag};create=true"
    drv = "org.apache.derby.jdbc.EmbeddedDriver"
    table = "t"
    rid = f"bench{tag}"  # run_id REQUIRED since the r13 ledger change;
    # identifier-safe (it is embedded in the staging table name)
    merge_jdbc_batch(
        base_frame(spark, n), 0, url, table, ["k"], "seq", driver=drv,
        run_id=rid,
    )
    merge_jdbc_batch(
        delta_frame(spark, n, 1), 1, url, table, ["k"], "seq", driver=drv,
        run_id=rid,
    )
    times = []
    for i in range(2, 5):
        t0 = time.perf_counter()
        merge_jdbc_batch(
            delta_frame(spark, n, i), i, url, table, ["k"], "seq",
            driver=drv, run_id=rid,
        )
        times.append(time.perf_counter() - t0)
    # drop the in-memory Derby DB so earlier sizes don't stay resident in
    # the JVM heap and skew (or OOM) the later, larger measurements
    try:
        spark._jvm.java.sql.DriverManager.getConnection(
            f"jdbc:derby:memory:mergebench{tag};drop=true"
        )
    except Exception:
        pass  # Derby signals a successful drop BY raising 08006
    return statistics.median(times)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--sizes", default="10000,100000,1000000")
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]

    if REPO not in sys.path:
        sys.path.insert(0, REPO)
    from filmdatawarehouse_spark.session import get_spark

    spark = get_spark("merge-bench", master="local[8]", shuffle_partitions=8)
    for n in sizes:
        snap = time_snapshot(spark, n)
        jdbc = time_jdbc(spark, n, n)
        print(
            json.dumps(
                {
                    "target_rows": n,
                    "delta_rows": DELTA_ROWS,
                    "snapshot_batch_s": round(snap, 3),
                    "jdbc_batch_s": round(jdbc, 3),
                }
            )
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
