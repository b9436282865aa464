"""Micro-bench: measured file-skipping win of the clustered parquet
layouts (VERDICT r06 item 6 / r07 item 5).

`tests/test_io_formats.py` pins that `write_range_sorted` / `write_zorder`
CAN prune (disjoint per-file ranges, compact 2-D spans); this measures
that they DO: the same lineitem rows are written three ways — unclustered
(as-shuffled), range-sorted on l_partkey, Z-ordered on
(l_partkey, l_suppkey) — and the same predicates run against each, with
files-read and rows-read pulled from the EXECUTED scan node's runtime
metrics (never estimated).

Predicates:
  px  — narrow range on l_partkey only        (the 1-D case both layouts
                                               should win)
  py  — narrow range on l_suppkey only        (the dimension the 1-D sort
                                               sacrifices; Z-order's case)
  pxy — small rectangle on both               (the 2-D case Z-order exists
                                               for)

Usage: python tools/zorder_bench.py [sf_dir]   (default /root/testdata/sf0.1)
Prints one JSON line:
  {"layout": {"predicate": {"files_read": N, "rows_read": N,
                            "result_rows": N, "sec": s}}, ...}

Reading the output: Spark's v1 parquet source LISTS every file
(`files_read` is constant across layouts — file-level stats skipping is a
table-format feature, Delta/Iceberg territory); the min/max skipping
fires at ROW-GROUP level inside the reader, so `rows_read` (the scan
node's numOutputRows — rows actually decoded off disk after row-group
pruning) is the pruning signal. Measured at sf0.1 (600k rows, 16 files):

  predicate        unclustered   range_sorted(partkey)   zorder(both)
  px (partkey)        600,000        58,400 (10.3x)      317,833 (1.9x)
  py (suppkey)        600,000       600,000 (none)       245,267 (2.4x)
  pxy (rectangle)     600,000        58,400 (10.3x)      146,743 (4.1x)

— the published trade-off, now measured: the single-key sort dominates on
its own key and is useless on the other; Z-order prunes on EITHER key at
the cost of a wider per-group span on each. Pick by workload: one hot
filter column → range-sort it; two independent filter columns → Z-order.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

N_FILES = 16


def scan_metrics(df) -> dict[str, int]:
    """files/rows actually read by the (single) parquet scan of an
    executed frame — FileSourceScanExec runtime metrics."""
    from filmdatawarehouse_spark.plans import executed_metric_values

    return {
        "files_read": sum(
            executed_metric_values(df, "FileSourceScanExec", "numFiles")
        ),
        "rows_read": sum(
            executed_metric_values(df, "FileSourceScanExec", "numOutputRows")
        ),
    }


def main() -> None:
    from pyspark.sql import functions as F

    from filmdatawarehouse_spark.io.sinks import write_range_sorted, write_zorder
    from filmdatawarehouse_spark.io.sources import read_table
    from filmdatawarehouse_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("zorder-bench")

    li = read_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice"
    )
    lo_p, hi_p, lo_s, hi_s = li.agg(
        F.min("l_partkey"), F.max("l_partkey"),
        F.min("l_suppkey"), F.max("l_suppkey"),
    ).collect()[0]
    # ~5% of each key domain — selective enough that a clustered layout
    # can skip most files, wide enough to return thousands of rows
    wid_p = max((hi_p - lo_p) // 20, 1)
    wid_s = max((hi_s - lo_s) // 20, 1)
    mid_p = lo_p + (hi_p - lo_p) // 2
    mid_s = lo_s + (hi_s - lo_s) // 2
    preds = {
        "px": (F.col("l_partkey") >= mid_p)
        & (F.col("l_partkey") < mid_p + wid_p),
        "py": (F.col("l_suppkey") >= mid_s)
        & (F.col("l_suppkey") < mid_s + wid_s),
        "pxy": (F.col("l_partkey") >= mid_p)
        & (F.col("l_partkey") < mid_p + wid_p)
        & (F.col("l_suppkey") >= mid_s)
        & (F.col("l_suppkey") < mid_s + wid_s),
    }

    base = tempfile.mkdtemp(prefix="zorder_bench_")
    layouts = {
        "unclustered": os.path.join(base, "plain"),
        "range_sorted_partkey": os.path.join(base, "ranged"),
        "zorder_partkey_suppkey": os.path.join(base, "zorder"),
    }
    try:
        # identical rows, three physical layouts, same file count
        li.repartition(N_FILES).write.parquet(layouts["unclustered"])
        write_range_sorted(
            li, layouts["range_sorted_partkey"], "l_partkey", n_files=N_FILES
        )
        write_zorder(
            li,
            layouts["zorder_partkey_suppkey"],
            "l_partkey",
            "l_suppkey",
            n_files=N_FILES,
        )

        out: dict[str, dict] = {}
        for layout, path in layouts.items():
            out[layout] = {}
            for pname, pred in preds.items():
                df = spark.read.parquet(path).filter(pred)
                t0 = time.perf_counter()
                # collect() (not count()) so THIS frame's QueryExecution
                # runs and its scan node carries the runtime metrics —
                # count() plans a separate execution and the walked scan
                # would read 0
                n = len(df.collect())
                dt = round(time.perf_counter() - t0, 4)
                m = scan_metrics(df)
                out[layout][pname] = {**m, "result_rows": n, "sec": dt}
        print(json.dumps(out))
    finally:
        shutil.rmtree(base, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
