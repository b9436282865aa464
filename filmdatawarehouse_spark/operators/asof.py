"""As-of and range joins — operators Spark lacks natively, built as
compositions of existing DataFrame ops (SURVEY-style custom operators; the
reference has nothing like them, they're part of the engine's extended
time-series surface).

As-of join (union + running window):
  Tag both sides, union, and take a running "last left-side timestamp" per
  key over event-time order. One shuffle on (key), no per-row Python, and —
  unlike the naive inequality join — no quadratic blowup on hot keys.

Range join (bucketize + equi-join):
  A time-window join `0 <= r.ts - l.ts <= width` becomes an equi-join on
  (key, time_bucket) with the right side exploded into the two candidate
  buckets, then an exact filter. Candidates are O(events per bucket), not
  O(n²) per key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_alias: str = "asof_ts",
) -> DataFrame:
    """For each RIGHT row, the greatest ``left_ts <= right_ts`` with the same
    key ``on`` (inclusive — a left row at exactly the same instant matches).

    Returns the right frame plus ``value_alias`` (nullable timestamp).
    Implementation: tag-union both sides, sort within key by (ts, tag) with
    the left tag ordered first on ties, and take a running max of left
    timestamps. Single shuffle on the key; scales with data volume, not with
    pairs.
    """
    r_cols = right.columns
    # the right side carries its full payload through the union; the left
    # side contributes only (key, ts) with nulled payload columns — no
    # row-id join-back needed, fully deterministic.
    l_tagged = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(0).alias("_tag"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in r_cols],
    )
    r_tagged = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(1).alias("_tag"),
        *[F.col(c) for c in r_cols],
    )
    unioned = l_tagged.unionByName(r_tagged)
    # ties: left rows (_tag=0) sort before the right row at the same ts, so
    # an equal-timestamp left event is visible to the running max (inclusive)
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = unioned.withColumn(
        value_alias,
        F.max(F.when(F.col("_tag") == 0, F.col("_ts"))).over(w),
    )
    return running.filter(F.col("_tag") == 1).select(*r_cols, value_alias)


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    width_seconds: int,
) -> DataFrame:
    """Pairs (left, right) with the same key and
    ``0 < right_ts - left_ts <= width_seconds``.

    Scale path: bucket both sides by ``width_seconds``; a qualifying right
    row is in the left row's bucket or the next one, so the right side is
    exploded into (bucket, bucket-1) and the join is a plain equi-join on
    (key, bucket) + exact filter. Returns left and right frames' columns
    (callers should pre-project to avoid name clashes).
    """
    width_us = width_seconds * 1_000_000  # microsecond precision end-to-end

    def bucket(c: Column) -> Column:
        # FLOOR division, not truncation: for pre-1970 (negative epoch)
        # timestamps cast('bigint') of a double quotient truncates toward
        # zero and buckets rows one slot too high. Subtracting the
        # non-negative pmod makes the numerator an exact multiple of the
        # width, so the double division is exact and floor == the quotient.
        us = F.unix_micros(c)
        return ((us - F.pmod(us, F.lit(width_us))) / F.lit(width_us)).cast(
            "bigint"
        )

    l_b = left.withColumn("_bkt_l", bucket(F.col(left_ts)))
    r_b = (
        right.withColumnRenamed(on, "_key_r")
        .withColumn("_bkt_r", F.explode(
            F.array(bucket(F.col(right_ts)), bucket(F.col(right_ts)) - 1)
        ))
    )
    joined = l_b.join(
        r_b,
        (l_b[on] == r_b["_key_r"]) & (l_b["_bkt_l"] == r_b["_bkt_r"]),
    )
    diff = F.unix_micros(F.col(right_ts)) - F.unix_micros(F.col(left_ts))
    return (
        joined.filter((diff > 0) & (diff <= width_us))
        .drop("_bkt_l", "_bkt_r", "_key_r")
    )
