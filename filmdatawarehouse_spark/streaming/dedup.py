"""Streaming deduplication and stream-stream interval joins.

The reference has no streaming at all (SURVEY.md §2.9); these are the
engine's extended surface, mirroring what a continuously-ingesting training
pipeline needs: exactly-once-per-key event streams and time-bounded joins
between streams. Both are pure Structured Streaming compositions — the
batch twins (``dropDuplicates`` / ``range_join``) are the oracle-checked
forms, and equivalence is asserted by replay tests
(tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_dedup_exact(
    events: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    delay: str = "10 minutes",
) -> DataFrame:
    """Exact streaming dedup with BOUNDED state: duplicates of a key are
    dropped as long as they arrive within ``delay`` of the first sighting
    (``dropDuplicatesWithinWatermark``), and the key's state is evicted
    once the watermark passes — unlike plain ``dropDuplicates`` on a
    stream, whose state grows forever. At 100 TB/day of events this is the
    only sane shape: state ∝ keys-per-watermark-window, not keys-ever.
    """
    return events.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(keys)


def write_stream_idempotent_parquet(
    df: DataFrame,
    path: str,
    checkpoint_dir: str,
    partition_by: str | list[str] | None = None,
):
    """Exactly-once parquet sink for a stream via ``foreachBatch``: each
    micro-batch overwrites its own ``_batch_id=<n>`` partition, so a batch
    replayed after a crash (foreachBatch is at-least-once) rewrites the
    same partition instead of appending duplicates — idempotence comes
    from the (batch_id → partition) mapping plus dynamic partition
    overwrite, the standard recipe when the sink itself has no
    transactions. Returns the started StreamingQuery (caller awaits /
    stops)."""
    from pyspark.sql import functions as F

    extra = (
        [partition_by] if isinstance(partition_by, str) else list(partition_by or [])
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        # dynamic overwrite per WRITE, not via save/set/restore of the
        # session conf — the session-global toggle races a concurrent
        # sink, whose overwrite could then run 'static' and truncate the
        # other batches' partitions
        (
            batch_df.withColumn("_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id", *extra)
            .parquet(path)
        )

    return (
        df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    width_seconds: int,
    delay: str = "30 minutes",
) -> DataFrame:
    """Stream-stream inner join: pairs with equal ``on`` key and
    ``0 < right_ts − left_ts ≤ width_seconds`` — the streaming twin of
    ``operators.asof.range_join`` (the batch form is the oracle-checked
    one; equivalence is asserted by replay).

    Both sides carry a watermark and the join condition bounds event-time
    distance, so Spark can size the join state to the interval and evict
    rows the watermark has passed — the requirements for an unbounded
    stream-stream join to run with finite state. Callers pre-project to
    avoid column-name clashes (same contract as ``range_join``).
    """
    l_w = left.withWatermark(left_ts, delay)
    r_w = right.withColumnRenamed(on, "_key_r").withWatermark(right_ts, delay)
    diff = F.unix_micros(F.col(right_ts)) - F.unix_micros(F.col(left_ts))
    width_us = width_seconds * 1_000_000
    return l_w.join(
        r_w,
        (F.col(on) == F.col("_key_r"))
        & (diff > 0)
        & (diff <= F.lit(width_us)),
    ).drop("_key_r")
