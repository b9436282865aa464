"""Oracle-checked batch twin of the stateful streaming session operator.

``stream_sessions_final`` replays the events table through a REAL
two-batch ``readStream`` run of ``streaming.stateful.expiring_user_sessions``
(applyInPandasWithState + EventTimeTimeout), then advances the watermark
past every session's ``last_event + gap`` with a far-future sentinel event
so every real session closes. The closed-session set must equal plain
gap-sessionization of the same data — which is exactly what the DuckDB
oracle computes — so the state-eviction path gets a full
rows/schema/value-hash CORRECTNESS row, not just pytest coverage.

Reference analog: none (the reference is batch-only, SURVEY.md §2.9); this
certifies the engine's extended streaming surface.

Scale note: the twin intentionally materializes the stream locally (temp
dir + memory sink) because it is a CERTIFICATION query, not a production
path; the production operator is the unbounded ``expiring_user_sessions``
itself, whose state is O(open sessions), not O(events).
"""

from __future__ import annotations

import itertools
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from filmdatawarehouse_spark.io.sources import read_table

SESSION_GAP_S = 600
_RUN_COUNTER = itertools.count()


def stream_sessions_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All closed sessions after the watermark passes the end of the data.

    Batch 1 carries every real event (one micro-batch: in-batch gap
    splitting does the heavy lifting); batch 2 carries one sentinel event
    for user -1 far enough in the future that the watermark closes every
    remaining open real session via EventTimeTimeout. The sentinel's own
    session stays open forever and is filtered out.
    """
    from filmdatawarehouse_spark.streaming.stateful import expiring_user_sessions

    events = read_table(spark, sf_dir, "events").select("user_id", "ts")
    max_ts = events.agg(F.max("ts").alias("m")).collect()[0]["m"]

    tmp = tempfile.mkdtemp(prefix="fdw_stream_sessions_")
    src = os.path.join(tmp, "src")
    qname = f"stream_sessions_final_{next(_RUN_COUNTER)}"
    try:
        events.write.parquet(src)
        stream = (
            spark.readStream.schema("user_id long, ts timestamp")
            .parquet(src)
            .withWatermark("ts", "1 second")
        )
        q = (
            expiring_user_sessions(stream, gap_seconds=SESSION_GAP_S)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName(qname)
            .start()
        )
        try:
            q.processAllAvailable()
            sentinel = spark.createDataFrame(
                [(-1,)], "user_id long"
            ).select(
                "user_id",
                (
                    F.lit(max_ts).cast("timestamp")
                    + F.expr(f"INTERVAL {SESSION_GAP_S + 3600} SECONDS")
                ).alias("ts"),
            )
            sentinel.write.mode("append").parquet(src)
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    # the memory sink retains its rows after stop; sessions carry
    # microsecond-precision event times (end = last event, no +gap)
    return spark.table(qname).filter(F.col("user_id") >= 0)


def stream_sessions_final_oracle() -> str:
    """Gap sessionization in plain SQL: break when the inter-event gap is
    strictly greater than the gap (events exactly ``gap`` apart merge —
    pinned by tests/test_streaming.py); session end = last event time,
    matching the stateful operator's contract (no ``+gap``)."""
    return f"""
        WITH x AS (
          SELECT user_id, ts,
                 CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                        IS NULL
                      OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                        > INTERVAL {SESSION_GAP_S} SECONDS
                      THEN 1 ELSE 0 END AS brk
          FROM events
        ), y AS (
          SELECT user_id, ts,
                 sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sess
          FROM x
        )
        SELECT user_id,
               MIN(ts) AS session_start,
               MAX(ts) AS session_end,
               COUNT(*)::BIGINT AS n_events
        FROM y GROUP BY user_id, sess
    """
