"""Windowed aggregation over the events stream — batch AND streaming forms.

The reference is batch-only (SURVEY.md §2.9: no streaming anywhere); this is
the engine's extended surface. The window transformations are written once
against a DataFrame and work identically on a batch read and a
``readStream`` source — that symmetry is the Structured Streaming design
point, and the batch form is what the DuckDB oracle checks.

Windows are epoch-aligned (Spark semantics): a 1-hour tumbling window starts
on the hour; a 1h/30m sliding window assigns each event to exactly 2 windows;
a session window is [first_event, last_event + gap).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def tumbling_window_counts(events: DataFrame, width: str = "1 hour") -> DataFrame:
    """Tumbling-window counts + value sum per event_type.

    Output: (window_start, window_end, event_type, n_events, total_value).
    Works on batch and streaming inputs unchanged (add a watermark upstream
    for streaming append mode).
    """
    return (
        events.groupBy(F.window("ts", width), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_window_counts(
    events: DataFrame, width: str = "1 hour", slide: str = "30 minutes"
) -> DataFrame:
    """Sliding-window (hopping) counts per event_type; each event lands in
    width/slide windows. Output schema matches ``tumbling_window_counts``."""
    return (
        events.groupBy(F.window("ts", width, slide), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def session_windows(events: DataFrame, gap: str = "10 minutes") -> DataFrame:
    """Per-user session windows with an inactivity gap: a session is a maximal
    run of events where consecutive gaps are <= gap (Spark merges windows
    that touch — pinned by tests/test_streaming.py); window end is
    last_event + gap. Output: (user_id, session_start, session_end, n_events).

    Uses the native ``session_window`` (merging state machine; in streaming
    it's the stateful operator, in batch an aggregate) rather than a
    hand-rolled lag/cumsum — same code both modes.
    """
    return (
        events.groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``readStream`` file source over the events parquet — the streaming
    twin of ``io.sources.read_table(spark, sf_dir, 'events')``. The ``ts``
    column is normalized to TIMESTAMP adaptively, mirroring the batch
    reader's three branches (Spark-3 int64 nanos / Spark-4 TIMESTAMP_NTZ /
    plain TIMESTAMP): a file stream needs an explicit schema, so probe the
    parquet footer with a batch read and reuse exactly the schema the
    running Spark produces."""
    from pyspark.sql import types as T

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    probe = spark.read.parquet(f"{sf_dir}/events.parquet")
    # the file stream source watches a DIRECTORY; glob-filter to the one table
    raw = (
        spark.readStream.schema(probe.schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    ts_type = probe.schema["ts"].dataType
    if isinstance(ts_type, T.LongType):
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    if isinstance(ts_type, T.TimestampNTZType):
        return raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


def run_stream_to_memory(
    df: DataFrame, query_name: str, output_mode: str = "complete"
) -> None:
    """Drive a streaming DataFrame to completion against the memory sink
    (synchronous — for tests and local smoke runs)."""
    q = (
        df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()


def enrich_with_static(
    stream: DataFrame,
    dim: DataFrame,
    on: Column | str,
    how: str = "left",
    broadcast: bool = False,
) -> DataFrame:
    """Stream-static join: each micro-batch joins against the CURRENT
    contents of the static side — the standard enrichment shape (event
    stream ⋈ dimension table). Stateless for the stream (no watermark
    needed on either side for inner/left). By default the planner (AQE /
    ``autoBroadcastJoinThreshold``) decides the static side's strategy, so
    a dimension that outgrows memory degrades to a shuffle join instead of
    OOMing; pass ``broadcast=True`` only when the dim is KNOWN small and
    you want to pin the no-shuffle plan (ADVICE r04).

    At scale: keep the dim a real table (parquet/Delta) and let each
    micro-batch re-resolve it — that is what gives slowly-changing
    dimensions their "current as of this batch" semantics; never
    ``collect()`` the dim into a driver-side map.
    """
    return stream.join(F.broadcast(dim) if broadcast else dim, on, how)
