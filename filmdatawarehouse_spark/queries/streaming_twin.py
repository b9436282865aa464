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


def stream_sessions_capped_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-certifiable twin of the CAPPED-session streaming operator
    (``streaming.stateful.expiring_capped_sessions``): all closed session
    SLICES — gap-split at 30 min idle AND time-sliced at 60 min from each
    gap-session's start — after the watermark passes the end of the data
    (r05 verdict item 6: the operator had pytest multi-batch equivalence
    but no driver row).

    Same two-batch protocol as ``stream_sessions_final``: batch 1 carries
    every real event; batch 2 carries one far-future sentinel for user -1
    whose watermark advance fires EventTimeTimeout on every remaining open
    slice. The sentinel's own open session is filtered out. The certified
    contract is the MICROSECOND-granularity oracle below — which is the
    streaming operator's own arithmetic. It matches the batch
    ``events_sessions_capped`` query only on whole-second timestamps: the
    batch query deliberately slices in seconds, so on this sub-second
    events table the two queries legitimately differ at boundary events
    (each is certified against its own-granularity oracle).

    Scale note: certification query — materializes the stream locally
    (temp dir + memory sink); the production operator is the unbounded
    ``expiring_capped_sessions`` with O(open slices) state.
    """
    from filmdatawarehouse_spark.queries.timeseries import (
        SESSION_CAP_S,
        SESSION_GAP_S as CAPPED_GAP_S,
    )
    from filmdatawarehouse_spark.streaming.stateful import (
        expiring_capped_sessions,
    )

    events = read_table(spark, sf_dir, "events").select("user_id", "ts")
    max_ts = events.agg(F.max("ts").alias("m")).collect()[0]["m"]

    tmp = tempfile.mkdtemp(prefix="fdw_stream_capped_")
    src = os.path.join(tmp, "src")
    qname = f"stream_sessions_capped_{next(_RUN_COUNTER)}"
    try:
        events.write.parquet(src)
        stream = (
            spark.readStream.schema("user_id long, ts timestamp")
            .parquet(src)
            .withWatermark("ts", "1 second")
        )
        q = (
            expiring_capped_sessions(
                stream, gap_seconds=CAPPED_GAP_S, cap_seconds=SESSION_CAP_S
            )
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
                    + F.expr(
                        f"INTERVAL {CAPPED_GAP_S + SESSION_CAP_S + 3600} SECONDS"
                    )
                ).alias("ts"),
            )
            sentinel.write.mode("append").parquet(src)
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    return spark.table(qname).filter(F.col("user_id") >= 0)


def stream_sessions_capped_final_oracle() -> str:
    """Capped sessionization in MICROSECOND arithmetic — the streaming
    operator's state machine works in integer µs (``streaming/stateful.py
    expiring_capped_sessions``: gap check ``t - last_us > gap_us``, slice
    index ``(t - gap_start) // cap_us``), and the events table carries
    sub-second timestamps, so the oracle must use ``epoch_us`` (the
    second-granularity batch oracle in queries/timeseries.py would
    misplace events near a boundary whose fractional seconds straddle
    it). Projected to the operator's output columns — one row per (gap
    session, cap slice), identified by its (start, end, n_events)
    triple."""
    from filmdatawarehouse_spark.queries.timeseries import (
        SESSION_CAP_S,
        SESSION_GAP_S as CAPPED_GAP_S,
    )

    gap_us = CAPPED_GAP_S * 1_000_000
    cap_us = SESSION_CAP_S * 1_000_000
    return f"""
        WITH x AS (
          SELECT user_id, ts, epoch_us(ts) AS us FROM events
        ), flagged AS (
          SELECT *,
                 CASE WHEN us - lag(us) OVER w > {gap_us}
                      THEN 1 ELSE 0 END AS gap
          FROM x WINDOW w AS (PARTITION BY user_id ORDER BY us)
        ), sess AS (
          SELECT *,
                 SUM(gap) OVER (PARTITION BY user_id ORDER BY us
                                ROWS UNBOUNDED PRECEDING) AS gap_sess
          FROM flagged
        ), sliced AS (
          SELECT *,
                 (us - MIN(us) OVER (PARTITION BY user_id, gap_sess))
                   // {cap_us} AS sub
          FROM sess
        )
        SELECT user_id,
               MIN(ts) AS session_start,
               MAX(ts) AS session_end,
               COUNT(*)::BIGINT AS n_events
        FROM sliced GROUP BY user_id, gap_sess, sub
    """


IJ_WIDTH_S = 600


def stream_interval_join_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-certifiable twin of the stream-stream interval join
    (``streaming.dedup.stream_interval_join``): every (click, purchase)
    pair for the same user with ``0 < purchase_ts − click_ts ≤ 10 min``,
    produced by a REAL two-batch ``readStream`` run of both sides.

    Protocol: both sides split at the midpoint of the time range; batch 1
    seeds the join state, batch 2 joins across the batch boundary —
    exercising cross-batch state retention, the thing a single-batch
    replay would miss. A streaming INNER interval join emits each
    qualifying pair exactly once regardless of batching (pairs are data-
    determined; the watermark only bounds state size), so the output is
    deterministic and equals the batch pair join the DuckDB oracle
    computes.

    Scale note: certification query (temp dir + memory sink); the
    production operator is the unbounded ``stream_interval_join`` whose
    state is bounded by watermark × interval width.
    """
    from filmdatawarehouse_spark.streaming.dedup import stream_interval_join

    events = read_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts"
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    lo, hi = events.agg(
        F.min(F.unix_micros("ts")).alias("lo"),
        F.max(F.unix_micros("ts")).alias("hi"),
    ).collect()[0]
    t_split = lo + (hi - lo) // 2

    tmp = tempfile.mkdtemp(prefix="fdw_stream_ij_")
    lsrc = os.path.join(tmp, "left")
    rsrc = os.path.join(tmp, "right")
    qname = f"stream_interval_join_{next(_RUN_COUNTER)}"
    try:
        clicks.filter(F.unix_micros("click_ts") <= t_split).write.parquet(lsrc)
        purchases.filter(F.unix_micros("purchase_ts") <= t_split).write.parquet(
            rsrc
        )
        l_stream = spark.readStream.schema(
            "user_id long, click_id long, click_ts timestamp"
        ).parquet(lsrc)
        r_stream = spark.readStream.schema(
            "p_user long, purchase_id long, purchase_ts timestamp"
        ).parquet(rsrc)
        joined = stream_interval_join(
            l_stream,
            r_stream.withColumnRenamed("p_user", "user_id"),
            on="user_id",
            left_ts="click_ts",
            right_ts="purchase_ts",
            width_seconds=IJ_WIDTH_S,
        )
        q = (
            joined.select("user_id", "click_id", "purchase_id")
            .writeStream.outputMode("append")
            .format("memory")
            .queryName(qname)
            .start()
        )
        try:
            q.processAllAvailable()
            clicks.filter(F.unix_micros("click_ts") > t_split).write.mode(
                "append"
            ).parquet(lsrc)
            purchases.filter(F.unix_micros("purchase_ts") > t_split).write.mode(
                "append"
            ).parquet(rsrc)
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    return spark.table(qname)


def stream_interval_join_final_oracle() -> str:
    """The same pair set in one batch SQL: equal user, strictly-after
    purchase within the window — microsecond-exact arithmetic, matching
    the operator's ``unix_micros`` bounds."""
    return f"""
        SELECT c.user_id,
               c.event_id AS click_id,
               p.event_id AS purchase_id
        FROM events c JOIN events p
          ON c.user_id = p.user_id
         AND c.event_type = 'click' AND p.event_type = 'purchase'
         AND epoch_us(p.ts) - epoch_us(c.ts) > 0
         AND epoch_us(p.ts) - epoch_us(c.ts) <= {IJ_WIDTH_S * 1_000_000}
    """


def stream_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT corpus heavy hitters with the CANDIDATE pass run as a real
    stateful stream: the documents token stream replays through
    ``streaming.stateful.streaming_mg_candidates`` in two micro-batches
    (bounded n_buckets × k state, update-mode emissions), the final
    per-bucket summaries are read back (max ``seq`` per bucket), and the
    bounded candidate set gets the same batch exact recount as
    ``text_heavy_hitters`` — so the ANSWER is exact and shares that
    query's plain full-histogram oracle, while certifying the streaming
    operator's cross-batch state carry and its superset guarantee (any
    heavy hitter the stream state lost would be missing here and
    hash-fail).

    Scale note: certification query (temp dir + memory sink); the
    production operator is the unbounded ``streaming_mg_candidates``
    with n_buckets × k counters of state, plus a periodic batch recount
    over candidates — the streaming analogue of the two-pass batch
    shape.
    """
    from filmdatawarehouse_spark.operators.frequent import MG_COUNTERS
    from filmdatawarehouse_spark.streaming.stateful import (
        MG_STATE_K,
        streaming_mg_candidates,
    )

    if MG_STATE_K != MG_COUNTERS:  # same threshold N/k as the oracle;
        # an `assert` is stripped under python -O, which would let a
        # drifted constant silently shrink the candidate superset
        raise ValueError(
            f"MG_STATE_K ({MG_STATE_K}) must equal MG_COUNTERS "
            f"({MG_COUNTERS}): the streaming candidate threshold and the "
            "exact-recount threshold are the same N/k bound"
        )

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    tmp = tempfile.mkdtemp(prefix="fdw_stream_hh_")
    src = os.path.join(tmp, "src")
    qname = f"stream_heavy_hitters_{next(_RUN_COUNTER)}"
    try:
        # two deterministic halves by doc_id parity → two micro-batches
        docs.filter(F.col("doc_id") % 2 == 0).write.parquet(src)
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .parquet(src)
            .select(
                F.explode(F.split(F.col("text"), " ")).alias("word")
            )
        )
        q = (
            streaming_mg_candidates(stream)
            .writeStream.outputMode("update")
            .format("memory")
            .queryName(qname)
            .start()
        )
        try:
            q.processAllAvailable()
            docs.filter(F.col("doc_id") % 2 == 1).write.mode("append").parquet(
                src
            )
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    emissions = spark.table(qname)
    # renamed join keys: last_seq derives from emissions, so a bare
    # ["bucket","seq"] join is a self-join with conflicting attributes
    last_seq = emissions.groupBy("bucket").agg(F.max("seq").alias("s2")).select(
        F.col("bucket").alias("b2"), "s2"
    )
    cand = (
        emissions.join(
            F.broadcast(last_seq),
            (F.col("bucket") == F.col("b2")) & (F.col("seq") == F.col("s2")),
        )
        .select("word")
        .distinct()
    )

    # batch exact recount over the streamed-in candidates (pass 2 of the
    # batch operator, verbatim semantics)
    tokens = docs.select(F.explode(F.split(F.col("text"), " ")).alias("word"))
    total = tokens.agg(F.count(F.lit(1)).alias("total_tokens"))
    counts = (
        tokens.join(F.broadcast(cand), "word", "left_semi")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(
            F.col("cnt").cast("double")
            > F.col("total_tokens").cast("double") / F.lit(float(MG_COUNTERS))
        )
        .select("word", "cnt", "total_tokens")
    )


def stream_heavy_hitters_oracle() -> str:
    """Identical contract to the batch ``text_heavy_hitters`` oracle: the
    exact recount makes the streaming candidate pass answer-invariant."""
    from filmdatawarehouse_spark.operators.frequent import MG_COUNTERS

    return f"""
        WITH w AS (
          SELECT unnest(string_split(text, ' ')) AS word FROM documents
        ), tot AS (
          SELECT COUNT(*)::BIGINT AS total_tokens FROM w
        )
        SELECT word, COUNT(*)::BIGINT AS cnt,
               (SELECT total_tokens FROM tot) AS total_tokens
        FROM w GROUP BY word
        HAVING COUNT(*)::DOUBLE
               > (SELECT total_tokens FROM tot)::DOUBLE / {MG_COUNTERS}.0
    """


DEDUP_KEYS = ["user_id", "event_type"]


def stream_dedup_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key emission counts from a REAL two-batch
    ``dropDuplicatesWithinWatermark`` run over the events table — the
    driver-certifiable twin of ``streaming.dedup.stream_dedup_exact``
    (VERDICT r03 item 8: both stateful streaming paths need driver rows,
    not just pytest coverage).

    Protocol: split the table at the midpoint of its time range. Batch 1
    (ts <= split) seeds per-key state with expiry ``first_ts + delay``
    (delay = span/8); finishing batch 1 advances the watermark to
    ``max_b1_ts - delay``, which EVICTS exactly the keys whose first
    sighting is older than ``max_b1_ts - 2*delay``. Batch 2 (ts > split)
    then re-emits evicted keys once and is silently deduped for retained
    keys. The per-key emission count (1 or 2) is therefore a pure
    function of event times — computable by the DuckDB oracle — while
    being produced by the real streaming operator with real state
    eviction. Which physical row is emitted per (key, batch) is
    task-order-dependent, so the certified output is the deterministic
    count, never the row.

    Batch-2 event times all exceed the batch-1 watermark (ts > split >=
    max_b1 > max_b1 - delay), so no input is ever late-dropped — emission
    counts depend only on state eviction, the thing under test.

    Scale note: like ``stream_sessions_final`` this twin materializes the
    stream locally (temp dir + memory sink) because it is a CERTIFICATION
    query; the production operator is the unbounded ``stream_dedup_exact``
    with O(keys-per-watermark-window) state.
    """
    from filmdatawarehouse_spark.streaming.dedup import stream_dedup_exact

    events = read_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    lo, hi = events.agg(
        F.min(F.unix_micros("ts")).alias("lo"), F.max(F.unix_micros("ts")).alias("hi")
    ).collect()[0]
    t_split = lo + (hi - lo) // 2
    d_us = (hi - lo) // 8

    tmp = tempfile.mkdtemp(prefix="fdw_stream_dedup_")
    src = os.path.join(tmp, "src")
    qname = f"stream_dedup_final_{next(_RUN_COUNTER)}"
    try:
        events.filter(F.unix_micros("ts") <= t_split).write.parquet(src)
        stream = spark.readStream.schema(
            "user_id long, event_type string, ts timestamp"
        ).parquet(src)
        deduped = stream_dedup_exact(
            stream, DEDUP_KEYS, ts_col="ts", delay=f"{d_us} microseconds"
        )
        q = (
            deduped.writeStream.outputMode("append")
            .format("memory")
            .queryName(qname)
            .start()
        )
        try:
            q.processAllAvailable()  # batch 1: seed state, advance watermark
            events.filter(F.unix_micros("ts") > t_split).write.mode(
                "append"
            ).parquet(src)
            q.processAllAvailable()  # batch 2: evicted keys re-emit
        finally:
            q.stop()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    return (
        spark.table(qname)
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n_emissions"))
    )


def stream_dedup_final_oracle() -> str:
    """The emission count in closed form: a key emits once per batch it
    appears in, except batch 2 is suppressed when the key's batch-1 state
    survived the inter-batch watermark (first_us + delay >= max_b1 -
    delay). Integer-microsecond arithmetic throughout (epoch_us / DIV
    twins) so both engines compute identical split and delay."""
    return """
        WITH bounds AS (
          SELECT min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi FROM events
        ), params AS (
          SELECT lo + (hi - lo) // 2 AS t_split, (hi - lo) // 8 AS d_us
          FROM bounds
        ), b1 AS (
          SELECT user_id, event_type, min(epoch_us(ts)) AS first_us
          FROM events, params WHERE epoch_us(ts) <= t_split
          GROUP BY user_id, event_type
        ), mx AS (
          SELECT max(epoch_us(ts)) AS m FROM events, params
          WHERE epoch_us(ts) <= t_split
        ), b2 AS (
          SELECT DISTINCT user_id, event_type
          FROM events, params WHERE epoch_us(ts) > t_split
        )
        SELECT
          coalesce(b1.user_id, b2.user_id) AS user_id,
          coalesce(b1.event_type, b2.event_type) AS event_type,
          (CASE WHEN b1.user_id IS NOT NULL THEN 1 ELSE 0 END
           + CASE WHEN b2.user_id IS NOT NULL
                   AND (b1.user_id IS NULL
                        OR b1.first_us + (SELECT d_us FROM params)
                           < (SELECT m FROM mx) - (SELECT d_us FROM params))
                  THEN 1 ELSE 0 END)::BIGINT AS n_emissions
        FROM b1
        FULL OUTER JOIN b2
          ON b1.user_id = b2.user_id AND b1.event_type = b2.event_type
    """


MERGE_MOD = 10
MERGE_RESIDUE = 4  # distinct from orders_upsert_merge (residue 3, x1.10)


def stream_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final warehouse table after a REAL two-micro-batch foreachBatch run
    of the exactly-once MERGE sink (``streaming.merge``): micro-batch 1
    carries the orders base, micro-batch 2 a deterministic CDC delta
    (keys % 10 == 4 get status 'U' and an exact DECIMAL x1.05 bump; the
    same rows under negative-mirror keys -(k+1) are brand-new inserts,
    disjoint from real keys at any SF). Survivorship is by the stored
    ``seq`` version column, so the result is independent of micro-batch
    arrival order — the CDC MERGE contract — and the DuckDB oracle is the
    closed-form FULL OUTER JOIN upsert. What this certifies beyond
    ``orders_upsert_merge`` is the SINK path itself: versioned-snapshot
    write, atomic pointer flip, checkpointed readStream — the replay
    idempotence of that path is pinned by tests/test_stream_merge.py.

    Determinism: prices stay DECIMAL(28,4) end to end (the x1.05 bump is
    an exact scale-2 x scale-2 product), cast to double exactly once at
    the end — the orders_upsert_merge rule (Spark HALF_UP vs DuckDB
    HALF_EVEN disagree if re-quantized).
    """
    from filmdatawarehouse_spark.streaming.merge import (
        read_merge_table,
        write_stream_merge_upsert,
    )

    o = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    base = o.select(
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
        "o_orderstatus",
        F.col("o_totalprice").cast("decimal(28,4)").alias("price"),
        F.lit(0).cast("int").alias("seq"),
    )
    upd_src = o.filter(
        F.pmod(F.col("o_orderkey"), F.lit(MERGE_MOD)) == MERGE_RESIDUE
    ).select(
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
        F.lit("U").alias("o_orderstatus"),
        (
            F.col("o_totalprice").cast("decimal(18,2)")
            * F.lit("1.05").cast("decimal(4,2)")
        ).cast("decimal(28,4)").alias("price"),
        F.lit(1).cast("int").alias("seq"),
    )
    delta = upd_src.unionAll(
        upd_src.select(
            (-(F.col("o_orderkey") + F.lit(1))).alias("o_orderkey"),
            "o_orderstatus",
            "price",
            "seq",
        )
    )

    tmp = tempfile.mkdtemp(prefix="fdw_stream_merge_")
    src = os.path.join(tmp, "src")
    table = os.path.join(tmp, "table")
    ckpt = os.path.join(tmp, "ckpt")
    os.makedirs(table)
    try:
        # one file per micro-batch; maxFilesPerTrigger=1 splits them, and
        # seq survivorship makes the result order-independent anyway
        base.coalesce(1).write.mode("append").parquet(src)
        delta.coalesce(1).write.mode("append").parquet(src)
        stream = (
            spark.readStream.schema(
                "o_orderkey long, o_orderstatus string, "
                "price decimal(28,4), seq int"
            )
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q = write_stream_merge_upsert(
            stream, table, ["o_orderkey"], ckpt, seq_col="seq"
        )
        q.awaitTermination()
        final = read_merge_table(spark, table)
        # localCheckpoint materializes to executor storage AND truncates
        # lineage, so the plan no longer references the temp dir (safe to
        # remove) and nothing round-trips through the Python driver
        out = final.select(
            "o_orderkey",
            "o_orderstatus",
            F.col("price").cast("double").alias("price"),
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def stream_merge_upsert_oracle() -> str:
    """Closed-form upsert: updates win over base by key, inserts appear
    once under negative-mirror keys; DECIMAL exact until one final
    double cast (the orders_upsert_merge determinism rule)."""
    return f"""
        WITH upd AS (
          SELECT o_orderkey, 'U' AS o_orderstatus,
                 CAST(CAST(o_totalprice AS DECIMAL(18,2))
                      * CAST('1.05' AS DECIMAL(4,2)) AS DECIMAL(28,4))
                   AS price
          FROM orders WHERE o_orderkey % {MERGE_MOD} = {MERGE_RESIDUE}
        )
        SELECT b.o_orderkey,
               coalesce(u.o_orderstatus, b.o_orderstatus) AS o_orderstatus,
               CAST(coalesce(u.price, b.price) AS DOUBLE) AS price
        FROM (SELECT o_orderkey, o_orderstatus,
                     CAST(o_totalprice AS DECIMAL(28,4)) AS price
              FROM orders) b
        LEFT JOIN upd u USING (o_orderkey)
        UNION ALL
        SELECT -(o_orderkey + 1) AS o_orderkey, o_orderstatus,
               CAST(price AS DOUBLE) AS price
        FROM upd
    """
