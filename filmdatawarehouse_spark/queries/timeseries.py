"""Oracle-checked time-series queries over the events table: OHLC
downsampling and event-time RANGE-frame window aggregation.

No reference analog (the reference is a batch star-schema ETL,
SURVEY.md §2); these certify the time-series surface a metrics/training
telemetry pipeline needs.

Determinism notes shared by both queries:
- open/close use explicit (ts, event_id) tiebreaks — never "first row
  Spark happened to see".
- money-style sums go through DECIMAL(18,2) (associative-exact, so
  partial-aggregation order can't drift the hash) and are cast to DOUBLE
  only at the output boundary, matching the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from filmdatawarehouse_spark.io.sources import read_table

RANGE_WINDOW_S = 3600  # 1 hour of event time


def q_events_ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open/high/low/close + count + volume per (event_type, hour) — the
    classic time-series downsample (tick data → bars).

    Scale shape: ONE map-side-combinable aggregation — open/close are
    ``min_by``/``max_by`` on the chronology key ``epoch_us * 1e12 +
    event_id``, encoded as DECIMAL(38,0) (~29 digits, exact; and a
    fixed-width mutable buffer type, so the whole thing stays
    HashAggregate — a string key would demote to SortAggregate). There is
    no window at all: the first draft used two row_number windows, which
    put every (type, hour) partition on a single task — a skew trap when
    one hour×type holds billions of events; the aggregation form partial-
    aggregates per map task and is immune. DuckDB replays the identical
    key in HUGEINT, so the certified tiebreak is exact.
    """
    e = read_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "ts", "value"
    )
    dec38 = "decimal(38,0)"
    key = (
        F.unix_micros("ts").cast(dec38) * F.lit(10**12).cast(dec38)
        + F.col("event_id").cast(dec38)
    )
    return (
        e.withColumn("hour", F.date_trunc("hour", F.col("ts")))
        .withColumn("_k", key)
        .groupBy("event_type", "hour")
        .agg(
            F.min_by("value", F.col("_k")).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", F.col("_k")).alias("close"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("volume"),
        )
    )


OHLC_ORACLE = """
    WITH x AS (
      SELECT event_type, date_trunc('hour', ts) AS hour, value,
             epoch_us(ts)::HUGEINT * 1000000000000 + event_id AS k
      FROM events
    )
    SELECT event_type, hour,
           arg_min(value, k) AS open,
           max(value) AS high,
           min(value) AS low,
           arg_max(value, k) AS close,
           count(*)::BIGINT AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS volume
    FROM x GROUP BY event_type, hour
"""


def q_events_range_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event: how many events (and how much value) the same user
    produced in the trailing hour of EVENT time — a RANGE frame over
    ``unix_micros(ts)``, not a row frame, so simultaneous events are
    frame-peers and the result is tie-order-independent.

    Scale shape: one shuffle on user_id + per-user sort on ts; frame width
    is bounded by the hour, so state per row is O(events-per-user-hour).
    """
    e = read_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    us = F.unix_micros(F.col("ts"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(us)
        .rangeBetween(-RANGE_WINDOW_S * 1_000_000, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        "ts",
        F.count(F.lit(1)).over(w).alias("n_last_hour"),
        F.sum(F.col("value").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("value_last_hour"),
    )


RANGE_WINDOW_ORACLE = f"""
    SELECT event_id, user_id, ts,
           count(*) OVER w AS n_last_hour,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
             AS value_last_hour
    FROM events
    WINDOW w AS (
      PARTITION BY user_id ORDER BY epoch_us(ts)
      RANGE BETWEEN {RANGE_WINDOW_S * 1_000_000} PRECEDING AND CURRENT ROW)
"""

TIMESERIES_QUERIES = {
    "events_ohlc_hourly": (q_events_ohlc_hourly, OHLC_ORACLE),
    "events_range_window": (q_events_range_window, RANGE_WINDOW_ORACLE),
}

Z_THRESHOLD = 3.0


def q_events_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events whose value is > 3 sigma from their event_type's mean — the
    telemetry anomaly-flagging primitive.

    Determinism across engines: mean and variance are derived from
    DECIMAL sums (exact, order-independent) cast to DOUBLE only once,
    then combined with the IDENTICAL arithmetic expression on both sides
    — so the IEEE result, and therefore the flagged set, is bit-equal.

    Scale shape: one map-side-combinable aggregation (per-type stats,
    cardinality = #event types), broadcast back onto the stream of
    events — no second shuffle, no window.
    """
    e = read_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    dec = F.col("value").cast("decimal(18,2)")
    stats = e.groupBy("event_type").agg(
        F.sum(dec).cast("double").alias("_sd"),
        F.sum(dec * dec).cast("double").alias("_sq"),
        F.count(F.lit(1)).alias("_n"),
    )
    # A type with a single event has no sample variance (n-1 = 0 would make
    # z NaN via 0/0, and NaN ordering differs across engines) — a z-score is
    # undefined for one point, so such types are excluded on BOTH sides
    # (oracle mirrors with HAVING COUNT(*) > 1). ADVICE r04.
    stats = stats.filter(F.col("_n") > 1)
    j = e.join(F.broadcast(stats), "event_type")
    mean = F.col("_sd") / F.col("_n")
    var = (F.col("_sq") - F.col("_sd") * F.col("_sd") / F.col("_n")) / (
        F.col("_n") - F.lit(1)
    )
    z = (F.col("value") - mean) / F.sqrt(F.greatest(var, F.lit(1e-12)))
    return (
        j.withColumn("z", z)
        .filter(F.abs(F.col("z")) > Z_THRESHOLD)
        .select("event_id", "event_type", "value", "z")
    )


ZSCORE_ORACLE = f"""
    WITH s AS (
      SELECT event_type,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sd,
             CAST(SUM(CAST(value AS DECIMAL(18,2))
                      * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sq,
             COUNT(*)::BIGINT AS n
      FROM events GROUP BY event_type HAVING COUNT(*) > 1
    ), z AS (
      SELECT e.event_id, e.event_type, e.value,
             (e.value - sd / n)
               / sqrt(greatest((sq - sd * sd / n) / (n - 1), 1e-12)) AS z
      FROM events e JOIN s USING (event_type)
    )
    SELECT event_id, event_type, value, z FROM z
    WHERE abs(z) > {Z_THRESHOLD!r}
"""


TIMESERIES_QUERIES["events_zscore_outliers"] = (
    q_events_zscore_outliers,
    ZSCORE_ORACLE,
)

def q_events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-activity month (the
    cohort), counted by how many are active in each subsequent month —
    the canonical product-analytics rollup.

    Scale shape: one aggregation derives each user's cohort month (map-
    side combinable min), the (user, month) activity set dedups in the
    same shuffle family, and the final rollup is a count on (cohort,
    month). The cohort frame is |users|-sized — joined back by key, which
    AQE converts to broadcast when it fits.
    """
    e = read_table(spark, sf_dir, "events").select("user_id", "ts")
    month = (F.year("ts") * 100 + F.month("ts")).cast("int")
    activity = e.select("user_id", month.alias("month")).distinct()
    cohort = activity.groupBy("user_id").agg(
        F.min("month").alias("cohort_month")
    )
    return (
        activity.join(cohort, "user_id")
        .groupBy("cohort_month", "month")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


COHORT_ORACLE = """
    WITH activity AS (
      SELECT DISTINCT user_id,
             (year(ts) * 100 + month(ts))::INT AS month
      FROM events
    ), cohort AS (
      SELECT user_id, min(month) AS cohort_month
      FROM activity GROUP BY user_id
    )
    SELECT c.cohort_month, a.month, count(*)::BIGINT AS n_users
    FROM activity a JOIN cohort c USING (user_id)
    GROUP BY c.cohort_month, a.month
"""


TIMESERIES_QUERIES["events_cohort_retention"] = (
    q_events_cohort_retention,
    COHORT_ORACLE,
)

ROLLING_DAYS = 7


def q_events_rolling_actives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day active users per day — the WAU-style metric, computed
    as (user, day) activity against a broadcast day spine with a bounded
    date-difference join, then a distinct-user count per spine day.

    Scale shape: activity dedups to (user, day) in one map-side-combinable
    pass; the spine is O(days) rows and broadcasts; each activity row
    lands in at most ``ROLLING_DAYS`` spine days, so the expansion is
    bounded and the final count-distinct is the standard two-phase
    distinct aggregate on (day, user).
    """
    e = read_table(spark, sf_dir, "events").select("user_id", "ts")
    activity = e.select(
        "user_id", F.to_date("ts").alias("day")
    ).distinct()
    bounds = activity.agg(
        F.min("day").alias("lo"), F.max("day").alias("hi")
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi")).alias("spine_day")
    )
    joined = activity.join(
        F.broadcast(spine),
        (F.datediff(F.col("spine_day"), F.col("day")) >= 0)
        & (F.datediff(F.col("spine_day"), F.col("day")) < ROLLING_DAYS),
    )
    return joined.groupBy("spine_day").agg(
        F.countDistinct("user_id").alias("n_active_7d")
    )


ROLLING_ORACLE = f"""
    WITH activity AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ), bounds AS (
      SELECT min(day) AS lo, max(day) AS hi FROM activity
    ), spine AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS spine_day
      FROM bounds
    )
    SELECT spine_day, count(DISTINCT user_id)::BIGINT AS n_active_7d
    FROM spine JOIN activity
      ON spine_day - day >= 0 AND spine_day - day < {ROLLING_DAYS}
    GROUP BY spine_day
"""


TIMESERIES_QUERIES["events_rolling_actives"] = (
    q_events_rolling_actives,
    ROLLING_ORACLE,
)

def q_events_wow_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week growth per event_type — the trend metric layered on
    the weekly rollup: n_events per (type, ISO week) plus the previous
    week's count and their ratio.

    Scale shape: the corpus collapses FIRST to the (type, week) frame (one
    map-side-combinable aggregation — cardinality = types × weeks, tiny at
    any SF), and the lag window runs over that tiny frame only. The
    anti-pattern — a window over raw events — never appears.

    Determinism: counts are exact ints; the ratio is one double division
    of exact ints (bit-identical cross-engine); the first week's ratio is
    NULL in both engines.
    """
    e = read_table(spark, sf_dir, "events").select("event_type", "ts")
    weekly = e.groupBy(
        "event_type", F.date_trunc("week", F.col("ts")).alias("week_start")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    w = Window.partitionBy("event_type").orderBy("week_start")
    prev = F.lag("n_events").over(w)
    return weekly.select(
        "event_type",
        "week_start",
        "n_events",
        prev.alias("prev_n"),
        (F.col("n_events").cast("double") / prev.cast("double")).alias(
            "wow_ratio"
        ),
    )


# Spark date_trunc('week') and DuckDB date_trunc('week') both start Monday.
WOW_ORACLE = """
    WITH weekly AS (
      SELECT event_type, date_trunc('week', ts) AS week_start,
             COUNT(*)::BIGINT AS n_events
      FROM events GROUP BY event_type, date_trunc('week', ts)
    )
    SELECT event_type, week_start, n_events,
           lag(n_events) OVER (PARTITION BY event_type ORDER BY week_start)
             AS prev_n,
           n_events::DOUBLE
             / lag(n_events) OVER (PARTITION BY event_type ORDER BY week_start)
             AS wow_ratio
    FROM weekly
"""


TIMESERIES_QUERIES["events_wow_growth"] = (q_events_wow_growth, WOW_ORACLE)

SESSION_GAP_S = 1800
SESSION_CAP_S = 3600


def q_events_sessions_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization with BOTH an inactivity gap and a max-duration cap:
    sessions split when the user is idle > 30 min (the classic gap rule),
    and a gap-session longer than 60 min is further time-sliced into
    60-min sub-sessions from its start — the bounded-session contract
    billing/abuse pipelines need (an endless bot stream can't produce an
    unbounded session row).

    Scale shape: two window passes over the SAME (user) partitioning —
    one shuffle total; the gap flag, running session id, per-session
    start, and time-slice index are all narrow per-row expressions. No
    per-session data ever concentrates beyond the final per-session
    aggregate (map-side combinable).

    Determinism: (ts, event_id) tiebreak orders every window; epoch
    arithmetic is exact integer; both engines slice with the identical
    floor division.
    """
    e = read_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    us = F.unix_seconds("ts")
    w = Window.partitionBy("user_id").orderBy(us, "event_id")
    gap = F.when(
        us - F.lag(us).over(w) > SESSION_GAP_S, F.lit(1)
    ).otherwise(F.lit(0))
    with_sess = e.withColumn(
        "gap_sess",
        F.sum(gap).over(w.rangeBetween(Window.unboundedPreceding, 0)),
    )
    ws = Window.partitionBy("user_id", "gap_sess")
    sliced = with_sess.withColumn(
        "sub",
        F.floor((us - F.min(us).over(ws)) / F.lit(SESSION_CAP_S)),
    )
    return (
        sliced.groupBy("user_id", "gap_sess", "sub")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            "user_id",
            F.col("gap_sess").cast("int").alias("gap_session"),
            F.col("sub").cast("int").alias("slice_idx"),
            "session_start",
            "session_end",
            "n_events",
        )
    )


SESSIONS_CAPPED_ORACLE = f"""
    WITH x AS (
      SELECT event_id, user_id, ts, epoch(ts)::BIGINT AS us FROM events
    ), flagged AS (
      SELECT *,
             CASE WHEN us - lag(us) OVER w > {SESSION_GAP_S} THEN 1 ELSE 0 END
               AS gap
      FROM x WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
    ), sess AS (
      SELECT *,
             SUM(gap) OVER (PARTITION BY user_id ORDER BY us, event_id
                            ROWS UNBOUNDED PRECEDING) AS gap_sess
      FROM flagged
    ), sliced AS (
      SELECT *,
             FLOOR((us - MIN(us) OVER (PARTITION BY user_id, gap_sess))
                   / {SESSION_CAP_S}) AS sub
      FROM sess
    )
    SELECT user_id, gap_sess::INT AS gap_session, sub::INT AS slice_idx,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           COUNT(*)::BIGINT AS n_events
    FROM sliced GROUP BY user_id, gap_sess, sub
"""


TIMESERIES_QUERIES["events_sessions_capped"] = (
    q_events_sessions_capped,
    SESSIONS_CAPPED_ORACLE,
)


def q_events_daily_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-active-day streak per user (gaps-and-islands):
    distinct active days, island id = day − row_number (constant within a
    consecutive run), then per-island lengths rolled up to per-user
    longest/count/total. The standard engagement-streak query.

    Scale shape: the distinct collapses to one row per (user, day) with
    map-side combine BEFORE its exchange; the window and both rollups
    partition by user — no global window, no skew beyond a user's day
    count (bounded by the calendar). Determinism: days are exact dates;
    row_number is total-ordered by (day) within user (days are distinct,
    so no tiebreak needed).

    Reference analog: none (SURVEY §2.5 extension surface).
    """
    e = read_table(spark, sf_dir, "events")
    days = e.select("user_id", F.to_date("ts").alias("day")).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    islands = days.withColumn(
        "grp", F.date_sub(F.col("day"), F.row_number().over(w))
    )
    streaks = islands.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).alias("len")
    )
    return streaks.groupBy("user_id").agg(
        F.max("len").cast("bigint").alias("longest_streak"),
        F.count(F.lit(1)).cast("bigint").alias("n_streaks"),
        F.sum("len").cast("bigint").alias("active_days"),
    )


STREAKS_ORACLE = """
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ), islands AS (
      SELECT user_id, day,
             day - CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                                           ORDER BY day) AS INT) AS grp
      FROM days
    ), streaks AS (
      SELECT user_id, grp, COUNT(*) AS len
      FROM islands GROUP BY user_id, grp
    )
    SELECT user_id,
           MAX(len)::BIGINT AS longest_streak,
           COUNT(*)::BIGINT AS n_streaks,
           SUM(len)::BIGINT AS active_days
    FROM streaks GROUP BY user_id
"""


TIMESERIES_QUERIES["events_daily_streaks"] = (
    q_events_daily_streaks,
    STREAKS_ORACLE,
)


def q_events_first_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch attribution: for every user with at least one
    purchase, the event type that FIRST touched them (their earliest
    event of any type), their first purchase time, the seconds from
    first touch to first purchase, and their purchase count — the
    marketing-attribution primitive.

    Scale shape: one window (rn = 1 picks the first event, total-ordered
    by (ts, event_id)) and one filtered aggregate, both partitioned by
    user — the window and the aggregate share the user partitioning; no
    global sort, no skew beyond per-user event counts. Seconds are exact
    integer µs arithmetic (sub-second timestamps).

    Reference analog: none (SURVEY §2.5 extension surface).
    """
    e = read_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    first_touch = (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("first_touch_type"),
            F.col("ts").alias("first_touch_ts"),
        )
    )
    purchases = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.min("ts").alias("first_purchase_ts"),
            F.count(F.lit(1)).alias("n_purchases"),
        )
    )
    return first_touch.join(purchases, "user_id").select(
        "user_id",
        "first_touch_type",
        "first_touch_ts",
        "first_purchase_ts",
        (
            (
                F.unix_micros("first_purchase_ts")
                - F.unix_micros("first_touch_ts")
            )
            / F.lit(1_000_000)
        ).alias("secs_to_purchase"),
        F.col("n_purchases").cast("bigint").alias("n_purchases"),
    )


FIRST_TOUCH_ORACLE = """
    WITH ranked AS (
      SELECT user_id, event_type, ts,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    ), first_touch AS (
      SELECT user_id, event_type AS first_touch_type,
             ts AS first_touch_ts
      FROM ranked WHERE rn = 1
    ), purchases AS (
      SELECT user_id, MIN(ts) AS first_purchase_ts,
             COUNT(*)::BIGINT AS n_purchases
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
    )
    SELECT f.user_id, first_touch_type, first_touch_ts, first_purchase_ts,
           (epoch_us(first_purchase_ts) - epoch_us(first_touch_ts))
             / 1000000.0 AS secs_to_purchase,
           n_purchases
    FROM first_touch f JOIN purchases p ON f.user_id = p.user_id
"""


TIMESERIES_QUERIES["events_first_touch"] = (
    q_events_first_touch,
    FIRST_TOUCH_ORACLE,
)


def q_events_mode_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped MODE: each user's most frequent event type, with a
    deterministic tie rule (highest count, then lexicographically
    smallest type). Built as count-per-(user, type) → rank window —
    both shuffles on user-sized keys, the counts collapse map-side; no
    engine-specific ``mode()``/``arg_max`` whose tie behavior differs
    across engines.

    Reference analog: none (SURVEY §2.5 extension surface).
    """
    e = read_table(spark, sf_dir, "events").select("user_id", "event_type")
    counts = e.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("cnt").desc(), F.col("event_type")
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("mode_type"),
            F.col("cnt").cast("bigint").alias("n_events"),
        )
    )


MODE_TYPE_ORACLE = """
    WITH counts AS (
      SELECT user_id, event_type, COUNT(*)::BIGINT AS cnt
      FROM events GROUP BY user_id, event_type
    ), ranked AS (
      SELECT *, row_number() OVER (PARTITION BY user_id
                                   ORDER BY cnt DESC, event_type) AS rn
      FROM counts
    )
    SELECT user_id, event_type AS mode_type, cnt AS n_events
    FROM ranked WHERE rn = 1
"""


TIMESERIES_QUERIES["events_mode_type"] = (
    q_events_mode_type,
    MODE_TYPE_ORACLE,
)


def q_events_hour_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week × hour-of-day activity heatmap with per-cell share of
    total — the ops-dashboard staple. One map-side-combined aggregate;
    the share divides by a broadcast scalar.

    Cross-engine pin: Spark's ``dayofweek`` is 1=Sunday..7=Saturday;
    DuckDB's ``dayofweek`` is 0=Sunday..6=Saturday — the query emits the
    0-based convention (Spark value − 1). Share is one int/int double
    division on exact counts, rounded to the 1e-12 grid.
    """
    e = read_table(spark, sf_dir, "events").select("ts")
    total = e.agg(F.count(F.lit(1)).alias("total"))
    return (
        e.groupBy(
            (F.dayofweek("ts") - 1).cast("int").alias("dow"),
            F.hour("ts").cast("int").alias("hour"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .crossJoin(F.broadcast(total))
        .select(
            "dow",
            "hour",
            "n_events",
            F.round(
                F.col("n_events").cast("double") / F.col("total").cast("double"),
                12,
            ).alias("share"),
        )
    )


HOUR_HEATMAP_ORACLE = """
    WITH t AS (SELECT COUNT(*)::BIGINT AS total FROM events)
    SELECT dayofweek(ts)::INT AS dow, hour(ts)::INT AS hour,
           COUNT(*)::BIGINT AS n_events,
           round(COUNT(*)::DOUBLE / (SELECT total FROM t)::DOUBLE, 12)
             AS share
    FROM events GROUP BY 1, 2
"""


TIMESERIES_QUERIES["events_hour_heatmap"] = (
    q_events_hour_heatmap,
    HOUR_HEATMAP_ORACLE,
)


ANOM_Z = 2.0


def q_events_hourly_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-baseline anomaly detection: each observed (calendar hour)
    event count is z-scored against the same (day-of-week, hour-of-day)
    cell across the whole range — the ops-monitoring primitive ("is this
    Tuesday 3pm unusually quiet?"). Cells with zero variance (or a single
    sample) yield NULL z and never flag.

    Contract: only hours with >= 1 event participate (zero-event hours
    are absent from both the samples and the baseline — documented
    choice; gap-filling variants exist via ``events_hourly_gapfill``).

    Determinism: counts are ints; mean and variance use the pinned
    integer-numerator formulas mean = sx/cnt and
    var = (cnt·sxx − sx²)/cnt² — exact int64 arithmetic up to one
    IEEE-correctly-rounded double division each — then
    z = round((x − mean)/sqrt(var), 12). One aggregate per grain, a
    broadcast join of the 7×24-bounded baseline; no window.
    """
    e = read_table(spark, sf_dir, "events").select("ts")
    hourly = e.groupBy(
        F.to_date("ts").alias("day"),
        (F.dayofweek("ts") - 1).cast("int").alias("dow"),
        F.hour("ts").cast("int").alias("hour"),
    ).agg(F.count(F.lit(1)).alias("n_events"))
    base = hourly.groupBy("dow", "hour").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("n_events").alias("sx"),
        F.sum(F.col("n_events") * F.col("n_events")).alias("sxx"),
    )
    mean = F.col("sx").cast("double") / F.col("cnt").cast("double")
    var = (
        (F.col("cnt") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
        / (F.col("cnt") * F.col("cnt")).cast("double")
    )
    z = F.round(
        (F.col("n_events").cast("double") - mean) / F.sqrt(var), 12
    )
    return (
        hourly.join(F.broadcast(base), ["dow", "hour"])
        .select(
            "day",
            "dow",
            "hour",
            "n_events",
            F.when(var > 0, z).alias("z"),
            F.when(var > 0, F.abs(z) >= F.lit(ANOM_Z))
            .otherwise(F.lit(False))
            .alias("is_anomaly"),
        )
    )


HOURLY_ANOM_ORACLE = f"""
    WITH hourly AS (
      SELECT CAST(ts AS DATE) AS day, dayofweek(ts)::INT AS dow,
             hour(ts)::INT AS hour, COUNT(*)::BIGINT AS n_events
      FROM events GROUP BY 1, 2, 3
    ), base AS (
      SELECT dow, hour, COUNT(*)::BIGINT AS cnt,
             SUM(n_events)::BIGINT AS sx,
             SUM(n_events * n_events)::BIGINT AS sxx
      FROM hourly GROUP BY dow, hour
    )
    SELECT day, h.dow, h.hour, n_events,
           CASE WHEN (cnt*sxx - sx*sx) > 0 THEN
             round((n_events::DOUBLE - sx::DOUBLE / cnt::DOUBLE)
                   / sqrt((cnt*sxx - sx*sx)::DOUBLE / (cnt*cnt)::DOUBLE), 12)
           END AS z,
           CASE WHEN (cnt*sxx - sx*sx) > 0 THEN
             abs(round((n_events::DOUBLE - sx::DOUBLE / cnt::DOUBLE)
                 / sqrt((cnt*sxx - sx*sx)::DOUBLE / (cnt*cnt)::DOUBLE), 12))
               >= {ANOM_Z}
           ELSE FALSE END AS is_anomaly
    FROM hourly h JOIN base USING (dow, hour)
"""


TIMESERIES_QUERIES["events_hourly_anomalies"] = (
    q_events_hourly_anomalies,
    HOURLY_ANOM_ORACLE,
)


TRANSITION_GAP_S = 1800


def q_events_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session path analysis: the event-type transition matrix — counts
    and conditional probabilities P(next | prev) over ADJACENT event
    pairs of the same user within a 30-minute gap (a cross-session pair
    is not a behavioral transition). The first-order Markov summary
    product analytics builds funnels from.

    Scale shape: one lag window partitioned by user (total-ordered by
    (ts, event_id)), then a map-side-combined count over the tiny
    |types|² key space; the row-probability denominator comes from a
    second aggregation of that matrix (types²-sized, broadcast). No
    global window, no skew beyond per-user event counts.

    Determinism: exact integer counts; P is one int/int double division
    rounded to the 1e-12 grid.
    """
    e = read_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts"
    )
    us = F.unix_micros("ts")
    w = Window.partitionBy("user_id").orderBy(us, "event_id")
    flagged = e.select(
        F.col("event_type").alias("next_type"),
        F.lag("event_type").over(w).alias("prev_type"),
        (us - F.lag(us).over(w)).alias("gap_us"),
    ).filter(
        F.col("prev_type").isNotNull()
        & (F.col("gap_us") <= F.lit(TRANSITION_GAP_S * 1_000_000))
    )
    matrix = flagged.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    totals = matrix.groupBy("prev_type").agg(
        F.sum("n_transitions").alias("n_from")
    )
    return matrix.join(F.broadcast(totals), "prev_type").select(
        "prev_type",
        "next_type",
        "n_transitions",
        F.round(
            F.col("n_transitions").cast("double")
            / F.col("n_from").cast("double"),
            12,
        ).alias("p"),
    )


TRANSITIONS_ORACLE = f"""
    WITH lagged AS (
      SELECT event_type AS next_type,
             lag(event_type) OVER w AS prev_type,
             epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_us
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    ), matrix AS (
      SELECT prev_type, next_type, COUNT(*)::BIGINT AS n_transitions
      FROM lagged
      WHERE prev_type IS NOT NULL
        AND gap_us <= {TRANSITION_GAP_S * 1_000_000}
      GROUP BY prev_type, next_type
    ), totals AS (
      SELECT prev_type, SUM(n_transitions) AS n_from
      FROM matrix GROUP BY prev_type
    )
    SELECT m.prev_type, m.next_type, m.n_transitions,
           round(m.n_transitions::DOUBLE / t.n_from::DOUBLE, 12) AS p
    FROM matrix m JOIN totals t ON m.prev_type = t.prev_type
"""


TIMESERIES_QUERIES["events_transitions"] = (
    q_events_transitions,
    TRANSITIONS_ORACLE,
)
