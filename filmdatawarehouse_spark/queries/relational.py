"""Relational surface beyond strict reference parity — window functions,
rollup, set operations, distinct aggregation, and the custom time-series
joins — each with a DuckDB oracle.

SURVEY.md §2.3/§2.5/§2.7 note these are absent from the reference but free
(or compositional) on Spark; exposing and oracle-checking them makes the
engine a complete analytics surface rather than a 1:1 parity shim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from filmdatawarehouse_spark.io.sources import read_table
from filmdatawarehouse_spark.operators.asof import asof_join, range_join
from filmdatawarehouse_spark.queries.registry import Entry


def q_window_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 customers per nation by account balance (rank/partition window
    — SURVEY §2.5: absent in the reference, table stakes for an engine)."""
    c = read_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        c.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 3)
        .select("c_nationkey", "c_custkey", "c_acctbal", "rank")
    )


def q_rollup_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP subtotals over (status, priority) — multi-level aggregation in
    one pass (grouping sets), null-filled subtotal keys."""
    o = read_table(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
        )
    )


def q_set_ops_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations: customers that placed 'F' orders but no 'O' orders
    (EXCEPT over distinct key sets — SURVEY §2.7: none in the reference)."""
    o = read_table(spark, sf_dir, "orders")
    f_cust = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    o_cust = o.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    )
    # subtract = set EXCEPT (exceptAll would be multiset semantics: a
    # customer with several 'F' orders would survive the subtraction)
    return f_cust.distinct().subtract(o_cust.distinct())


def q_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct aggregation: per order status, distinct customers and
    order count (expand + two-phase agg under the hood)."""
    o = read_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
    )


def q_asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each 'error' event, the most recent 'purchase' of the
    same user at ts <= error ts (union + running-window composition — no
    native Spark operator, no quadratic join)."""
    e = read_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select("user_id", "ts")
    errors = e.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    return asof_join(
        purchases, errors, on="user_id", left_ts="ts", right_ts="ts",
        value_alias="last_purchase_ts",
    ).select("event_id", "user_id", "ts", "last_purchase_ts")


def q_range_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: (purchase, follow-up event) pairs of the same user within
    30 minutes after the purchase (bucketized equi-join, not O(n²))."""
    e = read_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), F.col("user_id"),
        F.col("ts").alias("purchase_ts"),
    )
    followups = e.filter(F.col("event_type") != "purchase").select(
        F.col("event_id").alias("followup_id"), F.col("user_id").alias("user_id"),
        F.col("ts").alias("followup_ts"),
    )
    return range_join(
        purchases, followups, on="user_id", left_ts="purchase_ts",
        right_ts="followup_ts", width_seconds=1800,
    ).select("purchase_id", "followup_id", "user_id", "purchase_ts", "followup_ts")


_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_PRIO_ALIAS = ["n_urgent", "n_high", "n_medium", "n_not_specified", "n_low"]


def q_pivot_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: order counts per status × priority, priorities as columns
    (SURVEY §2.4: pivot absent in the reference).

    Compiled to conditional aggregation rather than ``df.pivot`` — with a
    known value list that is the same result in ONE shuffle (partial+final
    count), where Spark's pivotfirst path plans two exchanges. Verified by
    test_plan_hygiene.test_pivot_is_single_pass."""
    o = read_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        *[
            F.count(F.when(F.col("o_orderpriority") == p, 1)).alias(a)
            for p, a in zip(_PRIORITIES, _PRIO_ALIAS)
        ]
    )


def q_cube_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority): all 2^2 grouping sets in one shuffle
    (SURVEY §2.4: grouping sets/cube absent in the reference)."""
    o = read_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_price"),
    )


def q_anti_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join: customers that never placed an urgent order (SURVEY
    §2.3: semi/anti absent in the reference). Plans as a broadcast/shuffled
    hash anti join — no NOT IN subquery materialization."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return c.join(
        o, c["c_custkey"] == o["o_custkey"], "left_anti"
    ).select("c_custkey", "c_name")


def q_semi_join_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join: suppliers with at least one urgent-priority shipment
    — existence check without duplicating supplier rows per lineitem."""
    s = read_table(spark, sf_dir, "supplier")
    l = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    urgent_items = l.join(
        o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_orderkey"),
        l["l_orderkey"] == o["o_orderkey"],
        "left_semi",
    )
    return s.join(
        urgent_items, s["s_suppkey"] == urgent_items["l_suppkey"], "left_semi"
    ).select("s_suppkey", "s_name", "s_nationkey")


def q_percentile_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (median / p90) of order value per
    status — Spark `percentile` (exact, sort-based) rather than
    `percentile_approx`, matching DuckDB's `quantile_cont` bit-for-bit."""
    o = read_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("p50_price"),
        F.expr("percentile(o_totalprice, 0.9)").alias("p90_price"),
    )


def q_above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subqueries: orders priced above their customer's
    average. Written as SQL subqueries on purpose — Catalyst decorrelates
    them into aggregate+join (no per-row re-execution). The comparison is
    ``price * n > sum`` in DECIMAL, the division-free exact form of
    ``price > avg`` (identical row set in both engines, no float boundary).
    """
    read_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        SELECT o.o_orderkey, o.o_custkey
        FROM orders_v o
        WHERE CAST(o.o_totalprice AS DECIMAL(18,2)) * (
                SELECT COUNT(*) FROM orders_v i
                WHERE i.o_custkey = o.o_custkey)
              > (SELECT SUM(CAST(i.o_totalprice AS DECIMAL(18,2)))
                 FROM orders_v i WHERE i.o_custkey = o.o_custkey)
        """
    )


def q_scd2_customer_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 dimension merge end-to-end: bootstrap the customer dimension from
    a T1 snapshot, apply a T2 snapshot where every 10th customer changed
    market segment, and return the versioned state (closed + reopened rows).

    The reference has no update semantics at all (blind append,
    `dags/rentalFilmDAG.py:39`); this is the engine's MERGE-INTO answer as
    pure DataFrame algebra (warehouse/scd.py) — one shuffle on the key.
    """
    from filmdatawarehouse_spark.warehouse.scd import scd2_apply, scd2_initial

    attrs = ["c_mktsegment", "c_acctbal"]
    c = read_table(spark, sf_dir, "customer")
    t1 = F.lit("2024-01-01 00:00:00").cast("timestamp")
    t2 = F.lit("2024-06-01 00:00:00").cast("timestamp")
    batch1 = c.select("c_custkey", *attrs).withColumn("effective_ts", t1)
    dim = scd2_initial(batch1, "c_custkey", attrs)
    batch2 = c.select(
        "c_custkey",
        F.when(F.col("c_custkey") % 10 == 0, F.lit("RELOCATED"))
        .otherwise(F.col("c_mktsegment"))
        .alias("c_mktsegment"),
        "c_acctbal",
    ).withColumn("effective_ts", t2)
    return scd2_apply(dim, batch2, "c_custkey", attrs)



def q_scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time dimension lookup — the query SCD2 versioning exists
    FOR: every order joins the customer-dimension VERSION that was valid
    on its order date (equi-join on the key + validity-interval predicate),
    so pre-1998 orders see the original market segment and later orders of
    every 10th customer see 'RELOCATED'.

    Version timeline is built inside the order date range (t1=1995-01-01,
    t2=1998-01-01) by the same scd2_initial/scd2_apply machinery certified
    in ``scd2_customer_dim``.

    Scale shape: the dim is versions-per-key small relative to the fact —
    broadcast equi-join on the key with the interval check as join filter;
    for dims too big to broadcast the same plan degrades to SMJ on the
    key, never an interval cross-join.
    """
    from filmdatawarehouse_spark.warehouse.scd import scd2_apply, scd2_initial

    attrs = ["c_mktsegment"]
    c = read_table(spark, sf_dir, "customer")
    t1 = F.lit("1995-01-01 00:00:00").cast("timestamp")
    t2 = F.lit("1998-01-01 00:00:00").cast("timestamp")
    dim = scd2_initial(
        c.select("c_custkey", *attrs).withColumn("effective_ts", t1),
        "c_custkey", attrs,
    )
    dim = scd2_apply(
        dim,
        c.select(
            "c_custkey",
            F.when(F.col("c_custkey") % 10 == 0, F.lit("RELOCATED"))
            .otherwise(F.col("c_mktsegment"))
            .alias("c_mktsegment"),
        ).withColumn("effective_ts", t2),
        "c_custkey", attrs,
    )
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    ts = F.col("o_orderdate").cast("timestamp")
    # The bootstrap version (valid_from == t1) is open-ended on the left so
    # coverage is total by construction: an order dated before the first
    # snapshot still resolves to the earliest known version rather than
    # silently dropping out of the inner join (ADVICE r04).
    is_bootstrap = F.col("valid_from") == t1
    return o.join(
        F.broadcast(dim),
        (F.col("o_custkey") == F.col("c_custkey"))
        & (is_bootstrap | (ts >= F.col("valid_from")))
        & (F.col("valid_to").isNull() | (ts < F.col("valid_to"))),
    ).select("o_orderkey", "o_custkey", "o_orderdate", "c_mktsegment")


def q_window_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ranking-window family over one partition spec — rank,
    dense_rank, percent_rank, cume_dist — on supplier account balance per
    nation. percent_rank/cume_dist are exact integer ratios in double, so
    they compare bit-for-bit across engines."""
    from pyspark.sql.window import Window

    s = read_table(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy("s_acctbal", "s_suppkey")
    return s.select(
        "s_nationkey",
        "s_suppkey",
        F.rank().over(w).cast("int").alias("rnk"),
        F.dense_rank().over(w).cast("int").alias("drnk"),
        F.percent_rank().over(w).alias("prnk"),
        F.cume_dist().over(w).alias("cdist"),
    )


def q_events_hourly_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly series: every hour in the events time range gets a
    row per event_type, zero-filled where nothing happened — the resample
    step before any time-series modeling. The hour spine is a distributed
    ``sequence`` (generate, like the date dimension), cross-joined with
    the type dim and LEFT-joined to the hourly aggregate; no driver loop."""
    e = read_table(spark, sf_dir, "events")
    hourly = (
        e.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(
            F.sequence(F.col("lo"), F.col("hi"), F.expr("INTERVAL 1 HOUR"))
        ).alias("hour")
    )
    types = e.select("event_type").distinct()
    grid = spine.crossJoin(F.broadcast(types))
    return grid.join(hourly, ["hour", "event_type"], "left").select(
        "hour",
        "event_type",
        F.coalesce(F.col("n_events"), F.lit(0)).cast("bigint").alias("n_events"),
    )


def q_ntile_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE quartiles of order value per order-status group: the quantile
    -bucketing window (equal-count tiles), with per-tile count and exact
    DECIMAL value sums. Tie order pinned by (o_totalprice, o_orderkey)."""
    from pyspark.sql.window import Window

    o = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return (
        o.withColumn("tile", F.ntile(4).over(w))
        .groupBy("o_orderstatus", "tile")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("tile_value"),
        )
    )


def q_corr_qty_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation of lineitem quantity vs extended price — computed
    from EXACT decimal sums (n, Σx, Σy, Σxy, Σx², Σy²) and one pinned
    double formula, NOT the built-in ``corr`` (Spark and DuckDB use
    different streaming-moment algorithms whose float accumulation order
    is engine- and partition-dependent; sums of decimals are
    order-independent, so this form is bit-identical everywhere AND
    shuffle-wise identical to any other single aggregate)."""
    li = read_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("decimal(18,2)")
    y = F.col("l_extendedprice").cast("decimal(18,2)")
    agg = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum((x * y).cast("decimal(38,4)")).alias("sxy"),
        F.sum((x * x).cast("decimal(38,4)")).alias("sxx"),
        F.sum((y * y).cast("decimal(38,4)")).alias("syy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    return agg.select(
        F.col("n"),
        # 1e-12 grid on the O(1) output (r06 fix): at sf>=0.1 the sums'
        # decimal->double casts land past 2^53, where Spark's correctly-
        # rounded BigDecimal conversion and DuckDB's int128-then-divide
        # double-rounding can differ in the last ulp — observed 7e-19
        # absolute at sf0.1. The correlation itself is in [-1, 1], so the
        # grid costs nothing.
        F.round(
            (n * sxy - sx * sy)
            / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)),
            12,
        ).alias("corr_qty_price"),
    )


def q_snapshot_diff_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data capture between two customer snapshots: T2 relocates
    every 10th customer (update), drops custkey % 7 == 3 (delete), and adds
    shifted-key clones of custkey % 13 == 1 (insert). One full-outer join;
    unchanged keys vanish from the feed."""
    from filmdatawarehouse_spark.warehouse.scd import snapshot_diff

    c = read_table(spark, sf_dir, "customer")
    old = c.select("c_custkey", "c_mktsegment")
    base = c.select(
        "c_custkey",
        F.when(F.col("c_custkey") % 10 == 0, F.lit("RELOCATED"))
        .otherwise(F.col("c_mktsegment"))
        .alias("c_mktsegment"),
    ).filter(F.col("c_custkey") % 7 != 3)
    inserts = c.filter(F.col("c_custkey") % 13 == 1).select(
        (F.col("c_custkey") + F.lit(10_000_000)).alias("c_custkey"),
        "c_mktsegment",
    )
    new = base.unionByName(inserts)
    return snapshot_diff(old, new, "c_custkey", ["c_mktsegment"])


ORACLES: dict[str, str] = {
    "window_rank_family": """
        SELECT s_nationkey, s_suppkey,
               rank() OVER w ::INT AS rnk,
               dense_rank() OVER w ::INT AS drnk,
               percent_rank() OVER w AS prnk,
               cume_dist() OVER w AS cdist
        FROM supplier
        WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal, s_suppkey)
    """,
    "events_hourly_gapfill": """
        WITH b AS (
          SELECT date_trunc('hour', MIN(ts)) AS lo,
                 date_trunc('hour', MAX(ts)) AS hi
          FROM events
        ), spine AS (
          SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour
          FROM b
        ), types AS (
          SELECT DISTINCT event_type FROM events
        ), hourly AS (
          SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
                 event_type, COUNT(*)::BIGINT AS n_events
          FROM events GROUP BY 1, 2
        )
        SELECT CAST(s.hour AS TIMESTAMP) AS hour, t.event_type,
               COALESCE(h.n_events, 0)::BIGINT AS n_events
        FROM spine s CROSS JOIN types t
        LEFT JOIN hourly h
          ON h.hour = CAST(s.hour AS TIMESTAMP) AND h.event_type = t.event_type
    """,
    "ntile_order_value": """
        WITH t AS (
          SELECT o_orderstatus, o_totalprice,
                 ntile(4) OVER (PARTITION BY o_orderstatus
                                ORDER BY o_totalprice, o_orderkey) AS tile
          FROM orders
        )
        SELECT o_orderstatus, tile,
               COUNT(*)::BIGINT AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS tile_value
        FROM t GROUP BY o_orderstatus, tile
    """,
    "corr_qty_price": """
        WITH s AS (
          SELECT COUNT(*)::BIGINT AS n,
                 SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sx,
                 SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS sy,
                 SUM(CAST(CAST(l_quantity AS DECIMAL(18,2))
                      * CAST(l_extendedprice AS DECIMAL(18,2))
                      AS DECIMAL(38,4))) AS sxy,
                 SUM(CAST(CAST(l_quantity AS DECIMAL(18,2))
                      * CAST(l_quantity AS DECIMAL(18,2))
                      AS DECIMAL(38,4))) AS sxx,
                 SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                      * CAST(l_extendedprice AS DECIMAL(18,2))
                      AS DECIMAL(38,4))) AS syy
          FROM lineitem
        )
        SELECT n,
               round((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
                 / sqrt((n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
                        * (n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE)),
                 12)
                 AS corr_qty_price
        FROM s
    """,
    "snapshot_diff_customers": """
        WITH old AS (SELECT c_custkey, c_mktsegment FROM customer),
        base AS (
          SELECT c_custkey,
                 CASE WHEN c_custkey % 10 = 0 THEN 'RELOCATED'
                      ELSE c_mktsegment END AS c_mktsegment
          FROM customer WHERE c_custkey % 7 <> 3
        ),
        ins AS (
          SELECT c_custkey + 10000000 AS c_custkey, c_mktsegment
          FROM customer WHERE c_custkey % 13 = 1
        ),
        new AS (SELECT * FROM base UNION ALL SELECT * FROM ins),
        j AS (
          SELECT o.c_custkey AS k_old, n.c_custkey AS k_new,
                 o.c_mktsegment AS m_old, n.c_mktsegment AS m_new
          FROM old o FULL OUTER JOIN new n ON o.c_custkey = n.c_custkey
        )
        SELECT COALESCE(k_old, k_new) AS c_custkey,
               CASE WHEN k_old IS NULL THEN 'insert'
                    WHEN k_new IS NULL THEN 'delete'
                    WHEN m_old IS DISTINCT FROM m_new THEN 'update'
               END AS change_type
        FROM j
        WHERE CASE WHEN k_old IS NULL THEN 'insert'
                   WHEN k_new IS NULL THEN 'delete'
                   WHEN m_old IS DISTINCT FROM m_new THEN 'update'
              END IS NOT NULL
    """,
    "window_topn_per_group": """
        SELECT c_nationkey, c_custkey, c_acctbal, rank FROM (
          SELECT c_nationkey, c_custkey, c_acctbal,
                 row_number() OVER (
                   PARTITION BY c_nationkey
                   ORDER BY c_acctbal DESC, c_custkey
                 )::INT AS rank
          FROM customer
        ) WHERE rank <= 3
    """,
    "rollup_order_stats": """
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS total_price
        FROM orders
        GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    "set_ops_customers": """
        SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
        EXCEPT
        SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    """,
    "count_distinct": """
        SELECT o_orderstatus,
               COUNT(DISTINCT o_custkey) AS n_customers,
               COUNT(*) AS n_orders
        FROM orders GROUP BY o_orderstatus
    """,
    "asof_join_events": """
        WITH purchases AS (
          SELECT user_id, ts FROM events WHERE event_type = 'purchase'
        ), errors AS (
          SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'
        )
        SELECT e.event_id, e.user_id, e.ts, p.ts AS last_purchase_ts
        FROM errors e
        ASOF LEFT JOIN purchases p
          ON e.user_id = p.user_id AND e.ts >= p.ts
    """,
    "range_join_events": """
        WITH purchases AS (
          SELECT event_id AS purchase_id, user_id, ts AS purchase_ts
          FROM events WHERE event_type = 'purchase'
        ), followups AS (
          SELECT event_id AS followup_id, user_id, ts AS followup_ts
          FROM events WHERE event_type != 'purchase'
        )
        SELECT purchase_id, followup_id, p.user_id, purchase_ts, followup_ts
        FROM purchases p JOIN followups f
          ON p.user_id = f.user_id
         AND epoch_us(followup_ts) - epoch_us(purchase_ts) > 0
         AND epoch_us(followup_ts) - epoch_us(purchase_ts) <= 1800000000
    """,
    "pivot_orders": """
        SELECT o_orderstatus,
               COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS n_urgent,
               COUNT(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS n_high,
               COUNT(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS n_medium,
               COUNT(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED')
                 AS n_not_specified,
               COUNT(*) FILTER (WHERE o_orderpriority = '5-LOW') AS n_low
        FROM orders GROUP BY o_orderstatus
    """,
    "cube_order_stats": """
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS total_price
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    "anti_join_customers": """
        SELECT c_custkey, c_name FROM customer c
        WHERE NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
        )
    """,
    "semi_join_suppliers": """
        SELECT s_suppkey, s_name, s_nationkey FROM supplier s
        WHERE EXISTS (
          SELECT 1 FROM lineitem l
          JOIN orders o ON l.l_orderkey = o.o_orderkey
          WHERE o.o_orderpriority = '1-URGENT' AND l.l_suppkey = s.s_suppkey
        )
    """,
    "percentile_order_value": """
        SELECT o_orderstatus,
               quantile_cont(o_totalprice, 0.5) AS p50_price,
               quantile_cont(o_totalprice, 0.9) AS p90_price
        FROM orders GROUP BY o_orderstatus
    """,
    "above_customer_avg": """
        SELECT o.o_orderkey, o.o_custkey
        FROM orders o
        WHERE CAST(o.o_totalprice AS DECIMAL(18,2)) * (
                SELECT COUNT(*) FROM orders i
                WHERE i.o_custkey = o.o_custkey)
              > (SELECT SUM(CAST(i.o_totalprice AS DECIMAL(18,2)))
                 FROM orders i WHERE i.o_custkey = o.o_custkey)
    """,
    # Closed form of the SCD2 merge: unchanged keys keep their T1 version;
    # every 10th key gets a closed T1→T2 version plus an open T2 version.
    # TIMESTAMP_NS so DuckDB's pandas unit matches Spark's ns at compare time.
    # point-in-time: orders before 1998 see the original segment; later
    # orders of every 10th customer see RELOCATED.
    "scd2_point_in_time": """
        SELECT o_orderkey, o_custkey, o_orderdate,
               CASE WHEN o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
                     AND o_custkey % 10 = 0
                    THEN 'RELOCATED' ELSE c_mktsegment END AS c_mktsegment
        FROM orders JOIN customer ON o_custkey = c_custkey
    """,
    "scd2_customer_dim": """
        SELECT c_custkey, c_mktsegment, c_acctbal,
               CAST(TIMESTAMP '2024-01-01 00:00:00' AS TIMESTAMP_NS) AS valid_from,
               CAST(NULL AS TIMESTAMP_NS) AS valid_to,
               TRUE AS is_current
        FROM customer WHERE c_custkey % 10 <> 0
        UNION ALL
        SELECT c_custkey, c_mktsegment, c_acctbal,
               CAST(TIMESTAMP '2024-01-01 00:00:00' AS TIMESTAMP_NS),
               CAST(TIMESTAMP '2024-06-01 00:00:00' AS TIMESTAMP_NS),
               FALSE
        FROM customer WHERE c_custkey % 10 = 0
        UNION ALL
        SELECT c_custkey, 'RELOCATED', c_acctbal,
               CAST(TIMESTAMP '2024-06-01 00:00:00' AS TIMESTAMP_NS),
               CAST(NULL AS TIMESTAMP_NS),
               TRUE
        FROM customer WHERE c_custkey % 10 = 0
    """,
}

RELATIONAL_QUERIES: dict[str, Entry] = {
    "window_topn_per_group": (q_window_topn_per_group, ORACLES["window_topn_per_group"]),
    "rollup_order_stats": (q_rollup_order_stats, ORACLES["rollup_order_stats"]),
    "set_ops_customers": (q_set_ops_customers, ORACLES["set_ops_customers"]),
    "count_distinct": (q_count_distinct, ORACLES["count_distinct"]),
    "asof_join_events": (q_asof_join_events, ORACLES["asof_join_events"]),
    "scd2_point_in_time": (q_scd2_point_in_time, ORACLES["scd2_point_in_time"]),
    "range_join_events": (q_range_join_events, ORACLES["range_join_events"]),
    "scd2_customer_dim": (q_scd2_customer_dim, ORACLES["scd2_customer_dim"]),
    "pivot_orders": (q_pivot_orders, ORACLES["pivot_orders"]),
    "cube_order_stats": (q_cube_order_stats, ORACLES["cube_order_stats"]),
    "anti_join_customers": (q_anti_join_customers, ORACLES["anti_join_customers"]),
    "semi_join_suppliers": (q_semi_join_suppliers, ORACLES["semi_join_suppliers"]),
    "percentile_order_value": (
        q_percentile_order_value,
        ORACLES["percentile_order_value"],
    ),
    "above_customer_avg": (q_above_customer_avg, ORACLES["above_customer_avg"]),
    "snapshot_diff_customers": (
        q_snapshot_diff_customers,
        ORACLES["snapshot_diff_customers"],
    ),
    "ntile_order_value": (q_ntile_order_value, ORACLES["ntile_order_value"]),
    "corr_qty_price": (q_corr_qty_price, ORACLES["corr_qty_price"]),
    "window_rank_family": (q_window_rank_family, ORACLES["window_rank_family"]),
    "events_hourly_gapfill": (
        q_events_hourly_gapfill,
        ORACLES["events_hourly_gapfill"],
    ),
}


def q_window_value_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The value-window family over one partition spec — first_value,
    last_value, nth_value, lead — completing the window-function surface
    next to ``window_rank_family``. last_value/nth_value use the explicit
    full-partition frame (the default RANGE..CURRENT ROW frame makes
    last_value ≡ current row — the classic silent-wrong-answer trap, pinned
    correct here in both engines)."""
    from pyspark.sql.window import Window

    s = read_table(spark, sf_dir, "supplier")
    order = [F.col("s_acctbal").asc(), F.col("s_suppkey").asc()]
    w = Window.partitionBy("s_nationkey").orderBy(*order)
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return s.select(
        "s_nationkey",
        "s_suppkey",
        F.first("s_suppkey").over(wf).alias("poorest_suppkey"),
        F.last("s_suppkey").over(wf).alias("richest_suppkey"),
        F.nth_value("s_suppkey", 2).over(wf).alias("second_poorest_suppkey"),
        F.lead("s_suppkey").over(w).alias("next_suppkey"),
    )


ORACLES["window_value_family"] = """
    SELECT s_nationkey, s_suppkey,
           first_value(s_suppkey) OVER wf AS poorest_suppkey,
           last_value(s_suppkey) OVER wf AS richest_suppkey,
           nth_value(s_suppkey, 2) OVER wf AS second_poorest_suppkey,
           lead(s_suppkey) OVER w AS next_suppkey
    FROM supplier
    WINDOW
      w AS (PARTITION BY s_nationkey ORDER BY s_acctbal, s_suppkey),
      wf AS (PARTITION BY s_nationkey ORDER BY s_acctbal, s_suppkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


def q_events_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-grain time rollup in ONE pass: event counts at (day), (month),
    and grand-total grains via GROUPING SETS over derived time keys, with
    grouping() flags disambiguating the NULL-key rows — the
    time-hierarchy sibling of ``grouping_sets_orders``. One scan, one
    Expand, one two-phase aggregate; never three separate scans."""
    e = read_table(spark, sf_dir, "events").select("ts")
    keyed = e.select(
        F.to_date("ts").alias("day"),
        (F.year("ts") * 100 + F.month("ts")).cast("int").alias("month"),
    )
    return (
        keyed.groupingSets(
            [[F.col("day")], [F.col("month")], []],
            F.col("day"),
            F.col("month"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.grouping("day").cast("int").alias("g_day"),
            F.grouping("month").cast("int").alias("g_month"),
        )
        .select("day", "month", "n_events", "g_day", "g_month")
    )


ORACLES["events_time_rollup"] = """
    WITH keyed AS (
      SELECT CAST(ts AS DATE) AS day,
             (year(ts) * 100 + month(ts))::INT AS month
      FROM events
    )
    SELECT day, month, COUNT(*)::BIGINT AS n_events,
           grouping(day)::INT AS g_day, grouping(month)::INT AS g_month
    FROM keyed
    GROUP BY GROUPING SETS ((day), (month), ())
"""

RELATIONAL_QUERIES["window_value_family"] = (
    q_window_value_family,
    ORACLES["window_value_family"],
)
RELATIONAL_QUERIES["events_time_rollup"] = (
    q_events_time_rollup,
    ORACLES["events_time_rollup"],
)


def q_regional_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped "local supplier volume": revenue from lineitems
    where the customer and the supplier sit in the SAME nation of one
    region, over one order-date year — the canonical 6-way
    fact⋈fact⋈4-dim join (region ⋈ nation ⋈ customer ⋈ orders ⋈
    lineitem ⋈ supplier).

    Scale shape: the date predicate prunes orders AT THE SCAN (pushed
    filter); orders⋈lineitem is the one big⋈big shuffle (both sides hash
    on orderkey); nation⋈region collapses to a broadcast hash join onto
    customer and supplier; the c_nationkey = s_nationkey condition rides
    the lineitem⋈supplier join as a residual equi-key. Supplier itself is
    deliberately NOT hint-broadcast (it grows with SF); AQE picks
    broadcast while it fits and a shuffled hash join beyond that. Revenue sums in DECIMAL (order-independent) and casts to
    double once.

    Reference analog: none (single-table pandas); SURVEY §2.3 extension
    surface.
    """
    region_name = "ASIA"
    nat = (
        read_table(spark, sf_dir, "nation")
        .join(
            F.broadcast(
                read_table(spark, sf_dir, "region").filter(
                    F.col("r_name") == region_name
                )
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    cust = read_table(spark, sf_dir, "customer").join(
        F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey")
    ).select("c_custkey", F.col("n_nationkey").alias("cn_key"), "n_name")
    orders = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    ).select("o_orderkey", "o_custkey")
    supp = read_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    revenue = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)")
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            # no broadcast HINT: supplier grows with SF (10k rows x SF) and
            # a forced broadcast would hit the 8 GB driver limit at the
            # scale this plan targets; AQE broadcasts it while it is small
            # and falls back to a shuffled join when it is not
            supp,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("s_nationkey") == F.col("cn_key")),
        )
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(revenue).cast("double").alias("revenue"),
        )
    )


ORACLES["regional_supplier_revenue"] = """
    SELECT n_name,
           COUNT(*)::BIGINT AS n_items,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
             AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n_name
"""


# rule-based RFM thresholds (days / orders / revenue). DELIBERATELY fixed
# rules, not quantiles: quantile scoring needs a global rank (single-
# partition window) or interpolated percentiles (engine-dependent float
# interpolation) — fixed business-rule buckets are what production RFM
# systems ship, embarrassingly parallel, and hash-certifiable.
RFM_RECENCY_DAYS = (365, 730, 1460)  # <=1y:3, <=2y:2, <=4y:1, else 0
RFM_FREQ = (10, 5, 2)  # >=10:3, >=5:2, >=2:1, else 0
RFM_MONETARY = ("500000", "200000", "50000")  # decimal thresholds


def q_customer_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rule-based RFM segmentation: per customer, recency (days between
    their last order and the corpus max order date), frequency (order
    count), monetary (DECIMAL revenue sum), each bucketed 0-3 by the
    fixed thresholds above, plus the composite ``rfm`` code. One
    map-side-combined aggregate per customer + a broadcast of the scalar
    max date — no window, no quantile, no second shuffle.

    Scale: customers get one row each out of the orders aggregate
    (map-side combine bounds the exchange at |customers| rows); the
    bucketing is pure per-row expression. At 100 TB this is the plan you
    want — the alternative quantile-based scoring needs a global sort.
    """
    o = read_table(spark, sf_dir, "orders")
    maxd = o.agg(F.max("o_orderdate").alias("maxd"))
    per_cust = (
        o.groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("monetary"),
        )
        .crossJoin(F.broadcast(maxd))
        .withColumn(
            "recency_days", F.datediff(F.col("maxd"), F.col("last_order"))
        )
    )
    r1, r2, r3 = RFM_RECENCY_DAYS
    f1, f2, f3 = RFM_FREQ
    m1, m2, m3 = RFM_MONETARY
    r_score = (
        F.when(F.col("recency_days") <= r1, 3)
        .when(F.col("recency_days") <= r2, 2)
        .when(F.col("recency_days") <= r3, 1)
        .otherwise(0)
    )
    f_score = (
        F.when(F.col("frequency") >= f1, 3)
        .when(F.col("frequency") >= f2, 2)
        .when(F.col("frequency") >= f3, 1)
        .otherwise(0)
    )
    m_score = (
        F.when(F.col("monetary") >= F.lit(m1).cast("decimal(18,2)"), 3)
        .when(F.col("monetary") >= F.lit(m2).cast("decimal(18,2)"), 2)
        .when(F.col("monetary") >= F.lit(m3).cast("decimal(18,2)"), 1)
        .otherwise(0)
    )
    return per_cust.select(
        F.col("o_custkey").alias("custkey"),
        F.col("recency_days").cast("int").alias("recency_days"),
        F.col("frequency").cast("bigint").alias("frequency"),
        F.col("monetary").cast("double").alias("monetary"),
        r_score.cast("int").alias("r_score"),
        f_score.cast("int").alias("f_score"),
        m_score.cast("int").alias("m_score"),
        (r_score * 100 + f_score * 10 + m_score).cast("int").alias("rfm"),
    )


ORACLES["customer_rfm"] = f"""
    WITH maxd AS (SELECT MAX(o_orderdate) AS maxd FROM orders),
    per_cust AS (
      SELECT o_custkey AS custkey,
             date_diff('day', MAX(o_orderdate), (SELECT maxd FROM maxd))::INT
               AS recency_days,
             COUNT(*)::BIGINT AS frequency,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS monetary
      FROM orders GROUP BY o_custkey
    ), scored AS (
      SELECT *,
             CASE WHEN recency_days <= {RFM_RECENCY_DAYS[0]} THEN 3
                  WHEN recency_days <= {RFM_RECENCY_DAYS[1]} THEN 2
                  WHEN recency_days <= {RFM_RECENCY_DAYS[2]} THEN 1
                  ELSE 0 END AS r_score,
             CASE WHEN frequency >= {RFM_FREQ[0]} THEN 3
                  WHEN frequency >= {RFM_FREQ[1]} THEN 2
                  WHEN frequency >= {RFM_FREQ[2]} THEN 1
                  ELSE 0 END AS f_score,
             CASE WHEN monetary >= {RFM_MONETARY[0]} THEN 3
                  WHEN monetary >= {RFM_MONETARY[1]} THEN 2
                  WHEN monetary >= {RFM_MONETARY[2]} THEN 1
                  ELSE 0 END AS m_score
      FROM per_cust
    )
    SELECT custkey, recency_days, frequency,
           CAST(monetary AS DOUBLE) AS monetary,
           r_score::INT AS r_score, f_score::INT AS f_score,
           m_score::INT AS m_score,
           (r_score * 100 + f_score * 10 + m_score)::INT AS rfm
    FROM scored
"""


ABC_A, ABC_B = "0.800000000000", "0.950000000000"
ABC_A_PPB, ABC_B_PPB = 800_000_000, 950_000_000  # integer ppb thresholds


def q_orders_abc_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto classification of parts by revenue: parts ranked by
    descending revenue, cumulative revenue share, class A up to 80% of
    total, B to 95%, C above. The global cumulative sum runs through
    ``operators/prefix.global_running_sum`` — range partition + bounded
    per-partition-offset collect + partition-parallel window — NEVER a
    single-partition ``Window.orderBy`` over all parts (the round-2 weak
    -plan smell; tests/test_plan_hygiene.py pins the absence of a
    1-partition WindowExec).

    Determinism (hardened r08 after an sf0.1 sweep caught a 1-in-20k
    flip): ranking order is (revenue DESC, partkey) — total; revenue and
    cumulative sums are DECIMAL-exact; the share is INTEGER parts-per-
    billion — exact decimal unit counts put through one integral
    division (`div` / `//`, exact in both engines) — never a
    round(double, 12), whose half-way boundary a 20k-row corpus lands on
    with last-ulp probability. ``cum_share`` = ppb/1e9 is then an exact
    function of an exact integer, and the ABC thresholds compare ppb as
    integers. Zero boundary risk at any scale.
    """
    from filmdatawarehouse_spark.operators.cache import managed_persist
    from filmdatawarehouse_spark.operators.prefix import global_running_sum

    li = read_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_discount"
    )
    revenue = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)")
    )
    # persisted: the prefix-sum operator's repartitionByRange computes its
    # input TWICE (a boundary-sampling job, then the exchange itself) —
    # without the persist each pass re-runs the lineitem scan + aggregate
    per_part = managed_persist(
        li.groupBy("l_partkey").agg(
            F.sum(revenue.cast("decimal(28,4)")).alias("rev")
        )
    )
    # tot rides out of the prefix-sum operator itself (total_col): the
    # grand total is already exact driver-side arithmetic over the
    # collected per-partition sums — a separate agg job + crossJoin over
    # the same persisted frame bought nothing (r09: one fewer job per run)
    cum = global_running_sum(
        per_part,
        F.col("rev"),
        [F.col("rev").desc(), F.col("l_partkey")],
        "cum_rev",
        total_col="tot",
    )
    # exact integer ppb: scale-4 unit counts are exactly integral, the
    # integral division truncates identically in both engines
    ppb = F.expr(
        "CAST((CAST(cum_rev * 10000 AS DECIMAL(38,0)) * 1000000000)"
        " div CAST(tot * 10000 AS DECIMAL(38,0)) AS BIGINT)"
    )
    return (
        cum.withColumn("_ppb", ppb)
        .withColumn(
            "cum_share", F.col("_ppb").cast("double") / F.lit(1e9)
        )
        .withColumn(
            "abc_class",
            F.when(F.col("_ppb") <= F.lit(ABC_A_PPB), "A")
            .when(F.col("_ppb") <= F.lit(ABC_B_PPB), "B")
            .otherwise("C"),
        )
        .select(
            "l_partkey",
            F.col("rev").cast("double").alias("revenue"),
            "cum_share",
            "abc_class",
        )
    )


ORACLES["orders_abc_pareto"] = f"""
    WITH per_part AS (
      SELECT l_partkey,
             SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(18,2)))
                      AS DECIMAL(28,4))) AS rev
      FROM lineitem GROUP BY l_partkey
    ), cum AS (
      SELECT l_partkey, rev,
             SUM(rev) OVER (ORDER BY rev DESC, l_partkey
                            ROWS UNBOUNDED PRECEDING) AS cum_rev,
             SUM(rev) OVER () AS tot
      FROM per_part
    ), p AS (
      SELECT l_partkey, rev,
             (CAST(cum_rev * 10000 AS HUGEINT) * 1000000000)
               // CAST(tot * 10000 AS HUGEINT) AS ppb
      FROM cum
    )
    SELECT l_partkey,
           CAST(rev AS DOUBLE) AS revenue,
           CAST(ppb AS DOUBLE) / 1000000000.0 AS cum_share,
           CASE WHEN ppb <= {ABC_A_PPB} THEN 'A'
                WHEN ppb <= {ABC_B_PPB} THEN 'B'
                ELSE 'C' END AS abc_class
    FROM p
"""


RELATIONAL_QUERIES["regional_supplier_revenue"] = (
    q_regional_supplier_revenue,
    ORACLES["regional_supplier_revenue"],
)
RELATIONAL_QUERIES["customer_rfm"] = (
    q_customer_rfm,
    ORACLES["customer_rfm"],
)
RELATIONAL_QUERIES["orders_abc_pareto"] = (
    q_orders_abc_pareto,
    ORACLES["orders_abc_pareto"],
)


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: per (returnflag, linestatus), the
    full battery of sums/averages over shipped lineitems — the canonical
    wide-aggregate scan benchmark.

    Scale shape: the textbook one-pass plan — pushed ship-date filter,
    pruned columns, ONE map-side-combined aggregate over a 6-ish-group
    key space (the exchange moves |groups| x |map partitions| rows, not
    data). Sums run in DECIMAL (order-independent); averages divide the
    exact decimal sums by the exact count once, in double, rounded to
    the 1e-12 grid (the established cross-engine contract).
    """
    li = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02")
    )
    qty = F.col("l_quantity").cast("decimal(18,2)")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    tax = F.col("l_tax").cast("decimal(18,2)")
    one = F.lit(1).cast("decimal(18,2)")
    agg = (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).alias("sum_qty"),
            F.sum(price).alias("sum_base_price"),
            F.sum((price * (one - disc)).cast("decimal(38,4)")).alias(
                "sum_disc_price"
            ),
            F.sum(
                (price * (one - disc) * (one + tax)).cast("decimal(38,6)")
            ).alias("sum_charge"),
            F.sum(disc).alias("sum_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )
    n = F.col("count_order").cast("double")
    return agg.select(
        "l_returnflag",
        "l_linestatus",
        F.col("sum_qty").cast("double").alias("sum_qty"),
        F.col("sum_base_price").cast("double").alias("sum_base_price"),
        F.col("sum_disc_price").cast("double").alias("sum_disc_price"),
        F.col("sum_charge").cast("double").alias("sum_charge"),
        F.round(F.col("sum_qty").cast("double") / n, 6).alias("avg_qty"),
        F.round(F.col("sum_base_price").cast("double") / n, 6).alias(
            "avg_price"
        ),
        F.round(F.col("sum_disc").cast("double") / n, 6).alias("avg_disc"),
        F.col("count_order"),
    )


ORACLES["pricing_summary"] = """
    WITH a AS (
      SELECT l_returnflag, l_linestatus,
             SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS sum_base_price,
             SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                  * (1 - CAST(l_discount AS DECIMAL(18,2)))
                  AS DECIMAL(38,4))) AS sum_disc_price,
             SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                  * (1 - CAST(l_discount AS DECIMAL(18,2)))
                  * (1 + CAST(l_tax AS DECIMAL(18,2)))
                  AS DECIMAL(38,6))) AS sum_charge,
             SUM(CAST(l_discount AS DECIMAL(18,2))) AS sum_disc,
             COUNT(*)::BIGINT AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      GROUP BY l_returnflag, l_linestatus
    )
    SELECT l_returnflag, l_linestatus,
           CAST(sum_qty AS DOUBLE) AS sum_qty,
           CAST(sum_base_price AS DOUBLE) AS sum_base_price,
           CAST(sum_disc_price AS DOUBLE) AS sum_disc_price,
           CAST(sum_charge AS DOUBLE) AS sum_charge,
           round(CAST(sum_qty AS DOUBLE) / count_order, 6) AS avg_qty,
           round(CAST(sum_base_price AS DOUBLE) / count_order, 6)
             AS avg_price,
           round(CAST(sum_disc AS DOUBLE) / count_order, 6) AS avg_disc,
           count_order
    FROM a
"""


SHIP_PRIORITY_K = 10


def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped shipping priority: top-10 orders by outstanding
    revenue for one market segment, ordered before a date with lineitems
    shipped after it.

    Scale shape: both date predicates push to their scans; the segment-
    filtered customer broadcasts onto orders; orders⋈lineitem is the one
    big exchange; the top-10 plans TakeOrderedAndProject (per-partition
    partial top-K), never a global sort. Ties pinned by o_orderkey.
    """
    cust = read_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    ).select("c_custkey")
    orders = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15")
    ).select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    li = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15")
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    revenue = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)")
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue.cast("decimal(38,4)")).alias("rev"))
        .select(
            "o_orderkey",
            F.col("rev").cast("double").alias("revenue"),
            "o_orderdate",
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(SHIP_PRIORITY_K)
    )


ORACLES["shipping_priority"] = f"""
    SELECT o_orderkey,
           CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))
                AS DECIMAL(38,4))) AS DOUBLE) AS revenue,
           o_orderdate, o_orderpriority
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate  > TIMESTAMP '1998-03-15'
    GROUP BY o_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT {SHIP_PRIORITY_K}
"""


RELATIONAL_QUERIES["pricing_summary"] = (
    q_pricing_summary,
    ORACLES["pricing_summary"],
)
RELATIONAL_QUERIES["shipping_priority"] = (
    q_shipping_priority,
    ORACLES["shipping_priority"],
)


SKEW_TOP_N = 10


def q_skew_profile_custkey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostics for orders.o_custkey — the check you run
    BEFORE choosing a join strategy (salting / AQE skew-join / broadcast):
    the ``SKEW_TOP_N`` heaviest keys with their group sizes and share of
    all rows, each row also carrying the key-count and exact p50/p99
    group sizes so the heavy keys can be read against the distribution's
    body.

    Scale shape: one map-side-combined count per key; the top-N is
    TakeOrderedAndProject over the key-sized frame; the scalar stats are
    one more aggregate over the same frame, broadcast back. Exact
    ``percentile`` buffers the key-sized (not row-sized) values on one
    task — swap percentile_approx beyond ~10⁸ keys (the
    `docs_mad_outliers` note applies).

    Determinism: counts are exact ints; share is one int/int double
    division rounded to the 1e-12 grid; p50/p99 are ALSO grid-rounded
    (1e-12 — group sizes are O(10) here, well inside double resolution)
    because fractional-rank interpolation (p99) lets Spark's percentile
    and DuckDB's quantile_cont associate the (hi-lo)*frac formula
    differently and diverge in the last ulp; top-N ties pinned by key.
    """
    from filmdatawarehouse_spark.operators.cache import managed_persist

    o = read_table(spark, sf_dir, "orders").select("o_custkey")
    # key-sized frame feeds the top-N AND the stats aggregate; the total
    # row count folds into the stats pass as sum(cnt) — no separate
    # eager count() scan of the table
    counts = managed_persist(
        o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("cnt"))
    )
    stats = counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("cnt").alias("n_rows"),
        F.expr("percentile(cnt, 0.5)").alias("p50_group"),
        F.expr("percentile(cnt, 0.99)").alias("p99_group"),
    )
    top = counts.orderBy(F.col("cnt").desc(), F.col("o_custkey")).limit(
        SKEW_TOP_N
    )
    return top.crossJoin(F.broadcast(stats)).select(
        "o_custkey",
        F.col("cnt").cast("bigint").alias("cnt"),
        F.round(
            F.col("cnt").cast("double") / F.col("n_rows").cast("double"), 12
        ).alias("share"),
        F.col("n_keys").cast("bigint").alias("n_keys"),
        F.round("p50_group", 9).alias("p50_group"),
        F.round("p99_group", 9).alias("p99_group"),
    )


ORACLES["skew_profile_custkey"] = f"""
    WITH counts AS (
      SELECT o_custkey, COUNT(*)::BIGINT AS cnt FROM orders GROUP BY o_custkey
    ), stats AS (
      SELECT COUNT(*)::BIGINT AS n_keys,
             SUM(cnt)::BIGINT AS n_rows,
             round(quantile_cont(cnt, 0.5), 9) AS p50_group,
             round(quantile_cont(cnt, 0.99), 9) AS p99_group
      FROM counts
    )
    SELECT o_custkey, cnt,
           round(cnt::DOUBLE / n_rows::DOUBLE, 12) AS share,
           n_keys, p50_group, p99_group
    FROM counts, stats
    ORDER BY cnt DESC, o_custkey
    LIMIT {SKEW_TOP_N}
"""


RELATIONAL_QUERIES["skew_profile_custkey"] = (
    q_skew_profile_custkey,
    ORACLES["skew_profile_custkey"],
)
