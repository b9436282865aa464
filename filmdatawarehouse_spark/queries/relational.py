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


ORACLES: dict[str, str] = {
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
}

RELATIONAL_QUERIES: dict[str, Entry] = {
    "window_topn_per_group": (q_window_topn_per_group, ORACLES["window_topn_per_group"]),
    "rollup_order_stats": (q_rollup_order_stats, ORACLES["rollup_order_stats"]),
    "set_ops_customers": (q_set_ops_customers, ORACLES["set_ops_customers"]),
    "count_distinct": (q_count_distinct, ORACLES["count_distinct"]),
    "asof_join_events": (q_asof_join_events, ORACLES["asof_join_events"]),
    "range_join_events": (q_range_join_events, ORACLES["range_join_events"]),
}
