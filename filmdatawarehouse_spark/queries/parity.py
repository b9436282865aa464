"""Reference-parity queries mapped onto the driver's TPC-H-style test corpus.

Every operator in SURVEY.md §2 (scan/project S1-S12, clean P2+D1, filter P3,
date derivations P4/P5, rename/cast P6/P7, joins J1/J2, aggregations A1-A5,
top-k O1, calendar generator S11) is exercised by at least one query here.
The reference's tables are Sakila-shaped; the harness corpus is TPC-H-shaped
(TESTDATA.md), so each query is the reference operator applied to the
equivalent-shaped table (FIXTURES.md §5: fact-to-dim joins ≈ lineitem⋈part /
orders⋈customer; date-key derivations on o_orderdate/l_shipdate).

Each entry pairs a Spark DataFrame builder ``(spark, sf_dir) -> DataFrame``
with the ANSI-SQL oracle string DuckDB runs on the same parquet files. Column
names and result types are aligned on both sides (the driver hashes values
after sorting columns by name). Determinism rules (SURVEY.md §7 phase C):
money/quantity sums go through DECIMAL (exact, order-independent — double
summation order would flip hashes), top-k has a total-order tiebreak, and
timestamps are session-UTC.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from filmdatawarehouse_spark.io.sources import read_table
from filmdatawarehouse_spark.operators.cleaning import clean
from filmdatawarehouse_spark.operators.dates import date_dimension, date_id, month_key

QueryFn = Callable[[SparkSession, str], DataFrame]

# ---------------------------------------------------------------------------
# query builders
# ---------------------------------------------------------------------------


def q_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1-S7/P1: scan + projection. Catalyst prunes the parquet ReadSchema to
    exactly these columns (the reference writes the SELECT list by hand,
    `dags/rentalFilmDAG.py:36`)."""
    return read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


def q_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2+D1: the cleaning operator (`dags/rentalFilmDAG.py:27-33`) on orders:
    any-null row drop + exact full-row dedup."""
    return clean(read_table(spark, sf_dir, "orders"))


def q_filter_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3: equality predicate pushed to the scan (`filmETLs.ipynb:620`:
    WHERE store_id = 1). PushedFilters shows [EqualTo(l_returnflag,R)]."""
    li = read_table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_shipdate"
    )


def q_dim_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S11: generated calendar dimension 2005-01-01..2006-12-31 (730 rows,
    `dags/rentalFilmDAG.py:56-65`)."""
    return date_dimension(spark)


def q_derive_date_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4/F3/F7: int YYYYMMDD date key from a timestamp
    (`dags/rentalFilmDAG.py:80`)."""
    li = read_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey", "l_linenumber", date_id("l_shipdate").alias("date_id")
    )


def q_derive_month_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5/F6: first-of-month int key year*10000+month*100+1
    (`dags/rentalFilmDAG.py:90-92`)."""
    o = read_table(spark, sf_dir, "orders")
    return o.select("o_orderkey", month_key("o_orderdate").alias("date_id"))


def q_join_inner_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: inner equi-join fact⋈dim (`dags/rentalFilmDAG.py:79`). part is the
    small side — broadcast, so the lineitem fact never shuffles."""
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part")
    return li.join(F.broadcast(p), li.l_partkey == p.p_partkey, "inner").select(
        "l_orderkey", "l_linenumber", "p_name", "p_brand", "l_quantity"
    )


def q_fact_daily_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fact_daily_inventory job shape (`dags/rentalFilmDAG.py:75-84`):
    clean → J1 broadcast join → P4 date key → A1 group-count.
    orders⋈customer stands in for rental⋈inventory (FIXTURES.md §5)."""
    o = clean(
        read_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderdate", "o_custkey"
        )
    )
    c = clean(
        read_table(spark, sf_dir, "customer").select(
            "c_custkey", "c_nationkey", "c_mktsegment"
        )
    )
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "inner")
        .withColumn("date_id", date_id("o_orderdate"))
        .groupBy("date_id", "c_nationkey", "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def q_fact_monthly_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fact_monthly_payment job shape (`dags/rentalFilmDAG.py:87-97`):
    P5 month key → A2 multi-key group-sum. DECIMAL end-to-end (the reference
    silently sums DECIMAL in float64; exact decimal is also hash-stable)."""
    o = clean(
        read_table(spark, sf_dir, "orders").select(
            "o_custkey", "o_orderstatus", "o_orderdate", "o_totalprice"
        )
    )
    return (
        o.withColumn("date_id", month_key("o_orderdate"))
        .groupBy("o_custkey", "o_orderstatus", "date_id")
        .agg(
            # sum in DECIMAL (exact, order-independent across partial aggs),
            # surface as DOUBLE (identical bits to the oracle's same cast)
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("monthly_total")
        )
    )


def q_monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4/F5: month-truncated revenue series (`filmETLs.ipynb:519-534`,
    cell 11 — monthly payment trend)."""
    o = read_table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.date_trunc("month", "o_orderdate").alias("month_start"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("monthly_revenue")
        )
    )


def q_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9/J2/A3/O1: the top-10 query (`filmETLs.ipynb:579-586`, cell 12) —
    join fact to dim, group-sum, ORDER BY DESC LIMIT 10. Spark plans
    TakeOrderedAndProject (true top-k, no full sort). Tiebreak on p_name for
    a total order (pandas/MySQL would otherwise be free to differ)."""
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey, "inner")
        .groupBy("p_name")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_quantity")
        )
        .orderBy(F.col("total_quantity").desc(), F.col("p_name"))
        .limit(10)
    )


def q_filtered_daily_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S10/P3/A5: filtered read + daily re-aggregation (`filmETLs.ipynb:
    617-624`, cell 13 — per-store daily series, WHERE store_id = 1)."""
    e = read_table(spark, sf_dir, "events")
    return (
        e.filter(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("purchase_count"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("purchase_value"),
        )
    )


def q_sql_passthrough(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8/§3.3: raw-SQL entry point — the reference ships SQL strings to MySQL
    (`filmETLs.ipynb:519-522`); the engine ships them to Catalyst via
    ``spark.sql`` over registered views."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS total_price
        FROM orders
        WHERE o_orderstatus = 'F'
        GROUP BY o_orderpriority
        """
    )


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every corpus table as a temp view for the SQL entry point."""
    from filmdatawarehouse_spark.schemas import TESTDATA_TABLES

    for name in TESTDATA_TABLES:
        read_table(spark, sf_dir, name).createOrReplaceTempView(name)


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB dialect-compatible ANSI SQL on the same parquet views)
# ---------------------------------------------------------------------------

ORACLES: dict[str, str] = {
    "scan_project": "SELECT c_custkey, c_name, c_mktsegment FROM customer",
    "clean_dropna_dedup": """
        SELECT DISTINCT *
        FROM orders
        WHERE o_orderkey IS NOT NULL AND o_custkey IS NOT NULL
          AND o_orderstatus IS NOT NULL AND o_totalprice IS NOT NULL
          AND o_orderdate IS NOT NULL AND o_orderpriority IS NOT NULL
    """,
    "filter_pushdown": """
        SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate
        FROM lineitem WHERE l_returnflag = 'R'
    """,
    "dim_date_generate": """
        SELECT CAST(strftime(d, '%Y%m%d') AS INT) AS date_id,
               d AS full_date,
               CAST(month(d) AS INT) AS month,
               CAST(year(d) AS INT) AS year
        FROM generate_series(TIMESTAMP '2005-01-01', TIMESTAMP '2006-12-31',
                             INTERVAL 1 DAY) AS t(d)
    """,
    "derive_date_id": """
        SELECT l_orderkey, l_linenumber,
               CAST(strftime(l_shipdate, '%Y%m%d') AS INT) AS date_id
        FROM lineitem
    """,
    "derive_month_key": """
        SELECT o_orderkey,
               CAST(year(o_orderdate)*10000 + month(o_orderdate)*100 + 1 AS INT)
                 AS date_id
        FROM orders
    """,
    "join_inner_equi": """
        SELECT l_orderkey, l_linenumber, p_name, p_brand, l_quantity
        FROM lineitem JOIN part ON l_partkey = p_partkey
    """,
    "fact_daily_orders": """
        WITH o AS (
          SELECT DISTINCT o_orderkey, o_orderdate, o_custkey FROM orders
          WHERE o_orderkey IS NOT NULL AND o_orderdate IS NOT NULL
            AND o_custkey IS NOT NULL
        ), c AS (
          SELECT DISTINCT c_custkey, c_nationkey, c_mktsegment FROM customer
          WHERE c_custkey IS NOT NULL AND c_nationkey IS NOT NULL
            AND c_mktsegment IS NOT NULL
        )
        SELECT CAST(strftime(o_orderdate, '%Y%m%d') AS INT) AS date_id,
               c_nationkey, c_mktsegment,
               COUNT(*) AS order_count
        FROM o JOIN c ON o_custkey = c_custkey
        GROUP BY 1, 2, 3
    """,
    "fact_monthly_totals": """
        WITH o AS (
          SELECT DISTINCT o_custkey, o_orderstatus, o_orderdate, o_totalprice
          FROM orders
          WHERE o_custkey IS NOT NULL AND o_orderstatus IS NOT NULL
            AND o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
        )
        SELECT o_custkey, o_orderstatus,
               CAST(year(o_orderdate)*10000 + month(o_orderdate)*100 + 1 AS INT)
                 AS date_id,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS monthly_total
        FROM o
        GROUP BY 1, 2, 3
    """,
    "monthly_revenue": """
        SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS monthly_revenue
        FROM orders
        GROUP BY 1
    """,
    "top10_parts": """
        SELECT p_name,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                 AS total_quantity
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_name
        ORDER BY total_quantity DESC, p_name
        LIMIT 10
    """,
    "filtered_daily_series": """
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
               COUNT(*) AS purchase_count,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                 AS purchase_value
        FROM events
        WHERE event_type = 'purchase'
        GROUP BY 1
    """,
    "sql_passthrough": """
        SELECT o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS total_price
        FROM orders
        WHERE o_orderstatus = 'F'
        GROUP BY o_orderpriority
    """,
}

PARITY_QUERIES: dict[str, tuple[QueryFn, str | None]] = {
    "scan_project": (q_scan_project, ORACLES["scan_project"]),
    "clean_dropna_dedup": (q_clean, ORACLES["clean_dropna_dedup"]),
    "filter_pushdown": (q_filter_pushdown, ORACLES["filter_pushdown"]),
    "dim_date_generate": (q_dim_date, ORACLES["dim_date_generate"]),
    "derive_date_id": (q_derive_date_id, ORACLES["derive_date_id"]),
    "derive_month_key": (q_derive_month_key, ORACLES["derive_month_key"]),
    "join_inner_equi": (q_join_inner_equi, ORACLES["join_inner_equi"]),
    "fact_daily_orders": (q_fact_daily_orders, ORACLES["fact_daily_orders"]),
    "fact_monthly_totals": (q_fact_monthly_totals, ORACLES["fact_monthly_totals"]),
    "monthly_revenue": (q_monthly_revenue, ORACLES["monthly_revenue"]),
    "top10_parts": (q_top10, ORACLES["top10_parts"]),
    "filtered_daily_series": (q_filtered_daily_series, ORACLES["filtered_daily_series"]),
    "sql_passthrough": (q_sql_passthrough, ORACLES["sql_passthrough"]),
}
