"""Oracle-checked data-quality report over the orders table
(operators/quality.py): uniqueness, mandatory columns, range invariants,
and referential integrity against customer. The synthetic corpus is clean,
so every check passes here; that the checks actually FIRE on violations is
pinned by the fixture test (tests/test_quality.py) with planted
duplicates, nulls, orphans, and out-of-range rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from filmdatawarehouse_spark.io.sources import read_table
from filmdatawarehouse_spark.operators import quality as q


def q_dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    events = read_table(spark, sf_dir, "events")
    return q.run_checks(
        [
            q.check_unique(orders, ["o_orderkey"], "orders_pk_unique"),
            q.check_not_null(orders, "o_orderdate", "orders_date_not_null"),
            q.check_range(
                orders,
                F.col("o_totalprice") > 0,
                "orders_totalprice_positive",
            ),
            q.check_foreign_key(
                orders, "o_custkey", customer, "c_custkey", "orders_custkey_fk"
            ),
            q.check_range(
                events, F.col("value") >= 0, "events_value_nonnegative"
            ),
        ]
    )


DQ_ORACLE = """
    SELECT 'orders_pk_unique' AS check_name,
           COALESCE(SUM(n - 1), 0)::BIGINT AS n_violations,
           (COALESCE(SUM(n - 1), 0) = 0)::INT AS passed
    FROM (SELECT count(*) AS n FROM orders GROUP BY o_orderkey HAVING count(*) > 1)
    UNION ALL
    SELECT 'orders_date_not_null',
           COUNT(*) FILTER (o_orderdate IS NULL)::BIGINT,
           (COUNT(*) FILTER (o_orderdate IS NULL) = 0)::INT
    FROM orders
    UNION ALL
    SELECT 'orders_totalprice_positive',
           COUNT(*) FILTER (NOT COALESCE(o_totalprice > 0, FALSE))::BIGINT,
           (COUNT(*) FILTER (NOT COALESCE(o_totalprice > 0, FALSE)) = 0)::INT
    FROM orders
    UNION ALL
    SELECT 'orders_custkey_fk',
           COUNT(*)::BIGINT,
           (COUNT(*) = 0)::INT
    FROM orders
    WHERE o_custkey IS NOT NULL
      AND NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey)
    UNION ALL
    SELECT 'events_value_nonnegative',
           COUNT(*) FILTER (NOT COALESCE(value >= 0, FALSE))::BIGINT,
           (COUNT(*) FILTER (NOT COALESCE(value >= 0, FALSE)) = 0)::INT
    FROM events
"""

QUALITY_QUERIES = {
    "dq_checks": (q_dq_checks, DQ_ORACLE),
}
