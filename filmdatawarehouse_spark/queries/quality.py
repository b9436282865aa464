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
            q.check_accepted_values(
                orders, "o_orderstatus", ["O", "F", "P"], "orders_status_domain"
            ),
            # deterministic clock: explicit literal 'now', generous age so
            # the check passes at every SF; that it FIRES on stale/empty
            # feeds is pinned by tests/test_quality.py
            q.check_freshness(
                events,
                "ts",
                100 * 365 * 86400,
                "2030-01-01 00:00:00",
                "events_freshness",
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
    UNION ALL
    SELECT 'orders_status_domain',
           COUNT(*) FILTER (
             NOT COALESCE(o_orderstatus IN ('O', 'F', 'P'), FALSE))::BIGINT,
           (COUNT(*) FILTER (
             NOT COALESCE(o_orderstatus IN ('O', 'F', 'P'), FALSE)) = 0)::INT
    FROM orders
    UNION ALL
    SELECT 'events_freshness',
           (CASE WHEN max(ts) IS NULL THEN 1
                 WHEN epoch(TIMESTAMP '2030-01-01 00:00:00')
                      - epoch(max(ts)) > 100::BIGINT * 365 * 86400 THEN 1
                 ELSE 0 END)::BIGINT,
           (CASE WHEN max(ts) IS NULL THEN 0
                 WHEN epoch(TIMESTAMP '2030-01-01 00:00:00')
                      - epoch(max(ts)) > 100::BIGINT * 365 * 86400 THEN 0
                 ELSE 1 END)::INT
    FROM events
"""

QUALITY_QUERIES = {
    "dq_checks": (q_dq_checks, DQ_ORACLE),
}


MAD_K = 3.0


def q_docs_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust length-outlier detection per source: a document is flagged
    when |n_chars − median| > 3 × MAD of its source group — the
    median/MAD rule that, unlike the z-score, one bot dumping 100 MB docs
    cannot drag (mean and stddev move with the outlier; median and MAD
    don't).

    Two-pass by definition (the deviation median depends on the length
    median): two per-group exact-median aggregations with the per-group
    stats broadcast back — group count is |sources| (tiny), so both joins
    are broadcast and the corpus shuffles on `source` twice at worst.

    100 TB note: exact ``median`` buffers each group's values on the
    aggregating task — certification-grade here; at corpus scale swap
    ``percentile_approx`` and certify the sketch like ``sketch_accuracy``
    does. Determinism: integer medians interpolate to exact .0/.5 halves
    in double in both engines; the comparison is exact-double arithmetic.
    """
    d = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    med = d.groupBy("source").agg(F.median("n_chars").alias("med"))
    dev = d.join(F.broadcast(med), "source").withColumn(
        "adev", F.abs(F.col("n_chars").cast("double") - F.col("med"))
    )
    mad = dev.groupBy("source").agg(F.median("adev").alias("mad"))
    return (
        dev.join(F.broadcast(mad), "source")
        .filter(F.col("adev") > F.lit(MAD_K) * F.col("mad"))
        .select("doc_id", "source", "n_chars", "med", "mad")
    )


MAD_ORACLE = f"""
    WITH med AS (
      SELECT source, median(n_chars) AS med FROM documents GROUP BY source
    ), dev AS (
      SELECT d.doc_id, d.source, d.n_chars, m.med,
             abs(d.n_chars::DOUBLE - m.med) AS adev
      FROM documents d JOIN med m USING (source)
    ), mad AS (
      SELECT source, median(adev) AS mad FROM dev GROUP BY source
    )
    SELECT dev.doc_id, dev.source, dev.n_chars, dev.med, mad.mad
    FROM dev JOIN mad USING (source)
    WHERE dev.adev > {MAD_K!r} * mad.mad
"""

QUALITY_QUERIES["docs_mad_outliers"] = (q_docs_mad_outliers, MAD_ORACLE)
