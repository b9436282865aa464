"""Market-basket co-occurrence mining over lineitem — the A-Priori
frequent-pair shape: prune to frequent items FIRST (support counts
broadcast), pair-generate only within orders, then lift-score the
surviving pairs.

No reference analog (SURVEY.md §2 — the reference has no cross-row
analytics); this certifies the co-occurrence/self-join family.

Scale shape: the item-support prune is the whole algorithm at 100 TB —
the within-order self-join is quadratic in basket size, so dropping
infrequent items before pairing bounds it; the pair aggregation is
map-side combinable on (part_a, part_b). The order-key self-join shuffles
once on the order key; item counts and the order total are broadcast.
The distinct (order, part) frame is materialized once (managed_persist)
because four plan branches consume it — unpersisted, Catalyst re-ran the
scan + distinct shuffle per branch (7 lineitem scans / 5 distinct
exchanges in the executed plan; r09 committed bench record: warm
3.77s -> 2.42s at sf0.1, 0.58x drift-adjusted, from the single
materialization). Lift is computed from exact integer counts in
one identical double expression on both engines, so it hash-compares
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from filmdatawarehouse_spark.io.sources import read_table

MIN_ITEM_SUPPORT = 5  # item must appear in >= N distinct orders
MIN_PAIR_SUPPORT = 3  # pair must co-occur in >= N orders


def q_basket_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from filmdatawarehouse_spark.operators.cache import managed_persist

    # The distinct (order, part) frame feeds FOUR plan branches (item
    # support, both self-join sides, the order total); unpersisted, each
    # branch re-runs the full scan + distinct shuffle — the executed plan
    # showed lineitem scanned 7x and the distinct exchanged 5x. One
    # materialization serves all branches; `frequent` likewise feeds the
    # semi-join prune and both lift join-backs.
    li = managed_persist(
        read_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    item = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_item"))
    frequent = managed_persist(item.filter(F.col("n_item") >= MIN_ITEM_SUPPORT))
    # An explicit order-key repartition of the pair-join input (the
    # VERDICT r16 item-5 candidate) was A/B'd at widths 8/16/32 in r17
    # and measured FLAT to slightly negative (12 interleaved cold runs:
    # no-repartition medians 2.86-2.88 s and the most stable; width 16
    # min 2.65 s but median 3.04 s with a 4.1 s outlier) — the
    # within-order explosion at this SF is not single-task-bound (the
    # distinct already leaves ~3 scan partitions and AQE sizes the
    # li exchange), so the extra exchange only adds variance. Left at
    # AQE sizing; OPTIMIZATION_r17.md has the table.
    d = li.join(
        F.broadcast(frequent.select("l_partkey")), "l_partkey", "left_semi"
    )
    a = d.select(
        F.col("l_orderkey"), F.col("l_partkey").alias("part_a")
    )
    b = d.select(
        F.col("l_orderkey"), F.col("l_partkey").alias("part_b")
    )
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_cooccur"))
        .filter(F.col("n_cooccur") >= MIN_PAIR_SUPPORT)
    )
    n_orders = li.select("l_orderkey").distinct().agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    na = frequent.select(
        F.col("l_partkey").alias("part_a"), F.col("n_item").alias("n_a")
    )
    nb = frequent.select(
        F.col("l_partkey").alias("part_b"), F.col("n_item").alias("n_b")
    )
    return (
        pairs.join(F.broadcast(na), "part_a")
        .join(F.broadcast(nb), "part_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "part_a",
            "part_b",
            "n_cooccur",
            (
                F.col("n_cooccur").cast("double")
                * F.col("n_orders").cast("double")
                / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
            ).alias("lift"),
        )
    )


BASKET_ORACLE = f"""
    WITH d0 AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), item AS (
      SELECT l_partkey, count(*)::BIGINT AS n_item FROM d0 GROUP BY l_partkey
    ), freq AS (
      SELECT * FROM item WHERE n_item >= {MIN_ITEM_SUPPORT}
    ), d AS (
      SELECT d0.* FROM d0 JOIN freq USING (l_partkey)
    ), pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             count(*)::BIGINT AS n_cooccur
      FROM d a JOIN d b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY part_a, part_b
      HAVING count(*) >= {MIN_PAIR_SUPPORT}
    ), tot AS (
      SELECT count(DISTINCT l_orderkey)::BIGINT AS n_orders FROM d0
    )
    SELECT part_a, part_b, n_cooccur,
           n_cooccur::DOUBLE * n_orders::DOUBLE
             / (fa.n_item::DOUBLE * fb.n_item::DOUBLE) AS lift
    FROM pairs
    JOIN freq fa ON fa.l_partkey = part_a
    JOIN freq fb ON fb.l_partkey = part_b
    CROSS JOIN tot
"""

BASKET_QUERIES = {
    "basket_part_pairs": (q_basket_part_pairs, BASKET_ORACLE),
}
