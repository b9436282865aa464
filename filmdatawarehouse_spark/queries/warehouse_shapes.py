"""Round-8 warehouse query shapes: the EXISTS / anti / rollup / pivot /
histogram / top-k-per-group and TPC-H-analogue (Q4/Q6/Q10/Q14/Q18/Q19)
surfaces every warehouse workload contains, plus corpus-split contamination.

SURVEY.md §2.3-§2.7 note the reference (a 170-line pandas DAG,
`dags/rentalFilmDAG.py`) has none of these; they're table stakes for an
engine a reference user would switch to. Each query is declarative
DataFrame algebra — Catalyst pushes the date/brand predicates to the scans,
broadcasts every dim-sized side, and plans the single keyed shuffle the
shape actually requires.

Cross-engine determinism follows the repo contract (SCALING.md "hash-gate
rules"): money sums run in DECIMAL end to end and cast to double exactly
once at the output edge; O(1) ratios round to the 1e-12 grid, O(10)
percentages to 1e-9; raw parquet doubles are compared/min'd but never
re-derived through float arithmetic on both engines independently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from filmdatawarehouse_spark.io.sources import read_table
from filmdatawarehouse_spark.queries.registry import Entry

WAREHOUSE_SHAPE_QUERIES: dict[str, Entry] = {}
ORACLES: dict[str, str] = {}


def _dec(col: str, scale: str = "decimal(18,2)") -> F.Column:
    return F.col(col).cast(scale)


# --------------------------------------------------------------------------
# revenue_forecast_q6 — TPC-H Q6 shape
# --------------------------------------------------------------------------

Q6_YEAR_LO = "1996-01-01"
Q6_YEAR_HI = "1997-01-01"
Q6_DISC_LO, Q6_DISC_HI = 0.05, 0.07
Q6_QTY_MAX = 24


def q_revenue_forecast_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-shaped revenue-change forecast: revenue a blanket discount
    change would have touched — sum(extendedprice*discount) over one ship
    year, a discount band, and small quantities.

    Scale shape: the canonical pushdown benchmark — ALL three predicates
    reach the parquet scan (shipdate min/max prunes row groups), two
    columns read beyond the filter set, one partial+final aggregate over a
    single global group: the exchange moves one row per map partition.

    Determinism: the band predicates compare raw parquet doubles (the
    corpus discounts are exact binary-representable snaps of 0.00..0.10 —
    no arithmetic, identical row set in both engines); the product runs in
    DECIMAL(38,4) and casts to double once.
    """
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(Q6_YEAR_LO))
        & (F.col("l_shipdate") < F.lit(Q6_YEAR_HI))
        & (F.col("l_discount") >= Q6_DISC_LO)
        & (F.col("l_discount") <= Q6_DISC_HI)
        & (F.col("l_quantity") < Q6_QTY_MAX)
    )
    return li.agg(
        F.sum(
            (_dec("l_extendedprice") * _dec("l_discount")).cast("decimal(38,4)")
        )
        .cast("double")
        .alias("revenue_delta"),
        F.count(F.lit(1)).alias("n_lines"),
    )


ORACLES["revenue_forecast_q6"] = f"""
    SELECT CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                     * CAST(l_discount AS DECIMAL(18,2))
                     AS DECIMAL(38,4))) AS DOUBLE) AS revenue_delta,
           COUNT(*)::BIGINT AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '{Q6_YEAR_LO}'
      AND l_shipdate <  TIMESTAMP '{Q6_YEAR_HI}'
      AND l_discount BETWEEN {Q6_DISC_LO} AND {Q6_DISC_HI}
      AND l_quantity < {Q6_QTY_MAX}
"""


# --------------------------------------------------------------------------
# returned_items_topk — TPC-H Q10 shape
# --------------------------------------------------------------------------

Q10_DATE_LO = "1996-01-01"
Q10_DATE_HI = "1996-07-01"
Q10_K = 20


def q_returned_items_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-shaped returned-item report: the top-20 customers by
    revenue lost to returns for orders placed in one half-year, with their
    nation attached.

    Scale shape: order-date predicate pushes to the orders scan, return
    flag to lineitem; customer and nation broadcast; the one big exchange
    is orders⋈lineitem on orderkey; the top-20 is TakeOrderedAndProject
    over the customer-sized aggregate (never a global sort of the fact).

    Determinism: revenue is an exact DECIMAL(38,4) sum — the ORDER BY
    compares decimals, not doubles, so the top-k boundary is engine-
    independent; ties pinned by c_custkey; cast to double only in the
    output projection.
    """
    o = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(Q10_DATE_LO))
        & (F.col("o_orderdate") < F.lit(Q10_DATE_HI))
    )
    li = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    rev = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_custkey")
        .agg(
            F.sum(
                (
                    _dec("l_extendedprice")
                    * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
                ).cast("decimal(38,4)")
            ).alias("rev_dec")
        )
    )
    return (
        rev.join(F.broadcast(c), rev["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .orderBy(F.col("rev_dec").desc(), F.col("c_custkey"))
        .limit(Q10_K)
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            F.col("rev_dec").cast("double").alias("lost_revenue"),
        )
    )


ORACLES["returned_items_topk"] = f"""
    WITH rev AS (
      SELECT o.o_custkey,
             SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2))
                  * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
                  AS DECIMAL(38,4))) AS rev_dec
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE l.l_returnflag = 'R'
        AND o.o_orderdate >= TIMESTAMP '{Q10_DATE_LO}'
        AND o.o_orderdate <  TIMESTAMP '{Q10_DATE_HI}'
      GROUP BY o.o_custkey
    )
    SELECT c.c_custkey, c.c_name, n.n_name,
           CAST(rev_dec AS DOUBLE) AS lost_revenue
    FROM rev
    JOIN customer c ON rev.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    ORDER BY rev_dec DESC, c.c_custkey
    LIMIT {Q10_K}
"""


# --------------------------------------------------------------------------
# promo_revenue_monthly — TPC-H Q14 shape, per month
# --------------------------------------------------------------------------


def q_promo_revenue_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-shaped promotion effect, tracked per ship month: the
    percentage of revenue from PROMO-type parts, for every month in the
    corpus.

    Scale shape: part (dim-sized) broadcasts onto lineitem; one keyed
    aggregate on the ~dozens-of-months key space; the CASE folds into the
    same partial aggregation (no second pass for the numerator).

    Determinism: numerator and denominator are exact DECIMAL(38,4) sums;
    the percentage is ONE double division rounded to the 1e-9 grid (an
    O(100) value — per the magnitude-aware grid contract).
    """
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part")
    disc_price = (
        _dec("l_extendedprice")
        * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
    ).cast("decimal(38,4)")
    agg = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy(
            (F.year("l_shipdate") * 100 + F.month("l_shipdate"))
            .cast("int")
            .alias("ship_month")
        )
        .agg(
            F.sum(
                F.when(F.col("p_type") == "PROMO", disc_price).otherwise(
                    F.lit(0).cast("decimal(38,4)")
                )
            ).alias("promo_dec"),
            F.sum(disc_price).alias("total_dec"),
        )
    )
    return agg.select(
        "ship_month",
        F.round(
            F.lit(100.0)
            * F.col("promo_dec").cast("double")
            / F.col("total_dec").cast("double"),
            9,
        ).alias("promo_pct"),
        F.col("total_dec").cast("double").alias("total_revenue"),
    )


ORACLES["promo_revenue_monthly"] = """
    WITH m AS (
      SELECT (EXTRACT(year FROM l_shipdate) * 100
              + EXTRACT(month FROM l_shipdate))::INT AS ship_month,
             SUM(CASE WHEN p.p_type = 'PROMO'
                 THEN CAST(CAST(l.l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
                      AS DECIMAL(38,4))
                 ELSE CAST(0 AS DECIMAL(38,4)) END) AS promo_dec,
             SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2))
                  * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
                  AS DECIMAL(38,4))) AS total_dec
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1
    )
    SELECT ship_month,
           round(100.0 * CAST(promo_dec AS DOUBLE)
                 / CAST(total_dec AS DOUBLE), 9) AS promo_pct,
           CAST(total_dec AS DOUBLE) AS total_revenue
    FROM m
"""


# --------------------------------------------------------------------------
# large_volume_customers — TPC-H Q18 shape
# --------------------------------------------------------------------------

Q18_QTY_THRESHOLD = 250


def q_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-shaped large-volume-order report: orders whose total
    quantity exceeds the threshold (top ~1% of the order-size distribution
    — p99 is 262 on this corpus), with the placing customer attached.

    Scale shape: the HAVING runs on the orderkey-grouped lineitem BEFORE
    any join — the filter collapses the fact to the handful of qualifying
    orders, then orders joins that tiny frame and customer broadcasts.
    The wrong plan (join first, filter later) would shuffle the full fact
    twice; this one shuffles it once, on its natural key.

    Determinism: quantities are small integers in doubles — sums are exact
    regardless of order; the > threshold boundary is integer-exact.
    """
    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > Q18_QTY_THRESHOLD)
    )
    return (
        o.join(big, o["o_orderkey"] == big["l_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.col("sum_qty").cast("double").alias("sum_qty"),
        )
    )


ORACLES["large_volume_customers"] = f"""
    WITH big AS (
      SELECT l_orderkey, SUM(l_quantity) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(l_quantity) > {Q18_QTY_THRESHOLD}
    )
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate,
           o.o_totalprice, CAST(big.sum_qty AS DOUBLE) AS sum_qty
    FROM orders o
    JOIN big ON o.o_orderkey = big.l_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
"""


# --------------------------------------------------------------------------
# disjunctive_revenue — TPC-H Q19 shape
# --------------------------------------------------------------------------

_Q19_ARMS = [
    ("Brand#12", 1, 5, 1, 11),
    ("Brand#23", 1, 10, 10, 20),
    ("Brand#3", 20, 30, 20, 30),
]


def q_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-shaped disjunctive predicate revenue: an OR of three
    (brand, size-range, quantity-range) conjunctions across the
    lineitem⋈part join — the shape that defeats naive pushdown because no
    single conjunct is common to all arms.

    Scale shape: part broadcasts; the brand disjunction
    (p_brand IN (...)) DOES factor out and prunes the broadcast side
    before the join; the residual per-arm ranges evaluate post-join inside
    codegen. One global aggregate.
    """
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part").filter(
        F.col("p_brand").isin([a[0] for a in _Q19_ARMS])
    )
    arm = None
    for brand, size_lo, size_hi, qty_lo, qty_hi in _Q19_ARMS:
        cond = (
            (F.col("p_brand") == brand)
            & (F.col("p_size") >= size_lo)
            & (F.col("p_size") <= size_hi)
            & (F.col("l_quantity") >= qty_lo)
            & (F.col("l_quantity") <= qty_hi)
        )
        arm = cond if arm is None else (arm | cond)
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .filter(arm)
        .agg(
            F.sum(
                (
                    _dec("l_extendedprice")
                    * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
                ).cast("decimal(38,4)")
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


_Q19_ARM_SQL = " OR ".join(
    f"(p.p_brand = '{b}' AND p.p_size BETWEEN {slo} AND {shi}"
    f" AND l.l_quantity BETWEEN {qlo} AND {qhi})"
    for b, slo, shi, qlo, qhi in _Q19_ARMS
)

ORACLES["disjunctive_revenue"] = f"""
    SELECT CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
                 AS DECIMAL(38,4))) AS DOUBLE) AS revenue,
           COUNT(*)::BIGINT AS n_lines
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE {_Q19_ARM_SQL}
"""


# --------------------------------------------------------------------------
# orders_exists_late_lines — TPC-H Q4 shape (EXISTS via left-semi)
# --------------------------------------------------------------------------

LATE_AFTER_DAYS = 90
Q4_DATE_LO = "1996-01-01"
Q4_DATE_HI = "1997-01-01"


def q_orders_exists_late_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-shaped order-priority check: orders placed in one year
    with at least ONE late line (shipped > 90 days after the order date —
    the corpus has no commit/receipt dates, so lateness is ship-vs-order
    lag; reference `dags/rentalFilmDAG.py` has no EXISTS shape at all),
    counted per priority.

    Scale shape: EXISTS compiles to a LEFT SEMI join — the probe stops at
    the first matching line, never multiplies orders by their line count,
    and the non-equi lateness residual rides the equi-join on orderkey.
    The date window pushes to the orders scan before the join.

    Determinism: timestamp + literal day interval on midnight-aligned
    timestamps — exact in both engines; counts are exact ints.
    """
    o = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(Q4_DATE_LO))
        & (F.col("o_orderdate") < F.lit(Q4_DATE_HI))
    )
    li = read_table(spark, sf_dir, "lineitem")
    late = o.join(
        li,
        (o["o_orderkey"] == li["l_orderkey"])
        & (
            li["l_shipdate"]
            > o["o_orderdate"] + F.expr(f"INTERVAL {LATE_AFTER_DAYS} DAYS")
        ),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders")
    )


ORACLES["orders_exists_late_lines"] = f"""
    SELECT o.o_orderpriority, COUNT(*)::BIGINT AS n_orders
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '{Q4_DATE_LO}'
      AND o.o_orderdate <  TIMESTAMP '{Q4_DATE_HI}'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL {LATE_AFTER_DAYS} DAY
      )
    GROUP BY o.o_orderpriority
"""


# --------------------------------------------------------------------------
# priority_lines_by_status — fact⋈fact group report
# --------------------------------------------------------------------------


def q_priority_lines_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line volume and revenue per (order priority × line status) — the
    plain two-fact join+group report (the reference's only join is
    fact⋈date-dim, `dags/rentalFilmDAG.py:88`; this is the fact⋈fact
    version on the natural key).

    Scale shape: one shuffle on orderkey for the join (both sides keyed),
    then a map-side-combined aggregate over a 10-group key space — the
    second exchange moves |groups| × |partitions| rows only.
    """
    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_orderpriority", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum("l_quantity").cast("double").alias("sum_qty"),
            F.sum(
                (
                    _dec("l_extendedprice")
                    * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
                ).cast("decimal(38,4)")
            )
            .cast("double")
            .alias("revenue"),
        )
    )


ORACLES["priority_lines_by_status"] = """
    SELECT o.o_orderpriority, l.l_linestatus,
           COUNT(*)::BIGINT AS n_lines,
           CAST(SUM(l.l_quantity) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
                AS DECIMAL(38,4))) AS DOUBLE) AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority, l.l_linestatus
"""


# --------------------------------------------------------------------------
# part_min_price_per_type — TPC-H Q2-shaped correlated min
# --------------------------------------------------------------------------


def q_part_min_price_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-shaped correlated minimum: for every part type, the
    part(s) selling at that type's minimum retail price (the corpus has no
    partsupp, so the correlated min runs on part itself).

    Scale shape: aggregate-then-join-back — the per-type min is a 6-row
    frame that BROADCASTS back onto part; Catalyst decorrelates the
    equivalent subquery to this same plan, written explicitly here.

    Determinism: min is a selection (no arithmetic) over raw parquet
    doubles, and the join-back compares the selected value for equality —
    bit-identical in both engines.
    """
    p = read_table(spark, sf_dir, "part")
    mins = p.groupBy(F.col("p_type").alias("t_type")).agg(
        F.min("p_retailprice").alias("min_price")
    )
    return (
        p.join(
            F.broadcast(mins),
            (p["p_type"] == mins["t_type"])
            & (p["p_retailprice"] == mins["min_price"]),
        )
        .select("p_type", "p_partkey", "p_name", "p_retailprice")
    )


ORACLES["part_min_price_per_type"] = """
    SELECT p_type, p_partkey, p_name, p_retailprice
    FROM part p
    WHERE p_retailprice = (
      SELECT MIN(i.p_retailprice) FROM part i WHERE i.p_type = p.p_type
    )
"""


# --------------------------------------------------------------------------
# customers_anti_orders — TPC-H Q22 shape (anti join + scalar subquery)
# --------------------------------------------------------------------------

LAPSED_SINCE = "2000-01-01"


def q_customers_anti_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-shaped lapsed-high-value-customer report: customers whose
    balance exceeds the average positive balance and who placed NO order
    since the cutoff — the scalar-subquery + NOT EXISTS shape, as one
    broadcast scalar and one anti join.

    Scale shape: the threshold is a 1-row aggregate broadcast onto
    customer; the anti join probes only date-filtered orders (predicate
    pushed to the scan). No NOT IN materialization, no correlated re-scan.

    Determinism: the threshold is an exact DECIMAL sum divided by an exact
    count ONCE in double (IEEE division is correctly rounded in both
    engines — SCALING.md hash-gate rules); c_acctbal compares raw parquet
    doubles against it.
    """
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit(LAPSED_SINCE)
    )
    thr = c.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(_dec("c_acctbal")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("avg_bal")
    )
    rich = c.crossJoin(F.broadcast(thr)).filter(
        F.col("c_acctbal") > F.col("avg_bal")
    )
    return rich.join(
        o, rich["c_custkey"] == o["o_custkey"], "left_anti"
    ).select("c_custkey", "c_name", "c_acctbal")


ORACLES["customers_anti_orders"] = f"""
    WITH thr AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
             / COUNT(*) AS avg_bal
      FROM customer WHERE c_acctbal > 0
    )
    SELECT c.c_custkey, c.c_name, c.c_acctbal
    FROM customer c, thr
    WHERE c.c_acctbal > thr.avg_bal
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '{LAPSED_SINCE}'
      )
"""


# --------------------------------------------------------------------------
# orders_rollup_totals — ROLLUP over (year, status)
# --------------------------------------------------------------------------


def q_orders_rollup_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP subtotals over (order year, status): per-(year,status) rows,
    per-year subtotals, and the grand total in ONE grouping-sets pass —
    the time×dimension rollup every warehouse dashboard page runs (the
    sibling `rollup_order_stats` rolls up two categorical keys; this one
    exercises the derived-time-key axis).

    Determinism: year() is exact; money sums in DECIMAL cast to double
    once; NULL subtotal keys hash identically in both engines.
    """
    o = read_table(spark, sf_dir, "orders")
    return (
        o.withColumn("o_year", F.year("o_orderdate").cast("int"))
        .rollup("o_year", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_dec("o_totalprice")).cast("double").alias("total_price"),
        )
    )


ORACLES["orders_rollup_totals"] = """
    SELECT EXTRACT(year FROM o_orderdate)::INT AS o_year,
           o_orderstatus,
           COUNT(*)::BIGINT AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_price
    FROM orders
    GROUP BY ROLLUP (o_year, o_orderstatus)
"""


# --------------------------------------------------------------------------
# events_pivot_type_daily — conditional-aggregation pivot on the event fact
# --------------------------------------------------------------------------

_EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]


def q_events_pivot_type_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily event matrix: one row per day, one count column per event
    type plus the row total — the pivot shape on the event stream.

    Like `pivot_orders`, compiled to conditional aggregation over the
    KNOWN type list rather than ``df.pivot``: one shuffle (partial+final
    count) instead of pivotfirst's two exchanges, and the output schema is
    static (a 100 TB pivot with a driver-side distinct-values pass is a
    full extra scan).
    """
    e = read_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias(
                "day"
            )
        )
        .agg(
            *[
                F.count(F.when(F.col("event_type") == t, 1)).alias(f"n_{t}")
                for t in _EVENT_TYPES
            ],
            F.count(F.lit(1)).alias("n_total"),
        )
    )


ORACLES["events_pivot_type_daily"] = """
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           COUNT(*) FILTER (event_type = 'click')::BIGINT AS n_click,
           COUNT(*) FILTER (event_type = 'view')::BIGINT AS n_view,
           COUNT(*) FILTER (event_type = 'purchase')::BIGINT AS n_purchase,
           COUNT(*) FILTER (event_type = 'signup')::BIGINT AS n_signup,
           COUNT(*) FILTER (event_type = 'error')::BIGINT AS n_error,
           COUNT(*)::BIGINT AS n_total
    FROM events GROUP BY 1
"""


# --------------------------------------------------------------------------
# acctbal_histogram — fixed-width histogram
# --------------------------------------------------------------------------

HIST_LO = -1000.0
HIST_WIDTH = 500.0
HIST_BINS = 22  # covers [-1000, 10000)


def q_acctbal_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of customer balances: 22 bins of width 500
    over [-1000, 10000) — the distribution profile every data-quality
    dashboard draws; empty bins are omitted (both engines agree).

    Scale shape: a pure map-side expression (floor of one subtraction and
    one division) feeding a partial+final count over ≤22 groups — the
    exchange is constant-size regardless of table size.

    Determinism: (+, /, floor) are single correctly-rounded IEEE ops on
    the same parquet doubles — identical bin assignment in both engines;
    bin edges re-derive from the bin id by exact arithmetic.
    """
    c = read_table(spark, sf_dir, "customer")
    bucket = F.floor(
        (F.col("c_acctbal") - F.lit(HIST_LO)) / F.lit(HIST_WIDTH)
    ).cast("bigint")
    return (
        c.select(
            F.least(
                F.greatest(bucket, F.lit(0)), F.lit(HIST_BINS - 1)
            ).alias("bin_id")
        )
        .groupBy("bin_id")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .select(
            "bin_id",
            (F.lit(HIST_LO) + F.col("bin_id") * F.lit(HIST_WIDTH)).alias(
                "bin_lo"
            ),
            (
                F.lit(HIST_LO) + (F.col("bin_id") + 1) * F.lit(HIST_WIDTH)
            ).alias("bin_hi"),
            "n_customers",
        )
    )


ORACLES["acctbal_histogram"] = f"""
    WITH b AS (
      SELECT LEAST(GREATEST(
               FLOOR((c_acctbal - ({HIST_LO})) / {HIST_WIDTH})::BIGINT,
               0), {HIST_BINS - 1}) AS bin_id
      FROM customer
    )
    SELECT bin_id,
           {HIST_LO} + bin_id * {HIST_WIDTH} AS bin_lo,
           {HIST_LO} + (bin_id + 1) * {HIST_WIDTH} AS bin_hi,
           COUNT(*)::BIGINT AS n_customers
    FROM b GROUP BY bin_id
"""


# --------------------------------------------------------------------------
# text_topk_per_lang — top-k per group on the document corpus
# --------------------------------------------------------------------------

TOPK_PER_LANG = 5


def q_text_topk_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 longest documents per language — the per-group top-k shape a
    curation pipeline uses to eyeball each language's tail before setting
    length caps.

    Scale shape: rank-window with a pushed `rank <= k` predicate — Spark
    plans a WindowGroupLimit (running top-k inside each partition before
    the final window), so the shuffle carries ~k rows per (lang,
    partition), not the corpus.

    Determinism: ordering ties pinned by doc_id.
    """
    d = read_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    return (
        d.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= TOPK_PER_LANG)
        .select("lang", "doc_id", "n_chars", "rnk")
    )


ORACLES["text_topk_per_lang"] = f"""
    SELECT lang, doc_id, n_chars, rnk
    FROM (
      SELECT lang, doc_id, n_chars,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY n_chars DESC, doc_id)::INT AS rnk
      FROM documents
    ) WHERE rnk <= {TOPK_PER_LANG}
"""


# --------------------------------------------------------------------------
# split_contamination_rate — train/eval leakage check over the hash split
# --------------------------------------------------------------------------

FP_PREFIX_CHARS = 64


def q_split_contamination_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train→eval contamination rate: the fraction of val/test documents
    whose prefix fingerprint (md5 of the first 64 lowercased chars — the
    cheap near-dup surrogate; exact-text dups are keyed out by the
    hash_split's per-key assignment) also appears in train. The number a
    decontamination pass (`decontaminate_docs`) must drive to ~0 before an
    eval set is trustworthy.

    Scale shape: the distinct train-fingerprint frame is fingerprint-keyed
    and semi-joins the eval side on that key — one shuffle each side, no
    row multiplication (LEFT SEMI), and the rate aggregates per split
    (2 groups).

    Determinism: md5 and substring are bytewise-identical in both engines;
    the rate is one int/int double division on the 1e-12 grid.
    """
    from filmdatawarehouse_spark.operators.sampling import hash_split

    docs = hash_split(read_table(spark, sf_dir, "documents"), key="doc_id")
    fp = F.md5(F.substring(F.lower(F.col("text")), 1, FP_PREFIX_CHARS))
    docs = docs.select("doc_id", "split", fp.alias("fp"))
    train_fps = (
        docs.filter(F.col("split") == "train").select("fp").distinct()
    )
    evals = docs.filter(F.col("split") != "train")
    contaminated = evals.join(train_fps, "fp", "left_semi").groupBy(
        "split"
    ).agg(F.count(F.lit(1)).alias("n_contaminated"))
    totals = evals.groupBy("split").agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        totals.join(contaminated, "split", "left")
        .select(
            "split",
            "n_docs",
            F.coalesce(F.col("n_contaminated"), F.lit(0))
            .cast("bigint")
            .alias("n_contaminated"),
        )
        .withColumn(
            "contamination_rate",
            F.round(
                F.col("n_contaminated").cast("double")
                / F.col("n_docs").cast("double"),
                12,
            ),
        )
    )


ORACLES["split_contamination_rate"] = f"""
    WITH labeled AS (
      SELECT doc_id,
             CASE WHEN ('0x' || substr(md5('split:' || doc_id::VARCHAR),
                                       1, 8))::BIGINT % 10000 < 8000
                    THEN 'train'
                  WHEN ('0x' || substr(md5('split:' || doc_id::VARCHAR),
                                       1, 8))::BIGINT % 10000 < 9000
                    THEN 'val'
                  ELSE 'test' END AS split,
             md5(substr(lower(text), 1, {FP_PREFIX_CHARS})) AS fp
      FROM documents
    ), train_fps AS (
      SELECT DISTINCT fp FROM labeled WHERE split = 'train'
    ), evals AS (
      SELECT split, fp FROM labeled WHERE split <> 'train'
    )
    SELECT split,
           COUNT(*)::BIGINT AS n_docs,
           COUNT(*) FILTER (fp IN (SELECT fp FROM train_fps))::BIGINT
             AS n_contaminated,
           round(COUNT(*) FILTER (fp IN (SELECT fp FROM train_fps))::DOUBLE
                 / COUNT(*)::DOUBLE, 12) AS contamination_rate
    FROM evals GROUP BY split
"""


WAREHOUSE_SHAPE_QUERIES.update(
    {
        "revenue_forecast_q6": (q_revenue_forecast_q6, ORACLES["revenue_forecast_q6"]),
        "returned_items_topk": (q_returned_items_topk, ORACLES["returned_items_topk"]),
        "promo_revenue_monthly": (
            q_promo_revenue_monthly,
            ORACLES["promo_revenue_monthly"],
        ),
        "large_volume_customers": (
            q_large_volume_customers,
            ORACLES["large_volume_customers"],
        ),
        "disjunctive_revenue": (q_disjunctive_revenue, ORACLES["disjunctive_revenue"]),
        "orders_exists_late_lines": (
            q_orders_exists_late_lines,
            ORACLES["orders_exists_late_lines"],
        ),
        "priority_lines_by_status": (
            q_priority_lines_by_status,
            ORACLES["priority_lines_by_status"],
        ),
        "part_min_price_per_type": (
            q_part_min_price_per_type,
            ORACLES["part_min_price_per_type"],
        ),
        "customers_anti_orders": (
            q_customers_anti_orders,
            ORACLES["customers_anti_orders"],
        ),
        "orders_rollup_totals": (
            q_orders_rollup_totals,
            ORACLES["orders_rollup_totals"],
        ),
        "events_pivot_type_daily": (
            q_events_pivot_type_daily,
            ORACLES["events_pivot_type_daily"],
        ),
        "acctbal_histogram": (q_acctbal_histogram, ORACLES["acctbal_histogram"]),
        "text_topk_per_lang": (q_text_topk_per_lang, ORACLES["text_topk_per_lang"]),
        "split_contamination_rate": (
            q_split_contamination_rate,
            ORACLES["split_contamination_rate"],
        ),
    }
)
