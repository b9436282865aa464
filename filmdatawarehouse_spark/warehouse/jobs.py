"""The seven dimensional-model jobs, rebuilt as lazy Spark plans.

Reference parity (SURVEY.md §1.1/§2): each job reads operational tables,
cleans them (any-null drop + exact dedup), derives keys, aggregates, and
yields a dim/fact DataFrame. The reference runs these as seven eager pandas
functions (`dags/rentalFilmDAG.py:35-97`); here each is one Catalyst plan —
scan pruning, broadcast joins, and two-phase aggregation come free.

Jobs take source DataFrames (not connection strings) so the same builders run
against parquet fixtures in tests and JDBC scans in production. Each returns
the lazy result; the runner (`filmdatawarehouse_spark.runner`) handles
dims-before-facts ordering (`dags/rentalFilmDAG.py:163-164`) and writes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from typing import Callable

from filmdatawarehouse_spark.operators.cleaning import clean
from filmdatawarehouse_spark.operators.dates import date_dimension, date_id, month_key

# Cleaner hook: (df, table_name) -> cleaned df. Default is the lazy, silent
# `clean`; pass `CleanObserver().clean` (operators/cleaning.py) to get the
# reference's per-table "Cleaned: N rows removed" log at zero extra actions.
Cleaner = Callable[[DataFrame, str], DataFrame]


def _default_clean(df: DataFrame, _name: str) -> DataFrame:
    return clean(df)


def build_dim_staff(staff: DataFrame, cleaner: Cleaner = _default_clean) -> DataFrame:
    """dim_staff (`dags/rentalFilmDAG.py:35-39`): project 4 cols + clean."""
    return cleaner(
        staff.select("staff_id", "first_name", "last_name", "store_id"), "staff"
    )


def build_dim_film(film: DataFrame, cleaner: Cleaner = _default_clean) -> DataFrame:
    """dim_film (`dags/rentalFilmDAG.py:42-46`)."""
    return cleaner(
        film.select("film_id", "title", "release_year", "language_id"), "film"
    )


def build_dim_store(store: DataFrame, cleaner: Cleaner = _default_clean) -> DataFrame:
    """dim_store (`dags/rentalFilmDAG.py:49-53`)."""
    return cleaner(store.select("store_id", "manager_staff_id", "address_id"), "store")


def build_dim_date(
    spark: SparkSession,
    start: str = "2005-01-01",
    end: str = "2006-12-31",
    cleaner: Cleaner = _default_clean,
) -> DataFrame:
    """dim_date (`dags/rentalFilmDAG.py:56-65`): generated calendar, cleaned
    for parity (a generated range has no nulls/dupes — clean is a no-op)."""
    return cleaner(date_dimension(spark, start, end), "date")


def build_dim_rental(rental: DataFrame, cleaner: Cleaner = _default_clean) -> DataFrame:
    """dim_rental (`dags/rentalFilmDAG.py:68-72`)."""
    return cleaner(
        rental.select("rental_id", "rental_date", "inventory_id", "customer_id"),
        "rental",
    )


def build_fact_daily_inventory(
    rental: DataFrame, inventory: DataFrame, cleaner: Cleaner = _default_clean
) -> DataFrame:
    """fact_daily_inventory (`dags/rentalFilmDAG.py:75-84`): one row per
    (date, film, store); inventory_count = rentals of that film at that store
    that day.

    Plan: clean both inputs → inner equi-join on inventory_id (J1; the
    inventory side is small → AQE converts to broadcast-hash join, no shuffle
    of the rental fact) → derive date_id (P4) → group-count (A1;
    ``count(*)`` — pandas ``.size()`` counts rows incl. nulls).
    """
    r = cleaner(rental.select("rental_id", "rental_date", "inventory_id"), "rental")
    i = cleaner(inventory.select("inventory_id", "film_id", "store_id"), "inventory")
    return (
        r.join(F.broadcast(i), "inventory_id", "inner")
        .withColumn("date_id", date_id("rental_date"))
        .groupBy("date_id", "film_id", "store_id")
        .agg(F.count(F.lit(1)).alias("inventory_count"))
    )


def build_fact_monthly_payment(
    payment: DataFrame, cleaner: Cleaner = _default_clean
) -> DataFrame:
    """fact_monthly_payment (`dags/rentalFilmDAG.py:87-97`): payment amounts
    summed by (staff, rental, first-of-month key).

    The reference sums DECIMAL amounts in float64 (pandas coercion); we keep
    DECIMAL end-to-end — exact, associative, and order-independent, which also
    makes results hash-stable under Spark's nondeterministic partial-agg order.
    """
    p = cleaner(
        payment.select("staff_id", "rental_id", "payment_date", "amount"), "payment"
    )
    return (
        p.withColumn("date_id", month_key("payment_date"))
        .groupBy("staff_id", "rental_id", "date_id")
        .agg(
            F.sum(F.col("amount").cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .alias("monthly_payment_total")
        )
    )


def wire_reference_dag(
    spark: SparkSession,
    sources: dict[str, DataFrame],
    write: "Callable[[str, DataFrame], None]",
    runner=None,
):
    """Wire the reference's full DAG (`dags/rentalFilmDAG.py:163-164`) into a
    JobRunner with the Observation-based cleaning log as the DEFAULT path:
    each job builds its frame with a per-job ``CleanObserver``, runs the ONE
    write action via ``write(name, df)``, then flushes the reference-format
    "Cleaned: N rows removed" lines — whose counts rode the write itself
    (CollectMetrics), never extra ``count()`` jobs (VERDICT r04 item 7;
    pinned by tests/test_warehouse_jobs.py::test_wired_dag_logs_clean_counts_without_extra_jobs).

    ``sources`` needs keys staff/film/store/rental/inventory/payment.
    Returns the runner (dims before facts, 1 retry — W1/W3 parity).
    """
    from filmdatawarehouse_spark.operators.cleaning import CleanObserver
    from filmdatawarehouse_spark.runner import JobRunner

    r = runner or JobRunner()

    def job(name: str, build) -> None:
        obs = CleanObserver()
        write(name, build(obs.clean))
        obs.flush()

    r.add("dim_staff", lambda: job("dim_staff", lambda c: build_dim_staff(sources["staff"], c)))
    r.add("dim_film", lambda: job("dim_film", lambda c: build_dim_film(sources["film"], c)))
    r.add("dim_store", lambda: job("dim_store", lambda c: build_dim_store(sources["store"], c)))
    r.add("dim_date", lambda: job("dim_date", lambda c: build_dim_date(spark, cleaner=c)))
    r.add("dim_rental", lambda: job("dim_rental", lambda c: build_dim_rental(sources["rental"], c)))
    r.add(
        "fact_monthly_payment",
        lambda: job(
            "fact_monthly_payment",
            lambda c: build_fact_monthly_payment(sources["payment"], c),
        ),
        depends_on=["dim_staff", "dim_date", "dim_rental"],
    )
    r.add(
        "fact_daily_inventory",
        lambda: job(
            "fact_daily_inventory",
            lambda c: build_fact_daily_inventory(
                sources["rental"], sources["inventory"], c
            ),
        ),
        depends_on=["dim_film", "dim_store", "dim_date"],
    )
    return r
