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

from filmdatawarehouse_spark.operators.cleaning import clean
from filmdatawarehouse_spark.operators.dates import date_dimension, date_id, month_key


def build_dim_staff(staff: DataFrame) -> DataFrame:
    """dim_staff (`dags/rentalFilmDAG.py:35-39`): project 4 cols + clean."""
    return clean(staff.select("staff_id", "first_name", "last_name", "store_id"))


def build_dim_film(film: DataFrame) -> DataFrame:
    """dim_film (`dags/rentalFilmDAG.py:42-46`)."""
    return clean(film.select("film_id", "title", "release_year", "language_id"))


def build_dim_store(store: DataFrame) -> DataFrame:
    """dim_store (`dags/rentalFilmDAG.py:49-53`)."""
    return clean(store.select("store_id", "manager_staff_id", "address_id"))


def build_dim_date(
    spark: SparkSession, start: str = "2005-01-01", end: str = "2006-12-31"
) -> DataFrame:
    """dim_date (`dags/rentalFilmDAG.py:56-65`): generated calendar, cleaned
    for parity (a generated range has no nulls/dupes — clean is a no-op)."""
    return clean(date_dimension(spark, start, end))


def build_dim_rental(rental: DataFrame) -> DataFrame:
    """dim_rental (`dags/rentalFilmDAG.py:68-72`)."""
    return clean(
        rental.select("rental_id", "rental_date", "inventory_id", "customer_id")
    )


def build_fact_daily_inventory(rental: DataFrame, inventory: DataFrame) -> DataFrame:
    """fact_daily_inventory (`dags/rentalFilmDAG.py:75-84`): one row per
    (date, film, store); inventory_count = rentals of that film at that store
    that day.

    Plan: clean both inputs → inner equi-join on inventory_id (J1; the
    inventory side is small → AQE converts to broadcast-hash join, no shuffle
    of the rental fact) → derive date_id (P4) → group-count (A1;
    ``count(*)`` — pandas ``.size()`` counts rows incl. nulls).
    """
    r = clean(rental.select("rental_id", "rental_date", "inventory_id"))
    i = clean(inventory.select("inventory_id", "film_id", "store_id"))
    return (
        r.join(F.broadcast(i), "inventory_id", "inner")
        .withColumn("date_id", date_id("rental_date"))
        .groupBy("date_id", "film_id", "store_id")
        .agg(F.count(F.lit(1)).alias("inventory_count"))
    )


def build_fact_monthly_payment(payment: DataFrame) -> DataFrame:
    """fact_monthly_payment (`dags/rentalFilmDAG.py:87-97`): payment amounts
    summed by (staff, rental, first-of-month key).

    The reference sums DECIMAL amounts in float64 (pandas coercion); we keep
    DECIMAL end-to-end — exact, associative, and order-independent, which also
    makes results hash-stable under Spark's nondeterministic partial-agg order.
    """
    p = clean(payment.select("staff_id", "rental_id", "payment_date", "amount"))
    return (
        p.withColumn("date_id", month_key("payment_date"))
        .groupBy("staff_id", "rental_id", "date_id")
        .agg(
            F.sum(F.col("amount").cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .alias("monthly_payment_total")
        )
    )
