"""Date-key derivations and the generated calendar dimension.

Reference parity:

- ``date_id = int(ts.strftime('%Y%m%d'))`` (`dags/rentalFilmDAG.py:80`,
  operator P4/F3) → ``date_format(ts,'yyyyMMdd').cast('int')``.
- month key ``year*10000 + month*100 + 1`` (`dags/rentalFilmDAG.py:90-92`,
  P5/F6) → the same integer arithmetic on ``year()/month()``.
- calendar row-generator ``pd.date_range('2005-01-01','2006-12-31')``
  (`dags/rentalFilmDAG.py:56-65`, S11) → ``sequence()`` + ``explode`` — a
  distributed generator, no driver-side loop.

All pure built-in expressions: whole-stage-codegen'd, no Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def date_id(ts: Column | str) -> Column:
    """Integer YYYYMMDD encoding of a timestamp (reference P4)."""
    c = F.col(ts) if isinstance(ts, str) else ts
    return F.date_format(c, "yyyyMMdd").cast("int")


def month_key(ts: Column | str) -> Column:
    """Integer first-of-month YYYYMM01 encoding (reference P5/F6)."""
    c = F.col(ts) if isinstance(ts, str) else ts
    return (F.year(c) * F.lit(10000) + F.month(c) * F.lit(100) + F.lit(1)).cast("int")


def with_date_id(df: DataFrame, ts_col: str, out: str = "date_id") -> DataFrame:
    return df.withColumn(out, date_id(ts_col))


def with_month_key(df: DataFrame, ts_col: str, out: str = "date_id") -> DataFrame:
    return df.withColumn(out, month_key(ts_col))


def date_dimension(
    spark: SparkSession, start: str = "2005-01-01", end: str = "2006-12-31"
) -> DataFrame:
    """Generated calendar dimension (reference S11 / dim_date job,
    `dags/rentalFilmDAG.py:56-65`): one row per day in [start, end].

    Columns: date_id INT (YYYYMMDD), full_date TIMESTAMP, month INT, year INT
    (FIXTURES.md §3). Generated with ``sequence`` — executes on executors and
    scales to any range, unlike a driver-side ``pd.date_range``.
    """
    # determinism under any caller-provided session (see io.sources.read_table)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    days = spark.range(1).select(
        F.explode(
            F.sequence(
                F.to_date(F.lit(start)), F.to_date(F.lit(end)), F.expr("interval 1 day")
            )
        ).alias("d")
    )
    full_date = F.col("d").cast("timestamp")
    return days.select(
        date_id(full_date).alias("date_id"),
        full_date.alias("full_date"),
        F.month("d").cast("int").alias("month"),
        F.year("d").cast("int").alias("year"),
    )
