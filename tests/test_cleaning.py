"""The reference's own cleaning fixture, reproduced exactly.

`filmETLs.ipynb:179-196` (cell 3, FIXTURES.md §2): 4 hand-built dirty rental
rows → expect the null row dropped, one duplicate dropped ("2 rows removed"),
and the dangling-FK row KEPT (no referential validation — pinned behavior).
"""

from __future__ import annotations

import datetime

from pyspark.sql import types as T

from filmdatawarehouse_spark.io.sources import literal_rows
from filmdatawarehouse_spark.operators.cleaning import clean, clean_with_stats

FIXTURE_SCHEMA = T.StructType(
    [
        T.StructField("rental_id", T.IntegerType()),
        T.StructField("rental_date", T.TimestampType()),
        T.StructField("inventory_id", T.IntegerType()),
        T.StructField("customer_id", T.IntegerType()),
        T.StructField("return_date", T.TimestampType()),
    ]
)

TS = datetime.datetime


def _fixture_rows() -> list[dict]:
    return [
        # null rental_date → dropped by any-null rule
        dict(
            rental_id=16000,
            rental_date=None,
            inventory_id=1525,
            customer_id=130,
            return_date=TS(2025, 5, 25, 10, 0, 0),
        ),
        # dangling inventory_id=99999 → KEPT (no FK validation)
        dict(
            rental_id=16001,
            rental_date=TS(2025, 5, 23, 12, 0, 0),
            inventory_id=99999,
            customer_id=130,
            return_date=TS(2025, 5, 24, 13, 0, 0),
        ),
        dict(
            rental_id=16002,
            rental_date=TS(2025, 5, 22, 11, 0, 0),
            inventory_id=1525,
            customer_id=130,
            return_date=TS(2025, 5, 25, 10, 0, 0),
        ),
        # exact duplicate of 16002 → one copy dropped
        dict(
            rental_id=16002,
            rental_date=TS(2025, 5, 22, 11, 0, 0),
            inventory_id=1525,
            customer_id=130,
            return_date=TS(2025, 5, 25, 10, 0, 0),
        ),
    ]


def test_dirty_rental_fixture(spark):
    df = literal_rows(spark, _fixture_rows(), FIXTURE_SCHEMA)
    cleaned, removed = clean_with_stats(df, "rental")
    rows = {r.rental_id for r in cleaned.collect()}
    assert removed == 2  # the notebook's saved "2 rows removed"
    assert rows == {16001, 16002}  # dangling FK kept, null dropped, dedup'd


def test_clean_is_lazy_and_pure(spark):
    df = literal_rows(spark, _fixture_rows(), FIXTURE_SCHEMA)
    out = clean(df)
    assert out.count() == 2
    # cleaning twice is idempotent
    assert clean(out).count() == 2


def test_clean_drops_row_with_any_null(spark):
    rows = [
        dict(rental_id=1, rental_date=TS(2025, 1, 1), inventory_id=None,
             customer_id=1, return_date=TS(2025, 1, 2)),
        dict(rental_id=2, rental_date=TS(2025, 1, 1), inventory_id=3,
             customer_id=1, return_date=TS(2025, 1, 2)),
    ]
    df = literal_rows(spark, rows, FIXTURE_SCHEMA)
    assert [r.rental_id for r in clean(df).collect()] == [2]


def test_clean_observed_counts_match_eager_stats(spark):
    """clean_observed's single-action counts must equal clean_with_stats's
    two-action counts — in particular the input-side observation must see
    PRE-filter rows (CollectMetrics as optimizer barrier: the any-null
    filter must not push below the metrics node)."""
    from filmdatawarehouse_spark.io.sources import literal_rows
    from filmdatawarehouse_spark.operators.cleaning import (
        clean_observed,
        clean_with_stats,
    )

    schema = T.StructType(
        [
            T.StructField("a", T.LongType()),
            T.StructField("b", T.StringType()),
        ]
    )
    rows = [
        {"a": 1, "b": "x"},
        {"a": 1, "b": "x"},      # duplicate
        {"a": 2, "b": None},     # null -> dropped
        {"a": None, "b": "y"},   # null -> dropped
        {"a": 3, "b": "z"},
    ]
    df = literal_rows(spark, rows, schema)
    _, removed_eager = clean_with_stats(df, "fixture")

    cleaned, stats = clean_observed(df, "fixture")
    out_rows = cleaned.collect()  # the ONE action that feeds both metrics
    n_in, n_out, removed = stats()
    assert (n_in, n_out) == (5, 2)
    assert removed == removed_eager == 3
    assert len(out_rows) == 2
