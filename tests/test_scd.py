"""SCD2 merge semantics on a film-dimension example."""

from __future__ import annotations

import datetime

from pyspark.sql import types as T

from filmdatawarehouse_spark.io.sources import literal_rows
from filmdatawarehouse_spark.warehouse.scd import scd2_apply, scd2_initial

TS = datetime.datetime

UPD_SCHEMA = T.StructType(
    [
        T.StructField("film_id", T.IntegerType()),
        T.StructField("title", T.StringType()),
        T.StructField("language_id", T.IntegerType()),
        T.StructField("effective_ts", T.TimestampType()),
    ]
)

ATTRS = ["title", "language_id"]


def test_scd2_bootstrap_and_merge(spark):
    batch1 = literal_rows(
        spark,
        [
            dict(film_id=1, title="Alpha", language_id=1, effective_ts=TS(2024, 1, 1)),
            dict(film_id=2, title="Beta", language_id=1, effective_ts=TS(2024, 1, 1)),
        ],
        UPD_SCHEMA,
    )
    dim = scd2_initial(batch1, "film_id", ATTRS)
    assert dim.count() == 2
    assert all(r.is_current and r.valid_to is None for r in dim.collect())

    batch2 = literal_rows(
        spark,
        [
            # changed title → close + reopen
            dict(film_id=1, title="Alpha (remaster)", language_id=1,
                 effective_ts=TS(2024, 6, 1)),
            # identical snapshot → untouched
            dict(film_id=2, title="Beta", language_id=1,
                 effective_ts=TS(2024, 6, 1)),
            # new key → first version
            dict(film_id=3, title="Gamma", language_id=2,
                 effective_ts=TS(2024, 6, 1)),
        ],
        UPD_SCHEMA,
    )
    dim2 = scd2_apply(dim, batch2, "film_id", ATTRS)
    rows = {(r.film_id, r.title, r.is_current): r for r in dim2.collect()}
    assert len(rows) == 4

    old = rows[(1, "Alpha", False)]
    assert old.valid_to == TS(2024, 6, 1)
    new = rows[(1, "Alpha (remaster)", True)]
    assert new.valid_from == TS(2024, 6, 1) and new.valid_to is None
    beta = rows[(2, "Beta", True)]
    assert beta.valid_from == TS(2024, 1, 1)  # untouched, original version
    gamma = rows[(3, "Gamma", True)]
    assert gamma.valid_from == TS(2024, 6, 1)


def test_scd2_null_safe_attribute_compare(spark):
    b1 = literal_rows(
        spark,
        [dict(film_id=1, title=None, language_id=1, effective_ts=TS(2024, 1, 1))],
        UPD_SCHEMA,
    )
    dim = scd2_initial(b1, "film_id", ATTRS)
    # same null title again → no new version
    b2 = literal_rows(
        spark,
        [dict(film_id=1, title=None, language_id=1, effective_ts=TS(2024, 2, 1))],
        UPD_SCHEMA,
    )
    assert scd2_apply(dim, b2, "film_id", ATTRS).count() == 1
    # null → value → new version
    b3 = literal_rows(
        spark,
        [dict(film_id=1, title="Named", language_id=1, effective_ts=TS(2024, 3, 1))],
        UPD_SCHEMA,
    )
    assert scd2_apply(dim, b3, "film_id", ATTRS).count() == 2


def test_scd2_apply_is_idempotent(spark):
    b1 = literal_rows(
        spark,
        [dict(film_id=1, title="Alpha", language_id=1, effective_ts=TS(2024, 1, 1))],
        UPD_SCHEMA,
    )
    dim = scd2_initial(b1, "film_id", ATTRS)
    once = scd2_apply(dim, b1, "film_id", ATTRS)
    twice = scd2_apply(once, b1, "film_id", ATTRS)
    assert twice.count() == 1  # re-applying the same snapshot changes nothing


def test_snapshot_diff_classification(spark):
    """insert/delete/update classification, including the null-safe compare:
    NULL→value and value→NULL attribute transitions are updates, NULL→NULL
    is unchanged."""
    from filmdatawarehouse_spark.warehouse.scd import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None), (4, "d"), (5, None)],
        "k long, attr string",
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "CHANGED"), (3, "now-set"), (5, None), (6, "new")],
        "k long, attr string",
    )
    got = {r.k: r.change_type for r in snapshot_diff(old, new, "k", ["attr"]).collect()}
    # 1: unchanged (absent), 2: update, 3: NULL->value update, 4: delete,
    # 5: NULL==NULL unchanged (absent), 6: insert
    assert got == {2: "update", 3: "update", 4: "delete", 6: "insert"}


def test_merge_aggregate_delta_equals_full_recompute(spark, sf_dir):
    """Folding a day's increment into yesterday's aggregate must equal
    aggregating the full union — the distributive-aggregate contract that
    makes incremental maintenance sound."""
    from pyspark.sql import functions as F

    from filmdatawarehouse_spark.io.sources import read_table
    from filmdatawarehouse_spark.warehouse.scd import merge_aggregate_delta

    e = read_table(spark, sf_dir, "events")
    cutoff = e.agg(F.expr("percentile(unix_micros(ts), 0.8)")).first()[0]
    old = e.filter(F.unix_micros("ts") <= cutoff)
    inc = e.filter(F.unix_micros("ts") > cutoff)
    assert inc.count() > 0 and old.count() > 0

    def agg(df):
        return df.groupBy("user_id", "event_type").agg(
            F.sum(F.col("value").cast("decimal(18,6)")).alias("total_value"),
            F.count(F.lit(1)).cast("decimal(18,0)").alias("n_events"),
        )

    merged = merge_aggregate_delta(
        agg(old), agg(inc), ["user_id", "event_type"],
        ["total_value"], "n_events",
    )
    full = agg(e)
    got = {
        (r.user_id, r.event_type): (r.total_value, r.n_events)
        for r in merged.collect()
    }
    want = {
        (r.user_id, r.event_type): (r.total_value, r.n_events)
        for r in full.collect()
    }
    assert got == want


def test_snapshot_diff_composite_key_and_null_keys(spark):
    """r11: snapshot_diff accepts a composite key, and side presence is
    judged on literal markers — a row whose key columns are entirely
    NULL is a present row (matched null-safely across snapshots), never
    misread as an insert/delete."""
    from filmdatawarehouse_spark.warehouse.scd import snapshot_diff

    schema = "k1 int, k2 string, v int"
    old = spark.createDataFrame(
        [
            (1, "a", 10),
            (1, "b", 20),
            (2, "a", 30),
            (None, None, 99),   # all-NULL composite key, present both sides
        ],
        schema,
    )
    new = spark.createDataFrame(
        [
            (1, "a", 10),        # unchanged -> omitted
            (1, "b", 21),        # update
            (3, "a", 40),        # insert
            (None, None, 99),    # unchanged NULL-key row -> omitted
        ],
        schema,
    )
    got = {
        (r.k1, r.k2): r.change_type
        for r in snapshot_diff(old, new, ["k1", "k2"], ["v"]).collect()
    }
    assert got == {
        (1, "b"): "update",
        (3, "a"): "insert",
        (2, "a"): "delete",
    }
    # NULL-key row with a CHANGED value is an update, not insert+delete
    new2 = spark.createDataFrame([(None, None, 100)], schema)
    old2 = spark.createDataFrame([(None, None, 99)], schema)
    got2 = [
        (r.k1, r.k2, r.change_type)
        for r in snapshot_diff(old2, new2, ["k1", "k2"], ["v"]).collect()
    ]
    assert got2 == [(None, None, "update")]
