"""The DQ checks must COUNT planted violations, not rubber-stamp (the
corpus-level query legitimately all-passes, so this fixture is the proof
the machinery fires)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from filmdatawarehouse_spark.io.sources import literal_rows
from filmdatawarehouse_spark.operators import quality as q

CHILD = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("fk", T.LongType()),
        T.StructField("amount", T.DoubleType()),
    ]
)
PARENT = T.StructType([T.StructField("pk", T.LongType())])


def _frames(spark):
    child = literal_rows(
        spark,
        [
            {"id": 1, "fk": 10, "amount": 5.0},
            {"id": 1, "fk": 10, "amount": 5.0},   # dup id (1 extra row)
            {"id": 1, "fk": 11, "amount": -2.0},  # dup id again + negative
            {"id": 2, "fk": 99, "amount": 3.0},   # orphan fk
            {"id": 3, "fk": None, "amount": None},  # null fk (not an FK
            # violation by contract), null amount (range violation: unknown
            # is not a pass)
        ],
        CHILD,
    )
    parent = literal_rows(spark, [{"pk": 10}, {"pk": 11}], PARENT)
    return child, parent


def test_checks_count_planted_violations(spark):
    child, parent = _frames(spark)
    report = {
        r.check_name: (r.n_violations, r.passed)
        for r in q.run_checks(
            [
                q.check_unique(child, ["id"], "id_unique"),
                q.check_not_null(child, "amount", "amount_not_null"),
                q.check_range(child, F.col("amount") > 0, "amount_positive"),
                q.check_foreign_key(child, "fk", parent, "pk", "fk_valid"),
            ]
        ).collect()
    }
    assert report == {
        "id_unique": (2, 0),        # three rows share id=1 -> 2 extras
        "amount_not_null": (1, 0),  # one null amount
        "amount_positive": (2, 0),  # -2.0 and NULL both violate
        "fk_valid": (1, 0),         # fk=99 has no parent; NULL fk exempt
    }


def test_clean_frame_passes(spark):
    child, parent = _frames(spark)
    clean = child.filter(F.col("id") > 1).filter(F.col("fk").isin(10, 11))
    report = q.run_checks(
        [
            q.check_unique(clean, ["id"], "id_unique"),
            q.check_foreign_key(clean, "fk", parent, "pk", "fk_valid"),
        ]
    ).collect()
    assert all(r.passed == 1 and r.n_violations == 0 for r in report)


def test_run_checks_empty_raises(spark):
    import pytest as _pytest

    with _pytest.raises(ValueError):
        q.run_checks([])
