"""The approx twins' gates must be falsifiable — a gate that cannot fire
certifies nothing. These tests drive the rank-interval logic
(queries/approx_twins._rank_ok) with values a broken sketch would produce
and require the flag to drop, plus positive cases at the window edges and
an end-to-end FIRES check: feeding a corrupted 'approx' value through the
same counting arithmetic the queries use must flag 0.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from filmdatawarehouse_spark.queries.approx_twins import (
    PCTL_ACCURACY,
    PCTL_EPS,
    _rank_ok,
)


def _eval(spark, n_le: int, n_lt: int, n: int, p: float) -> int:
    row = (
        spark.range(1)
        .select(
            _rank_ok(
                F.lit(n_le).cast("bigint"),
                F.lit(n_lt).cast("bigint"),
                F.lit(n).cast("bigint"),
                p,
            ).alias("ok")
        )
        .first()
    )
    return row["ok"]


def test_exact_median_rank_passes(spark):
    # 101 distinct values, v = the true median: 50 below, 51 at-or-below
    assert _eval(spark, n_le=51, n_lt=50, n=101, p=0.5) == 1


def test_max_value_as_median_fires(spark):
    # a broken sketch returning the MAX as the p50: rank interval
    # [101, 101] cannot meet the window around 50.5
    assert _eval(spark, n_le=101, n_lt=100, n=101, p=0.5) == 0


def test_min_value_as_median_fires(spark):
    # the MIN as the p50: interval [1, 1] is below the window
    assert _eval(spark, n_le=1, n_lt=0, n=101, p=0.5) == 0


def test_duplicate_run_spanning_the_quantile_passes(spark):
    # heavy ties: one value occupies ranks 10..90 of 100 — its interval
    # CONTAINS the p50 window, and the duplicate-safe check must accept
    # (n_lt = 9 below it, n_le = 90 at-or-below)
    assert _eval(spark, n_le=90, n_lt=9, n=100, p=0.5) == 1


def test_off_by_slack_boundary(spark):
    # just outside the +-1-slack window must fire; just inside must pass.
    # p=0.5, n=1000, eps*n = 0.1 -> lo = floor(499.9)-1 = 498,
    # hi = ceil(500.1)+1 = 502
    assert _eval(spark, n_le=497, n_lt=496, n=1000, p=0.5) == 0
    assert _eval(spark, n_le=498, n_lt=497, n=1000, p=0.5) == 1
    assert _eval(spark, n_le=503, n_lt=502, n=1000, p=0.5) == 0
    assert _eval(spark, n_le=502, n_lt=501, n=1000, p=0.5) == 1


def test_p99_tail_gate(spark):
    # n=1000, p=0.99: window ~[988, 993]; the max (rank 1000) passes
    # only if 1000's interval reaches down — a single max value has
    # interval [1000, 1000] and must fire
    assert _eval(spark, n_le=1000, n_lt=999, n=1000, p=0.99) == 0
    assert _eval(spark, n_le=990, n_lt=989, n=1000, p=0.99) == 1


def test_gate_fires_end_to_end_on_corrupted_sketch(spark):
    """Full-query arithmetic with a poisoned approx value: replace the
    sketch output with the column max and run the exact counting the
    twins run — the flag must be 0 (i.e. the hash gate would fail)."""
    df = spark.range(1, 1002).select(F.col("id").cast("long").alias("v"))
    poisoned = df.agg(F.max("v").alias("bad_p50"))
    gates = df.crossJoin(F.broadcast(poisoned)).agg(
        F.sum((F.col("v") <= F.col("bad_p50")).cast("bigint")).alias("le"),
        F.sum((F.col("v") < F.col("bad_p50")).cast("bigint")).alias("lt"),
        F.count(F.lit(1)).alias("n"),
    )
    row = gates.select(
        _rank_ok(F.col("le"), F.col("lt"), F.col("n"), 0.5).alias("ok")
    ).first()
    assert row["ok"] == 0


def test_spark_sketch_meets_its_own_guarantee(spark):
    """The real approx_percentile at the registered accuracy must pass the
    gate on an adversarially tie-heavy column (the duplicate shape that
    breaks naive rank checks)."""
    df = spark.range(0, 5000).select(
        (F.col("id") % 7).cast("long").alias("v")  # 7 values x ~714 ties
    )
    stats = df.agg(
        F.percentile_approx("v", 0.5, PCTL_ACCURACY).alias("va"),
        F.count(F.lit(1)).alias("n"),
    )
    gates = df.crossJoin(F.broadcast(stats)).agg(
        F.sum((F.col("v") <= F.col("va")).cast("bigint")).alias("le"),
        F.sum((F.col("v") < F.col("va")).cast("bigint")).alias("lt"),
        F.max("n").alias("n"),
    )
    row = gates.select(
        _rank_ok(F.col("le"), F.col("lt"), F.col("n"), 0.5).alias("ok")
    ).first()
    assert row["ok"] == 1


def test_eps_matches_accuracy():
    assert PCTL_EPS == pytest.approx(1.0 / PCTL_ACCURACY)


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    values=st.lists(
        st.integers(min_value=0, max_value=9), min_size=1, max_size=60
    ),
    p=st.sampled_from([0.5, 0.9, 0.99]),
)
def test_real_sketch_always_passes_rank_gate(spark, values, p):
    """Property: for ANY multiset (ties, skew, singletons) and any
    registered quantile, Spark's approx_percentile at the registered
    accuracy must satisfy the duplicate-safe rank gate — i.e. the gate's
    window genuinely contains the sketch's guarantee and the certified
    flags can never flap on data shape."""
    df = spark.createDataFrame([(v,) for v in values], "v long").coalesce(1)
    stats = df.agg(
        F.percentile_approx("v", p, PCTL_ACCURACY).alias("va"),
        F.count(F.lit(1)).alias("n"),
    )
    gates = df.crossJoin(F.broadcast(stats)).agg(
        F.sum((F.col("v") <= F.col("va")).cast("bigint")).alias("le"),
        F.sum((F.col("v") < F.col("va")).cast("bigint")).alias("lt"),
        F.max("n").alias("n"),
    )
    row = gates.select(
        _rank_ok(F.col("le"), F.col("lt"), F.col("n"), p).alias("ok")
    ).first()
    assert row["ok"] == 1, (sorted(values), p)
