"""Unit tests for scalar quantization (operators/quantize.py). Oracle parity
at corpus scale is covered by test_parity_queries."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from filmdatawarehouse_spark.operators import quantize as qz


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


def test_dimension_stats(spark):
    emb = _emb(spark, [(1, [0.0, -2.0]), (2, [1.0, 2.0]), (3, [0.5, 0.0])])
    got = {r["pos"]: (r["mn"], r["mx"]) for r in qz.dimension_stats(emb).collect()}
    assert got == {0: (0.0, 1.0), 1: (-2.0, 2.0)}


def test_codes_hand_computed(spark):
    emb = _emb(spark, [(1, [0.0, -2.0]), (2, [1.0, 2.0]), (3, [0.5, 0.0])])
    stats = [(0.0, 1.0), (-2.0, 2.0)]
    got = {
        r["vec_id"]: r["codes"]
        for r in qz.quantize_vectors(emb, stats, n_levels=4).collect()
    }
    # dim0 range [0,1], 4 levels of width .25: 0.0->0, 1.0->clamp 3, 0.5->2
    # dim1 range [-2,2], width 1: -2->0, 2->clamp 3, 0->2
    assert got == {1: [0, 0], 2: [3, 3], 3: [2, 2]}


def test_constant_dimension_codes_zero(spark):
    emb = _emb(spark, [(1, [5.0]), (2, [5.0])])
    got = qz.quantize_vectors(emb, [(5.0, 5.0)]).collect()
    assert all(r["codes"] == [0] for r in got)


def test_reconstruction_error_within_bound(spark):
    rows = [(i, [i / 7.0, 1.0 - i / 13.0, float(i % 5)]) for i in range(60)]
    emb = _emb(spark, rows)
    stats = [
        (r["mn"], r["mx"])
        for r in qz.dimension_stats(emb).orderBy("pos").collect()
    ]
    rep = qz.reconstruction_report(emb, stats).collect()[0]
    assert rep["n_vecs"] == 60
    assert rep["ok"] == 1
    assert rep["max_abs_err"] <= rep["err_bound"] * 1.0000001
    # bound is tight-ish: some vector should land in the worst half-bucket
    assert rep["max_abs_err"] > 0


def test_quantize_plan_is_shuffle_free(spark):
    """The code-assignment projection must not shuffle: stats arrive as
    literals, so the plan above the scan is a pure Project."""
    emb = _emb(spark, [(1, [0.1, 0.2]), (2, [0.3, 0.4])])
    plan = qz.quantize_vectors(emb, [(0.0, 1.0), (0.0, 1.0)])._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
