"""Misra-Gries heavy hitters (operators/frequent.py): exactness on a
planted distribution, the per-partition candidate bound, and robustness to
adversarial partitioning (the superset guarantee must hold however rows
land)."""

from __future__ import annotations

from pyspark.sql import functions as F

from filmdatawarehouse_spark.operators.frequent import (
    heavy_hitters_exact,
    mg_candidates,
)


def _planted_docs(spark, n_partitions):
    """300 'hot' tokens (30%), 150 'warm' (15%), 550 singletons — with
    k=8 the threshold is 1000/8=125: exactly {hot, warm} qualify."""
    rows = (
        [("hot " * 10).strip() for _ in range(30)]
        + [("warm " * 5).strip() for _ in range(30)]
        + [f"u{i}a u{i}b u{i}c u{i}d u{i}e" for i in range(110)]
    )
    return spark.createDataFrame(
        [(t,) for t in rows], "text string"
    ).repartition(n_partitions)


def test_exact_on_planted_distribution(spark):
    for parts in (1, 7):
        docs = _planted_docs(spark, parts)
        got = {
            r.word: (r.cnt, r.total_tokens)
            for r in heavy_hitters_exact(docs, k=8).collect()
        }
        assert got == {"hot": (300, 1000), "warm": (150, 1000)}, (parts, got)


def test_candidate_rows_bounded_per_partition(spark):
    docs = _planted_docs(spark, 7)
    cand = mg_candidates(docs, k=8)
    per_part = (
        cand.withColumn("p", F.spark_partition_id())
        .groupBy("p")
        .count()
        .collect()
    )
    assert all(r["count"] <= 8 for r in per_part), per_part


def test_superset_guarantee_under_hostile_partitioning(spark):
    """All copies of the heavy word isolated from the noise: candidates
    must still contain it and the exact recount must still be exact."""
    hot = [("hot",)] * 40
    noise = [(f"n{i}",) for i in range(60)]
    docs = spark.createDataFrame(hot + noise, "text string").repartition(
        4, F.col("text")  # co-locates all 'hot' rows in ONE partition
    )
    got = {(r.word, r.cnt) for r in heavy_hitters_exact(docs, k=4).collect()}
    assert got == {("hot", 40)}  # 40 > 100/4
