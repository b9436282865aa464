"""Misra-Gries heavy hitters (operators/frequent.py): exactness on a
planted distribution, the per-partition candidate bound, robustness to
adversarial partitioning (the superset guarantee must hold however rows
land), and the vectorized merge rule's superset property on generated
skewed streams (pure Arrow — no Spark in the hypothesis loop)."""

from __future__ import annotations

from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from filmdatawarehouse_spark.operators.frequent import (
    heavy_hitters_exact,
    mg_candidates,
    mg_merge,
)


@st.composite
def _skewed_stream(draw):
    """A token stream with a few hot words and a long random tail, split
    into arbitrary 'Arrow batch' boundaries — the exact shape mg_candidates
    feeds mg_merge."""
    hot = draw(st.integers(1, 4))
    tokens = []
    for h in range(hot):
        tokens += [f"hot{h}"] * draw(st.integers(5, 60))
    tokens += [
        f"t{draw(st.integers(0, 200))}" for _ in range(draw(st.integers(0, 150)))
    ]
    tokens = draw(st.permutations(tokens))
    cuts = sorted(
        draw(
            st.lists(
                st.integers(0, max(len(tokens) - 1, 0)), min_size=0, max_size=5
            )
        )
    )
    batches, prev = [], 0
    for c in [*cuts, len(tokens)]:
        if c > prev:
            batches.append(tokens[prev:c])
            prev = c
    return batches


@settings(max_examples=200, deadline=None)
@given(_skewed_stream(), st.integers(2, 16))
def test_merge_rule_superset_property(batches, k):
    """Replaying any batched skewed stream through mg_merge must (a) keep
    <= k carried counters, (b) never overcount, (c) undercount by at most
    n/(k+1), and therefore (d) retain every word with count > n/(k+1) —
    the superset guarantee the exact recount relies on (VERDICT r05
    item 2's done-condition). Exercises the production Arrow merge
    directly, no Spark in the loop."""
    import pyarrow as pa
    import pyarrow.compute as pc

    summary = None
    for batch in batches:
        vc = pc.value_counts(pa.array(batch, pa.string()))
        hist = pa.table(
            {
                "word": vc.field("values").cast(pa.string()),
                "est": vc.field("counts").cast(pa.int64()),
            }
        )
        summary = mg_merge(summary, hist, k)
        assert summary is not None and summary.num_rows <= k
    truth = Counter(t for b in batches for t in b)
    n = sum(truth.values())
    est = (
        {}
        if summary is None
        else dict(
            zip(
                summary.column("word").to_pylist(),
                summary.column("est").to_pylist(),
            )
        )
    )
    for w, c in truth.items():
        e = est.get(w, 0)
        assert e <= c, (w, e, c)
        assert c - e <= n / (k + 1) + 1e-9, (w, e, c, n, k)
        if c > n / (k + 1):
            assert w in est, (w, c, n, k, est)


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
