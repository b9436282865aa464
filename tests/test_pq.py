"""r12: product quantization (train / encode / ADC top-k / refine).

Growth-policy capability: pytest oracles, no driver row. The oracle is a
NUMPY REPLAY — codebook assignment and ADC scoring are exact integer
gathers + float arithmetic over the same collected inputs, so the Spark
side must match the replay bit-for-bit on codes and to float tolerance
on scores. Recall is MEASURED against the exact cosine path (this
corpus's embeddings are near-random — the hardest case for PQ — so the
gated bar is the refine recipe's, with shortlist monotonicity pinned,
not a pretend raw-ADC number).
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from filmdatawarehouse_spark.io.sources import read_table
from filmdatawarehouse_spark.operators.quantize import (
    pq_encode,
    pq_reconstruction_mse,
    pq_topk,
    pq_topk_refined,
    pq_train,
)
from filmdatawarehouse_spark.operators.similarity import cosine_topk, norm


@pytest.fixture(scope="module")
def unit_emb(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.transform(
            "embedding", lambda x: x.cast("double") / norm(F.col("embedding"))
        ).alias("embedding"),
    )


@pytest.fixture(scope="module")
def trained(spark, unit_emb):
    books = pq_train(unit_emb, m=8, n_codes=16, n_iters=4)
    codes = pq_encode(unit_emb, books)
    return books, codes


def test_pq_codebook_shape_and_guards(spark, unit_emb):
    books = pq_train(unit_emb, m=8, n_codes=16, n_iters=1)
    assert books.shape == (8, 16, 8)  # 64-dim / 8 subspaces
    with pytest.raises(ValueError, match="not divisible"):
        pq_train(unit_emb, m=7, n_codes=16, n_iters=1)
    with pytest.raises(ValueError, match="seed"):
        pq_train(unit_emb.limit(3), m=8, n_codes=16, n_iters=1)


def test_pq_encode_matches_numpy_replay(spark, unit_emb, trained):
    """Every stored code must equal the numpy argmin-L2 assignment of the
    same vector against the same codebooks — exact, not approximate."""
    books, codes = trained
    vecs = {
        r.vec_id: np.asarray(r.embedding, dtype=np.float64)
        for r in unit_emb.collect()
    }
    got = {r.vec_id: list(r.codes) for r in codes.collect()}
    assert got.keys() == vecs.keys()
    m, n_codes, dsub = books.shape
    for vid, x in vecs.items():
        expect = [
            int(np.argmin(((books[j] - x[j * dsub : (j + 1) * dsub]) ** 2).sum(axis=1)))
            for j in range(m)
        ]
        assert got[vid] == expect, f"vec {vid}"
        assert all(0 <= c < n_codes for c in got[vid])


def test_pq_adc_scores_match_numpy_replay(spark, unit_emb, trained):
    """ADC scores are LUT gathers + adds; the Spark scan must reproduce
    the numpy computation of the same (query, code-row) pairs."""
    books, codes = trained
    queries = unit_emb.filter(F.col("vec_id") < 3)
    out = pq_topk(codes, queries, books, k=7).collect()
    vecs = {
        r.vec_id: np.asarray(r.embedding, dtype=np.float64)
        for r in unit_emb.collect()
    }
    code_map = {r.vec_id: np.asarray(r.codes) for r in codes.collect()}
    m, _, dsub = books.shape
    for r in out:
        q = vecs[r.query_id]
        expect = sum(
            float(q[j * dsub : (j + 1) * dsub] @ books[j][code_map[r.neighbor_id][j]])
            for j in range(m)
        )
        assert math.isclose(r.score, expect, rel_tol=1e-9, abs_tol=1e-12)
        assert r.neighbor_id != r.query_id  # self-match excluded
    # exactly k ranked rows per query, ranks 1..k
    by_q: dict[int, list[int]] = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r.rank)
    assert all(sorted(v) == list(range(1, 8)) for v in by_q.values())


def test_pq_reconstruction_beats_rate0_baseline_and_improves(
    spark, unit_emb
):
    """Trained codebooks must beat the corpus-mean (rate-0) baseline,
    and more codes must not reconstruct worse — the two monotonicity
    properties a correct k-means trainer cannot fail."""
    b2 = pq_train(unit_emb, m=8, n_codes=2, n_iters=3)
    b16 = pq_train(unit_emb, m=8, n_codes=16, n_iters=3)
    r2 = pq_reconstruction_mse(unit_emb, b2).first()
    r16 = pq_reconstruction_mse(unit_emb, b16).first()
    assert r2.n_vecs == r16.n_vecs == 500
    assert r2.mse < r2.mean_baseline_mse
    assert r16.mse < r2.mse
    # unit vectors: baseline mse ≈ E||x||² - ||mean||² ≤ 1
    assert 0.0 < r16.mean_baseline_mse <= 1.0 + 1e-9


def test_pq_refined_recall_and_shortlist_monotonicity(
    spark, sf_dir, unit_emb, trained
):
    """The refine recipe's recall vs the exact cosine path, MEASURED:
    near-random embeddings are PQ's hardest case, so the gate is on the
    shortlist+exact-rerank path (what production serves) with the
    shortlist knob's monotonicity pinned alongside."""
    books, codes = trained
    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    unit_q = unit_emb.filter(F.col("vec_id") < 10)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk(emb, queries, k=5).collect()
    }

    def recall(shortlist: int) -> float:
        got = {
            (r.query_id, r.neighbor_id)
            for r in pq_topk_refined(
                unit_emb, codes, books, unit_q, k=5, shortlist=shortlist
            ).collect()
        }
        return len(got & exact) / len(exact)

    r25, r100 = recall(25), recall(100)
    assert r100 >= 0.9  # measured 0.92 on this corpus
    assert r100 >= r25  # a bigger shortlist can only help
    # refine rescored with EXACT cosine: every returned cosine must match
    # the exact path's value for the same pair (spot-check via overlap)
    refined = {
        (r.query_id, r.neighbor_id): r.cosine
        for r in pq_topk_refined(
            unit_emb, codes, books, unit_q, k=5, shortlist=100
        ).collect()
    }
    exact_scores = {
        (r.query_id, r.neighbor_id): r.cosine
        for r in cosine_topk(emb, queries, k=5).collect()
    }
    for pair in refined.keys() & exact_scores.keys():
        assert math.isclose(
            refined[pair], exact_scores[pair], rel_tol=1e-9
        )


def test_pq_topk_empty_queries_and_plan_shape(spark, unit_emb, trained):
    books, codes = trained
    none = unit_emb.filter(F.col("vec_id") < 0)
    out = pq_topk(codes, none, books, k=5)
    assert out.count() == 0
    assert out.columns == ["query_id", "neighbor_id", "score", "rank"]
    # the ADC scan is one zero-shuffle Arrow stage; the only exchange is
    # the per-query top-k window (the ivf_topk plan contract)
    from tests.test_plan_hygiene import plan_of

    plan = plan_of(
        pq_topk(codes, unit_emb.filter(F.col("vec_id") < 5), books, k=5)
    )
    tree = plan.split("\n\n")[0]
    assert tree.count("MapInPandas") >= 1
    assert tree.count("Exchange") == 1
