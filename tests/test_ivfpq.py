"""r12: persisted IVF-PQ index (build / append / ADC search / refine).

Growth-policy capability: pytest oracles, no driver row. The oracle is
a NUMPY REPLAY of the full IVFADC recipe — coarse assignment, residual
PQ codes, and ADC scores are exact integer gathers + float arithmetic
over the same stored artifacts, so the Spark side must match the replay
bit-for-bit on codes and to float tolerance on scores. Recall is
MEASURED against the exact cosine path; the storage contract
(partition pruning on list_id, keep-two retention through a rebuild)
is asserted directly, mirroring the flat-IVF tests.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from filmdatawarehouse_spark.io.sources import read_table
from filmdatawarehouse_spark.operators.ivfpq import (
    _codebooks_of,
    ivfpq_codes_path,
    ivfpq_index_append,
    ivfpq_index_build,
    ivfpq_search,
    ivfpq_search_refined,
    ivfpq_version_dir,
)
from filmdatawarehouse_spark.operators.similarity import (
    _centroids_of,
    cosine_topk,
)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return read_table(spark, sf_dir, "embeddings")


@pytest.fixture(scope="module")
def built(spark, emb, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("ivfpq") / "idx")
    ivfpq_index_build(emb, idx, n_lists=16, m=8, n_codes=16, n_iters=4)
    return idx


def _replay_artifacts(spark, idx):
    """Collect the stored artifacts once for the numpy replays."""
    vdir = ivfpq_version_dir(spark, idx)
    cents = _centroids_of(spark, vdir)
    books = _codebooks_of(spark, vdir)
    stored = spark.read.parquet(f"{vdir}/codes").collect()
    return cents, books, {r.vec_id: (r.list_id, list(r.codes)) for r in stored}


def _expected_assignment(x, cents, books):
    """The replay: normalize, coarse-assign, residual-encode."""
    xh = x / np.sqrt((x * x).sum())
    l = int(np.argmax(xh @ cents.T))
    r = xh - cents[l]
    m, _, dsub = books.shape
    codes = [
        int(np.argmin(((books[j] - r[j * dsub : (j + 1) * dsub]) ** 2).sum(axis=1)))
        for j in range(m)
    ]
    return l, codes


def test_ivfpq_build_codes_match_numpy_replay(spark, emb, built):
    """Every stored (list_id, codes) row must equal the replay of the
    same vector through the stored centroids + codebooks — exact."""
    cents, books, stored = _replay_artifacts(spark, built)
    assert cents.shape == (16, 64) and books.shape == (8, 16, 8)
    vecs = {
        r.vec_id: np.asarray(r.embedding, dtype=np.float64)
        for r in emb.collect()
    }
    assert stored.keys() == vecs.keys()
    for vid, x in vecs.items():
        l, codes = _expected_assignment(x, cents, books)
        assert stored[vid] == (l, codes), f"vec {vid}"


def test_ivfpq_adc_scores_match_numpy_replay_and_prune(spark, emb, built):
    """ADC scores are offset + LUT gathers; the Spark scan must
    reproduce the numpy computation for every returned pair, and the
    codes read must be PARTITION-PRUNED to the probed lists."""
    from tests.test_plan_hygiene import plan_of

    cents, books, stored = _replay_artifacts(spark, built)
    queries = emb.filter(F.col("vec_id") < 3)
    df = ivfpq_search(spark, built, queries, k=7, n_probe=4)
    plan = plan_of(df)
    assert "PartitionFilters" in plan and "list_id" in plan
    out = df.collect()
    qvecs = {
        r.vec_id: np.asarray(r.embedding, dtype=np.float64)
        for r in queries.collect()
    }
    m, _, dsub = books.shape
    for r in out:
        q = qvecs[r.query_id]
        qh = q / np.sqrt((q * q).sum())
        l, codes = stored[r.neighbor_id]
        expect = float(qh @ cents[l]) + sum(
            float(qh[j * dsub : (j + 1) * dsub] @ books[j][codes[j]])
            for j in range(m)
        )
        assert math.isclose(r.score, expect, rel_tol=1e-9, abs_tol=1e-12)
        assert r.neighbor_id != r.query_id
    by_q: dict[int, list[int]] = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r.rank)
    assert all(sorted(v) == list(range(1, 8)) for v in by_q.values())
    # probed lists only: every neighbor comes from a probed partition
    probed_rows = {
        vid for vid, (l, _) in stored.items()
        if any(
            l in {
                int(x)
                for x in np.argsort(
                    -(qh @ cents.T), kind="stable"
                )[:4]
            }
            for qh in [
                v / np.sqrt((v * v).sum()) for v in qvecs.values()
            ]
        )
    }
    assert {r.neighbor_id for r in out} <= probed_rows


def test_ivfpq_refined_recall_and_exact_rescore(spark, sf_dir, emb, built):
    """The refine recipe's recall vs the exact cosine path, MEASURED
    (near-random embeddings — PQ's hardest case — so the gate is the
    shortlist+exact-rerank serving path with full probing), and every
    returned cosine must equal the exact path's value for the pair."""
    queries = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r.query_id, r.neighbor_id): r.cosine
        for r in cosine_topk(emb, queries, k=5).collect()
    }
    got = {
        (r.query_id, r.neighbor_id): r.cosine
        for r in ivfpq_search_refined(
            spark, built, queries, emb, k=5, shortlist=100, n_probe=16
        ).collect()
    }
    recall = len(got.keys() & exact.keys()) / len(exact)
    assert recall >= 0.9
    for pair in got.keys() & exact.keys():
        assert math.isclose(got[pair], exact[pair], rel_tol=1e-9)
    # fewer probes can only lose candidates, never corrupt scores
    narrow = {
        (r.query_id, r.neighbor_id)
        for r in ivfpq_search_refined(
            spark, built, queries, emb, k=5, shortlist=100, n_probe=2
        ).collect()
    }
    assert all(q < 10 for q, _ in narrow)


def test_ivfpq_append_encodes_like_build(spark, emb, tmp_path):
    """Appending an increment must land every vector in exactly the
    (list, codes) the STORED artifacts assign — bit-identical to having
    indexed it at build time — inside the existing list partitions."""
    base = emb.filter(F.col("vec_id") < 400)
    delta = emb.filter(F.col("vec_id") >= 400)
    idx = str(tmp_path / "idx")
    ivfpq_index_build(base, idx, n_lists=16, m=8, n_codes=16, n_iters=2)
    v1 = ivfpq_version_dir(spark, idx)
    ivfpq_index_append(delta, idx)
    assert ivfpq_version_dir(spark, idx) == v1  # pointer untouched
    cents, books, stored = _replay_artifacts(spark, idx)
    assert len(stored) == 500
    for r in emb.collect():
        x = np.asarray(r.embedding, dtype=np.float64)
        assert stored[r.vec_id] == _expected_assignment(x, cents, books)


def test_ivfpq_rebuild_keeps_previous_version(spark, emb, tmp_path):
    """The shared keep-two commit: one rebuild retains the version a
    concurrent reader resolved; a second rebuild prunes it; searches
    stay green across both flips; empty query set → empty frame."""
    from filmdatawarehouse_spark.io import fs

    idx = str(tmp_path / "idx")
    ivfpq_index_build(emb, idx, n_iters=2)
    v1 = ivfpq_version_dir(spark, idx)
    queries = emb.filter(F.col("vec_id") < 5)
    before = {
        (r.query_id, r.neighbor_id)
        for r in ivfpq_search(spark, idx, queries, k=5).collect()
    }
    ivfpq_index_build(emb.filter(F.col("vec_id") < 300), idx, n_iters=2)
    v2 = ivfpq_version_dir(spark, idx)
    assert v2 != v1
    assert fs.is_dir(spark, v1)  # retained for in-flight readers
    ivfpq_index_build(emb.filter(F.col("vec_id") < 200), idx, n_iters=2)
    v3 = ivfpq_version_dir(spark, idx)
    assert fs.is_dir(spark, v2) and not fs.is_dir(spark, v1)
    assert v3 != v2
    after = {
        (r.query_id, r.neighbor_id)
        for r in ivfpq_search(spark, idx, queries, k=5).collect()
    }
    assert before and after  # both versions served
    none = emb.filter(F.col("vec_id") < 0)
    out = ivfpq_search(spark, idx, none, k=5)
    assert out.count() == 0
    assert out.columns == ["query_id", "neighbor_id", "score", "rank"]
    # maintenance targets the committed codes table
    assert ivfpq_codes_path(spark, idx) == f"{v3}/codes"


def test_ivfpq_generic_id_type_roundtrip(spark, tmp_path):
    """build/append accept any id type via pq_encode's dynamic schema;
    the search derives its output id type from the stored codes, so a
    STRING-keyed index round-trips end-to-end."""
    import numpy as np

    rng = [(f"doc-{i:03d}", [float((i * 7 + j * 3) % 11) for j in range(8)])
           for i in range(24)]
    emb = spark.createDataFrame(rng, "doc_key string, v array<double>")
    idx = str(tmp_path / "idx")
    ivfpq_index_build(
        emb, idx, n_lists=2, m=2, n_codes=4, n_iters=1,
        id_col="doc_key", vec_col="v",
    )
    queries = emb.limit(2)
    out = ivfpq_search(
        spark, idx, queries, k=3, n_probe=2, id_col="doc_key", vec_col="v"
    ).collect()
    assert out and all(isinstance(r.query_id, str) for r in out)
    assert all(r.neighbor_id.startswith("doc-") for r in out)
    assert all(r.neighbor_id != r.query_id for r in out)
    # replay one score to pin correctness for the non-long id path
    cents, books, stored = _replay_artifacts_generic(spark, idx, "doc_key")
    vecs = {k: np.asarray(v, dtype=np.float64) for k, v in rng}
    r = out[0]
    qh = vecs[r.query_id] / np.sqrt((vecs[r.query_id] ** 2).sum())
    l, codes = stored[r.neighbor_id]
    m, _, dsub = books.shape
    expect = float(qh @ cents[l]) + sum(
        float(qh[j * dsub : (j + 1) * dsub] @ books[j][codes[j]])
        for j in range(m)
    )
    assert math.isclose(r.score, expect, rel_tol=1e-9)


def _replay_artifacts_generic(spark, idx, id_col):
    vdir = ivfpq_version_dir(spark, idx)
    cents = _centroids_of(spark, vdir)
    books = _codebooks_of(spark, vdir)
    stored = spark.read.parquet(f"{vdir}/codes").collect()
    return cents, books, {
        r[id_col]: (r.list_id, list(r.codes)) for r in stored
    }


def test_ivfpq_search_plan_single_exchange(spark, emb, built):
    """The ADC scan is one zero-shuffle Arrow stage over the pruned
    codes read; the per-query top-k window is the only exchange."""
    from tests.test_plan_hygiene import plan_of

    queries = emb.filter(F.col("vec_id") < 5)
    plan = plan_of(ivfpq_search(spark, built, queries, k=5))
    tree = plan.split("\n\n")[0]
    assert tree.count("MapInPandas") >= 1
    assert tree.count("Exchange") == 1


def test_ivfpq_zero_norm_vector_refuses(spark, tmp_path):
    """ADVICE r12: a zero vector cannot be unit-normalized — NaN
    residuals would silently corrupt codebook training and every later
    ADC score. Build must raise, naming the offending id."""
    rows = [(i, [float(i + 1)] * 8) for i in range(7)] + [(9, [0.0] * 8)]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    with pytest.raises(Exception, match="zero-norm"):
        ivfpq_index_build(
            emb, str(tmp_path / "idx"), n_lists=2, m=2, n_codes=2, n_iters=1
        )


def test_ivfpq_search_id_type_mismatch_refuses(spark, emb, built):
    """ADVICE r12: a query frame whose id column's type differs from the
    stored index keys would make the numpy self-match mask silently never
    match — the search must raise instead."""
    bad = emb.filter(F.col("vec_id") < 3).withColumn(
        "vec_id", F.col("vec_id").cast("string")
    )
    with pytest.raises(TypeError, match="stored index keys"):
        ivfpq_search(spark, built, bad, k=5)
