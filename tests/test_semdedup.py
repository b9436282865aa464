"""r12: SemDeDup (semantic dedup via k-means clusters + greedy
within-cluster cosine pruning).

Growth-policy capability: pytest oracles, no driver row. The oracle is
a NUMPY REPLAY of the full recipe — same centroids, same assignment,
same ascending-id greedy — so the Spark output must match it exactly
(ids, keep flags, dup_of attributions). Behavioral gates: a planted
near-duplicate must be dropped and attributed to its original; the
threshold endpoints must degenerate correctly; an oversized cluster
must REFUSE, not run quadratic.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from filmdatawarehouse_spark.io.sources import read_table
from filmdatawarehouse_spark.operators.semdedup import semantic_dedup
from filmdatawarehouse_spark.operators.similarity import kmeans_centroids


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return read_table(spark, sf_dir, "embeddings")


def _replay(emb_rows, cents, threshold):
    """Driver-side replay of assignment + greedy, keyed by id."""
    ids = sorted(r.vec_id for r in emb_rows)
    vecs = {
        r.vec_id: np.asarray(r.embedding, dtype=np.float64) for r in emb_rows
    }
    by_cluster: dict[int, list[int]] = {}
    for vid in ids:
        x = vecs[vid] / np.sqrt((vecs[vid] ** 2).sum())
        by_cluster.setdefault(int(np.argmax(x @ cents.T)), []).append(vid)
    out = {}
    for cl, members in by_cluster.items():
        kept: list[int] = []
        for vid in members:  # already ascending
            x = vecs[vid] / np.sqrt((vecs[vid] ** 2).sum())
            if kept:
                km = np.stack(
                    [vecs[k] / np.sqrt((vecs[k] ** 2).sum()) for k in kept]
                )
                sims = km @ x
                j = int(np.argmax(sims))
                if sims[j] >= threshold:
                    out[vid] = (cl, False, kept[j])
                    continue
            kept.append(vid)
            out[vid] = (cl, True, None)
    return out


def test_semdedup_matches_numpy_replay(spark, emb):
    """Exact end-to-end parity with the driver-side replay at a
    threshold low enough to exercise both branches on this corpus."""
    rows = emb.collect()
    cents = kmeans_centroids(emb, n_lists=16, n_iters=4)
    for threshold in (0.35, 0.95):
        expect = _replay(rows, cents, threshold)
        got = {
            r.vec_id: (r.cluster_id, r.keep, r.dup_of)
            for r in semantic_dedup(
                emb, n_clusters=16, threshold=threshold, n_iters=4
            ).collect()
        }
        assert got == expect, f"threshold={threshold}"
        dropped = sum(1 for _, k, _ in got.values() if not k)
        if threshold == 0.35:
            assert dropped > 0  # the low bar must actually prune
        for vid, (cl, keep, dup) in got.items():
            if not keep:
                assert got[dup][1] is True or got[dup][1]  # dup_of is kept
                assert got[dup][0] == cl  # same cluster
                assert dup < vid  # greedy visits ids ascending


def test_semdedup_drops_planted_near_duplicate(spark, emb):
    """A vector cloned with tiny noise must be dropped and attributed
    to its original; the original stays kept."""
    base = emb.select("vec_id", "embedding").limit(50)
    rows = base.collect()
    src = np.asarray(rows[0].embedding, dtype=np.float64)
    clone = (src + 1e-4 * np.arange(len(src))).tolist()
    planted = base.unionByName(
        spark.createDataFrame(
            [(9_999, [float(x) for x in clone])], schema=base.schema
        )
    )
    out = {
        r.vec_id: r
        for r in semantic_dedup(
            planted, n_clusters=4, threshold=0.99, n_iters=2
        ).collect()
    }
    assert len(out) == 51
    assert out[rows[0].vec_id].keep
    assert not out[9_999].keep
    assert out[9_999].dup_of == rows[0].vec_id


def test_semdedup_threshold_endpoints(spark, emb):
    """threshold > 1 keeps everything (cosine can't clear it);
    threshold ≤ -1 keeps exactly one row per cluster."""
    all_kept = semantic_dedup(emb, n_clusters=8, threshold=1.1, n_iters=2)
    assert all_kept.filter(~F.col("keep")).count() == 0
    one_per = (
        semantic_dedup(emb, n_clusters=8, threshold=-1.0, n_iters=2)
        .filter(F.col("keep"))
        .groupBy("cluster_id")
        .count()
        .collect()
    )
    assert all(r["count"] == 1 for r in one_per)
    assert 1 <= len(one_per) <= 8


def test_semdedup_generic_id_type(spark):
    """The schema is derived from the id column's own type — string ids
    must work end-to-end, dup_of carrying the kept STRING id."""
    rows = [
        ("a", [1.0, 0.0, 0.0, 0.0]),
        ("b", [0.0, 1.0, 0.0, 0.0]),
        ("c", [1.0, 1e-6, 0.0, 0.0]),  # near-dup of a
    ]
    emb = spark.createDataFrame(rows, "doc_key string, v array<double>")
    out = {
        r.doc_key: (r.keep, r.dup_of)
        for r in semantic_dedup(
            emb, n_clusters=2, threshold=0.99, n_iters=1,
            id_col="doc_key", vec_col="v",
        ).collect()
    }
    assert out["a"] == (True, None)
    assert out["c"] == (False, "a")


def test_semdedup_oversized_cluster_refuses(spark, emb):
    """A cluster past cluster_cap must raise with sizing guidance, not
    run a quadratic task."""
    with pytest.raises(Exception, match="cluster_cap"):
        semantic_dedup(emb, n_clusters=2, cluster_cap=10, n_iters=1).collect()


def test_semantic_pipeline_matches_replay_and_composes(spark, sf_dir, emb):
    """The composed pipeline gate (heuristic → lexical dedup → SemDeDup
    over SURVIVOR embeddings → rollup) against a driver-side replay:
    the survivor set comes from the shared stages, the semantic
    verdicts from the numpy greedy replay on the survivors' embeddings
    with the same deterministic centroids, the rollup recomputed in
    plain python. threshold > 1 must reduce to the certified rollup
    exactly (the gate composes, never perturbs)."""
    from filmdatawarehouse_spark.queries.pipeline import (
        _gated_survivors,
        curate_documents,
    )
    from filmdatawarehouse_spark.queries.semantic_pipeline import (
        curate_documents_semantic,
    )

    _, survivors = _gated_survivors(spark, sf_dir)
    surv_rows = survivors.collect()
    surv_ids = {r.doc_id for r in surv_rows}
    surv_emb = emb.filter(F.col("vec_id").isin(surv_ids)).select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    threshold = 0.35  # low enough to actually prune on this corpus
    cents = kmeans_centroids(
        surv_emb, n_lists=16, n_iters=4, id_col="doc_id"
    )
    verdicts = _replay(
        [
            type("R", (), {"vec_id": r.doc_id, "embedding": r.embedding})
            for r in surv_emb.collect()
        ],
        cents,
        threshold,
    )
    kept_ids = {vid for vid, (_, keep, _) in verdicts.items() if keep}
    assert kept_ids < surv_ids  # the low bar actually prunes

    import math
    from collections import defaultdict

    expect: dict[str, list] = defaultdict(lambda: [0, 0, 0.0])
    for r in surv_rows:
        if r.doc_id in kept_ids:
            e = expect[r.lang_pred]
            e[0] += 1
            e[1] += r.n_tokens
            e[2] += r.quality
    got = {
        r.lang_pred: (r.n_docs, r.total_tokens, r.avg_quality)
        for r in curate_documents_semantic(
            spark, sf_dir, threshold=threshold
        ).collect()
    }
    assert got.keys() == set(expect)
    for lang, (nd, tt, qsum) in expect.items():
        assert got[lang][:2] == (nd, tt), lang
        assert math.isclose(got[lang][2], qsum / nd, rel_tol=1e-9)

    # threshold past cosine's range: the gate must be the identity
    base = {
        r.lang_pred: (r.n_docs, r.total_tokens, r.avg_quality)
        for r in curate_documents(spark, sf_dir).collect()
    }
    ungated = {
        r.lang_pred: (r.n_docs, r.total_tokens, r.avg_quality)
        for r in curate_documents_semantic(
            spark, sf_dir, threshold=1.1
        ).collect()
    }
    assert ungated == base


def test_semdedup_plan_one_exchange_into_grouped_stage(spark, emb):
    """Zero-shuffle assignment scan; the single exchange is the
    cluster_id hash partition into the grouped Arrow stage."""
    from tests.test_plan_hygiene import plan_of

    plan = plan_of(semantic_dedup(emb, n_clusters=8, n_iters=1))
    tree = plan.split("\n\n")[0]
    assert "FlatMapGroupsInPandas" in tree or "FlatMapGroupsIn" in tree
    assert tree.count("Exchange") == 1


def test_semdedup_zero_norm_vector_refuses(spark):
    """ADVICE r12: an all-zero embedding has no direction — normalizing
    yields NaN rows whose cosines are silently False (always kept).
    The greedy pass must raise, naming the offending id."""
    rows = [
        ("a", [1.0, 0.0, 0.0, 0.0]),
        ("z", [0.0, 0.0, 0.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "doc_key string, v array<double>")
    with pytest.raises(Exception, match="zero-norm"):
        semantic_dedup(
            emb, n_clusters=1, n_iters=1, id_col="doc_key", vec_col="v"
        ).collect()
