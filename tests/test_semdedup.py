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


# ---- threshold boundary (VERDICT r13 item 4) ------------------------------
# semdedup_planted certifies cosine ≈ 1-1e-13 duplicates — far above the
# threshold; these pin behavior AT the boundary, where a >= vs >
# regression or a normalization drift would otherwise pass every gate.


def _two_vec_verdict(spark, v1, threshold=0.95):
    """Run semantic_dedup on {id 0: [1,0], id 1: v1} in one cluster and
    return id 1's (keep, dup_of) — the boundary row's verdict."""
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [float(x) for x in v1])],
        "vec_id bigint, embedding array<double>",
    )
    out = {
        r.vec_id: r
        for r in semantic_dedup(
            emb, n_clusters=1, threshold=threshold, n_iters=1
        ).collect()
    }
    assert out[0].keep  # the anchor is always kept (visited first)
    return out[1].keep, out[1].dup_of


def test_semdedup_boundary_exactly_at_threshold_drops(spark):
    """The documented side of the boundary: cosine EXACTLY == threshold
    is a duplicate (inclusive >=). The pair is constructed so the
    operator's own float64 normalization realizes the dot product as
    exactly np.float64(0.95): v0=[1,0] is exactly unit, and v1=[0.95,y]
    with y nudged (a few ulps) until fl(sqrt(0.95² + y²)) == 1.0 — then
    normalization divides by exactly 1.0 and the cosine is the raw
    0.95 coordinate."""
    c = np.float64(0.95)
    y = np.sqrt(np.float64(1.0) - c * c)
    for _ in range(64):
        if np.sqrt(c * c + y * y) == np.float64(1.0):
            break
        y = np.nextafter(y, np.float64(0.0))
    else:
        pytest.fail("could not construct an exactly-unit [0.95, y]")
    # the realized cosine is exactly the threshold — this IS the boundary
    assert (np.array([c, y]) / np.sqrt(c * c + y * y))[0] == c
    keep, dup_of = _two_vec_verdict(spark, [c, y])
    assert not keep, "cosine == threshold must DROP (inclusive >=)"
    assert dup_of == 0


def test_semdedup_boundary_epsilon_below_keeps(spark):
    """cosine = 0.95 - 1e-6: kept (below the ball)."""
    c = 0.95 - 1e-6
    keep, dup_of = _two_vec_verdict(spark, [c, float(np.sqrt(1 - c * c))])
    assert keep and dup_of is None


def test_semdedup_boundary_epsilon_above_drops(spark):
    """cosine = 0.95 + 1e-6: dropped, attributed to the anchor."""
    c = 0.95 + 1e-6
    keep, dup_of = _two_vec_verdict(spark, [c, float(np.sqrt(1 - c * c))])
    assert not keep and dup_of == 0


def test_semdedup_boundary_is_scale_invariant(spark):
    """Cosines are computed on the operator's own float64-normalized
    vectors: scaling an input must not move a near-boundary verdict
    (a normalization drift — e.g. normalizing only one side — would)."""
    for c, want_keep in ((0.95 - 1e-6, True), (0.95 + 1e-6, False)):
        raw = np.array([c, float(np.sqrt(1 - c * c))])
        for scale in (1.0, 7.25, 1e-3):
            keep, _ = _two_vec_verdict(spark, list(raw * scale))
            assert keep is want_keep, (c, scale)
