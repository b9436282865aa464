"""r12: the CCNet model-based quality stage composed onto the curation
pipeline (VERDICT r11 item 5). The heuristic-gated, deduped survivor set
is already hash-certified through ``pipeline_curate_documents``; what
these tests certify is the NEW composition — LM training on the
high-quality head, per-doc bigram perplexity over that LM, bucket
assignment, and the bucket-gated rollup — by replaying scoring AND
assignment in DuckDB over the SAME LM table. Quantile edges are an
operational policy (approx_percentile), so the replayed leg pins
EXPLICIT edges chosen between observed scores (no doc within float-ulp
reach of an edge — assignment is exactly reproducible); the default
quantile leg gets ordering/shape assertions instead.
"""

from __future__ import annotations

import math

import pytest

from filmdatawarehouse_spark.queries.pipeline import (
    curate_documents_lm,
    lm_bucketed_documents,
)

FLOOR_P = 1e-7


@pytest.fixture(scope="module")
def bucketed_default(spark, sf_dir):
    bucketed, lm = lm_bucketed_documents(spark, sf_dir)
    rows = bucketed.collect()
    lm_rows = lm.collect()
    return rows, lm_rows


def test_lm_stage_scores_every_survivor(bucketed_default):
    rows, lm_rows = bucketed_default
    assert rows, "pipeline produced no survivors at this SF"
    # MIN_TOKENS >= 10 guarantees bigrams: no doc may be unscored
    assert all(r.ppl_bucket != "unscored" for r in rows)
    assert all(r.perplexity is not None and r.n_bigrams >= 9 for r in rows)
    # the LM is broadcast-sized by construction (top-K bounded)
    from filmdatawarehouse_spark.queries.extended import BIGRAM_TOP_K

    assert 0 < len(lm_rows) <= BIGRAM_TOP_K
    # conditional probabilities are probabilities
    assert all(0.0 < r.cond_p <= 1.0 for r in lm_rows)


def test_default_quantile_buckets_are_ordered(bucketed_default):
    rows, _ = bucketed_default
    by_bucket: dict[str, list[float]] = {}
    for r in rows:
        by_bucket.setdefault(r.ppl_bucket, []).append(r.perplexity)
    assert set(by_bucket) <= {"head", "middle", "tail"}
    assert "head" in by_bucket  # the split produced a head at this SF
    # head < lo <= middle <= hi < tail — bucket ranges may not interleave
    if "middle" in by_bucket:
        assert max(by_bucket["head"]) < min(by_bucket["middle"])
    if "tail" in by_bucket and "middle" in by_bucket:
        assert max(by_bucket["middle"]) < min(by_bucket["tail"])


def _safe_edges(ppls: list[float], head: float, tail: float):
    """(lo, hi) between adjacent DISTINCT observed scores at roughly the
    head/1-tail quantiles — no observation sits at an edge, so a float
    ulp cannot flip any assignment in either engine."""
    vals = sorted(set(ppls))
    assert len(vals) >= 4, "need spread to place safe edges"
    i = max(0, min(int(len(vals) * head), len(vals) - 2))
    j = max(i + 1, min(int(len(vals) * (1 - tail)), len(vals) - 2))
    lo = (vals[i] + vals[i + 1]) / 2
    hi = (vals[j] + vals[j + 1]) / 2
    return lo, hi


def test_lm_scoring_and_buckets_replay_in_duckdb(spark, sf_dir, duck):
    """The cross-engine oracle: per-doc perplexity over the SAME LM
    table matches DuckDB to 1e-9 relative, bucket assignment at explicit
    safe edges matches EXACTLY, and the bucket-gated rollup
    (curate_documents_lm) equals the DuckDB rollup of the replayed
    assignment."""
    # pass 1 (uncommitted edges) just to harvest scores for edge placement
    bucketed0, lm = lm_bucketed_documents(spark, sf_dir)
    ppl0 = {r.doc_id: r.perplexity for r in bucketed0.collect()}
    lo, hi = _safe_edges(list(ppl0.values()), 0.3, 0.3)

    bucketed, _ = lm_bucketed_documents(spark, sf_dir, edges=(lo, hi))
    got = {
        r.doc_id: (
            r.lang_pred,
            r.quality,
            r.n_tokens,
            r.n_bigrams,
            r.perplexity,
            r.ppl_bucket,
        )
        for r in bucketed.collect()
    }
    assert got.keys() == ppl0.keys()

    # same kept set + same LM into DuckDB; replay scoring + assignment
    kept_pdf = (
        bucketed.select("doc_id", "lang_pred", "quality", "n_tokens", "text")
        .toPandas()
    )
    lm_pdf = lm.toPandas()
    duck.register("kept_docs", kept_pdf)
    duck.register("lm_tbl", lm_pdf)
    rows = duck.execute(
        f"""
        WITH toks AS (
          SELECT doc_id, string_split(text, ' ') AS w FROM kept_docs
        ),
        bg AS (
          SELECT doc_id, w[i] AS w1, w[i + 1] AS w2
          FROM toks, UNNEST(generate_series(1, len(w) - 1)) AS t(i)
        ),
        scored AS (
          SELECT bg.doc_id,
                 COUNT(*) AS n_bigrams,
                 SUM(LN(COALESCE(lm_tbl.cond_p, {FLOOR_P}))) / COUNT(*)
                   AS avg_logprob
          FROM bg
          LEFT JOIN lm_tbl USING (w1, w2)
          GROUP BY bg.doc_id
        )
        SELECT doc_id, n_bigrams, EXP(-avg_logprob) AS perplexity,
               CASE WHEN EXP(-avg_logprob) < {lo!r} THEN 'head'
                    WHEN EXP(-avg_logprob) <= {hi!r} THEN 'middle'
                    ELSE 'tail' END AS ppl_bucket
        FROM scored
        """
    ).fetchall()
    replay = {r[0]: (r[1], r[2], r[3]) for r in rows}
    assert replay.keys() == got.keys()
    for doc_id, (n_bg, ppl_d, bucket_d) in replay.items():
        _, _, _, n_bg_s, ppl_s, bucket_s = got[doc_id]
        assert n_bg == n_bg_s
        assert math.isclose(ppl_d, ppl_s, rel_tol=1e-9)
        assert bucket_d == bucket_s, (
            f"doc {doc_id}: spark={bucket_s} duckdb={bucket_d} "
            f"(ppl {ppl_s} vs {ppl_d}, edges {lo}, {hi})"
        )

    # the composed rollup: tail dropped, grouped by (lang, bucket)
    rollup = {
        (r.lang_pred, r.ppl_bucket): (r.n_docs, r.total_tokens, r.avg_quality)
        for r in curate_documents_lm(
            spark, sf_dir, edges=(lo, hi)
        ).collect()
    }
    assert rollup and all(b != "tail" for _, b in rollup)
    expect: dict[tuple[str, str], list] = {}
    for doc_id, (lang, quality, n_tokens, _, _, bucket_s) in got.items():
        if bucket_s == "tail":
            continue
        acc = expect.setdefault((lang, bucket_s), [0, 0, 0.0])
        acc[0] += 1
        acc[1] += n_tokens
        acc[2] += quality
    assert rollup.keys() == expect.keys()
    for key, (n, tot, qsum) in expect.items():
        gn, gtot, gavg = rollup[key]
        assert (gn, gtot) == (n, tot)
        assert math.isclose(gavg, qsum / n, rel_tol=1e-12)
    # the gate actually dropped something (tail nonempty at these edges)
    assert any(b == "tail" for *_, b in got.values())
