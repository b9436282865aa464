"""r12: cross-document duplicated n-gram coverage (Lee et al. span-level
dedup signal).

Growth-policy capability: pytest oracles, no driver row. The oracle is
a full DuckDB REPLAY over the same documents parquet — identical
tokenization (single-space split), identical 60-bit md5 gram hashing,
identical ≥min_docs distinct-document rule — compared exactly on counts
and to float tolerance on the fraction. Behavioral gates: a planted
template shared by several synthetic docs must score high coverage, a
unique doc zero; sub-n-token docs keep a NULL-fraction row.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from filmdatawarehouse_spark.io.sources import read_table
from filmdatawarehouse_spark.operators.dupcoverage import (
    dup_ngram_coverage,
    ngram_occurrences,
)

N = 5
MIN_DOCS = 2

ORACLE = f"""
WITH tok AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
occ AS (
  SELECT doc_id,
         ('0x' || substr(md5(array_to_string(toks[i:i+{N - 1}], ' ')), 1, 15))::BIGINT AS gram_h
  FROM tok, LATERAL (
    SELECT unnest(range(1, greatest(len(toks) - {N} + 2, 1))) AS i
  )
),
dup_grams AS (
  SELECT gram_h FROM occ GROUP BY gram_h
  HAVING count(DISTINCT doc_id) >= {MIN_DOCS}
),
totals AS (
  SELECT doc_id, count(*) AS n_ngrams FROM occ GROUP BY doc_id
),
dups AS (
  SELECT doc_id, count(*) AS dup_ngrams FROM occ
  WHERE gram_h IN (SELECT gram_h FROM dup_grams)
  GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(t.n_ngrams, 0) AS n_ngrams,
       coalesce(p.dup_ngrams, 0) AS dup_ngrams,
       CASE WHEN coalesce(t.n_ngrams, 0) > 0
            THEN coalesce(p.dup_ngrams, 0) / t.n_ngrams::DOUBLE END AS dup_frac
FROM documents d
LEFT JOIN totals t USING (doc_id)
LEFT JOIN dups p USING (doc_id)
"""


def test_dup_ngram_coverage_matches_duckdb_replay(spark, sf_dir, duck):
    docs = read_table(spark, sf_dir, "documents")
    got = {
        r.doc_id: (r.n_ngrams, r.dup_ngrams, r.dup_frac)
        for r in dup_ngram_coverage(docs, n=N, min_docs=MIN_DOCS).collect()
    }
    expect = {
        int(doc_id): (int(nn), int(dn), None if fr != fr and fr is not None else fr)
        for doc_id, nn, dn, fr in duck.execute(ORACLE).fetchall()
    }
    assert got.keys() == expect.keys()
    for vid in got:
        gn, gd, gf = got[vid]
        en, ed, ef = expect[vid]
        assert (gn, gd) == (en, ed), f"doc {vid}: counts {got[vid]} != {expect[vid]}"
        if ef is None:
            assert gf is None
        else:
            assert gf is not None and math.isclose(gf, ef, rel_tol=1e-12)
    # the synthetic corpus carries real cross-doc duplication: nonzero
    # coverage must actually occur, or this test proves nothing
    assert any(d > 0 for _, d, _ in got.values())


def test_planted_template_scores_high_unique_scores_zero(spark):
    template = "all work and no play makes jack a dull boy"
    rows = [(i, f"doc {i} intro. {template}") for i in range(4)]
    rows.append((99, "completely unique words never repeated anywhere else"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r for r in dup_ngram_coverage(docs, n=5, min_docs=2).collect()
    }
    assert len(out) == 5
    for i in range(4):
        # the shared 10-gram template dominates each short doc
        assert out[i].dup_frac > 0.5, out[i]
    assert out[99].dup_ngrams == 0 and out[99].dup_frac == 0.0


def test_short_docs_keep_null_fraction_row(spark):
    docs = spark.createDataFrame(
        [(1, "too short"), (2, "a b c d e"), (3, "a b c d e")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in dup_ngram_coverage(docs, n=5).collect()}
    assert out[1].n_ngrams == 0 and out[1].dup_frac is None
    assert out[2].n_ngrams == 1 and out[2].dup_frac == 1.0
    assert out[3].dup_ngrams == 1
    # occurrences are occurrence-weighted, not distinct: a doc repeating
    # its own gram counts each instance
    rep = spark.createDataFrame(
        [(7, "x y z w v x y z w v"), (8, "x y z w v padding words here")],
        "doc_id long, text string",
    )
    occ = ngram_occurrences(rep, n=5)
    assert occ.filter(F.col("doc_id") == 7).count() == 6  # 10 tokens -> 6 grams


def test_min_docs_rule_is_cross_document(spark):
    """A gram repeated only WITHIN one doc is not duplicated text
    between documents — min_docs counts distinct docs, not instances."""
    docs = spark.createDataFrame(
        [(1, "p q r s t p q r s t"), (2, "unrelated other content here now")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in dup_ngram_coverage(docs, n=5).collect()}
    assert out[1].dup_ngrams == 0  # both instances live in doc 1 only


def test_span_gated_pipeline_matches_duckdb_and_actually_gates(
    spark, sf_dir, duck
):
    """The composed pipeline (heuristic gate → doc-level dedup →
    span-coverage gate → rollup) against its full DuckDB replay, exact
    on counts; plus the two structural claims the docstring makes: the
    gate drops documents the certified pipeline keeps, and every
    survivor carries a non-NULL coverage (MIN_TOKENS ≥ 10 > n)."""
    from filmdatawarehouse_spark.queries.pipeline import (
        _gated_survivors,
        curate_documents,
        curate_documents_span_gated,
        curate_documents_span_gated_oracle,
    )

    got = {
        r.lang_pred: (r.n_docs, r.total_tokens, r.avg_quality)
        for r in curate_documents_span_gated(spark, sf_dir).collect()
    }
    expect = {
        lang: (int(nd), int(tt), aq)
        for lang, nd, tt, aq in duck.execute(
            curate_documents_span_gated_oracle()
        ).fetchall()
    }
    assert got.keys() == expect.keys()
    for lang in got:
        assert got[lang][:2] == expect[lang][:2], lang
        assert math.isclose(got[lang][2], expect[lang][2], rel_tol=1e-12)

    base_docs = sum(
        r.n_docs for r in curate_documents(spark, sf_dir).collect()
    )
    gated_docs = sum(nd for nd, _, _ in got.values())
    # this corpus's duplication is entirely whole-document near-dups,
    # which doc-level dedup fully resolves — so the span gate passes
    # everything here (equality allowed); the planted-template test
    # below proves it prunes what dedup CANNOT see
    assert 0 < gated_docs <= base_docs

    docs, survivors = _gated_survivors(spark, sf_dir)
    cov = dup_ngram_coverage(
        survivors.join(docs.select("doc_id", "text"), "doc_id")
    )
    assert cov.filter(F.col("dup_frac").isNull()).count() == 0


def test_span_gate_drops_planted_template_residue(spark, sf_dir, tmp_path):
    """Doc-level dedup's blind spot, reproduced: take 8 pipeline
    survivors (mutually non-duplicate by construction) and append the
    SAME template sentence to each — MinHash at 0.8 cannot pair them
    (shared shingles are a small fraction of each doc), but the span
    gate must drop all 8. The full composed query is then replayed in
    DuckDB on the planted corpus for exact parity."""
    import duckdb

    from filmdatawarehouse_spark.queries.pipeline import (
        _gated_survivors,
        curate_documents_span_gated,
        curate_documents_span_gated_oracle,
    )

    template = (
        "merge window batch stream vector column filter table query sort "
        "hash join scan part order key row data group agg spark line small"
    )
    raw = read_table(spark, sf_dir, "documents")
    _, survivors = _gated_survivors(spark, sf_dir)
    chosen = {
        r.doc_id
        for r in survivors.orderBy("doc_id").limit(8).collect()
    }
    planted = raw.withColumn(
        "text",
        F.when(
            F.col("doc_id").isin(chosen),
            F.concat_ws(" ", F.col("text"), F.lit(template)),
        ).otherwise(F.col("text")),
    ).withColumn("n_chars", F.length("text").cast("long"))
    pdir = str(tmp_path / "planted")
    planted.coalesce(1).write.parquet(f"{pdir}/documents.parquet")

    docs, p_survivors = _gated_survivors(spark, pdir)
    surv_ids = {r.doc_id for r in p_survivors.select("doc_id").collect()}
    assert chosen <= surv_ids  # still heuristic-pass, still non-dup
    cov = dup_ngram_coverage(
        p_survivors.join(docs.select("doc_id", "text"), "doc_id")
    )
    max_frac = 0.04
    dropped = {
        r.doc_id
        for r in cov.filter(F.col("dup_frac") > max_frac).collect()
    }
    assert chosen <= dropped  # the template residue is caught

    got = {
        r.lang_pred: (r.n_docs, r.total_tokens, r.avg_quality)
        for r in curate_documents_span_gated(
            spark, pdir, max_dup_frac=max_frac
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{pdir}/documents.parquet/*.parquet'"
    )
    expect = {
        lang: (int(nd), int(tt), aq)
        for lang, nd, tt, aq in con.execute(
            curate_documents_span_gated_oracle(max_dup_frac=max_frac)
        ).fetchall()
    }
    con.close()
    assert got.keys() == expect.keys()
    for lang in got:
        assert got[lang][:2] == expect[lang][:2], lang
        assert math.isclose(got[lang][2], expect[lang][2], rel_tol=1e-12)


def test_span_gate_null_coverage_passes_not_drops(spark, sf_dir, duck):
    """A survivor too short for any n-gram carries NULL dup_frac and
    must PASS the gate (an evidence gap is not evidence of duplication
    — the semantic gate's missing-embedding rule). At n larger than
    every document, ALL coverage is NULL, so the span-gated rollup must
    equal the certified rollup exactly — on BOTH engines."""
    from filmdatawarehouse_spark.queries.pipeline import (
        curate_documents,
        curate_documents_span_gated,
        curate_documents_span_gated_oracle,
    )

    base = {
        r.lang_pred: (r.n_docs, r.total_tokens)
        for r in curate_documents(spark, sf_dir).collect()
    }
    gated = {
        r.lang_pred: (r.n_docs, r.total_tokens)
        for r in curate_documents_span_gated(spark, sf_dir, n=500).collect()
    }
    assert gated == base
    oracle = {
        lang: (int(nd), int(tt))
        for lang, nd, tt, _ in duck.execute(
            curate_documents_span_gated_oracle(n=500)
        ).fetchall()
    }
    assert oracle == base


def test_plan_exchanges_carry_hashes_and_ids_only(spark, sf_dir):
    """No gram STRING crosses an exchange: grams are hashed in the same
    narrow stage as the explode, so every Exchange's input schema is
    ids / 60-bit hashes / counts — the shuffle-byte contract that makes
    the three-exchange shape viable at corpus scale. And the whole
    pipeline is native functions — no Python boundary at all."""
    import re

    from tests.test_plan_hygiene import plan_of

    docs = read_table(spark, sf_dir, "documents")
    plan = plan_of(dup_ngram_coverage(docs, n=N))
    assert "PythonUDF" not in plan  # pure native-function pipeline
    nodes = re.findall(r"\(\d+\) Exchange\nInput \[\d+\]: \[([^\]]*)\]", plan)
    assert nodes, "expected detailed Exchange nodes in the formatted plan"
    for inputs in nodes:
        cols = {c.strip().split("#")[0] for c in inputs.split(",")}
        assert cols <= {"doc_id", "gram_h", "count", "n_ngrams", "dup_ngrams"}, (
            f"exchange carries unexpected (wide?) columns: {cols}"
        )
