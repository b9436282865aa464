"""Composition certification for the round-5 text operators: a curation
pipeline built from containment-dedup + unigram-LM gating must hash-match a
DuckDB replay of the SAME composed logic — operators are certified to
compose, not just to run alone (the pipeline_curate_documents pattern,
applied to the new surface)."""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from filmdatawarehouse_spark.io.sources import read_table
from filmdatawarehouse_spark.queries.extended import (
    CONTAIN_DF_CAP,
    CONTAIN_T,
    q_text_containment_pairs,
    q_text_unigram_logprob,
)

LOGPROB_MIN = -3.6  # permissive gate; calibrated to keep most docs


@pytest.fixture(scope="module")
def duck2(sf_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    yield con
    con.close()


def test_curation_v2_composition_matches_duckdb(spark, sf_dir, duck2):
    # Spark side: drop the higher doc of every containment pair, then gate
    # on mean unigram log-probability; report per-source survivor stats
    losers = (
        q_text_containment_pairs(spark, sf_dir)
        .select(F.col("doc_id_b").alias("doc_id"))
        .distinct()
    )
    scores = q_text_unigram_logprob(spark, sf_dir).filter(
        F.col("mean_logprob") >= LOGPROB_MIN
    )
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "source")
    kept = (
        docs.join(F.broadcast(losers), "doc_id", "left_anti")
        .join(scores, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
    )
    got = {
        (r.source, r.n_docs, r.total_tokens) for r in kept.collect()
    }
    assert got, "composition produced an empty corpus — gate miscalibrated"

    # DuckDB replay of the identical composition
    oracle = f"""
        WITH w AS (
          SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        ), sh AS (
          SELECT DISTINCT doc_id,
                 ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle
          FROM w, unnest(range(1, greatest(len(ws) - 1, 1))) AS t(i)
        ), rare AS (
          SELECT shingle FROM sh GROUP BY shingle
          HAVING COUNT(*) <= {CONTAIN_DF_CAP}
        ), kept_sh AS (
          SELECT sh.* FROM sh JOIN rare USING (shingle)
        ), sizes AS (
          SELECT doc_id, COUNT(*)::BIGINT AS n_sh FROM kept_sh GROUP BY doc_id
        ), losers AS (
          SELECT DISTINCT b.doc_id
          FROM kept_sh a JOIN kept_sh b
            ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          JOIN sizes s1 ON s1.doc_id = a.doc_id
          JOIN sizes s2 ON s2.doc_id = b.doc_id
          GROUP BY a.doc_id, b.doc_id, s1.n_sh, s2.n_sh
          HAVING COUNT(*)::DOUBLE / least(s1.n_sh, s2.n_sh) >= {CONTAIN_T}
        ), toks AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS word
          FROM documents
        ), freq AS (
          SELECT word, COUNT(*)::BIGINT AS c FROM toks GROUP BY word
        ), tot AS (SELECT SUM(c)::BIGINT AS n FROM freq),
        logp AS (
          SELECT word, ln(c::DOUBLE / (SELECT n FROM tot)) AS lp FROM freq
        ), scored AS (
          SELECT doc_id, COUNT(*)::BIGINT AS n_tokens,
                 round(CAST(SUM(CAST(lp AS DECIMAL(28,18))) AS DOUBLE)
                       / COUNT(*), 12) AS mlp
          FROM toks JOIN logp USING (word) GROUP BY doc_id
        )
        SELECT d.source, COUNT(*)::BIGINT AS n_docs,
               SUM(s.n_tokens)::BIGINT AS total_tokens
        FROM documents d
        JOIN scored s USING (doc_id)
        WHERE d.doc_id NOT IN (SELECT doc_id FROM losers)
          AND s.mlp >= {LOGPROB_MIN}
        GROUP BY d.source
    """
    want = {
        (r[0], r[1], r[2]) for r in duck2.execute(oracle).fetchall()
    }
    assert got == want


def test_pipeline_dirty_corpus_uses_exact_cleaned_pair_build(
    spark, tmp_path
):
    """Review r10: the shared raw-corpus MinHash pair frame is reused
    only when cleaning drops nothing — LSH candidates are
    corpus-dependent through the hot-bucket cap, so on a DIRTY corpus
    the pipeline must rebuild pairs over cleaned docs exactly as the
    DuckDB oracle replays them. Pin that with a corpus where cleaning
    removes rows (NULL lang) that participate in near-dup pairs."""
    import duckdb

    from filmdatawarehouse_spark.queries.pipeline import (
        curate_documents,
        curate_documents_oracle,
    )

    real = [
        r.text
        for r in spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        )
        .select("text")
        .limit(20)
        .collect()
    ]
    rows = []
    for i in range(40):
        # pairs (2i, 2i+1) share one REAL text -> jaccard 1.0; real text
        # passes the quality gate (synthetic token soup does not)
        text = real[i // 2]
        lang = None if i % 7 == 0 else "en"  # every 7th row cleaned away
        rows.append((i, text, lang, "s", len(text)))
    sf = str(tmp_path)
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(f"{sf}/documents.parquet")

    got = {
        tuple(r)
        for r in curate_documents(spark, sf)
        .selectExpr(
            "lang_pred", "n_docs", "total_tokens", "round(avg_quality, 9)"
        )
        .collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{sf}/documents.parquet/*.parquet')"
    )
    want = {
        tuple(r)
        for r in con.execute(
            f"SELECT lang_pred, n_docs, total_tokens, "
            f"round(avg_quality, 9) FROM ({curate_documents_oracle()})"
        ).fetchall()
    }
    assert got == want and got
