"""Oracle-checked queries for the repetition-filter operators
(operators/repetition.py): the Gopher-rules panel and its keep/drop gate
over the documents table. No reference analog (SURVEY.md §2.8 — the
reference has no string surface); extended LLM-pipeline coverage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from filmdatawarehouse_spark.io.sources import read_table
from filmdatawarehouse_spark.operators import repetition as rep

Entry = tuple


def q_repetition_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition panel (dup-word / top-bigram / dup-5-gram
    fractions + mean word length) — one explode, one doc-keyed shuffle."""
    return rep.repetition_metrics(read_table(spark, sf_dir, "documents"))


def q_repetition_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style keep/drop decision per document at the default
    thresholds — the pre-training corpus filter, auditable (every doc
    reports its decision rather than silently vanishing)."""
    return rep.repetition_gate(read_table(spark, sf_dir, "documents"))


def _panel_sql() -> str:
    """The shared metrics CTE chain (DuckDB twin of repetition_metrics:
    same integer counts, same single-division doubles)."""
    n2, n5 = rep.TOP_NGRAM_N, rep.DUP_NGRAM_N
    return f"""
        WITH w AS (
          SELECT doc_id, string_split(text, ' ') AS words FROM documents
        ), base AS (
          SELECT doc_id,
                 len(words)::BIGINT AS n_words,
                 len(list_distinct(words))::BIGINT AS n_distinct,
                 list_sum(list_transform(words, x -> length(x)))::BIGINT
                   AS word_chars
          FROM w
        ), g2 AS (
          SELECT doc_id, array_to_string(words[i:i+{n2 - 1}], ' ') AS g
          FROM (SELECT doc_id, words,
                       unnest(range(1, len(words) - {n2} + 2)) AS i
                FROM w)
        ), g2c AS (
          SELECT doc_id, g, COUNT(*)::BIGINT AS cnt FROM g2 GROUP BY 1, 2
        ), g5 AS (
          SELECT doc_id, array_to_string(words[i:i+{n5 - 1}], ' ') AS g
          FROM (SELECT doc_id, words,
                       unnest(range(1, len(words) - {n5} + 2)) AS i
                FROM w)
        ), g5c AS (
          SELECT doc_id, g, COUNT(*)::BIGINT AS cnt FROM g5 GROUP BY 1, 2
        ), agg2 AS (
          SELECT doc_id, MAX(cnt)::BIGINT AS top_bigram_count
          FROM g2c GROUP BY doc_id
        ), agg5 AS (
          SELECT doc_id, SUM(cnt) FILTER (cnt >= 2)::BIGINT AS dup5_positions
          FROM g5c GROUP BY doc_id
        ), panel AS (
          SELECT b.doc_id,
                 b.n_words,
                 (b.n_words - b.n_distinct)::DOUBLE / b.n_words::DOUBLE
                   AS dup_word_frac,
                 COALESCE(a2.top_bigram_count, 0)::BIGINT AS top_bigram_count,
                 CASE WHEN b.n_words - {n2 - 1} > 0
                      THEN COALESCE(a2.top_bigram_count, 0)::DOUBLE
                           / (b.n_words - {n2 - 1})::DOUBLE
                      ELSE 0.0 END AS top_bigram_frac,
                 CASE WHEN b.n_words - {n5 - 1} > 0
                      THEN COALESCE(a5.dup5_positions, 0)::DOUBLE
                           / (b.n_words - {n5 - 1})::DOUBLE
                      ELSE 0.0 END AS dup_5gram_frac,
                 b.word_chars::DOUBLE / b.n_words::DOUBLE AS mean_word_len
          FROM base b
          LEFT JOIN agg2 a2 USING (doc_id)
          LEFT JOIN agg5 a5 USING (doc_id)
        )
    """


REPETITION_ORACLES: dict[str, str] = {
    "text_repetition_metrics": _panel_sql()
    + """
        SELECT doc_id, n_words, dup_word_frac, top_bigram_count,
               top_bigram_frac, dup_5gram_frac, mean_word_len
        FROM panel
    """,
    "text_repetition_gate": _panel_sql()
    + """
        SELECT doc_id,
               (dup_word_frac <= 0.8
                AND top_bigram_frac <= 0.18
                AND dup_5gram_frac <= 0.30)::INT AS keep
        FROM panel
    """,
}

REPETITION_QUERIES: dict[str, Entry] = {
    "text_repetition_metrics": (
        q_repetition_metrics,
        REPETITION_ORACLES["text_repetition_metrics"],
    ),
    "text_repetition_gate": (
        q_repetition_gate,
        REPETITION_ORACLES["text_repetition_gate"],
    ),
}
