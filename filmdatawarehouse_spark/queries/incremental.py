"""Oracle-checked query for incremental (delta-vs-corpus) dedup
(operators/dedup.py:incremental_dedup_flags).

The corpus/delta split is derived from doc_id so both engines replay it
exactly: corpus = doc_id % 7 != 0; delta = the % 7 == 0 docs (natural new
batch, some of which are near-duplicates of corpus docs) plus verbatim
COPIES of the % 11 == 3 corpus docs under shifted ids — guaranteeing the
exact-duplicate path fires regardless of corpus composition.

The oracle verifies near-dup flags by brute-force exact Jaccard over
delta × corpus (the same contract as dedup_minhash_lsh: LSH candidate
recall at threshold 0.8 with 32 perms / 2-row bands is ~1-1e-7 per pair,
so the exact-verify tail makes the engine answer exact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from filmdatawarehouse_spark.io.sources import read_table
from filmdatawarehouse_spark.operators import dedup as dd

DELTA_MOD = 7
COPY_MOD = 11
COPY_RESIDUE = 3
ID_SHIFT = 10_000_000
THRESHOLD = 0.8


def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    is_delta = F.pmod(F.col("doc_id"), F.lit(DELTA_MOD)) == 0
    corpus = docs.filter(~is_delta).select("doc_id", "text")
    injected = (
        docs.filter(
            (F.pmod(F.col("doc_id"), F.lit(COPY_MOD)) == COPY_RESIDUE) & ~is_delta
        )
        .select((F.col("doc_id") + F.lit(ID_SHIFT)).alias("doc_id"), "text")
    )
    delta = docs.filter(is_delta).select("doc_id", "text").unionAll(injected)
    # No n_corpus: the corpus is a FILTERED scan, so sizing it costs a full
    # pass over documents — at 100 TB an extra job per invocation for a
    # guard the census aggregation handles distributed anyway (VERDICT r03
    # item 6). n_corpus is for callers that KNOW a bound from ingest
    # metadata, never something to compute eagerly here.
    return dd.incremental_dedup_flags(corpus, delta, threshold=THRESHOLD)


def _shingles(src: str) -> str:
    return f"""
        SELECT doc_id, list_distinct(list_transform(
                 [s[i] || ' ' || s[i+1] || ' ' || s[i+2]
                  for i in range(1, len(s)-1)],
                 g -> ('0x' || substr(md5(g), 1, 8))::BIGINT
               )) AS shingles
        FROM (SELECT doc_id, string_split(text, ' ') AS s FROM {src})
    """


INCREMENTAL_ORACLE = f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents WHERE doc_id % {DELTA_MOD} <> 0
    ), delta AS (
      SELECT doc_id, text FROM documents WHERE doc_id % {DELTA_MOD} = 0
      UNION ALL
      SELECT doc_id + {ID_SHIFT} AS doc_id, text FROM documents
      WHERE doc_id % {COPY_MOD} = {COPY_RESIDUE}
        AND doc_id % {DELTA_MOD} <> 0
    ), shc AS ({_shingles("corpus")}), shd AS ({_shingles("delta")}),
    exact AS (
      SELECT DISTINCT d.doc_id FROM delta d
      JOIN corpus c ON d.text = c.text
    ), near AS (
      SELECT DISTINCT d.doc_id
      FROM shd d JOIN shc c
        ON len(d.shingles) > 0 AND len(c.shingles) > 0
       AND len(list_intersect(d.shingles, c.shingles))::DOUBLE
           / len(list_distinct(list_concat(d.shingles, c.shingles)))
           >= {THRESHOLD}
    )
    SELECT d.doc_id,
           (e.doc_id IS NOT NULL)::INT AS exact_dup,
           (n.doc_id IS NOT NULL)::INT AS near_dup,
           (e.doc_id IS NULL AND n.doc_id IS NULL)::INT AS accept
    FROM delta d
    LEFT JOIN exact e USING (doc_id)
    LEFT JOIN near n USING (doc_id)
"""

INCREMENTAL_QUERIES = {
    "dedup_incremental": (q_incremental_dedup, INCREMENTAL_ORACLE),
}
