"""Semantic gate composed onto the curation pipeline (r12).

With this module the pipeline carries the full modern curation stack,
one gate per duplication/quality modality, each composable after the
shared ``_gated_survivors`` stages:

  lexical   MinHash survivor anti-join        (curate_documents)
  span      duplicated n-gram coverage gate   (curate_documents_span_gated)
  semantic  SemDeDup over embeddings          (curate_documents_semantic, here)
  model     CCNet bigram-perplexity buckets   (curate_documents_lm)

Growth-policy capability: operators + pytest oracle, no driver row —
k-means float sums are order-sensitive, so like every k-means-derived
operator this is a NUMPY-REPLAY pytest surface, not a DuckDB hash row
(tests/test_semdedup.py replays the composed gate end-to-end).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from filmdatawarehouse_spark.io.sources import read_table
from filmdatawarehouse_spark.queries.pipeline import _gated_survivors

SEM_N_CLUSTERS = 16
SEM_THRESHOLD = 0.95
SEM_N_ITERS = 4


def curate_documents_semantic(
    spark: SparkSession,
    sf_dir: str,
    n_clusters: int = SEM_N_CLUSTERS,
    threshold: float = SEM_THRESHOLD,
    n_iters: int = SEM_N_ITERS,
) -> DataFrame:
    """``curate_documents`` with the SemDeDup stage applied: after the
    heuristic gate and doc-level (lexical) dedup, cluster the SURVIVORS'
    embeddings and drop within-cluster cosine-duplicates — documents
    that say the same thing in different words, which no lexical or
    span signal can pair. Same per-language rollup shape as the
    certified query.

    The dedup runs over the survivor corpus only (the span gate's
    composition argument: raw-corpus verdicts would re-litigate what
    the lexical stage already resolved, and the kept-representative
    choice must be made among rows that can actually ship). Documents
    WITHOUT an embedding pass through un-gated — an availability gap
    is not evidence of duplication; the join is a left join on the
    1:1 ``doc_id = vec_id`` contract of the corpus."""
    from filmdatawarehouse_spark.operators.semdedup import semantic_dedup

    _, survivors = _gated_survivors(spark, sf_dir)
    emb = read_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    surv_emb = survivors.select("doc_id").join(emb, "doc_id")
    verdicts = semantic_dedup(
        surv_emb,
        n_clusters=n_clusters,
        threshold=threshold,
        n_iters=n_iters,
        id_col="doc_id",
        vec_col="embedding",
    ).select("doc_id", "keep")
    final = survivors.join(verdicts, "doc_id", "left").filter(
        F.col("keep").isNull() | F.col("keep")
    )
    return final.groupBy("lang_pred").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        (
            F.sum(F.col("quality").cast("decimal(28,18)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_quality"),
    )
