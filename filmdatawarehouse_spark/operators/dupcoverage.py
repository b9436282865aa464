"""Cross-document duplicated n-gram coverage (the span-level dedup
signal of Lee et al., "Deduplicating Training Data Makes Language
Models Better", ACL 2022).

Document-level dedup (exact / MinHash / SemDeDup) misses PARTIAL
overlap: boilerplate headers, quoted passages, templated spans.
Lee et al. remove any substring of ≥50 BPE tokens that appears twice in
the corpus; the scalable DataFrame form of that signal is per-document
COVERAGE — the fraction of a document's word n-gram occurrences whose
n-gram also appears in ≥ ``min_docs`` OTHER distinct documents. A high
``dup_frac`` marks template/boilerplate documents for removal or span
surgery; the corpus-wide mean is the "how much duplicate text is left"
metric a curation pipeline tracks across rounds.

Scale shape (all exchanges on 8-byte gram hashes, never gram strings):
one explode scan (no shuffle) → groupBy gram_h with countDistinct doc
(shuffle 1; map-side partial) → LEFT-SEMI join of occurrences against
the (much smaller) duplicated-gram set (shuffle 2, semi side only
carries hashes) → per-doc counts (shuffle 3 on doc_id). Grams are
60-bit md5 hashes (``_hash60``): collisions hit both engines of the
oracle pair identically and at 2^60 are negligible at any corpus size.

No reference analog; part of the LLM-training-pipeline extension
surface (SURVEY.md §6), sibling to ``operators.repetition`` (WITHIN-doc
repetition) and the document-level dedup family in ``operators.dedup``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from filmdatawarehouse_spark.operators.dedup import _hash60, word_ngrams_all


def ngram_occurrences(
    docs: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(id, gram_h)`` — one row per n-gram OCCURRENCE (duplicates
    kept), gram hashed to 60 bits before anything shuffles. The token
    array is bound as a column before the per-gram lambda touches it
    (the ``word_shingles`` Catalyst re-evaluation trap)."""
    with_toks = docs.select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("_toks")
    )
    return with_toks.select(
        F.col(id_col),
        F.explode(word_ngrams_all(F.col("_toks"), n)).alias("_gram"),
    ).select(F.col(id_col), _hash60(F.col("_gram")).alias("gram_h"))


def dup_ngram_coverage(
    docs: DataFrame,
    n: int = 5,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(id, n_ngrams, dup_ngrams, dup_frac)`` per input document:
    how many of its n-gram occurrences use an n-gram found in
    ≥ ``min_docs`` distinct documents (the doc itself included — a
    gram must cross documents to count, so ``min_docs=2`` means
    "appears in at least one OTHER document"). Documents with fewer
    than n tokens keep a row with zero counts and NULL ``dup_frac``
    (undefined, not 0 — they carry no evidence either way)."""
    occ = ngram_occurrences(docs, n, id_col, text_col)
    dup_grams = (
        occ.groupBy("gram_h")
        .agg(F.count_distinct(F.col(id_col)).alias("n_docs"))
        .filter(F.col("n_docs") >= F.lit(min_docs))
        .select("gram_h")
    )
    totals = occ.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_ngrams"))
    dups = (
        occ.join(dup_grams, "gram_h", "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("dup_ngrams"))
    )
    return (
        docs.select(id_col)
        .join(totals, id_col, "left")
        .join(dups, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_ngrams"), F.lit(0)).alias("n_ngrams"),
            F.coalesce(F.col("dup_ngrams"), F.lit(0)).alias("dup_ngrams"),
            F.when(
                F.coalesce(F.col("n_ngrams"), F.lit(0)) > 0,
                F.coalesce(F.col("dup_ngrams"), F.lit(0))
                / F.col("n_ngrams").cast("double"),
            ).alias("dup_frac"),
        )
    )
