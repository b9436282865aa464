"""Repetition / natural-language quality filters for pre-training corpora.

The Gopher-rules family (Rae et al. 2021 §A1.1, public): documents whose
content is dominated by repeated fragments are boilerplate or spam and get
filtered before training. The reference has no text surface at all
(SURVEY.md §2.8) — this is the engine's extended LLM-pipeline surface,
sibling to ``operators/text.py`` quality scoring.

The corpus format is single-space separated words with no line structure,
so the panel is word-level (the line/paragraph variants are the same
aggregation shape over a different split):

- ``dup_word_frac``     — 1 - distinct_words / words
- ``top_bigram_count``  — occurrences of the most frequent word bigram
- ``top_bigram_frac``   — that count / total bigram positions
- ``dup_5gram_frac``    — fraction of 5-gram positions whose gram occurs
                          more than once in the document
- ``mean_word_len``     — characters per word

Scale shape: the per-doc scalars (word counts, mean length) are zero-shuffle
array expressions over the scan; the n-gram statistics explode BOTH gram
sizes in ONE pass tagged by n, then two-phase hash-aggregate — first on
(doc, n, gram), then on doc — so the whole panel costs one explode and one
shuffle keyed by doc_id regardless of corpus size. No per-doc O(len²) array
scans (higher-order-function count-inside-transform is quadratic per row and
re-evaluates its lambda per reference — see the word_shingles note in
operators/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOP_NGRAM_N = 2
DUP_NGRAM_N = 5


def _ws_words(text_col: str | Column) -> Column:
    """Single-space word split (the corpus format; identical in any SQL
    engine via string_split / string_to_array)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.split(c, " ")


def _grams(words: Column, n: int) -> Column:
    """All word n-grams of a BOUND words array, space-joined, with
    positional multiplicity (no distinct — repetition is the signal)."""
    idx = F.when(
        F.size(words) >= n, F.sequence(F.lit(1), F.size(words) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(idx, lambda i: F.array_join(F.slice(words, i, n), " "))


def repetition_metrics(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document repetition panel; returns
    (id, n_words, dup_word_frac, top_bigram_count, top_bigram_frac,
    dup_5gram_frac, mean_word_len).

    Fraction definitions (denominators are position counts, so every value
    is a ratio of two exact BIGINTs — one IEEE division, bit-identical in
    any engine):

    - dup_word_frac  = (n_words - n_distinct_words) / n_words
    - top_bigram_frac = max bigram multiplicity / (n_words - 1)
    - dup_5gram_frac = #positions whose 5-gram occurs ≥2× / (n_words - 4)

    Documents with no bigram (or 5-gram) positions report 0.0 for the
    corresponding fraction.
    """
    words = _ws_words(text_col)
    base = docs.select(
        F.col(id_col),
        F.size(words).cast("bigint").alias("n_words"),
        F.size(F.array_distinct(words)).cast("bigint").alias("n_distinct"),
        F.aggregate(
            words,
            F.lit(0).cast("bigint"),
            lambda acc, w: acc + F.length(w),
        ).alias("word_chars"),
    )

    tagged = docs.select(
        F.col(id_col),
        F.explode(
            F.concat(
                F.transform(
                    _grams(words, TOP_NGRAM_N),
                    lambda g: F.struct(
                        F.lit(TOP_NGRAM_N).alias("n"), g.alias("g")
                    ),
                ),
                F.transform(
                    _grams(words, DUP_NGRAM_N),
                    lambda g: F.struct(
                        F.lit(DUP_NGRAM_N).alias("n"), g.alias("g")
                    ),
                ),
            )
        ).alias("t"),
    )
    gram_counts = tagged.groupBy(
        F.col(id_col), F.col("t.n").alias("n"), F.col("t.g").alias("g")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    is_top = F.col("n") == TOP_NGRAM_N
    is_dup5 = (F.col("n") == DUP_NGRAM_N) & (F.col("cnt") >= 2)
    per_doc = gram_counts.groupBy(id_col).agg(
        F.max(F.when(is_top, F.col("cnt"))).alias("top_bigram_count"),
        F.sum(F.when(is_dup5, F.col("cnt"))).alias("dup5_positions"),
    )

    j = base.join(per_doc, id_col, "left")
    bigram_pos = F.col("n_words") - F.lit(TOP_NGRAM_N - 1)
    gram5_pos = F.col("n_words") - F.lit(DUP_NGRAM_N - 1)
    return j.select(
        F.col(id_col),
        F.col("n_words"),
        (
            (F.col("n_words") - F.col("n_distinct")).cast("double")
            / F.col("n_words").cast("double")
        ).alias("dup_word_frac"),
        F.coalesce(F.col("top_bigram_count"), F.lit(0))
        .cast("bigint")
        .alias("top_bigram_count"),
        F.when(
            bigram_pos > 0,
            F.coalesce(F.col("top_bigram_count"), F.lit(0)).cast("double")
            / bigram_pos.cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("top_bigram_frac"),
        F.when(
            gram5_pos > 0,
            F.coalesce(F.col("dup5_positions"), F.lit(0)).cast("double")
            / gram5_pos.cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_5gram_frac"),
        (F.col("word_chars").cast("double") / F.col("n_words").cast("double")).alias(
            "mean_word_len"
        ),
    )


def repetition_gate(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_dup_word_frac: float = 0.8,
    max_top_bigram_frac: float = 0.18,
    max_dup_5gram_frac: float = 0.30,
) -> DataFrame:
    """Gopher-style keep/drop gate over the repetition panel: a document
    survives iff every repetition fraction is at or under its threshold.
    Returns (id, keep) for every input document — callers semi-join the
    survivors, keeping the gate decision auditable."""
    m = repetition_metrics(docs, id_col=id_col, text_col=text_col)
    keep = (
        (F.col("dup_word_frac") <= F.lit(max_dup_word_frac))
        & (F.col("top_bigram_frac") <= F.lit(max_top_bigram_frac))
        & (F.col("dup_5gram_frac") <= F.lit(max_dup_5gram_frac))
    )
    return m.select(F.col(id_col), keep.cast("int").alias("keep"))
