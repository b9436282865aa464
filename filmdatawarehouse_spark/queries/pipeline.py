"""Composed training-data curation pipeline — the operators working together.

The canonical LLM-corpus preparation shape, as one lazy Catalyst plan:

  documents
    → clean (any-null drop + exact dedup)            [reference P2+D1]
    → language ID + quality score + token count       [text operators]
    → quality gate (score ≥ threshold, length bounds)
    → near-duplicate removal (MinHash survivor pick)
    → per-language corpus stats

Everything is a single DataFrame graph: Catalyst fuses the text-metric
projections, the dedup survivor anti-join broadcasts (pair set is tiny
relative to the corpus), and the final rollup is a two-phase aggregate.
The DuckDB oracle replays the identical logic in SQL, so this composition is
hash-checked end-to-end, not just operator-by-operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from filmdatawarehouse_spark.io.sources import read_table
from filmdatawarehouse_spark.operators import text as tx
from filmdatawarehouse_spark.operators.cleaning import clean

QUALITY_MIN = 0.5
MIN_TOKENS = 10
# MUST equal queries.extended.JACCARD_T: the dedup stage reuses the shared
# raw-corpus MinHash pair frame built at that threshold (import-checked in
# curate_documents); the oracle embeds this constant independently.
JACCARD_T = 0.8


def _gated_survivors(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """The pipeline's shared first three stages: ``(docs, kept)`` where
    ``docs`` is the persisted CLEANED corpus and ``kept`` the
    heuristic-gated, doc-level-deduped survivors
    ``(doc_id, lang_pred, quality, n_tokens)``.

    Near-dup removal drops the higher doc_id of every verified pair
    (survivor = lowest id). The shared raw-corpus MinHash pair frame is
    reused ONLY when cleaning provably dropped nothing (count equality
    — clean() can only remove rows, so equal counts ⟹ identical
    frames ⟹ identical pairs, hot-bucket cap included). A pairwise
    restriction of the raw pairs is NOT sound in general: LSH
    candidate generation is corpus-dependent through BUCKET_CAP — a
    bucket pushed hot by later-cleaned rows can drop a pair of two
    cleaned docs that the cleaned-corpus build finds (review r10) —
    so when cleaning dropped anything, the pair frame is built over
    the cleaned docs exactly as the oracle replays it. The raw count
    is a parquet-metadata read; the cleaned count materializes the
    persisted frame every caller reuses."""
    from filmdatawarehouse_spark.operators.cache import managed_persist
    from filmdatawarehouse_spark.queries.extended import (
        JACCARD_T as SHARED_JACCARD_T,
        minhash_pairs_shared,
    )

    if SHARED_JACCARD_T != JACCARD_T:  # oracles embed the local constant
        raise RuntimeError(
            "pipeline JACCARD_T diverged from the shared pair frame's"
        )
    # cleaned docs feed BOTH the metric projection and the dedup shingle
    # stage — persist so the scan+clean shuffle runs once, not per branch
    docs = managed_persist(clean(read_table(spark, sf_dir, "documents")))

    # one fused zero-shuffle projection instead of lang ⋈ quality ⋈ tokens.
    # A volume-keyed (width 8) spread of this projection was re-A/B'd in
    # r17 (r16 measured the width-32 variant regressing every composed
    # consumer): 6 interleaved cold runs read mins 4.28 s (spread) vs
    # 4.13 s (none) with ±2 s host noise — no resolvable win on a
    # ~0.68 s single-task stage, so the r16 leave-alone stands.
    metrics = tx.text_metrics_frame(docs)
    gated = metrics.filter(
        (F.col("quality") >= F.lit(QUALITY_MIN))
        & (F.col("n_tokens") >= F.lit(MIN_TOKENS))
    )
    raw_n = read_table(spark, sf_dir, "documents").count()
    if docs.count() == raw_n:
        pairs = minhash_pairs_shared(spark, sf_dir)
    else:
        from filmdatawarehouse_spark.operators import dedup as dd

        pairs = dd.minhash_dedup_pairs(docs, threshold=JACCARD_T)
    losers = pairs.select(F.col("doc_id_b").alias("doc_id")).distinct()
    kept = gated.join(F.broadcast(losers), "doc_id", "left_anti")
    return docs, kept


def curate_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language stats of the curated corpus:
    (lang_pred, n_docs, total_tokens, avg_quality)."""
    _, kept = _gated_survivors(spark, sf_dir)

    return kept.groupBy("lang_pred").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        # avg over exact decimal sum → double, order-independent
        (
            F.sum(F.col("quality").cast("decimal(28,18)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_quality"),
    )


# --- model-based (CCNet) quality stage, composed onto the pipeline (r12) ---
# Growth-policy capability: operators + pytest oracle, no driver row
# (tests/test_pipeline_lm.py replays scoring + bucket assignment in DuckDB
# over the same LM table). Constants shared with the certified
# text_bigram_lm query so the LM shape cannot drift from the certified one.
LM_TRAIN_QUALITY = 0.7  # heuristic-quality head that trains the LM
PPL_HEAD = 0.3
PPL_TAIL = 0.3


def _bigram_lm_frame(train: DataFrame) -> DataFrame:
    """Bigram LM ``(w1, w2, cond_p)`` over ``train``'s text — the exact
    shape of the certified ``text_bigram_lm`` query (extended.py:495:
    zip_with bigrams zero-shuffle, one count aggregate, marginal derived
    from the counts, top-K via TakeOrderedAndProject) restricted to the
    three columns ``bigram_perplexity`` consumes."""
    from filmdatawarehouse_spark.queries.extended import (
        BIGRAM_MIN_COUNT,
        BIGRAM_TOP_K,
    )

    words = F.split(F.col("text"), " ")
    pairs = F.zip_with(
        F.slice(words, 1, F.size(words) - 1),
        F.slice(words, 2, F.size(words) - 1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    bg = (
        train.select(F.explode(pairs).alias("p"))
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
    )
    marg = bg.groupBy("w1").agg(F.sum("c12").alias("c1"))
    return (
        bg.filter(F.col("c12") >= BIGRAM_MIN_COUNT)
        .join(marg, "w1")
        .select(
            "w1",
            "w2",
            (
                F.col("c12").cast("double") / F.col("c1").cast("double")
            ).alias("cond_p"),
        )
        .orderBy(F.col("cond_p").desc(), "w1", "w2")
        .limit(BIGRAM_TOP_K)
    )


def lm_bucketed_documents(
    spark: SparkSession,
    sf_dir: str,
    edges: tuple[float, float] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """The CCNet model-based quality stage composed onto the curated
    corpus: ``(bucketed, lm)`` where ``bucketed`` is every
    heuristic-gated, deduped survivor of ``curate_documents``'s first
    three stages with ``(doc_id, lang_pred, quality, n_tokens, text,
    n_bigrams, avg_logprob, perplexity, ppl_bucket)``, and ``lm`` is the
    bigram model that scored it — trained on the HIGH-heuristic-quality
    head (``quality >= LM_TRAIN_QUALITY``), the trusted-split stand-in
    for CCNet's reference corpus. ``edges`` pins explicit bucket
    thresholds (test oracles, production policy); default is the
    head/tail quantile split.

    Scale shape: everything before bucketing is the certified pipeline
    plan plus one broadcast LM join and one per-doc aggregation
    (``bigram_perplexity``); bucketing adds a bounded scalar collect
    (or none with explicit edges) and a map-side withColumn.
    """
    from filmdatawarehouse_spark.operators.cache import managed_persist

    docs, survivors = _gated_survivors(spark, sf_dir)
    kept = survivors.join(docs.select("doc_id", "text"), "doc_id")
    kept = managed_persist(kept)  # feeds LM training AND scoring

    train = kept.filter(
        F.col("quality") >= F.lit(LM_TRAIN_QUALITY)
    ).select("text")
    lm = _bigram_lm_frame(train)
    scored = tx.bigram_perplexity(kept.select("doc_id", "text"), lm)
    bucketed = tx.perplexity_buckets(
        kept.join(scored, "doc_id"),
        head=PPL_HEAD,
        tail=PPL_TAIL,
        edges=edges,
    )
    return bucketed, lm


def curate_documents_lm(
    spark: SparkSession,
    sf_dir: str,
    drop_buckets: tuple[str, ...] = ("tail",),
    edges: tuple[float, float] | None = None,
) -> DataFrame:
    """``curate_documents`` with the model-based stage applied: the
    per-(language, bucket) rollup of the corpus AFTER dropping
    ``drop_buckets`` (CCNet drops or audits the tail). Same rollup
    measures as the certified query, keyed by (lang_pred, ppl_bucket).
    Every surviving doc is scored by construction (MIN_TOKENS >= 10
    guarantees bigrams), so 'unscored' is empty here — asserted by the
    pytest oracle, not silently assumed."""
    bucketed, _ = lm_bucketed_documents(spark, sf_dir, edges=edges)
    kept = bucketed.filter(~F.col("ppl_bucket").isin(list(drop_buckets)))
    return kept.groupBy("lang_pred", "ppl_bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        (
            F.sum(F.col("quality").cast("decimal(28,18)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_quality"),
    )


# --- span-level duplicate gate, composed onto the pipeline (r12) ---
# Growth-policy capability: operator + pytest oracle, no driver row
# (tests/test_dupcoverage.py replays the composed gate in DuckDB).
SPAN_N = 5
SPAN_MIN_DOCS = 2
SPAN_MAX_DUP_FRAC = 0.5


def curate_documents_span_gated(
    spark: SparkSession,
    sf_dir: str,
    n: int = SPAN_N,
    min_docs: int = SPAN_MIN_DOCS,
    max_dup_frac: float = SPAN_MAX_DUP_FRAC,
) -> DataFrame:
    """``curate_documents`` with the Lee-et-al span-level stage applied:
    after the heuristic gate and doc-level dedup, compute duplicated
    n-gram coverage OVER THE SURVIVOR CORPUS (not the raw corpus — a
    survivor's grams trivially appear in its dropped twin, so raw-corpus
    coverage would re-flag exactly what dedup just resolved) and drop
    documents whose ``dup_frac`` exceeds ``max_dup_frac`` — the
    template/boilerplate residue document-level dedup cannot see. Same
    per-language rollup shape as the certified query. At the default
    n=5 every survivor is coverage-scored by construction (MIN_TOKENS
    ≥ 10 > n ⟹ every doc has grams — asserted by the pytest oracle);
    with a caller-raised n, a survivor too short for any n-gram keeps a
    NULL ``dup_frac`` and PASSES the gate — an evidence gap is not
    evidence of duplication, the same rule the semantic gate applies to
    missing embeddings."""
    from filmdatawarehouse_spark.operators.dupcoverage import (
        dup_ngram_coverage,
    )

    docs, survivors = _gated_survivors(spark, sf_dir)
    with_text = survivors.join(docs.select("doc_id", "text"), "doc_id")
    cov = dup_ngram_coverage(with_text, n=n, min_docs=min_docs)
    final = survivors.join(cov, "doc_id").filter(
        F.col("dup_frac").isNull()
        | (F.col("dup_frac") <= F.lit(max_dup_frac))
    )
    return final.groupBy("lang_pred").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        (
            F.sum(F.col("quality").cast("decimal(28,18)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_quality"),
    )


def _kept_ctes() -> str:
    """The shared DuckDB CTE chain (cleaned → gate → dedup → kept) both
    pipeline oracles build on — same constants, same rules as
    ``_gated_survivors``."""
    from filmdatawarehouse_spark.queries.extended import _WORD_SHINGLES, _langid_sql, _quality_sql

    langid = _langid_sql()
    quality = _quality_sql()
    return f"""
        WITH cleaned AS (
          SELECT DISTINCT * FROM documents
          WHERE doc_id IS NOT NULL AND text IS NOT NULL AND lang IS NOT NULL
            AND source IS NOT NULL AND n_chars IS NOT NULL
        ),
        documents_clean AS (SELECT * FROM cleaned),
        lang_pred AS (
          {langid.replace("FROM documents", "FROM documents_clean")}
        ),
        quality AS (
          {quality.replace("FROM documents", "FROM documents_clean")}
        ),
        tokens AS (
          SELECT doc_id, len(string_split(text, ' '))::BIGINT AS n_tokens
          FROM documents_clean
        ),
        sh AS ({_WORD_SHINGLES.replace("FROM documents", "FROM documents_clean")}),
        losers AS (
          SELECT DISTINCT b.doc_id
          FROM sh a JOIN sh b ON a.doc_id < b.doc_id
          WHERE len(list_intersect(a.shingles, b.shingles))::DOUBLE
                  / len(list_distinct(list_concat(a.shingles, b.shingles)))
                >= {JACCARD_T}
        ),
        kept AS (
          SELECT l.doc_id, l.lang_pred, q.quality, t.n_tokens
          FROM lang_pred l
          JOIN quality q USING (doc_id)
          JOIN tokens t USING (doc_id)
          WHERE q.quality >= {QUALITY_MIN} AND t.n_tokens >= {MIN_TOKENS}
            AND l.doc_id NOT IN (SELECT doc_id FROM losers)
        )"""


_ROLLUP_SELECT = """
        SELECT lang_pred,
               COUNT(*) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
               CAST(SUM(CAST(quality AS DECIMAL(28,18))) AS DOUBLE) / COUNT(*)
                 AS avg_quality
        FROM {src}
        GROUP BY lang_pred
    """


def curate_documents_oracle() -> str:
    """DuckDB twin of ``curate_documents`` (same constants, same rules)."""
    return _kept_ctes() + _ROLLUP_SELECT.format(src="kept")


def curate_documents_span_gated_oracle(
    n: int = SPAN_N,
    min_docs: int = SPAN_MIN_DOCS,
    max_dup_frac: float = SPAN_MAX_DUP_FRAC,
) -> str:
    """DuckDB twin of ``curate_documents_span_gated``: the shared kept
    CTEs plus the duplicated-n-gram coverage replay (identical
    tokenization and 60-bit md5 gram hashing as the Spark operator)
    computed over the SURVIVOR corpus, gated at ``max_dup_frac``."""
    return (
        _kept_ctes()
        + f""",
        survivor_text AS (
          SELECT k.doc_id, string_split(c.text, ' ') AS toks
          FROM kept k JOIN cleaned c USING (doc_id)
        ),
        occ AS (
          SELECT doc_id,
                 ('0x' || substr(md5(array_to_string(toks[i:i+{n - 1}], ' ')), 1, 15))::BIGINT AS gram_h
          FROM survivor_text, LATERAL (
            SELECT unnest(range(1, greatest(len(toks) - {n} + 2, 1))) AS i
          )
        ),
        dup_grams AS (
          SELECT gram_h FROM occ GROUP BY gram_h
          HAVING count(DISTINCT doc_id) >= {min_docs}
        ),
        coverage AS (
          SELECT doc_id,
                 count(*) AS n_ngrams,
                 sum(CASE WHEN gram_h IN (SELECT gram_h FROM dup_grams)
                     THEN 1 ELSE 0 END) AS dup_ngrams
          FROM occ GROUP BY doc_id
        ),
        span_gated AS (
          -- LEFT join + NULL-passes: a survivor with no n-grams keeps
          -- a NULL coverage and is NOT dropped (no-evidence rule)
          SELECT k.* FROM kept k LEFT JOIN coverage v USING (doc_id)
          WHERE v.doc_id IS NULL
             OR v.dup_ngrams / v.n_ngrams::DOUBLE <= {max_dup_frac}
        )"""
        + _ROLLUP_SELECT.format(src="span_gated")
    )
