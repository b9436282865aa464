"""Single registry of every (query, oracle) pair the engine declares.

Aggregates the parity queries (reference SURVEY.md §2 surface) and the
extended large-scale pipeline queries (dedup / similarity / text analysis /
windows) into one dict for the driver contract (``__spark_entry__``), tests,
and the bench harness.

ORDERING MATTERS: the external correctness driver checks only the FIRST 50
entries of ``queries()``. ``DRIVER_PRIORITY`` pins that window to the
queries that most need driver certification this round — entries that have
never (or not recently) received a CORRECTNESS row, new operators, and
operators whose implementation changed — while rotating repeatedly-green
parity entries to the tail. Every entry past the window is still verified
locally by ``tests/test_parity_queries.py``, which oracle-compares ALL
registered queries at sf0.001.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]
Entry = tuple[QueryFn, str | None]  # (spark builder, duckdb oracle sql or None)

# First-50 window for the external driver, highest certification value first
# (round-5 rotation per VERDICT r04 item 1 — the 49 registered queries with
# NO CORRECTNESS_r04 row, so after this round every query has an
# r04-or-r05 green driver row):
#  1. the 9 round-4 additions that have NEVER had a driver row — local
#     sf0.001 oracle-green is necessary but not sufficient (r03 proved the
#     driver environment can diverge from the local check)
#  2. new round-5 queries (also driver-never-seen)
#  3. the r03-certified dedup/similarity/quantize/curation/relational
#     families rotated out of the r04 window (no driver row since r02/r03)
# Everything certified green in r04 moves to the tail; it is still verified
# locally every pytest run by tests/test_parity_queries.py.
DRIVER_PRIORITY: tuple[str, ...] = (
    # -- 1. round-4 additions: driver-never-seen
    "basket_part_pairs",
    "dedup_clusters_star",
    "dedup_edit_distance",
    "dq_checks",
    "events_cohort_retention",
    "events_rolling_actives",
    "scd2_point_in_time",
    "text_vocab_encode",
    "text_word_entropy",
    # -- 2. new round-5 queries: driver-never-seen
    # (inserted here as they land; tail entries below yield their slot —
    #  they keep their r03 green rows and rotate back in r06)
    "text_word_entropy_native",
    "multimodal_byte_stats_native",
    "events_wow_growth",
    "events_sessions_capped",
    "text_bigram_lm",
    "docs_mad_outliers",
    "bloom_prefilter_join",
    "text_heavy_hitters",
    "text_sparse_cosine_pairs",
    "dedup_triangles",
    "window_value_family",
    "events_time_rollup",
    "text_containment_pairs",
    "text_unigram_logprob",
    # -- 3. r03-certified, no driver row since r02/r03
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "dedup_embedding_ann_recall",
    "similarity_topk",
    "similarity_range",
    "similarity_ann_ivf",
    "similarity_ann_recall",
    "sketch_accuracy",
    "corpus_split",
    "text_pmi_bigrams",
    "multimodal_frame_meta",
    "multimodal_byte_stats",
    "multimodal_payload_meta",
    "window_topn_per_group",
    "rollup_order_stats",
    "set_ops_customers",
    "count_distinct",
    "scd2_customer_dim",
    "pivot_orders",
    "cube_order_stats",
    "anti_join_customers",
    "semi_join_suppliers",
    "percentile_order_value",
    "above_customer_avg",
    # bumped to the tail for round 5 by the 14 new driver-never-seen
    # queries (each keeps its r03 green row; rotate back in r06):
    # snapshot_diff_customers, ntile_order_value, corr_qty_price,
    # window_rank_family, pipeline_curate_documents, join_bigbig_rollup,
    # decontaminate_docs, pack_sequences, redact_pii_docs,
    # text_repetition_metrics, text_repetition_gate,
    # embedding_quantize_codes, embedding_quantize_error
)


# Every registered query without a DuckDB oracle must carry an entry here
# explaining WHY it is rows-only and WHICH hash-gated query certifies it
# instead (tests/test_registry.py enforces the pairing; QUERIES.md renders
# it). Rows-only is a deliberate, documented status — never a missing oracle.
ROWS_ONLY_NOTES: dict[str, str] = {
    "similarity_ann_ivf": (
        "Permanently rows-only BY DESIGN: IVF top-k is approximate, and its "
        "exact neighbor set depends on float summation order across "
        "partitions during k-means training, so no engine-independent value "
        "hash exists. Its quality contract is certified by "
        "`similarity_ann_recall`, whose hash-gated oracle pins "
        "recall@5 >= 0.9 of this exact path vs exact top-k over the same "
        "query set (the same pattern as `dedup_embedding_ann_recall`)."
    ),
}


def all_queries() -> dict[str, Entry]:
    from filmdatawarehouse_spark.queries.parity import PARITY_QUERIES

    registry: dict[str, Entry] = dict(PARITY_QUERIES)

    try:
        from filmdatawarehouse_spark.queries.extended import EXTENDED_QUERIES

        registry.update(EXTENDED_QUERIES)
    except ImportError:
        pass

    try:
        from filmdatawarehouse_spark.queries.relational import RELATIONAL_QUERIES

        registry.update(RELATIONAL_QUERIES)
    except ImportError:
        pass

    try:
        from filmdatawarehouse_spark.queries.pipeline import (
            curate_documents,
            curate_documents_oracle,
        )

        registry["pipeline_curate_documents"] = (
            curate_documents,
            curate_documents_oracle(),
        )
    except ImportError:
        pass

    try:
        from filmdatawarehouse_spark.queries.bigjoin import BIGJOIN_QUERIES

        registry.update(BIGJOIN_QUERIES)
    except ImportError:
        pass

    try:
        from filmdatawarehouse_spark.queries.curation import CURATION_QUERIES

        registry.update(CURATION_QUERIES)
    except ImportError:
        pass

    try:
        from filmdatawarehouse_spark.queries.repetition import REPETITION_QUERIES

        registry.update(REPETITION_QUERIES)
    except ImportError:
        pass

    try:
        from filmdatawarehouse_spark.queries.incremental import INCREMENTAL_QUERIES

        registry.update(INCREMENTAL_QUERIES)
    except ImportError:
        pass

    try:
        from filmdatawarehouse_spark.queries.quantize import QUANTIZE_QUERIES

        registry.update(QUANTIZE_QUERIES)
    except ImportError:
        pass

    try:
        from filmdatawarehouse_spark.queries.chunking import CHUNKING_QUERIES

        registry.update(CHUNKING_QUERIES)
    except ImportError:
        pass

    try:
        from filmdatawarehouse_spark.queries.timeseries import TIMESERIES_QUERIES

        registry.update(TIMESERIES_QUERIES)
    except ImportError:
        pass

    try:
        from filmdatawarehouse_spark.queries.quality import QUALITY_QUERIES

        registry.update(QUALITY_QUERIES)
    except ImportError:
        pass

    try:
        from filmdatawarehouse_spark.queries.basket import BASKET_QUERIES

        registry.update(BASKET_QUERIES)
    except ImportError:
        pass

    try:
        from filmdatawarehouse_spark.queries.streaming_twin import (
            stream_dedup_final,
            stream_dedup_final_oracle,
            stream_sessions_final,
            stream_sessions_final_oracle,
        )

        registry["stream_sessions_final"] = (
            stream_sessions_final,
            stream_sessions_final_oracle(),
        )
        registry["stream_dedup_final"] = (
            stream_dedup_final,
            stream_dedup_final_oracle(),
        )
    except ImportError:
        pass

    ordered: dict[str, Entry] = {}
    for name in DRIVER_PRIORITY:
        if name in registry:
            ordered[name] = registry[name]
    for name, entry in registry.items():
        if name not in ordered:
            ordered[name] = entry
    return ordered
