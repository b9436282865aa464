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

# First-50 window for the external driver, highest certification value first:
#  1. never driver-verified as of round 2 (relational tail + new this round)
#  2. missing from CORRECTNESS_r02 (driver cap) though green in r1/pytest
#  3. operators whose code changed this round (dedup guards, PMI window,
#     exact-cosine candidate path, streaming sessions)
#  4. high-value extended coverage (sketches, skew, windows)
DRIVER_PRIORITY: tuple[str, ...] = (
    # -- never driver-verified (round 2 "What's missing" #1)
    "corr_qty_price",
    "events_hourly_gapfill",
    "multimodal_frame_meta",
    "ntile_order_value",
    "snapshot_diff_customers",
    "window_rank_family",
    # -- new operators this round
    "join_bigbig_rollup",
    "join_bigbig_bucketed",
    "stream_sessions_final",
    "decontaminate_docs",
    "stratified_sample_events",
    "pack_sequences",
    "redact_pii_docs",
    "text_repetition_metrics",
    "text_repetition_gate",
    "dedup_incremental",
    "embedding_quantize_codes",
    "embedding_quantize_error",
    # -- green in r1 / pytest but past r2's driver cap
    "window_topn_per_group",
    "rollup_order_stats",
    "set_ops_customers",
    "count_distinct",
    "asof_join_events",
    "range_join_events",
    "scd2_customer_dim",
    "pivot_orders",
    "cube_order_stats",
    "anti_join_customers",
    "semi_join_suppliers",
    "percentile_order_value",
    "above_customer_avg",
    "pipeline_curate_documents",
    "multimodal_byte_stats",
    "multimodal_payload_meta",
    # -- implementation touched this round: keep inside the window
    "text_pmi_bigrams",
    "dedup_embedding_cosine",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_clusters",
    "dedup_exact",
    "dedup_embedding_ann_recall",
    "similarity_ann_recall",
    "similarity_topk",
    "similarity_range",
    "similarity_ann_ivf",
    # -- high-value extended coverage
    "sketch_accuracy",
    "skew_salted_group_count",
    "skew_salted_join",
    "corpus_split",
    "events_session_window",
    "events_user_totals",
    "text_tfidf",
    "text_word_freq",
    "events_running_totals",
)


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
        from filmdatawarehouse_spark.queries.streaming_twin import (
            stream_sessions_final,
            stream_sessions_final_oracle,
        )

        registry["stream_sessions_final"] = (
            stream_sessions_final,
            stream_sessions_final_oracle(),
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
