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
# (round-4 rebuild per VERDICT r03 item 2 — exactly ≤50 names so the window
# test can actually gate):
#  1. the 7 queries that ERRed in r03 on the events-reader bug — the fix
#     (io/sources.py type-adaptive ts) must re-certify against the driver
#  2. the 34 entries rotated out of r03's window (parity set + text/events
#     extended) — no driver row since r02, and r03 proved rotation isn't
#     free: the environment shifted underneath exactly the rotated set
#  3. operators whose implementation changed this round (lazy incremental
#     guard, scoped bucketed-scan conf) — keep inside the window
#  4. new queries added this round (streaming-dedup batch twin etc.)
DRIVER_PRIORITY: tuple[str, ...] = (
    # -- 1. errored in r03, fixed this round: must re-certify
    "events_hourly_gapfill",
    "stream_sessions_final",
    "stratified_sample_events",
    "asof_join_events",
    "range_join_events",
    "skew_salted_group_count",
    "skew_salted_join",
    # -- 2. rotated out of r03 (last driver row: r02) — parity set first
    "scan_project",
    "filter_pushdown",
    "join_inner_equi",
    "fact_daily_orders",
    "fact_monthly_totals",
    "monthly_revenue",
    "filtered_daily_series",
    "top10_parts",
    "sql_passthrough",
    "dim_date_generate",
    "derive_date_id",
    "derive_month_key",
    "clean_dropna_dedup",
    # -- 2b. rotated-out extended (events/text/misc)
    "events_tumbling_window",
    "events_sliding_window",
    "events_session_window",
    "events_user_totals",
    "events_running_totals",
    "events_funnel",
    "events_gaps",
    "events_locf_fill",
    "events_json_props",
    "latest_order_per_customer",
    "grouping_sets_orders",
    "profile_orders",
    "unpivot_part",
    "embedding_norm_hist",
    "text_langid",
    "text_quality",
    "text_token_count",
    "text_fingerprint",
    "text_normalize_dedup",
    "text_word_freq",
    "text_tfidf",
    # -- 3. implementation touched this round
    "dedup_incremental",
    "join_bigbig_bucketed",
    "dedup_clusters",
    # -- 4. new this round
    "stream_dedup_final",
    "chunk_documents",
    "corpus_merge_priority",
    "events_ohlc_hourly",
    "events_range_window",
    "events_zscore_outliers",
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
