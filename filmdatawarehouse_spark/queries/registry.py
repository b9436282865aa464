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

# The round the NEXT CORRECTNESS_r{N}.json will carry. Bumped at each
# round's window rotation; pins the staleness ledger (QUERIES.md "last
# driver row" column + tests/test_registry.py staleness guard) to the
# round files that exist at rotation time, so the guard stays green even
# after the driver drops this round's new CORRECTNESS file mid-round.
CURRENT_ROUND = 6

# First-50 window for the external driver, highest certification value first
# (round-6 rotation per VERDICT r05 item 1):
#  1. the 13 queries whose ONLY driver rows are r03 (bumped from the r05
#     window by the 14 round-5 additions) — 3 rounds stale, the maximum
#     the staleness guard tolerates
#  2. new round-6 queries (driver-never-seen; inserted as they land,
#     taking slots from the bottom of group 3)
#  3. the stalest r04-certified entries — streaming twins, dedup/text
#     operators, and the events/timeseries family first; 33 r04 entries
#     wait for r07, where they lead the window: the 14 simplest parity
#     entries (clean_dropna_dedup, derive_date_id, derive_month_key,
#     dim_date_generate, fact_daily_orders, fact_monthly_totals,
#     filter_pushdown, filtered_daily_series, join_inner_equi,
#     monthly_revenue, scan_project, sql_passthrough, top10_parts,
#     unpivot_part) plus the 16 that yielded slots to round-6 additions
#     (see the tail comment below).
# Everything certified green in r05 moves to the tail; every entry is
# still verified locally on every pytest run by
# tests/test_parity_queries.py.
DRIVER_PRIORITY: tuple[str, ...] = (
    # -- 1. r03-only driver rows (stalest first priority)
    "snapshot_diff_customers",
    "ntile_order_value",
    "corr_qty_price",
    "window_rank_family",
    "pipeline_curate_documents",
    "join_bigbig_rollup",
    "decontaminate_docs",
    "pack_sequences",
    "redact_pii_docs",
    "text_repetition_metrics",
    "text_repetition_gate",
    "embedding_quantize_codes",
    "embedding_quantize_error",
    # -- 2. new round-6 queries: driver-never-seen
    "stream_sessions_capped",
    "text_prefix_filter_pairs",
    "regional_supplier_revenue",
    "customer_rfm",
    "orders_abc_pareto",
    "events_daily_streaks",
    "events_first_touch",
    "events_mode_type",
    "graph_bfs_hops",
    "events_hour_heatmap",
    "stream_interval_join",
    "events_hourly_anomalies",
    "pricing_summary",
    "shipping_priority",
    "incremental_daily_rollup",
    "orders_upsert_merge",
    "text_hof_stats",
    "events_transitions",
    "stream_heavy_hitters",
    "skew_profile_custkey",
    # -- 3. stalest r04-certified entries
    "stream_sessions_final",
    "stream_dedup_final",
    "dedup_clusters",
    "dedup_incremental",
    "text_normalize_dedup",
    "text_tfidf",
    "text_fingerprint",
    "chunk_documents",
    "corpus_merge_priority",
    "stratified_sample_events",
    "embedding_norm_hist",
    "events_funnel",
    "events_ohlc_hourly",
    "events_range_window",
    "events_running_totals",
    "events_zscore_outliers",
    "asof_join_events",
    # text_langid, text_quality, text_token_count, text_word_freq,
    # events_gaps, events_hourly_gapfill, events_json_props,
    # events_locf_fill, events_session_window,
    # events_sliding_window,
    # events_tumbling_window, events_user_totals, range_join_events,
    # latest_order_per_customer, grouping_sets_orders,
    # join_bigbig_bucketed, skew_salted_group_count, skew_salted_join,
    # profile_orders yielded their r06 slots to the twenty new round-6
    # queries above; they keep their r04 rows and join the 14 r04 parity
    # entries at the head of the r07 window
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
        from filmdatawarehouse_spark.queries.graph import GRAPH_QUERIES

        registry.update(GRAPH_QUERIES)
    except ImportError:
        pass

    try:
        from filmdatawarehouse_spark.queries.streaming_twin import (
            stream_dedup_final,
            stream_dedup_final_oracle,
            stream_heavy_hitters,
            stream_heavy_hitters_oracle,
            stream_interval_join_final,
            stream_interval_join_final_oracle,
            stream_sessions_capped_final,
            stream_sessions_capped_final_oracle,
            stream_sessions_final,
            stream_sessions_final_oracle,
        )

        registry["stream_sessions_final"] = (
            stream_sessions_final,
            stream_sessions_final_oracle(),
        )
        registry["stream_sessions_capped"] = (
            stream_sessions_capped_final,
            stream_sessions_capped_final_oracle(),
        )
        registry["stream_dedup_final"] = (
            stream_dedup_final,
            stream_dedup_final_oracle(),
        )
        registry["stream_interval_join"] = (
            stream_interval_join_final,
            stream_interval_join_final_oracle(),
        )
        registry["stream_heavy_hitters"] = (
            stream_heavy_hitters,
            stream_heavy_hitters_oracle(),
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
