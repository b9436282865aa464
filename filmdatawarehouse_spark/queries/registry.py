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
CURRENT_ROUND = 7

# First-50 window for the external driver, highest certification value first
# (round-7 rotation per VERDICT r06 item 3):
#  1. the 33 queries whose latest driver rows are r04 — 2 rounds stale,
#     the maximum the staleness guard tolerates; they MUST certify this
#     round (the 14 simplest parity entries plus the 19 that yielded
#     their r06 slots to round-6 additions)
#  2. new round-7 queries (driver-never-seen; registered as they land)
# Everything certified green in r05/r06 moves to the tail and queues for
# the r08 window; every entry is still verified locally on every pytest
# run by tests/test_parity_queries.py.
DRIVER_PRIORITY: tuple[str, ...] = (
    # -- 1. r04-stale entries (hard deadline: this round)
    "scan_project",
    "clean_dropna_dedup",
    "filter_pushdown",
    "dim_date_generate",
    "derive_date_id",
    "derive_month_key",
    "join_inner_equi",
    "fact_daily_orders",
    "fact_monthly_totals",
    "monthly_revenue",
    "top10_parts",
    "filtered_daily_series",
    "sql_passthrough",
    "unpivot_part",
    "text_langid",
    "text_quality",
    "text_token_count",
    "text_word_freq",
    "events_tumbling_window",
    "events_sliding_window",
    "events_session_window",
    "events_user_totals",
    "events_gaps",
    "events_json_props",
    "events_locf_fill",
    "events_hourly_gapfill",
    "latest_order_per_customer",
    "grouping_sets_orders",
    "range_join_events",
    "join_bigbig_bucketed",
    "skew_salted_group_count",
    "skew_salted_join",
    "profile_orders",
    # -- 2. new round-7 queries: driver-never-seen
    "revenue_forecast_q6",
    "returned_items_topk",
    "promo_revenue_monthly",
    "large_volume_customers",
    "disjunctive_revenue",
    "orders_exists_late_lines",
    "priority_lines_by_status",
    "part_min_price_per_type",
    "customers_anti_orders",
    "orders_rollup_totals",
    "events_pivot_type_daily",
    "text_topk_per_lang",
    "split_contamination_rate",
    "acctbal_histogram",
    "skew_profile_custkey_approx",
    "docs_mad_outliers_approx",
    "events_distinct_users_approx",
    # the 50 r05-certified entries + the 50 r06-certified entries hold
    # their rows and queue for the r08 window (r05 set first — it will be
    # 2 rounds stale by then, hitting the same hard deadline the r04 set
    # hits this round)
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
        from filmdatawarehouse_spark.queries.warehouse_shapes import (
            WAREHOUSE_SHAPE_QUERIES,
        )

        registry.update(WAREHOUSE_SHAPE_QUERIES)
    except ImportError:
        pass

    try:
        from filmdatawarehouse_spark.queries.approx_twins import (
            APPROX_TWIN_QUERIES,
        )

        registry.update(APPROX_TWIN_QUERIES)
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
