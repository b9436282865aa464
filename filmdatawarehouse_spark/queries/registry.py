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

# The block between the ROTATION-MANAGED markers is rewritten by
# ``python tools/rotate_window.py`` at each round start (VERDICT r07
# item 7: the rotation is one gated command, not hand-edits — r06 shipped
# a stale QUERIES.md and r07 shipped phantom window names by hand-editing
# this file). The tool bumps the round, recomputes the stalest-first
# window from the CORRECTNESS ledger, validates every name against the
# live registry, regenerates QUERIES.md, and runs the registry +
# plan-hygiene guards before anything is written.
#
# CURRENT_ROUND: the round the NEXT CORRECTNESS_r{N}.json will carry.
# Pins the staleness ledger (QUERIES.md "last driver row" column +
# tests/test_registry.py staleness guard) to the round files that exist
# at rotation time, so the guard stays green even after the driver drops
# this round's new CORRECTNESS file mid-round.
#
# DRIVER_PRIORITY: the external driver certifies only the FIRST 50
# registry entries; this tuple IS that window.
#
# WINDOW_DEFERRED: names registered this round whose FIRST driver window
# slot is explicitly pushed to the next rotation because the staleness
# backlog fills all 50 slots (only never-certified names are deferrable —
# a certified-stale entry can never yield its slot; enforced by
# tests/test_registry.py::test_window_deferrals_are_sound). Deferred
# entries are still oracle-verified locally on every pytest run.
#
# Forward math (r09): the r09 window is fully ledger-determined — 48
# r06-certified entries at the staleness deadline + the 2 r08 deferrals.
# Looking ahead to r10: 47 r07-certified entries reach the deadline
# (49 minus the two r09 retirements `text_word_entropy` and
# `similarity_ann_ivf`) + the 2 r09 deferrals = 49 mandatory, slack 1.
# The r08 saturation (150 registered / 50 slots / 3-round bound = exact
# steady-state capacity) is resolved by the RETIRED mechanism below:
# active = registered - retired must stay <= window_size x 3, and the
# rotation tool reports the headroom (capacity - active) so growth is
# planned, not discovered at an over-committed rotation.
# --- BEGIN ROTATION-MANAGED (tools/rotate_window.py) ---
CURRENT_ROUND = 17

DRIVER_PRIORITY: tuple[str, ...] = (
    # -- r14-certified (staleness deadline)
    "text_unigram_logprob",
    "dedup_edit_distance",
    "dedup_triangles",
    "text_tfidf",
    "events_running_totals",
    "sketch_accuracy",
    "corpus_split",
    "text_normalize_dedup",
    "embedding_norm_hist",
    "text_pmi_bigrams",
    "multimodal_frame_meta",
    "multimodal_byte_stats_native",
    "multimodal_payload_meta",
    "set_ops_customers",
    "count_distinct",
    "scd2_point_in_time",
    "scd2_customer_dim",
    "cube_order_stats",
    "percentile_order_value",
    "above_customer_avg",
    "window_value_family",
    "events_time_rollup",
    "revenue_forecast_q6",
    "returned_items_topk",
    "large_volume_customers",
    "disjunctive_revenue",
    "orders_exists_late_lines",
    "part_min_price_per_type",
    "customers_anti_orders",
    "orders_rollup_totals",
    "events_pivot_type_daily",
    "acctbal_histogram",
    "text_topk_per_lang",
    "split_contamination_rate",
    "skew_profile_custkey_approx",
    "docs_mad_outliers_approx",
    "events_distinct_users_approx",
    "bloom_prefilter_join",
    "corpus_shuffle_shards",
    "events_cohort_retention",
    "events_rolling_actives",
    "events_wow_growth",
    "events_sessions_capped",
    "dq_checks",
    "docs_mad_outliers",
    "basket_part_pairs",
    # -- driver-never-seen (new this round)
    "text_containment_auto_pairs",
    # -- r15-certified (filler slot)
    "orders_abc_pareto",
    "filter_pushdown",
    "dim_date_generate",
)

WINDOW_DEFERRED: tuple[str, ...] = (
)
# --- END ROTATION-MANAGED ---


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


# Retirement (VERDICT r08 item 1): 150 registered queries / 50-slot driver
# window / 3-round staleness bound is exactly at steady-state capacity
# (window_size x 3 = 150), so without retirement no NEW query could ever
# earn a driver row. A RETIRED entry stays registered and locally
# oracle-verified on every pytest run (tests/test_parity_queries.py), but
# leaves the driver-certification rotation: tools/rotate_window.py excludes
# it from the staleness ledger math and the staleness guard exempts it.
#
# Retirement is only legal when (enforced by
# tests/test_registry.py::test_retired_queries_are_sound):
#   - the entry has at least one prior green driver row (retiring a
#     never-certified query would be deleting it from certification);
#   - RETIRED_NOTES names a strictly-stronger ACTIVE sibling (backquoted)
#     whose green driver rows certify the same capability;
#   - the name holds no window slot and no deferral.
RETIRED: tuple[str, ...] = (
    "multimodal_byte_stats",
    "dedup_clusters",
    "window_topn_per_group",
    "text_word_entropy",
    "similarity_ann_ivf",
    "rollup_order_stats",
    "events_tumbling_window",
    # r14 wave (VERDICT r13 item 3: open >= 4 slots of forward slack
    # before the ceiling binds) — each strictly dominated per the notes
    "anti_join_customers",
    "semi_join_suppliers",
    "pivot_orders",
    "text_repetition_gate",
)

RETIRED_NOTES: dict[str, str] = {
    "multimodal_byte_stats": (
        "Certified by `multimodal_byte_stats_native` (green r08): the "
        "JVM-native production twin computes the identical per-asset "
        "byte statistics on the same 1e-9 grid against the same oracle "
        "shape, and is the form a 100 TB run would use. The retired "
        "Arrow-UDF variant stays registered as the Pandas-UDF plumbing "
        "exhibit and is still oracle-compared locally every pytest run."
    ),
    "dedup_clusters": (
        "Certified by `dedup_clusters_star` (green r07): large-star/"
        "small-star contraction produces the SAME connected components "
        "against the IDENTICAL recursive-transitive-closure oracle, in "
        "O(log n) BSP rounds instead of O(diameter) — the strictly "
        "stronger scale path. The min-label BSP variant stays registered "
        "and locally verified as the simpler reference implementation."
    ),
    "window_topn_per_group": (
        "Certified by `text_topk_per_lang` (green r08): the same "
        "rank-window + WindowGroupLimit capability, plan-tested, over a "
        "corpus-sized shape rather than the 25-nation customer dim — a "
        "strict superset of what this narrow top-3-per-nation query "
        "exercised. Stays registered and locally verified."
    ),
    "text_word_entropy": (
        "Certified by `text_word_entropy_native` (green r07): the "
        "JVM-native production twin computes the identical per-doc "
        "word-distribution entropy on the same 1e-9 grid against the "
        "same oracle shape, and is the form a 100 TB run would use — the "
        "exact precedent of the `multimodal_byte_stats` retirement. The "
        "retired Arrow-UDF pinned-fold variant stays registered as the "
        "Pandas-UDF determinism exhibit, is still oracle-compared "
        "locally every pytest run, and the unrounded twins remain "
        "property-tested to |Δ| < 1e-9 (tests/test_properties.py)."
    ),
    "similarity_ann_ivf": (
        "Certified by `similarity_ann_recall` (green r07): the recall "
        "query runs the SAME IVF index path and hash-gates "
        "recall@5 >= 0.9 against exact top-k over the same query set — "
        "a strictly stronger certification than this entry's own "
        "rows-only driver row, which (per ROWS_ONLY_NOTES) could never "
        "carry a value hash because IVF's neighbor set depends on float "
        "summation order during k-means training. Retiring the weaker "
        "row spends no window slot on a check the recall gate subsumes; "
        "the query stays registered, in the bench headline, and locally "
        "rows-verified every pytest run."
    ),
    "rollup_order_stats": (
        "Certified by `cube_order_stats` (green r08): CUBE over the SAME "
        "two keys (o_orderstatus, o_orderpriority) with the IDENTICAL "
        "aggregates emits every grouping set ROLLUP does — {(s,p),(s),()} "
        "⊂ {(s,p),(s),(p),()} — so the cube's hash-pinned rows are a "
        "strict superset of this query's output on the same determinism "
        "contract. The sibling `orders_rollup_totals` (derived time-key "
        "axis) and `grouping_sets_orders` (grouping() disambiguation "
        "flags, arbitrary set lists) stay active: each certifies a "
        "capability the cube row does not. Stays registered and locally "
        "oracle-verified every pytest run."
    ),
    "events_tumbling_window": (
        "Certified by `events_sliding_window` (green r10): both queries "
        "run the IDENTICAL aggregates (decimal-exact count + value sum "
        "per event_type) through the same `F.window` expression on the "
        "same events table — a tumbling window IS the slide=width "
        "special case of Spark's TimeWindow, so the sliding row "
        "exercises a strict superset of the assignment machinery "
        "(multi-window membership included) on the same determinism "
        "contract and output schema (streaming/windows.py:20,45). "
        "Retired r13 to fund the second reserved-slot gate "
        "(`semdedup_planted`) without saturating window capacity. Stays "
        "registered, in the bench headline, and locally oracle-verified "
        "every pytest run."
    ),
    "anti_join_customers": (
        "Certified by `customers_anti_orders` (green r11): the TPC-H "
        "Q22 shape runs the IDENTICAL machinery — a LEFT ANTI join of "
        "customer against a filter-pushed orders probe on "
        "c_custkey = o_custkey with a projected customer output — plus "
        "a broadcast scalar-subquery threshold on top, so its "
        "hash-pinned rows exercise a strict superset of what this "
        "plain anti join certified (the anti-join node, the pushed "
        "probe filter, null-safe non-membership). Stays registered and "
        "locally oracle-verified every pytest run."
    ),
    "semi_join_suppliers": (
        "Certified by `orders_exists_late_lines` (green r11): the "
        "TPC-H Q4 EXISTS shape compiles to the SAME LEFT SEMI join "
        "node with a strictly RICHER condition (equi key + non-equi "
        "lateness residual) and an aggregation consumer on top. The "
        "retired query chained two plain equi semi joins — two "
        "applications of the operator the survivor certifies with "
        "more per-node machinery; chaining adds no new plan feature "
        "(each semi node plans independently). Stays registered and "
        "locally oracle-verified every pytest run."
    ),
    "pivot_orders": (
        "Certified by `events_pivot_type_daily` (green r11): the same "
        "known-value-list pivot COMPILATION (conditional count-when "
        "aggregation, one partial+final exchange — its docstring cites "
        "this query as the pattern) over the corpus-sized events "
        "stream with a derived day key and a row-total column — a "
        "strict superset of this 3x5 order-status pivot, the exact "
        "`window_topn_per_group` precedent (same capability, bigger "
        "shape). The single-pass plan property stays pinned by "
        "test_plan_hygiene.test_pivot_is_single_pass. Stays registered "
        "and locally oracle-verified every pytest run."
    ),
    "text_repetition_gate": (
        "Certified by `text_repetition_metrics` (green r12): the gate "
        "is a PURE FUNCTION of the metrics panel — three literal <= "
        "comparisons on dup_word_frac / top_bigram_frac / "
        "dup_5gram_frac at fixed thresholds "
        "(operators/repetition.py:147) — so the metrics row's "
        "hash-pinned fraction VALUES determine every keep decision "
        "exactly; a gate regression without a metrics regression would "
        "require the comparison operator itself to break, which every "
        "other certified query exercises. The composed pipeline gate "
        "(`pipeline_curate_documents`) also fires it end-to-end. Stays "
        "registered and locally oracle-verified every pytest run."
    ),
}


# GROWTH POLICY (r11, VERDICT r10 item 2 — decided before headroom binds):
# the driver-certified surface is COMPLETE. 148 active entries against a
# 150-slot steady-state capacity leaves permanent headroom of 2, and the
# r10 retirement audit found no further strictly-stronger-sibling
# candidates (the approx twins have different output shapes from their
# exact queries, so they cannot legally retire them). Therefore:
#
#   1. New CAPABILITIES land as operators + pytest oracles WITHOUT driver
#      rows — the `io/maintenance.py` precedent: full local test coverage
#      (DuckDB comparison and/or property tests), no registry entry, no
#      window slot. This is not a lesser tier: every registered query is
#      already oracle-compared locally on every pytest run; the driver
#      row only adds cross-engine certification cadence.
#   2. The 2 permanent headroom slots are RESERVED for capabilities that
#      genuinely need recurring cross-engine hash certification (a new
#      determinism-risk class the sweep cannot cover, e.g. a new rounding
#      grid family or a new engine-boundary numeric contract). Using one
#      requires naming, in the registering commit, why a pytest oracle is
#      insufficient.
#   3. If a future round needs more than the reserved 2, the legal moves
#      are another retirement wave (same test-enforced rules) or an
#      explicit window-contract change — never registering into negative
#      headroom (tools/rotate_window.py refuses at rotation time).
def all_queries() -> dict[str, Entry]:
    # Imports here are UNGUARDED on purpose (r12; the r11 wrappers
    # swallowed ImportError per family): every family is mandatory, and
    # the external driver imports this module WITHOUT running pytest
    # first — a broken family module must fail the driver loudly, never
    # silently shrink the certified window to whatever still imports.
    from filmdatawarehouse_spark.queries.approx_twins import APPROX_TWIN_QUERIES
    from filmdatawarehouse_spark.queries.basket import BASKET_QUERIES
    from filmdatawarehouse_spark.queries.bigjoin import BIGJOIN_QUERIES
    from filmdatawarehouse_spark.queries.chunking import CHUNKING_QUERIES
    from filmdatawarehouse_spark.queries.curation import CURATION_QUERIES
    from filmdatawarehouse_spark.queries.extended import EXTENDED_QUERIES
    from filmdatawarehouse_spark.queries.graph import GRAPH_QUERIES
    from filmdatawarehouse_spark.queries.incremental import INCREMENTAL_QUERIES
    from filmdatawarehouse_spark.queries.parity import PARITY_QUERIES
    from filmdatawarehouse_spark.queries.pipeline import (
        curate_documents,
        curate_documents_oracle,
    )
    from filmdatawarehouse_spark.queries.quality import QUALITY_QUERIES
    from filmdatawarehouse_spark.queries.quantize import QUANTIZE_QUERIES
    from filmdatawarehouse_spark.queries.relational import RELATIONAL_QUERIES
    from filmdatawarehouse_spark.queries.repetition import REPETITION_QUERIES
    from filmdatawarehouse_spark.queries.streaming_twin import (
        stream_dedup_final,
        stream_dedup_final_oracle,
        stream_heavy_hitters,
        stream_heavy_hitters_oracle,
        stream_interval_join_final,
        stream_interval_join_final_oracle,
        stream_merge_upsert,
        stream_merge_upsert_oracle,
        stream_sessions_capped_final,
        stream_sessions_capped_final_oracle,
        stream_sessions_final,
        stream_sessions_final_oracle,
    )
    from filmdatawarehouse_spark.queries.timeseries import TIMESERIES_QUERIES
    from filmdatawarehouse_spark.queries.vector_gates import VECTOR_GATE_QUERIES
    from filmdatawarehouse_spark.queries.warehouse_shapes import (
        WAREHOUSE_SHAPE_QUERIES,
    )

    registry: dict[str, Entry] = dict(PARITY_QUERIES)
    registry.update(EXTENDED_QUERIES)
    registry.update(RELATIONAL_QUERIES)
    registry.update(WAREHOUSE_SHAPE_QUERIES)
    registry.update(APPROX_TWIN_QUERIES)
    registry["pipeline_curate_documents"] = (
        curate_documents,
        curate_documents_oracle(),
    )
    registry.update(BIGJOIN_QUERIES)
    registry.update(CURATION_QUERIES)
    registry.update(REPETITION_QUERIES)
    registry.update(INCREMENTAL_QUERIES)
    registry.update(QUANTIZE_QUERIES)
    registry.update(CHUNKING_QUERIES)
    registry.update(TIMESERIES_QUERIES)
    registry.update(QUALITY_QUERIES)
    registry.update(BASKET_QUERIES)
    registry.update(GRAPH_QUERIES)
    # r13: the two RESERVED window slots, spent on the r12 vector-numeric
    # family's quality gates (the module banner names why a pytest
    # oracle is insufficient, per the growth policy below)
    registry.update(VECTOR_GATE_QUERIES)
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
    registry["stream_merge_upsert"] = (
        stream_merge_upsert,
        stream_merge_upsert_oracle(),
    )

    # second line of defense: every DRIVER_PRIORITY name must resolve —
    # a family that imports but lost entries would otherwise shrink the
    # window silently (the rotation tool validates at rotation time;
    # this validates at DRIVER time)
    missing = [n for n in DRIVER_PRIORITY if n not in registry]
    if missing:
        raise RuntimeError(
            f"driver window names missing from the registry: {missing}"
        )

    ordered: dict[str, Entry] = {}
    for name in DRIVER_PRIORITY:
        if name in registry:
            ordered[name] = registry[name]
    for name, entry in registry.items():
        if name not in ordered:
            ordered[name] = entry
    return ordered
