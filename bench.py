"""Benchmark harness: times the engine's headline queries at one SF.

Prints exactly ONE compact JSON line (cold per-query timings + totals; no
warm dict, so a tail-capture of stdout cannot truncate it) and writes the
FULL record to BENCH_full.json next to this file:
  stdout:  {"metric": "...", "value": <total cold sec>, "unit": "sec",
            "queries": {"<name>": cold sec, ...}, "value_warm": <sec>,
            "sf": <float>, "full_json": "<path>",
            "errors": {...}, "n_errors": N}     # errors only when present
  file:    the same plus "queries_warm" per-query warm timings

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).

Each query is forced to full materialization with the `noop` sink (all
columns computed, nothing written), so timings reflect real operator work,
not count() shortcuts. One warm-up of a trivial job excludes JVM/codegen
startup from the first measured query.

Cold/warm protocol (round-3 change, VERDICT r2 item 7): round 1's min-of-2
accidentally measured warm caches (persisted signature frames leaked across
passes), round 2 released caches per run — honest, but it made rounds
incomparable. Both axes are now explicit:

- COLD ("queries"/"value", the headline): `release_managed()` after every
  timed run — each run re-executes its Python stages; min over 2
  interleaved suite passes absorbs the VM's multi-second stalls.
- WARM ("queries_warm"/"value_warm"): persisted frames are kept across
  runs and passes (steady-state of a long-lived service re-running its
  workload); min over 2 interleaved passes, caches dropped only at the end.

Notes:
- `join_bigbig_bucketed` pays its bucketed TABLE WRITE inside the timed
  run (certification shape); production pays that once at ingest, so read
  its delta vs `join_bigbig_rollup` as write-cost + exchange-free join.
- The hot-bucket guard census is count-gated (operators/dedup.py): at SFs
  where the corpus bound proves no bucket can be hot it costs zero; at
  sf0.1 (5000 docs > cap 1024) the census runs — its measured cost is the
  dedup-family cold delta vs a bucket_cap=None run (see README bench note).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# queries whose cost is dominated by result size at larger SFs are still
# forced through noop (no driver collect) — this is deliberate: the engine's
# unit of work is "produce the full result set".
HEADLINE = [
    "clean_dropna_dedup",
    "filter_pushdown",
    "join_inner_equi",
    "fact_daily_orders",
    "fact_monthly_totals",
    "monthly_revenue",
    "top10_parts",
    "filtered_daily_series",
    "sql_passthrough",
    # big-join surface
    "join_bigbig_rollup",
    "join_bigbig_bucketed",
    # extended surface
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_clusters",
    "dedup_embedding_cosine",
    "similarity_topk",
    "similarity_ann_ivf",
    "text_langid",
    "text_quality",
    "text_token_count",
    "text_fingerprint",
    "text_tfidf",
    "text_pmi_bigrams",
    "text_vocab_encode",
    "events_tumbling_window",
    "events_running_totals",
    "events_session_window",
    "events_ohlc_hourly",
    "events_range_window",
    "events_zscore_outliers",
    "pipeline_curate_documents",
    "chunk_documents",
    "corpus_merge_priority",
    "dq_checks",
    "scd2_point_in_time",
    "events_cohort_retention",
    "basket_part_pairs",
    "text_word_entropy",
    # JVM-native production twins (round 5) — the 100 TB path variants
    "text_word_entropy_native",
    "multimodal_byte_stats_native",
    # round-5 additions
    "text_heavy_hitters",
    "text_sparse_cosine_pairs",
    "bloom_prefilter_join",
    "events_sessions_capped",
    "dedup_triangles",
    "text_containment_pairs",
    "text_unigram_logprob",
    # round-6 additions
    "text_prefix_filter_pairs",
    "regional_supplier_revenue",
    "customer_rfm",
    "orders_abc_pareto",
    "events_daily_streaks",
    "events_first_touch",
    "events_mode_type",
    "graph_bfs_hops",
    "events_hour_heatmap",
    # (stream_* certification twins stay out of the bench like the other
    # streaming replays — they time the replay harness, not an operator)
    "events_hourly_anomalies",
    "pricing_summary",
    "shipping_priority",
    "incremental_daily_rollup",
    "orders_upsert_merge",
    "text_hof_stats",
    "events_transitions",
    "skew_profile_custkey",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from filmdatawarehouse_spark.session import get_spark
    from filmdatawarehouse_spark.queries.registry import all_queries
    from filmdatawarehouse_spark.operators.cache import release_managed

    spark = get_spark("fdw-bench")
    registry = all_queries()

    # warm-up: JVM, parquet footer reads, codegen paths
    from filmdatawarehouse_spark.io.sources import read_table

    read_table(spark, sf_dir, "lineitem").limit(1000).write.format("noop").mode(
        "overwrite"
    ).save()

    names = [n for n in HEADLINE if n in registry]

    def run_suite(
        timings: dict[str, float], errors: dict[str, str], release_each: bool
    ) -> None:
        # min over 2 interleaved passes of the whole suite: steady-state
        # timing, robust to the multi-second JVM/VM pauses local mode
        # occasionally hits (pauses cluster in time; interleaving separates
        # a query's attempts).
        #
        # Per-query fail-loud (VERDICT r03 item 4): round 3's single broken
        # query aborted the whole bench with no numbers. Each timed run is
        # isolated — a failure records an "errors" entry for that query and
        # the rest of the suite still gets timed.
        for _pass in range(2):
            for name in names:
                if name in errors:
                    continue
                fn, _ = registry[name]
                t0 = time.perf_counter()
                try:
                    fn(spark, sf_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                except Exception as exc:  # noqa: BLE001 — keep benching
                    errors[name] = f"{type(exc).__name__}: {exc}"[:500]
                    timings.pop(name, None)
                    print(
                        f"bench: {name} FAILED: {errors[name]}",
                        file=sys.stderr,
                    )
                    continue
                dt = time.perf_counter() - t0
                timings[name] = round(min(timings.get(name, dt), dt), 4)
                if release_each:
                    try:
                        release_managed()
                    except Exception:
                        pass

    cold: dict[str, float] = {}
    cold_errors: dict[str, str] = {}
    run_suite(cold, cold_errors, release_each=True)

    warm: dict[str, float] = {}
    warm_errors: dict[str, str] = dict(cold_errors)  # don't retry known-broken
    run_suite(warm, warm_errors, release_each=False)
    release_managed()

    out = {
        "metric": "headline_queries_total_runtime",
        "value": round(sum(cold.values()), 4),
        "unit": "sec",
        "queries": cold,
        "queries_warm": warm,
        "value_warm": round(sum(warm.values()), 4),
        "sf": sf,
    }
    if cold_errors or warm_errors:
        out["errors"] = warm_errors
        out["n_errors"] = len(warm_errors)

    # Full record (cold + warm + errors) goes to a FILE the driver can
    # archive; stdout gets ONE compact line — headline totals + per-query
    # COLD only — so a tail-capture of stdout can never truncate the cold
    # dict again (VERDICT r04 item 8: BENCH_r04's single long line lost its
    # head to the driver's tail window).
    full_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_full.json"
    )
    with open(full_path, "w") as f:
        json.dump(out, f, indent=1)
    compact = {k: v for k, v in out.items() if k != "queries_warm"}
    compact["full_json"] = full_path
    print(json.dumps(compact))
    spark.stop()


if __name__ == "__main__":
    main()
