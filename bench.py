"""Benchmark harness: times the engine's headline queries at one SF.

Prints exactly ONE fixed-size JSON line (totals + counts + the 8 slowest
cold queries — hard-capped at 1,800 chars so a ~2,000-char stdout
tail-capture can never truncate it; BENCH_r06 lost its record when the
full 66-query dict outgrew the tail) and writes the FULL record to
BENCH_full.json next to this file:
  stdout:  {"metric": "...", "value": <total cold sec>, "unit": "sec",
            "value_warm": <sec>, "n_queries": N, "sf": <float>,
            "queries": {<8 slowest cold>}, "queries_note": "...",
            "full_json": "<path>", "n_errors": N,
            "anchor_drift_median": <ratio>}     # last two only when present
  file:    complete cold ("queries") + warm ("queries_warm") dicts,
           "errors", and "anchor_drift" — the scan-bound anchor queries'
           warm AND cold (r14) ratios vs the previous committed
           BENCH_full.json, so round-over-round environment drift is
           recorded in the harness on both axes instead of being
           re-derived from git each round — plus
           "job_overhead_ms" (median trivial-job wall time before/after
           the suite): the second drift axis the scan-bound anchors are
           blind to, since a session with inflated per-job fixed cost
           slows multi-job queries without moving single-job anchors.

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
    "weighted_sample_docs",
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
    # round-8 additions: TPC-H warehouse shapes + certified approx twins
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
    # round-10 additions: balanced training-data mix + deterministic shuffle
    "corpus_mix_sample",
    "corpus_shuffle_shards",
    # round-15: prefix-filtered containment (the 100 TB-default shape for
    # the containment family — SCALING.md round-15)
    "text_containment_prefix_pairs",
    # round-16: the size-keyed dispatcher (`text_containment_auto_pairs`)
    # is deliberately NOT a headline row — at bench SF it would run the
    # plain plan verbatim (the corpus is far below CONTAIN_DISPATCH_DOCS),
    # double-counting `text_containment_pairs` while measuring nothing
    # new. Both underlying plans stay benched individually above; the
    # headline set is therefore UNCHANGED by the dispatcher and BENCH_REV
    # does not bump (VERDICT r15 item 7's rule: bump only when the set of
    # timed queries actually changes).
]

# Record-layout revision stamped into BENCH_full.json (VERDICT r14 item 7).
# Drift tooling (the anchor-ratio comparisons below) ANNOTATES any
# comparison that crosses a revision boundary instead of diffing silently.
#   absent  — pre-r15 records. Within them, overhead_post semantics moved
#             twice (r13 measured it after the plan captures; r14 moved it
#             back) — exactly the silent boundary this field now marks.
#   3       — r15 layout: overhead_post directly after the warm suite
#             (r14 semantics), plus the "active" subtotals (value_active /
#             value_warm_active: retired regression-canary queries
#             excluded, so round-over-round totals track the production
#             surface).
BENCH_REV = 3


def _anchor_ratios(
    cur: dict[str, float], prev: dict[str, float], anchors: tuple[str, ...]
) -> dict[str, float]:
    return {
        a: round(cur[a] / prev[a], 4)
        for a in anchors
        if cur.get(a) and prev.get(a)
    }


def committed_anchor_drift(
    warm: dict[str, float],
    cold: dict[str, float],
    anchors: tuple[str, ...],
    sf: float,
    ref: str = "HEAD",
) -> dict | None:
    """Anchor-drift ratios vs the last COMMITTED BENCH_full.json.

    Round-over-round chain (VERDICT r08 item 4): the on-disk record may
    already have been overwritten by an earlier run this session, so the
    on-disk vs-prev ratios only chain run-over-run; a round with three
    bench runs left round-over-round attribution to hand-chained math.
    This reads the record at ``ref`` via git so "drift-adjusted vs last
    round" is a recorded number. Returns None when no comparable
    committed record exists (fresh repo, different SF, no anchors).

    Both axes since r14 (VERDICT r13 item 2): warm ratios were the only
    drift divisor while driver COLD totals crept 84→92 s across three
    rounds with no way to split environment drift from real regression —
    the cold anchors (same queries, release-each runs: scan + JVM first-
    materialization cost included) make cold movement attributable the
    same way."""
    import statistics
    import subprocess

    repo_dir = os.path.dirname(os.path.abspath(__file__))
    try:
        blob = subprocess.run(
            ["git", "-C", repo_dir, "show", f"{ref}:BENCH_full.json"],
            capture_output=True,
            text=True,
            timeout=30,
        )
        if blob.returncode != 0:
            return None
        committed = json.loads(blob.stdout)
    except (OSError, ValueError, subprocess.SubprocessError):
        return None
    if committed.get("sf") != sf:
        return None  # cross-SF ratios are meaningless
    ratios = _anchor_ratios(warm, committed.get("queries_warm", {}), anchors)
    if not ratios:
        return None
    out = {
        "ratios_warm": ratios,
        "median": round(statistics.median(ratios.values()), 4),
        "committed_value_warm": committed.get("value_warm"),
    }
    if committed.get("rev") != BENCH_REV:
        # cross-revision comparison: anchor ratios stay valid (anchor
        # queries are layout-independent) but total/overhead semantics
        # may differ — annotated so no tool diffs the boundary silently
        out["rev_mismatch"] = {
            "committed": committed.get("rev"), "current": BENCH_REV,
        }
    cold_ratios = _anchor_ratios(cold, committed.get("queries", {}), anchors)
    if cold_ratios:
        out["ratios_cold"] = cold_ratios
        out["median_cold"] = round(
            statistics.median(cold_ratios.values()), 4
        )
        out["committed_value_cold"] = committed.get("value")
    return out


def build_compact(out: dict, full_path: str) -> str:
    """The ONE fixed-size stdout line, derived from the full record.

    Shared by main() and tests/test_env_contract.py (ADVICE r07: the test
    used to re-implement this compaction and could drift from the real
    emitter). Raises — not asserts, which `-O` strips — if the record
    cannot be brought under the driver's 1,800-char tail-capture bound.
    """
    cold = out["queries"]
    slowest = dict(sorted(cold.items(), key=lambda kv: -kv[1])[:8])
    compact = {
        "metric": out["metric"],
        "value": out["value"],
        "unit": "sec",
        "value_warm": out["value_warm"],
        "n_queries": len(cold),
        "sf": out["sf"],
        "queries": slowest,
        "queries_note": f"8 slowest cold of {len(cold)}; full dicts in full_json",
        "full_json": full_path,
    }
    for k in ("rev", "value_active", "value_warm_active", "n_queries_active"):
        if k in out:
            compact[k] = out[k]
    if "n_errors" in out:
        compact["n_errors"] = out["n_errors"]
    if "anchor_drift" in out:
        # run-over-run median when the on-disk prev record was comparable;
        # else the vs-committed median (r13: a cross-SF prev record used
        # to leave anchor_drift holding ONLY vs_committed, and the bare
        # ["median"] crashed the emitter AFTER the full record was
        # written — stdout empty, stderr discarded, exit 0 via the tail
        # pipe: the exact silent-protocol-break this function exists to
        # prevent)
        med = out["anchor_drift"].get("median")
        if med is None:
            med = (
                out["anchor_drift"]
                .get("vs_committed", {})
                .get("median")
            )
        if med is not None:
            compact["anchor_drift_median"] = med
    if "scale_sweep" in out:
        compact["scale_sweep_current"] = out["scale_sweep"]["current"]
    line = json.dumps(compact)
    if len(line) > 1800:  # never outgrow the driver's tail capture again
        compact.pop("queries", None)
        line = json.dumps(compact)
    if len(line) > 1800:
        raise RuntimeError(f"bench stdout record too big: {len(line)}")
    return line


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

    def job_overhead_ms() -> float:
        # Median wall time of a trivial 1-row job: the session's PER-JOB
        # fixed cost (scheduler + task dispatch + GC pressure). The four
        # scan-bound anchors are single-job queries, so sessions whose
        # per-job overhead inflates under-report drift for multi-job
        # queries (the collect-based prefix sum spans 3 jobs and swung
        # 1.1s<->3.0s between same-code runs while anchors moved 10%).
        # Recording the probe makes that drift axis attributable.
        for _ in range(3):  # unmeasured: codegen/classload of this path
            spark.range(1).write.format("noop").mode("overwrite").save()
        samples = []
        for _ in range(15):
            t0 = time.perf_counter()
            spark.range(1).write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        samples.sort()
        return round(samples[len(samples) // 2] * 1000, 2)

    overhead_pre = job_overhead_ms()

    cold: dict[str, float] = {}
    cold_errors: dict[str, str] = {}
    run_suite(cold, cold_errors, release_each=True)

    warm: dict[str, float] = {}
    warm_errors: dict[str, str] = dict(cold_errors)  # don't retry known-broken
    run_suite(warm, warm_errors, release_each=False)

    # overhead_post RIGHT after the warm suite (ADVICE r13): the r13
    # layout measured it after the plan captures re-executed ~13 queries
    # twice, which broke pre/post drift comparability with the committed
    # history — this position matches every record up to r12.
    overhead_post = job_overhead_ms()

    # Runtime plan fingerprints (VERDICT r10 item 7): PLANS.json pins
    # STATIC sf0.001 shapes; the one regression class it cannot see is
    # AQE re-planning at real data sizes — the class the r10
    # shingle-census incident lived in, caught only because the static
    # shape happened to change too. Capture the POST-execution
    # (isFinalPlan=true) plan of the 8 bench-slowest queries at this SF;
    # `tools/plan_audit.py --check` diffs the same cost features vs the
    # committed record. Each capture re-executes the query once via the
    # plan's own execute() (JVM-side row count, nothing collected).
    #
    # Captured TWICE (VERDICT r12 item 8 — the one r12 perf anomaly was
    # warm-only and the cold-state fingerprints couldn't see it):
    #   plans_runtime_warm — BEFORE release_managed(), with the warm
    #     pass's persisted frames still in the CacheManager, so
    #     cache-induced plan differences (InMemoryRelation substitution,
    #     AQE re-plans around cached sizes) land in the record;
    #   plans_runtime      — after release, the cold-state shape the
    #     committed history already tracks.
    tools_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "tools"
    )
    if tools_dir not in sys.path:
        sys.path.insert(0, tools_dir)

    def capture_plans(capture_names: list[str]) -> dict[str, dict]:
        from plan_audit import final_plan_section, fingerprint

        plans: dict[str, dict] = {}
        for name in capture_names:
            try:
                qe = registry[name][0](spark, sf_dir)._jdf.queryExecution()
                qe.executedPlan().execute().count()  # finalize AQE
                plans[name] = fingerprint(
                    final_plan_section(qe.executedPlan().toString())
                )
            except Exception as exc:  # noqa: BLE001 — keep benching
                print(
                    f"bench: runtime plan capture failed for {name}: {exc}",
                    file=sys.stderr,
                )
        return plans

    plans_runtime: dict[str, dict] = {}
    plans_runtime_warm: dict[str, dict] = {}
    try:
        from plan_audit import EXCHANGE_HEAVY

        slowest8 = [
            n for n, _ in sorted(warm.items(), key=lambda kv: -kv[1])[:8]
        ]
        # r12 (VERDICT r11 item 6): the AQE-regression class lives where
        # the exchanges are, not necessarily in the slowest tail —
        # always fingerprint the SMJ/multi-exchange set too
        capture_names = slowest8 + [
            n for n in EXCHANGE_HEAVY
            if n not in slowest8 and n in registry
        ]
        plans_runtime_warm = capture_plans(capture_names)
        release_managed()
        plans_runtime = capture_plans(capture_names)
    except Exception as exc:  # noqa: BLE001
        print(f"bench: runtime plan capture unavailable: {exc}", file=sys.stderr)
    release_managed()

    # actives-only subtotal (VERDICT r14 item 4): ~8 s of the headline is
    # retired regression-canary exhibits (dedup_clusters min-label BSP,
    # similarity_ann_ivf, ...) whose production twins are elsewhere in the
    # suite; the active subtotal tracks the production surface while the
    # full total keeps the canaries timed.
    from filmdatawarehouse_spark.queries.registry import RETIRED

    active = {n for n in names if n not in RETIRED}
    out = {
        "metric": "headline_queries_total_runtime",
        "rev": BENCH_REV,
        "value": round(sum(cold.values()), 4),
        "unit": "sec",
        "queries": cold,
        "queries_warm": warm,
        "value_warm": round(sum(warm.values()), 4),
        "value_active": round(
            sum(v for n, v in cold.items() if n in active), 4
        ),
        "value_warm_active": round(
            sum(v for n, v in warm.items() if n in active), 4
        ),
        "n_queries_active": len(active),
        "sf": sf,
        "job_overhead_ms": {"pre": overhead_pre, "post": overhead_post},
    }
    if plans_runtime:
        out["plans_runtime"] = plans_runtime
    if plans_runtime_warm:
        out["plans_runtime_warm"] = plans_runtime_warm
    if cold_errors or warm_errors:
        out["errors"] = warm_errors
        out["n_errors"] = len(warm_errors)

    # the round-final bench record provably implies a green, CURRENT
    # sf0.1 determinism sweep (VERDICT r10 item 6): the committed
    # SWEEP.json carries a content fingerprint of the risk class, and
    # the same check reds the default pytest suite when stale
    try:
        from scale_sweep import log_is_current

        current, reason = log_is_current()
        out["scale_sweep"] = {"current": current, "note": reason}
    except Exception as e:  # noqa: BLE001 — the record must still land
        out["scale_sweep"] = {
            "current": False,
            "note": f"check failed: {type(e).__name__}: {e}"[:200],
        }

    full_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_full.json"
    )

    # Environment-drift self-attribution (VERDICT r06 item 5): record each
    # scan-bound anchor query's warm ratio vs the PREVIOUS run's
    # BENCH_full.json (whatever is on disk — back-to-back runs measure
    # run-over-run drift; in the per-round cadence the file on disk is the
    # previous round's committed record) before overwriting it. Anchors
    # are queries whose code ~never changes, so their drift measures the
    # shared-JVM / page-cache environment, not any plan change; divide a
    # query's round-over-round ratio by `anchor_drift.median` before
    # calling it a regression. Five anchors so one missing/errored anchor
    # still leaves a 4-point median (ADVICE r07: the old len//2 pick was
    # an upper-median on even counts, biasing the divisor upward).
    # clean_dropna_dedup joined in r11 after its three-round watch item
    # closed as environment: 12 in-session runs span 0.35-0.50s with a
    # monotone decay tracking the job-overhead probe (61->31ms), and
    # r10's 0.66s reading scales to the probe ratio exactly — a
    # scan-bound single-job distinct, which is what anchors are for.
    anchors = (
        "filter_pushdown",
        "filtered_daily_series",
        "monthly_revenue",
        "top10_parts",
        "clean_dropna_dedup",
    )
    try:
        import statistics

        with open(full_path) as f:
            prev = json.load(f)
        if prev.get("sf") != sf:  # cross-SF ratios are meaningless
            raise ValueError("previous record is a different SF")
        ratios = _anchor_ratios(warm, prev.get("queries_warm", {}), anchors)
        if ratios:
            out["anchor_drift"] = {
                "ratios_warm_vs_prev": ratios,
                "median": round(statistics.median(ratios.values()), 4),
                "prev_value_warm": prev.get("value_warm"),
            }
            if prev.get("rev") != BENCH_REV:
                out["anchor_drift"]["rev_mismatch_vs_prev"] = {
                    "prev": prev.get("rev"), "current": BENCH_REV,
                }
            # cold axis (VERDICT r13 item 2): same anchors on the
            # release-each pass, so cold-total creep divides into
            # environment drift vs real regression like warm always did
            cold_ratios = _anchor_ratios(cold, prev.get("queries", {}), anchors)
            if cold_ratios:
                out["anchor_drift"]["ratios_cold_vs_prev"] = cold_ratios
                out["anchor_drift"]["median_cold"] = round(
                    statistics.median(cold_ratios.values()), 4
                )
                out["anchor_drift"]["prev_value_cold"] = prev.get("value")
    except (OSError, ValueError, KeyError):
        pass

    vs_committed = committed_anchor_drift(warm, cold, anchors, sf)
    if vs_committed:
        out.setdefault("anchor_drift", {})["vs_committed"] = vs_committed

    with open(full_path, "w") as f:
        json.dump(out, f, indent=1)

    # Per-core-count copy of the full record (VERDICT r16 item 8): the
    # driver's 8-core control run overwrites BENCH_full.json and the
    # 32-core per-query dict is lost (r16 kept only the slowest-8 in the
    # tail capture). The canonical BENCH_full.json contract is unchanged
    # — this is an ADDITIONAL artifact keyed on $SPARK_GRAFT_CPUS so
    # both core counts' complete dicts survive a round.
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    with open(
        os.path.join(
            os.path.dirname(full_path), f"BENCH_full_c{cpus}.json"
        ),
        "w",
    ) as f:
        json.dump(out, f, indent=1)

    # stdout protocol (VERDICT r06 item 2): the driver recovers the record
    # from a ~2,000-char stdout TAIL, and at 66 headline queries the full
    # per-query dict outgrew it (BENCH_r06.json parsed=null). stdout now
    # carries a FIXED-SIZE record — totals, counts, sf, the slowest few
    # queries, and the BENCH_full.json path holding the complete dicts —
    # printed as the very last line, size-bounded by build_compact (which
    # raises, not asserts; tests/test_env_contract.py drives the same
    # function with worst-case inputs).
    print(build_compact(out, full_path))
    spark.stop()


if __name__ == "__main__":
    main()
