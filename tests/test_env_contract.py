"""Environment-contract smoke tests (VERDICT r03 item 5).

The Spark 3→4 jump silently changed how the events parquet timestamps
surface (nanosAsLong died; TIMESTAMP_NTZ appeared) and cost round 3 its
entire gate. These tests pin every engine-version behavior the repo relies
on, so the next engine upgrade is a one-test diagnosis instead of a
27-failure archaeology dig.
"""

from __future__ import annotations

import pyspark
from pyspark.sql import functions as F
from pyspark.sql import types as T

from filmdatawarehouse_spark.io.sources import read_table

def test_events_ts_reads_as_timestamp(spark, sf_dir):
    """The single contract that broke round 3: whatever dtype the installed
    Spark surfaces for the events parquet `ts` column, read_table must hand
    downstream operators a proper TIMESTAMP."""
    df = read_table(spark, sf_dir, "events")
    assert isinstance(df.schema["ts"].dataType, T.TimestampType), (
        f"read_table must normalize events.ts to TIMESTAMP, got "
        f"{df.schema['ts'].dataType} under PySpark {pyspark.__version__}"
    )
    # And the values must be real instants, not nulls from a bad cast.
    row = df.select(F.min("ts").alias("lo"), F.max("ts").alias("hi")).first()
    assert row["lo"] is not None and row["hi"] is not None
    assert row["lo"].year >= 2000


def test_events_raw_dtype_is_a_known_branch(spark, sf_dir):
    """read_table handles exactly three raw dtypes for events.ts; if the
    engine ever produces a fourth, fail HERE with a clear message rather
    than deep in a query plan."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    dt = raw.schema["ts"].dataType
    assert isinstance(
        dt, (T.LongType, T.TimestampNTZType, T.TimestampType)
    ), f"unhandled raw events.ts dtype {dt} under PySpark {pyspark.__version__}"


def test_session_timezone_pinned_utc(spark, sf_dir):
    read_table(spark, sf_dir, "region")
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"


def test_timestamp_micros_signature(spark):
    """timestamp_micros(long) → TIMESTAMP, used by the Spark-3 nanos branch."""
    df = spark.range(1).select(
        F.timestamp_micros(F.lit(1_700_000_000_000_000)).alias("t")
    )
    assert isinstance(df.schema["t"].dataType, T.TimestampType)
    assert df.first()["t"].year == 2023


def test_arrow_execution_enabled(spark):
    """Every dedup/similarity Python stage assumes Arrow-batched transfer."""
    assert (
        spark.conf.get("spark.sql.execution.arrow.pyspark.enabled") == "true"
    )


def test_ntz_cast_is_utc_wallclock(spark):
    """The Spark-4 branch relies on NTZ→TIMESTAMP cast preserving wall-clock
    under a UTC session (same instants DuckDB computes on the raw parquet)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.sql(
        "SELECT CAST(TIMESTAMP_NTZ '2024-01-02 03:04:05.678901' AS TIMESTAMP) AS t"
    )
    got = df.first()["t"]
    assert (got.year, got.month, got.day, got.hour, got.minute, got.second, got.microsecond) == (
        2024, 1, 2, 3, 4, 5, 678901
    )


def test_bench_stdout_record_fits_driver_tail_capture():
    """The driver recovers bench.py's stdout record from a ~2,000-char
    TAIL; BENCH_r06 lost its record when the full per-query dict outgrew
    it. Pin the protocol: simulate the widest plausible record (100
    queries, worst-case field widths) through the same compaction logic
    bench.py uses and require the emitted line stays under 1,800 chars.
    """
    import importlib
    import json

    bench = importlib.import_module("bench")

    # worst-case full record: 200 long-named queries, max field widths, a
    # pathologically long full_json path, every optional field present —
    # driven through the REAL emitter (ADVICE r07: a copied simulation of
    # the compaction logic could drift from bench.py unnoticed)
    cold = {
        f"a_very_long_query_name_number_{i:03d}": 123.4567 for i in range(200)
    }
    out = {
        "metric": "headline_queries_total_runtime",
        "value": 99999.9999,
        "unit": "sec",
        "queries": cold,
        "queries_warm": cold,
        "value_warm": 99999.9999,
        "sf": 1000.0,
        "n_errors": 100,
        "anchor_drift": {"median": 1.2345},
        "scale_sweep": {"current": False, "note": "x" * 200},
    }
    long_path = "/very/deep/" + "sub/" * 40 + "BENCH_full.json"
    line = bench.build_compact(out, long_path)
    assert len(line) <= 1800
    parsed = json.loads(line)
    assert parsed["n_queries"] == 200
    assert parsed["anchor_drift_median"] == 1.2345
    assert parsed["scale_sweep_current"] is False  # flag only, not the note
    # the 8-slowest dict survives compaction at realistic path lengths
    realistic = bench.build_compact(out, "/root/repo/BENCH_full.json")
    assert len(json.loads(realistic)["queries"]) == 8


def test_committed_anchor_drift_reads_git_not_disk():
    """`vs_committed` (VERDICT r08 item 4) must chain drift to the last
    COMMITTED BENCH_full.json via git — immune to however many times the
    on-disk record was overwritten this session — and return None rather
    than garbage for a different SF or a missing record."""
    import importlib
    import json as _json
    import subprocess

    bench = importlib.import_module("bench")
    anchors = ("filter_pushdown", "top10_parts")

    blob = subprocess.run(
        ["git", "-C", "/root/repo", "show", "HEAD:BENCH_full.json"],
        capture_output=True,
        text=True,
    )
    committed = _json.loads(blob.stdout)
    sf = committed["sf"]
    cw = committed["queries_warm"]
    cc = committed["queries"]
    # doubled warm times -> every ratio exactly 2.0 against the committed;
    # tripled cold times -> the r14 cold axis lands alongside at 3.0
    warm = {a: 2 * cw[a] for a in anchors if a in cw}
    cold = {a: 3 * cc[a] for a in anchors if a in cc}
    got = bench.committed_anchor_drift(warm, cold, anchors, sf)
    assert got is not None
    assert got["median"] == 2.0
    assert got["committed_value_warm"] == committed["value_warm"]
    assert got["median_cold"] == 3.0
    assert got["committed_value_cold"] == committed["value"]

    assert bench.committed_anchor_drift(warm, cold, anchors, sf + 999) is None
    assert (
        bench.committed_anchor_drift(warm, cold, anchors, sf, ref="HEAD~10000")
        is None
    )


def test_bench_stdout_survives_vs_committed_only_anchor_drift():
    """r13 regression: when the previous on-disk record was a DIFFERENT
    SF (cross-SF ratios refused), anchor_drift holds ONLY the
    vs_committed block — the emitter must fall back to its median, not
    crash after the full record is already on disk (stdout empty,
    stderr discarded, exit 0 through the tail pipe: a silent protocol
    break the driver would record as parsed=null)."""
    import importlib
    import json

    bench = importlib.import_module("bench")

    out = {
        "metric": "headline_queries_total_runtime",
        "value": 1.0,
        "unit": "sec",
        "queries": {"q": 1.0},
        "queries_warm": {"q": 1.0},
        "value_warm": 1.0,
        "sf": 0.1,
        "anchor_drift": {"vs_committed": {"median": 0.9, "ratios_warm": {}}},
    }
    line = bench.build_compact(out, "/root/repo/BENCH_full.json")
    assert json.loads(line)["anchor_drift_median"] == 0.9
    # and an anchor_drift with NO median anywhere simply omits the field
    out["anchor_drift"] = {"vs_committed": {}}
    line = bench.build_compact(out, "/root/repo/BENCH_full.json")
    assert "anchor_drift_median" not in json.loads(line)
