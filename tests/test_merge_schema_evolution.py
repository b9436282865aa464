"""Schema-drift policy of the snapshot MERGE sink (r13).

Before this round a batch whose columns differed from the snapshot was
handled WRONG in both directions: a batch MISSING a snapshot column
silently projected it away (``base.select(*batch_cols)`` — the merged
snapshot lost the column for EVERY row, not just the batch's), and a
batch ADDING a column died on an opaque unresolved-column
AnalysisException. These tests pin the new contract:

- missing snapshot columns REFUSE loudly in every mode;
- added value columns refuse under 'strict' (default) and widen the
  table under 'additive' (snapshot rows null-fill; survivorship
  untouched); keys and seq_col are never evolvable;
- the CDC feed stays correct across the evolution boundary (old side
  null-filled: null→value is an update, null→null unchanged);
- replay idempotence survives the evolution (the widened snapshot is
  the committed state; a redelivered batch no-ops).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from filmdatawarehouse_spark.streaming.merge import (
    merge_upsert_batch,
    merged_frame,
    read_merge_table,
)

SCHEMA = "k long, status string, seq long"
WIDE = "k long, status string, seq long, region string"


def _rows(spark, table):
    df = read_merge_table(spark, table)
    cols = [c for c in df.columns if c != "k"]
    return {r.k: tuple(r[c] for c in cols) for r in df.collect()}


def test_missing_snapshot_column_refuses_not_silent_loss(spark):
    base = spark.createDataFrame([(1, "A", 0, "eu")], WIDE)
    narrow = spark.createDataFrame([(2, "B", 1)], SCHEMA)
    with pytest.raises(ValueError, match="missing snapshot column"):
        merged_frame(base, narrow, ["k"], seq_col="seq")
    with pytest.raises(ValueError, match="missing snapshot column"):
        merged_frame(
            base, narrow, ["k"], seq_col="seq", schema_evolution="additive"
        )


def test_added_column_refused_under_strict_with_guidance(spark):
    base = spark.createDataFrame([(1, "A", 0)], SCHEMA)
    wide = spark.createDataFrame([(2, "B", 1, "eu")], WIDE)
    with pytest.raises(ValueError, match="schema_evolution='additive'"):
        merged_frame(base, wide, ["k"], seq_col="seq")


def test_key_and_seq_additions_never_evolvable(spark):
    base = spark.createDataFrame([(1, "A")], "k long, status string")
    with_seq = spark.createDataFrame([(2, "B", 1)], SCHEMA)
    with pytest.raises(ValueError, match="not evolvable"):
        merged_frame(
            base, with_seq, ["k"], seq_col="seq",
            schema_evolution="additive",
        )
    with_k2 = spark.createDataFrame(
        [(2, 9, "B")], "k long, k2 long, status string"
    )
    with pytest.raises(ValueError, match="not evolvable"):
        merged_frame(
            base, with_k2, ["k", "k2"], schema_evolution="additive"
        )


def test_unknown_policy_refused(spark):
    b = spark.createDataFrame([(1, "A", 0)], SCHEMA)
    with pytest.raises(ValueError, match="unknown schema_evolution"):
        merged_frame(None, b, ["k"], schema_evolution="mergeSchema")


def test_additive_widens_nullfills_and_keeps_survivorship(spark):
    base = spark.createDataFrame(
        [(1, "A", 5), (2, "A", 5)], SCHEMA
    )
    wide = spark.createDataFrame(
        [(2, "U", 6, "eu"), (2, "stale", 4, "us"), (3, "A", 1, "ap")], WIDE
    )
    out = {
        r.k: (r.status, r.seq, r.region)
        for r in merged_frame(
            base, wide, ["k"], seq_col="seq", schema_evolution="additive"
        ).collect()
    }
    assert out == {
        1: ("A", 5, None),   # untouched base row, new column null-filled
        2: ("U", 6, "eu"),   # seq survivorship across the boundary
        3: ("A", 1, "ap"),   # insert carries the new column
    }


def test_additive_end_to_end_with_cdc_and_replay(spark, tmp_path):
    table = str(tmp_path / "t")
    feeds: list[tuple[int, dict]] = []

    def consumer(changes, batch_id):
        feeds.append(
            (
                batch_id,
                {r.k: r.change_type for r in changes.collect()},
            )
        )

    b0 = spark.createDataFrame([(1, "A", 0), (2, "A", 0)], SCHEMA)
    merge_upsert_batch(
        b0, 0, table, ["k"], seq_col="seq", run_id="r",
        on_changes=consumer,
    )
    b1 = spark.createDataFrame([(2, "U", 1, "eu"), (3, "A", 1, None)], WIDE)
    merge_upsert_batch(
        b1, 1, table, ["k"], seq_col="seq", run_id="r",
        on_changes=consumer, schema_evolution="additive",
    )
    assert _rows(spark, table) == {
        1: ("A", 0, None),
        2: ("U", 1, "eu"),
        3: ("A", 1, None),
    }
    # CDC across the boundary: k=2 updated (status AND null->'eu'),
    # k=3 inserted, k=1 untouched — null->null on the new column must
    # NOT read as a change
    assert feeds == [
        (0, {1: "insert", 2: "insert"}),
        (1, {2: "update", 3: "insert"}),
    ]

    # replay of the evolved batch: pointer no-op, CDC re-fed unchanged
    merge_upsert_batch(
        b1, 1, table, ["k"], seq_col="seq", run_id="r",
        on_changes=consumer, schema_evolution="additive",
    )
    assert feeds[-1] == (1, {2: "update", 3: "insert"})
    assert _rows(spark, table) == {
        1: ("A", 0, None),
        2: ("U", 1, "eu"),
        3: ("A", 1, None),
    }

    # post-evolution: a narrow batch is now MISSING the widened column
    # and refuses (null-fill it in the batch to proceed)
    b2 = spark.createDataFrame([(4, "A", 2)], SCHEMA)
    with pytest.raises(ValueError, match="missing snapshot column"):
        merge_upsert_batch(
            b2, 2, table, ["k"], seq_col="seq", run_id="r"
        )
    b2ok = b2.withColumn("region", F.lit(None).cast("string"))
    merge_upsert_batch(
        b2ok, 2, table, ["k"], seq_col="seq", run_id="r"
    )
    assert _rows(spark, table)[4] == ("A", 2, None)


def test_same_columns_any_order_still_merges(spark):
    """Column ORDER drift (no set drift) keeps working — unionByName
    alignment, not positional."""
    base = spark.createDataFrame([(1, "A", 0)], SCHEMA)
    reordered = spark.createDataFrame(
        [("B", 1, 2)], "status string, seq long, k long"
    )
    out = {
        r.k: (r.status, r.seq)
        for r in merged_frame(
            base, reordered, ["k"], seq_col="seq"
        ).collect()
    }
    assert out == {1: ("A", 0), 2: ("B", 1)}
