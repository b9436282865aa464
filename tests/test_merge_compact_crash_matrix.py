"""Crash matrix for the merge → auto-compaction → vacuum composition
(VERDICT r10 item 4): each piece documents a per-phase crash contract
("a replay repairs"), and each piece has its own tests — these tests
prove the contracts COMPOSE. The job is killed after each phase of the
streaming sink's batch (the MERGE commit, the compaction), the batch is
replayed from the same checkpoint, and rows + file layout must converge
with the checkpoint skipping the already-applied batch.

The heal-phase crashes (mid-rename-loop, between heal and rewrite) are
exercised directly against ``compact_partitions``: the colliding-dir
state that makes the heal non-trivial is a foreign-WRITER state, which
is out of the streaming sink's managed-table contract (its own writes
only ever produce Spark's canonical dir spellings)."""

from __future__ import annotations

import os

import pytest

SCHEMA = "k long, day int, status string, seq long"


def _rows(spark, table):
    return {
        r.k: (r.day, r.status, r.seq)
        for r in spark.read.parquet(table).collect()
    }


def _append(spark, src, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)


def _run_stream(spark, src, table, ckpt, compact=1 << 30):
    from filmdatawarehouse_spark.streaming.merge import (
        write_stream_merge_partitioned,
    )

    q = write_stream_merge_partitioned(
        spark.readStream.schema(SCHEMA).parquet(src),
        table,
        ["k"],
        "day",
        ckpt,
        seq_col="seq",
        compact_target_bytes=compact,
    )
    return q


@pytest.mark.parametrize("phase", ["after_merge_commit", "after_compaction"])
def test_streaming_crash_after_each_phase_replay_converges(
    spark, tmp_path, monkeypatch, phase
):
    """Kill the batch (a) after the MERGE's dynamic overwrite committed
    but before compaction, (b) after compaction completed but before the
    checkpoint commit. Both crash states must be readable (per-partition
    consistency), and a replay from the same checkpoint must converge to
    the same rows and a compacted layout — including when a whole-table
    ``compact_parquet`` crash leftover sits beside the table and is
    vacuumed between the crash and the replay."""
    import filmdatawarehouse_spark.io.maintenance as mt
    from pyspark.errors.exceptions.captured import StreamingQueryException

    src = str(tmp_path / "src")
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    _append(spark, src, [(1, 5, "A", 0), (2, 5, "A", 0), (3, 6, "A", 0)])
    _run_stream(spark, src, table, ckpt).awaitTermination()
    assert _rows(spark, table) == {
        1: (5, "A", 0),
        2: (5, "A", 0),
        3: (6, "A", 0),
    }

    # batch 2 with an injected crash in the chosen phase
    _append(spark, src, [(2, 5, "U", 1), (4, 6, "A", 1)])
    real_compact = mt.compact_partitions
    fired = []

    def crashing(*args, **kwargs):
        if phase == "after_compaction":
            real_compact(*args, **kwargs)
        fired.append(phase)
        raise RuntimeError(f"injected crash {phase}")

    monkeypatch.setattr(mt, "compact_partitions", crashing)
    q = _run_stream(spark, src, table, ckpt)
    with pytest.raises(StreamingQueryException):
        q.awaitTermination()
    assert fired  # the crash fired after the merge commit, as intended
    monkeypatch.undo()

    expected = {
        1: (5, "A", 0),
        2: (5, "U", 1),
        3: (6, "A", 0),
        4: (6, "A", 1),
    }
    # crash state: the merge had already committed; table is readable
    # and correct at row level in BOTH phases (per-partition atomicity)
    assert _rows(spark, table) == expected

    # ops runs a vacuum between the crash and the replay: a stale
    # whole-table compact_parquet leftover beside the LIVE table is
    # removed, the table itself untouched
    leftover = str(tmp_path / "table_compact_0badc0de")
    os.makedirs(leftover)
    assert mt.vacuum_compact_leftovers(spark, table) == [
        f"file:{leftover}"
    ]
    assert _rows(spark, table) == expected

    # replay from the same checkpoint redelivers ONLY the failed batch;
    # merge is a fixed point, compaction converges the layout
    _run_stream(spark, src, table, ckpt).awaitTermination()
    assert _rows(spark, table) == expected
    assert (
        real_compact(spark, table, "day", target_bytes=1 << 30)[
            "partitions"
        ]
        == 0
    )

    # the checkpoint skips applied batches: a further drain with no new
    # input changes neither rows nor a single file on disk
    layout = mt.list_data_files(spark, table)
    _run_stream(spark, src, table, ckpt).awaitTermination()
    assert mt.list_data_files(spark, table) == layout
    assert _rows(spark, table) == expected


def _foreign_collision_table(spark, tmp_path):
    """day=5 (canonical, fragmented) beside foreign zero-padded day=05 —
    ONE int value to a Spark scan, rows disjoint by construction."""
    path = str(tmp_path / "t")
    schema = "k long, v string"
    for sub, lo in [("day=5", 0), ("day=05", 100)]:
        os.makedirs(f"{path}/{sub}")
        spark.createDataFrame(
            [(lo + i, f"v{lo + i}") for i in range(100)], schema
        ).repartition(4).write.mode("append").parquet(f"{path}/{sub}")
    assert spark.read.parquet(path).count() == 200
    return path


def test_heal_crash_between_move_and_rewrite_replay_converges(
    spark, tmp_path, monkeypatch
):
    """Kill compaction right after the heal moved a foreign dir's files,
    before the rewrite. The crash state must already be duplicate-free
    (the move neither copies nor drops rows), and the re-run must finish
    the job: this is the exact window where the previous
    read-both-overwrite-purge design permanently double-counted rows."""
    import filmdatawarehouse_spark.io.maintenance as mt

    path = _foreign_collision_table(spark, tmp_path)
    real_move = mt._move_partition_dir

    def crash_after_move(*args, **kwargs):
        real_move(*args, **kwargs)
        raise RuntimeError("injected crash after heal move")

    monkeypatch.setattr(mt, "_move_partition_dir", crash_after_move)
    with pytest.raises(RuntimeError, match="after heal move"):
        mt.compact_partitions(spark, path, "day", target_bytes=1 << 30)
    monkeypatch.undo()

    # crash state: no row lost, no row duplicated, foreign dir gone
    assert spark.read.parquet(path).count() == 200
    stats = mt.partition_file_stats(spark, path, "day")
    assert stats.get("05", (0, 0))[0] == 0

    # replay completes the rewrite and converges
    summary = mt.compact_partitions(
        spark, path, "day", target_bytes=1 << 30
    )
    assert summary["partitions"] == 1
    back = spark.read.parquet(path)
    assert back.count() == 200
    assert {r.k for r in back.select("k").distinct().collect()} == set(
        range(200)
    )
    assert (
        mt.compact_partitions(spark, path, "day", target_bytes=1 << 30)[
            "partitions"
        ]
        == 0
    )


def test_heal_crash_mid_rename_loop_replay_converges(spark, tmp_path):
    """Kill the heal INSIDE its rename loop: one foreign file already
    renamed into the canonical dir, the rest not. Simulated by doing
    that exact first rename by hand — the replay's move must skip the
    already-moved file (its source is gone) and carry the rest, with
    zero duplication."""
    import filmdatawarehouse_spark.io.maintenance as mt

    path = _foreign_collision_table(spark, tmp_path)
    foreign = sorted(
        f
        for f in os.listdir(f"{path}/day=05")
        if f.endswith(".parquet")
    )
    assert len(foreign) >= 2
    os.rename(
        f"{path}/day=05/{foreign[0]}", f"{path}/day=5/{foreign[0]}"
    )
    assert spark.read.parquet(path).count() == 200  # crash state intact

    summary = mt.compact_partitions(
        spark, path, "day", target_bytes=1 << 30
    )
    assert summary["partitions"] == 1
    back = spark.read.parquet(path)
    assert back.count() == 200
    assert {r.k for r in back.select("k").distinct().collect()} == set(
        range(200)
    )
    stats = mt.partition_file_stats(spark, path, "day")
    assert stats.get("05", (0, 0))[0] == 0
    assert (
        mt.compact_partitions(spark, path, "day", target_bytes=1 << 30)[
            "partitions"
        ]
        == 0
    )
