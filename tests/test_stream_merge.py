"""End-to-end exactly-once contract of the streaming MERGE sink
(streaming/merge.py): restart drains only new input, and at-least-once
redelivery of any micro-batch — same id after the pointer flip, a new id
after a checkpoint loss, even an OLD batch arriving late — converges to
the same keyed table with zero duplicate rows."""

from __future__ import annotations

import os

SCHEMA = "k long, status string, price double, seq long"


def _rows(spark, table):
    from filmdatawarehouse_spark.streaming.merge import read_merge_table

    df = read_merge_table(spark, table)
    return {r.k: (r.status, r.price, r.seq) for r in df.collect()}


def test_stream_merge_upsert_exactly_once_restart_and_replay(
    spark, tmp_path
):
    from filmdatawarehouse_spark.streaming.merge import (
        current_snapshot,
        merge_upsert_batch,
        write_stream_merge_upsert,
    )

    src = str(tmp_path / "src")
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    os.makedirs(table)

    base = [(1, "A", 10.0, 0), (2, "A", 20.0, 0), (3, "B", 30.0, 0)]
    spark.createDataFrame(base, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = write_stream_merge_upsert(stream, table, ["k"], ckpt, seq_col="seq")
    q.awaitTermination()
    assert _rows(spark, table) == {
        1: ("A", 10.0, 0),
        2: ("A", 20.0, 0),
        3: ("B", 30.0, 0),
    }

    # updates + an insert land; RESTART the stream against the same
    # checkpoint — only the new file is processed, updates win, no dupes
    delta = [(2, "U", 22.0, 1), (4, "A", 40.0, 1)]
    spark.createDataFrame(delta, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    stream2 = spark.readStream.schema(SCHEMA).parquet(src)
    q2 = write_stream_merge_upsert(stream2, table, ["k"], ckpt, seq_col="seq")
    q2.awaitTermination()
    after = {
        1: ("A", 10.0, 0),
        2: ("U", 22.0, 1),
        3: ("B", 30.0, 0),
        4: ("A", 40.0, 1),
    }
    assert _rows(spark, table) == after

    # crash window 1: batch redelivered with the SAME (run, batch) after
    # the pointer flip (checkpoint commit lost) — must be a no-op. Pin
    # the run id by applying once through the direct API first.
    replay = spark.createDataFrame(delta, SCHEMA)
    merge_upsert_batch(replay, 7, table, ["k"], seq_col="seq", run_id="r1")
    assert _rows(spark, table) == after
    snap_before = current_snapshot(spark, table)
    merge_upsert_batch(replay, 7, table, ["k"], seq_col="seq", run_id="r1")
    assert current_snapshot(spark, table) == snap_before  # no-op: no new commit
    assert _rows(spark, table) == after

    # crash window 2: same rows under a NEW run identity (checkpoint
    # loss — the batch id even collides) — must RE-MERGE, not skip, and
    # converge with no duplicates
    merge_upsert_batch(replay, 7, table, ["k"], seq_col="seq", run_id="r2")
    assert _rows(spark, table) == after

    # out-of-order redelivery: an OLD batch arriving after a newer one
    # must not regress rows — seq survivorship, not arrival order
    stale = spark.createDataFrame([(2, "A", 20.0, 0)], SCHEMA)
    merge_upsert_batch(stale, 8, table, ["k"], seq_col="seq", run_id="r2")
    assert _rows(spark, table) == after

    # retention: current + previous snapshot only (a reader that just
    # resolved the previous snapshot can still finish its query)
    vdirs = sorted(d for d in os.listdir(table) if d.startswith("v-"))
    assert len(vdirs) <= 2 and current_snapshot(spark, table) in vdirs


def test_merge_checkpoint_loss_with_colliding_batch_ids_loses_nothing(
    spark, tmp_path
):
    """The review-r09 data-loss scenario, replayed exactly: a first run
    commits batch 0; the checkpoint is lost; the restarted run's batch 0
    now bundles old AND new rows. A batch-id-only guard would skip it —
    the run-identity key must instead re-merge and keep the new rows."""
    from filmdatawarehouse_spark.streaming.merge import (
        merge_upsert_batch,
        read_merge_table,
    )

    table = str(tmp_path / "t")
    os.makedirs(table)
    old = [(1, "A", 10.0, 0)]
    merge_upsert_batch(
        spark.createDataFrame(old, SCHEMA), 0, table, ["k"],
        seq_col="seq", run_id="run_a",
    )
    # checkpoint lost; new source file appeared; restarted stream's
    # batch 0 replays everything
    both = old + [(2, "B", 20.0, 1)]
    merge_upsert_batch(
        spark.createDataFrame(both, SCHEMA), 0, table, ["k"],
        seq_col="seq", run_id="run_b",
    )
    got = {r.k: r.status for r in read_merge_table(spark, table).collect()}
    assert got == {1: "A", 2: "B"}  # the new row survived the collision


def test_merge_without_seq_is_arrival_order_last_write_wins(spark, tmp_path):
    from filmdatawarehouse_spark.streaming.merge import (
        merge_upsert_batch,
        read_merge_table,
    )

    table = str(tmp_path / "t")
    os.makedirs(table)
    merge_upsert_batch(
        spark.createDataFrame([(1, "A", 1.0, 0)], SCHEMA), 0, table, ["k"]
    )
    merge_upsert_batch(
        spark.createDataFrame([(1, "B", 2.0, 0)], SCHEMA), 1, table, ["k"]
    )
    rows = read_merge_table(spark, table).collect()
    assert len(rows) == 1 and rows[0].status == "B"


def test_streaming_ingest_pipeline_quarantine_merge_deadletter(
    spark, tmp_path
):
    """Production-shaped streaming warehouse load, end to end: a dirty
    JSON feed is split by the REAL `split_quarantine` expressions, clean
    rows flow through the exactly-once MERGE sink (seq survivorship),
    dead letters land in the partition-per-batch idempotent parquet sink
    — then the feed grows and BOTH streams restart from their
    checkpoints. Conservation (clean keys + quarantined raw lines ==
    input lines), update-wins, and no-duplicates must all hold across
    the restart."""
    from pyspark.sql import functions as F

    from filmdatawarehouse_spark.io.formats import split_quarantine
    from filmdatawarehouse_spark.streaming.dedup import (
        write_stream_idempotent_parquet,
    )
    from filmdatawarehouse_spark.streaming.merge import (
        read_merge_table,
        write_stream_merge_upsert,
    )

    feed = tmp_path / "feed"
    feed.mkdir()
    table = str(tmp_path / "table")
    dead = str(tmp_path / "dead")
    ck_m = str(tmp_path / "ck_merge")
    ck_d = str(tmp_path / "ck_dead")
    os.makedirs(table)

    def run_once():
        raw = spark.readStream.format("text").load(str(feed))
        clean, quarantine = split_quarantine(
            raw, "json", "k long, status string, seq long"
        )
        qm = write_stream_merge_upsert(
            clean.filter(F.col("k").isNotNull()),
            table,
            ["k"],
            ck_m,
            seq_col="seq",
        )
        qd = write_stream_idempotent_parquet(
            quarantine.select("raw_record"), dead, ck_d
        )
        qm.awaitTermination()
        qd.awaitTermination()

    (feed / "f1.json").write_text(
        '{"k": 1, "status": "A", "seq": 0}\n'
        "{broken line}\n"
        '{"k": 2, "status": "A", "seq": 0}\n'
    )
    run_once()
    t = read_merge_table(spark, table)
    assert {(r.k, r.status) for r in t.collect()} == {(1, "A"), (2, "A")}
    assert [r.raw_record for r in spark.read.parquet(dead).collect()] == [
        "{broken line}"
    ]

    # feed grows: an update for k=2, a new key, another dead letter, a
    # blank line; RESTART both sinks from their checkpoints
    (feed / "f2.json").write_text(
        '{"k": 2, "status": "U", "seq": 1}\n'
        '{"k": 3, "status": "A", "seq": 1}\n'
        "\n"
        "also not json\n"
    )
    run_once()
    t = read_merge_table(spark, table)
    rows = t.collect()
    assert len(rows) == 3  # no duplicate keys across the restart
    assert {(r.k, r.status) for r in rows} == {
        (1, "A"),
        (2, "U"),
        (3, "A"),
    }
    bad = sorted(r.raw_record for r in spark.read.parquet(dead).collect())
    assert bad == ["", "also not json", "{broken line}"]


def test_merge_plan_is_single_exchange_no_join_no_sort(spark):
    """The MERGE survivorship plan must stay the one-shuffle aggregate
    shape: exactly one Exchange (hashpartitioning on the key), partial
    aggregation below it, and neither a join nor a window sort anywhere
    — the property that keeps the sink viable when the upsert target is
    large."""
    from filmdatawarehouse_spark.streaming.merge import merged_frame

    base = spark.range(1000).selectExpr(
        "id AS k", "'A' AS status", "CAST(id AS double) AS price",
        "CAST(0 AS long) AS seq"
    )
    batch = spark.range(100).selectExpr(
        "id AS k", "'U' AS status", "CAST(id+1 AS double) AS price",
        "CAST(1 AS long) AS seq"
    )
    plan = (
        merged_frame(base, batch, ["k"], seq_col="seq")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Join" not in plan, plan
    assert "Window" not in plan, plan


DERBY_URL = "jdbc:derby:memory:fdw_merge_jdbc;create=true"
DERBY_DRV = "org.apache.derby.jdbc.EmbeddedDriver"


def test_jdbc_merge_exactly_once_restart_and_replay(spark, tmp_path):
    """The transactional exactly-once recipe against a REAL embedded
    Derby: restart drains only new input; redelivery with the same id is
    skipped via the batch ledger inside the SAME transaction as the
    upsert; an out-of-order OLD batch cannot regress rows (seq guard in
    the DELETE); no duplicate keys ever."""
    from filmdatawarehouse_spark.streaming.jdbc_merge import (
        merge_jdbc_batch,
        write_stream_merge_jdbc,
    )

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    def table_rows():
        back = (
            spark.read.format("jdbc")
            .option("url", DERBY_URL)
            .option("driver", DERBY_DRV)
            .option("dbtable", "merged_t")
            .load()
        )
        return {r.k: (r.status, r.price, r.seq) for r in back.collect()}

    base = [(1, "A", 10.0, 0), (2, "A", 20.0, 0), (3, "B", 30.0, 0)]
    spark.createDataFrame(base, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    q = write_stream_merge_jdbc(
        spark.readStream.schema(SCHEMA).parquet(src),
        DERBY_URL,
        "merged_t",
        ["k"],
        ckpt,
        seq_col="seq",
        driver=DERBY_DRV,
    )
    q.awaitTermination()
    assert table_rows() == {
        1: ("A", 10.0, 0),
        2: ("A", 20.0, 0),
        3: ("B", 30.0, 0),
    }

    delta = [(2, "U", 22.0, 1), (4, "A", 40.0, 1)]
    spark.createDataFrame(delta, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    q2 = write_stream_merge_jdbc(
        spark.readStream.schema(SCHEMA).parquet(src),
        DERBY_URL,
        "merged_t",
        ["k"],
        ckpt,
        seq_col="seq",
        driver=DERBY_DRV,
    )
    q2.awaitTermination()
    after = {
        1: ("A", 10.0, 0),
        2: ("U", 22.0, 1),
        3: ("B", 30.0, 0),
        4: ("A", 40.0, 1),
    }
    assert table_rows() == after

    # crash window 1: SAME (run, batch) redelivered (ledger hit -> no-op
    # even though staging was rewritten). Pin the run id via the direct
    # API: first application under ("r1", 7) is a real merge, the second
    # must be skipped by the ledger.
    replay = spark.createDataFrame(delta, SCHEMA)
    merge_jdbc_batch(
        replay, 7, DERBY_URL, "merged_t", ["k"], seq_col="seq",
        driver=DERBY_DRV, run_id="r1",
    )
    assert table_rows() == after
    merge_jdbc_batch(
        replay, 7, DERBY_URL, "merged_t", ["k"], seq_col="seq",
        driver=DERBY_DRV, run_id="r1",
    )
    assert table_rows() == after

    # crash window 2 (the review-r09 collision): checkpoint lost, the
    # restarted run's batch id COLLIDES — a new run identity must
    # RE-APPLY (convergent), never skip
    merge_jdbc_batch(
        replay, 7, DERBY_URL, "merged_t", ["k"], seq_col="seq",
        driver=DERBY_DRV, run_id="r2",
    )
    assert table_rows() == after

    # out-of-order: an OLD batch under a new id must not regress k=2
    stale = spark.createDataFrame([(2, "A", 20.0, 0)], SCHEMA)
    merge_jdbc_batch(
        stale, 100, DERBY_URL, "merged_t", ["k"], seq_col="seq",
        driver=DERBY_DRV, run_id="r2",
    )
    assert table_rows() == after


def test_jdbc_merge_transaction_rolls_back_atomically(spark, tmp_path, monkeypatch):
    """Crash INSIDE the transaction: if any statement after the DELETE
    fails, the rollback must leave BOTH the target table and the batch
    ledger untouched — no half-applied batch, no phantom ledger row (a
    ledger row without the data would make the later replay a data-losing
    no-op). Then the undoctored retry of the same batch must succeed."""
    from filmdatawarehouse_spark.streaming import jdbc_merge

    url = "jdbc:derby:memory:fdw_merge_atomic;create=true"

    def table_rows(name="atomic_t"):
        back = (
            spark.read.format("jdbc")
            .option("url", url)
            .option("driver", DERBY_DRV)
            .option("dbtable", name)
            .load()
        )
        return {r.k: (r.status, r.price, r.seq) for r in back.collect()}

    base = spark.createDataFrame(
        [(1, "A", 10.0, 0), (2, "A", 20.0, 0)], SCHEMA
    )
    jdbc_merge.merge_jdbc_batch(
        base, 0, url, "atomic_t", ["k"], seq_col="seq", driver=DERBY_DRV,
        run_id="ra",
    )
    before = table_rows()

    # doctor the INSERT statement so the txn fails AFTER the DELETE ran
    real_execute = jdbc_merge._execute

    def sabotaged(conn, sql):
        if sql.lstrip().upper().startswith("INSERT INTO ATOMIC_T"):
            raise RuntimeError("injected crash inside the transaction")
        return real_execute(conn, sql)

    monkeypatch.setattr(jdbc_merge, "_execute", sabotaged)
    delta = spark.createDataFrame([(2, "U", 22.0, 1), (3, "B", 30.0, 1)], SCHEMA)
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="injected"):
        jdbc_merge.merge_jdbc_batch(
            delta, 1, url, "atomic_t", ["k"], seq_col="seq",
            driver=DERBY_DRV, run_id="ra",
        )
    monkeypatch.setattr(jdbc_merge, "_execute", real_execute)
    # rollback: the DELETE that ran inside the doomed txn left no trace
    assert table_rows() == before
    # and the ledger did not record batch 1 — the retry applies for real
    jdbc_merge.merge_jdbc_batch(
        delta, 1, url, "atomic_t", ["k"], seq_col="seq", driver=DERBY_DRV,
        run_id="ra",
    )
    assert table_rows() == {
        1: ("A", 10.0, 0),
        2: ("U", 22.0, 1),
        3: ("B", 30.0, 1),
    }


def test_jdbc_merge_null_keys_never_duplicate(spark, tmp_path):
    """Plain SQL `=` is never true for NULL, so a NULL-key row would
    dodge the DELETE and re-INSERT every batch. The null-safe key match
    must keep exactly one NULL-key survivor — matching the snapshot
    sink's groupBy semantics (NULL is one group)."""
    from filmdatawarehouse_spark.streaming.jdbc_merge import merge_jdbc_batch

    url = "jdbc:derby:memory:fdw_merge_nullk;create=true"
    merge_jdbc_batch(
        spark.createDataFrame([(None, "A", 1.0, 0), (1, "A", 1.0, 0)], SCHEMA),
        0, url, "nk_t", ["k"], seq_col="seq", driver=DERBY_DRV, run_id="r",
    )
    merge_jdbc_batch(
        spark.createDataFrame([(None, "B", 2.0, 1)], SCHEMA),
        1, url, "nk_t", ["k"], seq_col="seq", driver=DERBY_DRV, run_id="r",
    )
    back = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("driver", DERBY_DRV)
        .option("dbtable", "nk_t")
        .load()
        .collect()
    )
    got = sorted(
        ((r.k, r.status) for r in back),
        key=lambda t: (t[0] is None, t[0] or 0, t[1]),
    )
    assert got == [(1, "A"), (None, "B")]


def test_snapshot_pointer_legacy_format_still_resolves(spark, tmp_path):
    """A table committed by the pre-run-identity code (pointer holds the
    bare batch id, snapshot at v-<id>) must stay readable and mergeable
    after the upgrade."""
    from filmdatawarehouse_spark.streaming.merge import (
        merge_upsert_batch,
        read_merge_table,
    )

    table = str(tmp_path / "legacy")
    os.makedirs(table)
    spark.createDataFrame([(1, "A", 1.0, 0)], SCHEMA).write.parquet(
        os.path.join(table, "v-5")
    )
    with open(os.path.join(table, "_LATEST"), "w") as f:
        f.write("5")
    assert {r.k for r in read_merge_table(spark, table).collect()} == {1}
    merge_upsert_batch(
        spark.createDataFrame([(2, "B", 2.0, 1)], SCHEMA),
        0, table, ["k"], seq_col="seq", run_id="new",
    )
    assert {r.k for r in read_merge_table(spark, table).collect()} == {1, 2}


def test_partitioned_merge_touches_only_batch_partitions(spark, tmp_path):
    """The partition-pruned MERGE must (a) upsert correctly, (b) leave
    UNTOUCHED partitions' files bit-identical on disk (the O(touched)
    claim, verified by file mtimes+sizes, not just values), and (c) be
    replay-idempotent — re-applying the same batch changes nothing."""
    import glob

    from filmdatawarehouse_spark.streaming.merge import (
        merge_upsert_batch_partitioned,
    )

    table = str(tmp_path / "pt")
    schema = "k long, day string, status string, seq long"

    base = [
        (1, "d1", "A", 0),
        (2, "d1", "A", 0),
        (3, "d2", "A", 0),
        (4, "d3", "A", 0),
    ]
    merge_upsert_batch_partitioned(
        spark.createDataFrame(base, schema), table, ["k"], "day",
        seq_col="seq",
    )

    def files(day):
        return {
            (p, os.path.getmtime(p), os.path.getsize(p))
            for p in glob.glob(f"{table}/day={day}/*.parquet")
        }

    d2_before, d3_before = files("d2"), files("d3")
    delta = [(2, "d1", "U", 1), (5, "d1", "A", 1)]  # touches d1 only
    merge_upsert_batch_partitioned(
        spark.createDataFrame(delta, schema), table, ["k"], "day",
        seq_col="seq",
    )
    got = {
        (r.k, r.day, r.status)
        for r in spark.read.parquet(table).collect()
    }
    expect = {
        (1, "d1", "A"),
        (2, "d1", "U"),
        (3, "d2", "A"),
        (4, "d3", "A"),
        (5, "d1", "A"),
    }
    assert got == expect
    # untouched partitions: same files, same mtimes, same bytes
    assert files("d2") == d2_before and files("d3") == d3_before

    # replay idempotence: same batch again -> identical table
    merge_upsert_batch_partitioned(
        spark.createDataFrame(delta, schema), table, ["k"], "day",
        seq_col="seq",
    )
    again = {
        (r.k, r.day, r.status)
        for r in spark.read.parquet(table).collect()
    }
    assert again == expect
    assert files("d2") == d2_before  # still untouched

    # an OLD redelivery cannot regress (seq survivorship)
    stale = [(2, "d1", "A", 0)]
    merge_upsert_batch_partitioned(
        spark.createDataFrame(stale, schema), table, ["k"], "day",
        seq_col="seq",
    )
    assert {
        (r.k, r.status)
        for r in spark.read.parquet(table).filter("k = 2").collect()
    } == {(2, "U")}


def test_partitioned_merge_streaming_restart(spark, tmp_path):
    """The partitioned sink through a real readStream: restart from the
    checkpoint drains only new input; no duplicates, updates win."""
    from pyspark.sql import functions as F

    from filmdatawarehouse_spark.streaming.merge import (
        write_stream_merge_partitioned,
    )

    src = str(tmp_path / "src")
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    schema = "k long, day string, status string, seq long"

    spark.createDataFrame(
        [(1, "d1", "A", 0), (2, "d2", "A", 0)], schema
    ).coalesce(1).write.mode("append").parquet(src)
    q = write_stream_merge_partitioned(
        spark.readStream.schema(schema).parquet(src),
        table, ["k"], "day", ckpt, seq_col="seq",
    )
    q.awaitTermination()

    spark.createDataFrame(
        [(2, "d2", "U", 1), (3, "d1", "A", 1)], schema
    ).coalesce(1).write.mode("append").parquet(src)
    q2 = write_stream_merge_partitioned(
        spark.readStream.schema(schema).parquet(src),
        table, ["k"], "day", ckpt, seq_col="seq",
    )
    q2.awaitTermination()

    rows = spark.read.parquet(table).collect()
    assert len(rows) == 3
    assert {(r.k, r.day, r.status) for r in rows} == {
        (1, "d1", "A"),
        (2, "d2", "U"),
        (3, "d1", "A"),
    }
    # partition pruning survives on the result table
    plan = (
        spark.read.parquet(table)
        .filter(F.col("day") == "d1")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters: [isnotnull(day" in plan


def test_partitioned_merge_null_partition_updates_not_duplicated(
    spark, tmp_path
):
    """isin() never matches NULL: a null-partition batch's existing rows
    (__HIVE_DEFAULT_PARTITION__) must still be visible to the pruned
    base read, or every update would duplicate instead of replacing."""
    from filmdatawarehouse_spark.streaming.merge import (
        merge_upsert_batch_partitioned,
    )

    table = str(tmp_path / "nt")
    schema = "k long, day string, status string, seq long"
    merge_upsert_batch_partitioned(
        spark.createDataFrame([(1, None, "A", 0), (2, "d1", "A", 0)], schema),
        table, ["k"], "day", seq_col="seq",
    )
    merge_upsert_batch_partitioned(
        spark.createDataFrame([(1, None, "U", 1)], schema),
        table, ["k"], "day", seq_col="seq",
    )
    rows = spark.read.parquet(table).collect()
    assert len(rows) == 2
    assert {(r.k, r.status) for r in rows} == {(1, "U"), (2, "A")}


def test_base_read_probe_maps_only_path_absent_to_first_batch(
    spark, tmp_path
):
    """Review r09 (medium): the base-table existence probe must treat
    ONLY the two table-absent error classes as 'first batch'. Any other
    read failure (the S3-timeout / permission-blip / corrupt-footer
    class) must re-raise and fail the micro-batch for replay — mapping
    it to base=None would dynamic-overwrite the touched partitions with
    batch-only rows: silent data loss."""
    import pytest
    from pyspark.errors import AnalysisException

    from filmdatawarehouse_spark.streaming.merge import (
        _is_missing_table_error,
        _read_parquet_or_none,
    )

    # absent path and empty dir are the two legitimate first-batch cases
    assert _read_parquet_or_none(spark, str(tmp_path / "nope")) is None
    empty = tmp_path / "empty"
    empty.mkdir()
    assert _read_parquet_or_none(spark, str(empty)) is None

    # any OTHER AnalysisException class must classify as a real failure
    with pytest.raises(AnalysisException) as ei:
        spark.sql("select nonexistent_column from range(1)").collect()
    assert not _is_missing_table_error(ei.value)


def test_merged_frame_rejects_reserved_columns_and_keyonly_batch(spark):
    """Review r09: withColumn would silently REPLACE a caller '_prio'
    (breaking survivorship) and '_s' collides with the struct alias;
    a key-only batch would make F.struct() error obscurely. All three
    must raise loudly up front."""
    import pytest

    from filmdatawarehouse_spark.streaming.merge import merged_frame

    prio = spark.createDataFrame([(1, "x", 9)], "k long, v string, _prio long")
    with pytest.raises(ValueError, match="_prio"):
        merged_frame(None, prio, ["k"])
    s = spark.createDataFrame([(1, "x")], "k long, _s string")
    with pytest.raises(ValueError, match="_s"):
        merged_frame(None, s, ["k"])
    keyonly = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError, match="non-key"):
        merged_frame(None, keyonly, ["k"])


def test_jdbc_merge_run_id_is_required_and_scopes_the_ledger(spark):
    """Reviews r09+r10: no run_id DEFAULT is safe — the old shared 'api'
    made independent callers collide on staging + ledger; a per-call
    fresh uuid silently loses replay protection. run_id is therefore a
    required keyword: omitting it is a TypeError, distinct run ids keep
    independent callers' same-numbered batches from skipping each
    other, and a stable run id preserves replay idempotence."""
    import pytest

    from filmdatawarehouse_spark.streaming.jdbc_merge import merge_jdbc_batch

    url = "jdbc:derby:memory:fdw_merge_ridcol;create=true"
    b1 = spark.createDataFrame([(1, "A", 1.0, 0)], SCHEMA)
    with pytest.raises(TypeError):
        merge_jdbc_batch(
            b1, 0, url, "rid_t", ["k"], seq_col="seq", driver=DERBY_DRV
        )
    merge_jdbc_batch(
        b1, 0, url, "rid_t", ["k"], seq_col="seq", driver=DERBY_DRV,
        run_id="caller_a",
    )
    # same batch_id, different logical caller: must APPLY, not skip
    merge_jdbc_batch(
        spark.createDataFrame([(2, "B", 2.0, 0)], SCHEMA),
        0, url, "rid_t", ["k"], seq_col="seq", driver=DERBY_DRV,
        run_id="caller_b",
    )
    # stable run id: the retried batch is a ledger no-op (replay
    # protection the fresh-uuid default would have lost)
    merge_jdbc_batch(
        spark.createDataFrame([(1, "STALE", 9.0, 9)], SCHEMA),
        0, url, "rid_t", ["k"], seq_col="seq", driver=DERBY_DRV,
        run_id="caller_a",
    )
    back = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("driver", DERBY_DRV)
        .option("dbtable", "rid_t")
        .load()
    )
    assert {r.k: r.status for r in back.collect()} == {1: "A", 2: "B"}


def test_partitioned_merge_multicol_touches_only_batch_leaves(
    spark, tmp_path
):
    """r11: the partitioned MERGE accepts a LIST of partition columns —
    the batch's distinct (day, hour) tuples prune the base read and the
    dynamic overwrite replaces exactly those leaves; untouched leaves
    stay bit-identical on disk, NULL levels update without duplicating."""
    import os as _os

    from filmdatawarehouse_spark.io import maintenance as mt
    from filmdatawarehouse_spark.streaming.merge import (
        merge_upsert_batch_partitioned,
    )

    table = str(tmp_path / "table")
    schema = "k long, day string, hour int, status string, seq long"
    base = [
        (1, "d1", 0, "A", 0),
        (2, "d1", 1, "A", 0),
        (3, "d2", 0, "A", 0),
        (4, "d1", None, "A", 0),
    ]
    merge_upsert_batch_partitioned(
        spark.createDataFrame(base, schema),
        table, ["k"], ["day", "hour"], seq_col="seq",
    )
    untouched = sorted(
        (rel, size)
        for rel, size in mt.list_data_files(spark, table)
        if rel.startswith(("day=d1/hour=1/", "day=d2/"))
    )

    batch = [
        (1, "d1", 0, "U", 1),            # update in (d1, 0)
        (5, "d1", 0, "A", 1),            # insert in (d1, 0)
        (4, "d1", None, "U", 1),         # update in the NULL-hour leaf
    ]
    merge_upsert_batch_partitioned(
        spark.createDataFrame(batch, schema),
        table, ["k"], ["day", "hour"], seq_col="seq",
    )
    rows = {
        r.k: (r.day, r.hour, r.status, r.seq)
        for r in spark.read.parquet(table).collect()
    }
    assert rows == {
        1: ("d1", 0, "U", 1),
        2: ("d1", 1, "A", 0),
        3: ("d2", 0, "A", 0),
        4: ("d1", None, "U", 1),
        5: ("d1", 0, "A", 1),
    }
    after = sorted(
        (rel, size)
        for rel, size in mt.list_data_files(spark, table)
        if rel.startswith(("day=d1/hour=1/", "day=d2/"))
    )
    assert after == untouched
    assert _os.path.isdir(
        f"{table}/day=d1/{mt.HIVE_DEFAULT_PARTITION}"
    ) or _os.path.isdir(f"{table}/day=d1/hour={mt.HIVE_DEFAULT_PARTITION}")
    # replay of the same batch is a fixed point
    merge_upsert_batch_partitioned(
        spark.createDataFrame(batch, schema),
        table, ["k"], ["day", "hour"], seq_col="seq",
    )
    assert {
        r.k: (r.day, r.hour, r.status, r.seq)
        for r in spark.read.parquet(table).collect()
    } == rows


def test_read_merge_changes_cdc_between_retained_snapshots(
    spark, tmp_path
):
    """r11: the keep-two snapshot retention feeds a CDC reader —
    read_merge_changes diffs the retained previous snapshot against the
    current one into (keys, insert/update/delete), survives prune-crash
    garbage via run-identity disambiguation, and returns None rather
    than a guess when no unambiguous previous exists."""
    import os as _os

    from filmdatawarehouse_spark.streaming.merge import (
        previous_snapshot,
        read_merge_changes,
        write_stream_merge_upsert,
    )

    src = str(tmp_path / "src")
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    _os.makedirs(src)
    _os.makedirs(table)

    spark.createDataFrame(
        [(1, "A", 10.0, 0), (2, "A", 20.0, 0), (3, "B", 30.0, 0)], SCHEMA
    ).coalesce(1).write.mode("append").parquet(src)
    q = write_stream_merge_upsert(
        spark.readStream.schema(SCHEMA).parquet(src),
        table, ["k"], ckpt, seq_col="seq", run_id="cdcrun",
    )
    q.awaitTermination()
    # one snapshot only: no changes feed yet
    assert read_merge_changes(spark, table, ["k"]) is None

    spark.createDataFrame(
        [(2, "U", 22.0, 1), (4, "A", 40.0, 1)], SCHEMA
    ).coalesce(1).write.mode("append").parquet(src)
    q2 = write_stream_merge_upsert(
        spark.readStream.schema(SCHEMA).parquet(src),
        table, ["k"], ckpt, seq_col="seq", run_id="cdcrun",
    )
    q2.awaitTermination()

    changes = {
        r.k: r.change_type
        for r in read_merge_changes(spark, table, ["k"]).collect()
    }
    assert changes == {2: "update", 4: "insert"}

    # prune-crash garbage from a FOREIGN run: same-run disambiguation
    # still finds the true previous
    _os.makedirs(f"{table}/v-zzzgarbage-7")
    assert previous_snapshot(spark, table) == "v-cdcrun-0"
    assert {
        r.k: r.change_type
        for r in read_merge_changes(spark, table, ["k"]).collect()
    } == {2: "update", 4: "insert"}

    # garbage from the SAME run below current still loses to the max
    _os.makedirs(f"{table}/v-cdcrun-0x")  # non-numeric tail: ignored
    assert previous_snapshot(spark, table) == "v-cdcrun-0"

    # compare_cols restriction: seq-only diff sees the update, and the
    # insert is an insert regardless of compared columns
    only_status = {
        r.k: r.change_type
        for r in read_merge_changes(
            spark, table, ["k"], compare_cols=["status"]
        ).collect()
    }
    assert only_status == {2: "update", 4: "insert"}


def test_previous_snapshot_pointer_pair_and_legacy_future_partials(
    spark, tmp_path
):
    """r11 review: (a) post-r11 pointers record (current, previous) on
    two lines — one atomic read, no dir guessing, no double-read race;
    (b) on a LEGACY single-line pointer, a same-run snapshot at/above
    the current batch is a crashed FUTURE partial (the documented
    pointer-flip crash window) and must never be returned as the
    previous — the old len==1 shortcut returned exactly that, which
    would have fed the CDC consumer an INVERTED diff."""
    import os as _os

    from filmdatawarehouse_spark.streaming.merge import previous_snapshot

    t = str(tmp_path / "t")
    _os.makedirs(f"{t}/v-run-0")
    _os.makedirs(f"{t}/v-run-1")  # crashed future partial
    with open(f"{t}/_LATEST", "w") as f:
        f.write("v-run-0")  # legacy single-line pointer
    assert previous_snapshot(spark, t) is None  # refuse, never invert

    # r12 (ADVICE): a sole CROSS-RUN candidate is indistinguishable by
    # name from a crashed partial of a different run identity — refused
    # too, never guessed (the r11 code returned it, risking one
    # inverted/garbage CDC diff on legacy tables)
    t2 = str(tmp_path / "t2")
    _os.makedirs(f"{t2}/v-runa-0")
    _os.makedirs(f"{t2}/v-runb-3")  # foreign run identity: ambiguous
    with open(f"{t2}/_LATEST", "w") as f:
        f.write("v-runa-0")
    assert previous_snapshot(spark, t2) is None

    # once a later batch commits, earlier same-run dirs are legitimate:
    # the heuristic picks the HIGHEST batch below the current one
    _os.makedirs(f"{t}/v-run-7")
    with open(f"{t}/_LATEST", "w") as f:
        f.write("v-run-7")
    assert previous_snapshot(spark, t) == "v-run-1"

    # post-r11 two-line pointer: exact, overrides the dir heuristic
    with open(f"{t}/_LATEST", "w") as f:
        f.write("v-run-7\nv-run-0")
    assert previous_snapshot(spark, t) == "v-run-0"
    # recorded previous already pruned: refuse, never guess
    with open(f"{t}/_LATEST", "w") as f:
        f.write("v-run-7\nv-run-gone")
    assert previous_snapshot(spark, t) is None


def test_per_batch_cdc_consumer_hook(spark, tmp_path):
    """r12: on_changes attaches a PER-BATCH CDC consumer inside the
    sink's foreachBatch — the granularity read_merge_changes (end-of-run
    diff) cannot give. Contract pinned here: bootstrap batch feeds every
    row as an insert; each later batch feeds exactly its own diff;
    delivery is AT-LEAST-ONCE (a replay after the pointer flip no-ops
    the merge but re-feeds the same diff); a consumer exception fails
    the batch for replay."""
    import os as _os

    import pytest

    from filmdatawarehouse_spark.streaming.merge import (
        merge_upsert_batch,
        write_stream_merge_upsert,
    )

    src = str(tmp_path / "src")
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    _os.makedirs(src)
    _os.makedirs(table)

    feeds: list[tuple[int, dict]] = []

    def consumer(changes, batch_id):
        feeds.append(
            (batch_id, {r.k: r.change_type for r in changes.collect()})
        )

    spark.createDataFrame(
        [(1, "A", 10.0, 0), (2, "A", 20.0, 0)], SCHEMA
    ).coalesce(1).write.mode("append").parquet(src)
    q = write_stream_merge_upsert(
        spark.readStream.schema(SCHEMA).parquet(src),
        table, ["k"], ckpt, seq_col="seq", run_id="cdchook",
        on_changes=consumer,
    )
    q.awaitTermination()
    # bootstrap: everything is an insert
    assert feeds == [(0, {1: "insert", 2: "insert"})]

    spark.createDataFrame(
        [(2, "U", 22.0, 1), (3, "B", 30.0, 1)], SCHEMA
    ).coalesce(1).write.mode("append").parquet(src)
    q2 = write_stream_merge_upsert(
        spark.readStream.schema(SCHEMA).parquet(src),
        table, ["k"], ckpt, seq_col="seq", run_id="cdchook",
        on_changes=consumer,
    )
    q2.awaitTermination()
    assert feeds[1] == (1, {2: "update", 3: "insert"})

    # replay of the SAME (run, batch) after the flip: merge no-ops,
    # the consumer re-receives the identical diff (at-least-once)
    replay = spark.createDataFrame([(2, "U", 22.0, 1), (3, "B", 30.0, 1)], SCHEMA)
    merge_upsert_batch(
        replay, 1, table, ["k"], seq_col="seq", run_id="cdchook",
        on_changes=consumer,
    )
    assert feeds[2] == (1, {2: "update", 3: "insert"})
    # the table itself was untouched by the replay
    rows = {r.k: r.status for r in spark.read.parquet(
        f"{table}/v-cdchook-1").collect()}
    assert rows == {1: "A", 2: "U", 3: "B"}

    # a consumer exception fails the batch (part of the batch's work)
    def boom(changes, batch_id):
        raise RuntimeError("downstream unavailable")

    with pytest.raises(RuntimeError, match="downstream unavailable"):
        merge_upsert_batch(
            spark.createDataFrame([(4, "C", 40.0, 2)], SCHEMA),
            2, table, ["k"], seq_col="seq", run_id="cdchook",
            on_changes=boom,
        )
