"""Schema-drift policy of the transactional JDBC MERGE sink (r13) —
the snapshot sink's policy (tests/test_merge_schema_evolution.py)
carried to the database leg, executed against embedded Derby.

Before: a batch adding a column died mid-transaction on an opaque
store error (and replayed into the same error forever); a batch
missing a target column merged anyway — its superseding DELETE plus
narrower INSERT silently nulled the column for every key the batch
touched. Now: drops refuse loudly BEFORE the staging write; additive
widening is opt-in, typed from the staging table's own metadata, run
on a separate autocommit connection (MySQL DDL implicitly commits —
inside the transaction it would break trio+ledger atomicity), and
convergent across a crash between the ALTER and the transaction.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from filmdatawarehouse_spark.streaming import jdbc_merge
from filmdatawarehouse_spark.streaming.jdbc_merge import merge_jdbc_batch

DRV = "org.apache.derby.jdbc.EmbeddedDriver"
SCHEMA = "k long, status string, seq long"
WIDE = "k long, status string, seq long, region string"


def _rows(spark, url, table):
    back = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("driver", DRV)
        .option("dbtable", table)
        .load()
    )
    cols = [c for c in back.columns if c != "k"]
    return {r.k: tuple(r[c] for c in cols) for r in back.collect()}


def _seed(spark, url, table):
    b0 = spark.createDataFrame([(1, "A", 0), (2, "A", 0)], SCHEMA)
    merge_jdbc_batch(
        b0, 0, url, table, ["k"], seq_col="seq", driver=DRV, run_id="r"
    )


def test_added_column_refused_under_strict_before_staging(spark):
    url = "jdbc:derby:memory:fdw_evo_strict;create=true"
    _seed(spark, url, "t_strict")
    wide = spark.createDataFrame([(3, "B", 1, "eu")], WIDE)
    with pytest.raises(ValueError, match="schema_evolution='additive'"):
        merge_jdbc_batch(
            wide, 1, url, "t_strict", ["k"], seq_col="seq",
            driver=DRV, run_id="r",
        )
    # the refusal left the target untouched
    assert _rows(spark, url, "t_strict") == {1: ("A", 0), 2: ("A", 0)}


def test_missing_column_refused_not_silent_loss(spark):
    url = "jdbc:derby:memory:fdw_evo_drop;create=true"
    wide0 = spark.createDataFrame([(1, "A", 0, "eu")], WIDE)
    merge_jdbc_batch(
        wide0, 0, url, "t_drop", ["k"], seq_col="seq", driver=DRV,
        run_id="r",
    )
    narrow = spark.createDataFrame([(1, "U", 1)], SCHEMA)
    with pytest.raises(ValueError, match="missing target column"):
        merge_jdbc_batch(
            narrow, 1, url, "t_drop", ["k"], seq_col="seq", driver=DRV,
            run_id="r", schema_evolution="additive",
        )
    assert _rows(spark, url, "t_drop") == {1: ("A", 0, "eu")}


def test_additive_widens_merges_and_replays(spark):
    url = "jdbc:derby:memory:fdw_evo_add;create=true"
    _seed(spark, url, "t_add")
    wide = spark.createDataFrame(
        [(2, "U", 1, "eu"), (3, "A", 1, None)], WIDE
    )
    merge_jdbc_batch(
        wide, 1, url, "t_add", ["k"], seq_col="seq", driver=DRV,
        run_id="r", schema_evolution="additive",
    )
    after = {
        1: ("A", 0, None),   # pre-evolution row reads NULL
        2: ("U", 1, "eu"),   # seq survivorship across the boundary
        3: ("A", 1, None),
    }
    assert _rows(spark, url, "t_add") == after

    # ledger no-op replay of the evolved batch
    merge_jdbc_batch(
        wide, 1, url, "t_add", ["k"], seq_col="seq", driver=DRV,
        run_id="r", schema_evolution="additive",
    )
    assert _rows(spark, url, "t_add") == after

    # post-evolution: a narrow batch now refuses; null-filled it merges
    narrow = spark.createDataFrame([(4, "A", 2)], SCHEMA)
    with pytest.raises(ValueError, match="missing target column"):
        merge_jdbc_batch(
            narrow, 2, url, "t_add", ["k"], seq_col="seq", driver=DRV,
            run_id="r",
        )
    ok = narrow.withColumn("region", F.lit(None).cast("string"))
    merge_jdbc_batch(
        ok, 2, url, "t_add", ["k"], seq_col="seq", driver=DRV, run_id="r"
    )
    assert _rows(spark, url, "t_add")[4] == ("A", 2, None)


def test_key_seq_additions_refused(spark):
    url = "jdbc:derby:memory:fdw_evo_key;create=true"
    b0 = spark.createDataFrame([(1, "A")], "k long, status string")
    merge_jdbc_batch(b0, 0, url, "t_key", ["k"], driver=DRV, run_id="r")
    with_seq = spark.createDataFrame([(2, "B", 1)], SCHEMA)
    with pytest.raises(ValueError, match="not evolvable"):
        merge_jdbc_batch(
            with_seq, 1, url, "t_key", ["k"], seq_col="seq", driver=DRV,
            run_id="r", schema_evolution="additive",
        )


def test_crash_between_alter_and_transaction_replays_convergently(
    spark, monkeypatch
):
    """Kill the batch right after the widening ALTER committed (its own
    autocommit connection) but before the merge transaction. The replay
    must find the column already present, alter nothing, and complete
    the merge — exactly-once on rows."""
    url = "jdbc:derby:memory:fdw_evo_crash;create=true"
    _seed(spark, url, "t_crash")
    wide = spark.createDataFrame([(2, "U", 1, "eu")], WIDE)

    real = jdbc_merge._column_ddl_type
    state = {"altered": False}

    def crash_after_type(conn, table, col, dialect):
        out = real(conn, table, col, dialect)
        state["altered"] = True
        return out

    monkeypatch.setattr(jdbc_merge, "_column_ddl_type", crash_after_type)
    real_exec = jdbc_merge._execute

    def crashing_exec(conn, sql):
        real_exec(conn, sql)
        if sql.upper().startswith("ALTER TABLE"):
            raise RuntimeError("injected crash after ALTER")

    monkeypatch.setattr(jdbc_merge, "_execute", crashing_exec)
    with pytest.raises(RuntimeError, match="after ALTER"):
        merge_jdbc_batch(
            wide, 1, url, "t_crash", ["k"], seq_col="seq", driver=DRV,
            run_id="r", schema_evolution="additive",
        )
    assert state["altered"]
    monkeypatch.undo()

    # crash state: column exists, rows unmerged, ledger unmarked
    rows = _rows(spark, url, "t_crash")
    assert rows[2] == ("A", 0, None)

    merge_jdbc_batch(
        wide, 1, url, "t_crash", ["k"], seq_col="seq", driver=DRV,
        run_id="r", schema_evolution="additive",
    )
    assert _rows(spark, url, "t_crash") == {
        1: ("A", 0, None),
        2: ("U", 1, "eu"),
    }


def test_add_column_golden_sql_both_dialects():
    from filmdatawarehouse_spark.streaming.jdbc_dialect import DERBY, MYSQL

    assert (
        DERBY.add_column("t", "region", "VARCHAR(32)")
        == 'ALTER TABLE t ADD COLUMN "region" VARCHAR(32)'
    )
    assert (
        MYSQL.add_column("t", "region", "VARCHAR(32)")
        == "ALTER TABLE t ADD COLUMN `region` VARCHAR(32)"
    )
