"""Crash matrix for the vector-ingest → compaction composition (r13,
VERDICT r12 item 6) — the ``test_merge_compact_crash_matrix`` pattern
applied to ``ivfpq_ingest_batch`` + ``compact_partitions`` over the
hive-partitioned codes table.

``tests/test_vector_ingest.py`` covers each piece's own contract
(ledger no-op, anti-join over a SIMULATED partial append, fragmentation
compaction). This matrix INJECTS the crash the banner argues about —
the append job committed, the ledger write did not — and proves the
contracts compose: a replay converges through the anti-join with zero
duplicate ids, INCLUDING when ops runs a compaction between the crash
and the replay (the rewrite changes every data file under the
anti-join's feet; ids are the invariant), and a ledger-committed batch
replayed after a compaction stays a strict no-op at the file level.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from filmdatawarehouse_spark.io import fs
from filmdatawarehouse_spark.io import maintenance as mt
from filmdatawarehouse_spark.io.sources import read_table
from filmdatawarehouse_spark.operators.ivfpq import (
    ivfpq_codes_path,
    ivfpq_index_build,
    ivfpq_search,
    ivfpq_version_dir,
)
from filmdatawarehouse_spark.streaming.vector_ingest import (
    _applied,
    _ledger_path,
    ivfpq_ingest_batch,
)


@pytest.fixture()
def corpus(spark, sf_dir):
    return read_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )


def _ids(spark, idx) -> list[int]:
    return sorted(
        r.vec_id
        for r in spark.read.parquet(ivfpq_codes_path(spark, idx)).collect()
    )


def _crash_ledger_write(monkeypatch):
    """Arm: the NEXT ledger write (fs.write_text_atomic on an
    INGEST_LEDGER path) raises AFTER the append already committed —
    the exact between-append-and-ledger window. Non-ledger writes
    pass through untouched."""
    real = fs.write_text_atomic
    fired = []

    def crashing(spark, path, text):
        if path.endswith("INGEST_LEDGER") and not fired:
            fired.append(path)
            raise RuntimeError("injected crash before ledger write")
        return real(spark, path, text)

    monkeypatch.setattr(fs, "write_text_atomic", crashing)
    return fired


@pytest.mark.parametrize("compact_between", [False, True])
def test_crash_between_append_and_ledger_replay_converges(
    spark, corpus, tmp_path, monkeypatch, compact_between
):
    """Kill the batch after its append job committed but before the
    ledger write; optionally run a compaction over the crash state
    (ops healing fragmentation before anyone notices the stream
    died); replay the same (run, batch). Convergence contract: every
    id exactly once, ledger mark present, search unaffected."""
    idx = str(tmp_path / "idx")
    ivfpq_index_build(
        corpus.filter(F.col("vec_id") < 300), idx, n_iters=2
    )
    batch = corpus.filter(F.col("vec_id") >= 300)

    fired = _crash_ledger_write(monkeypatch)
    with pytest.raises(RuntimeError, match="before ledger write"):
        ivfpq_ingest_batch(batch, 4, idx, run_id="r")
    assert fired  # the injected window actually fired
    monkeypatch.undo()

    # crash state: rows landed, ledger did NOT — the window a ledger
    # alone cannot close
    assert _ids(spark, idx) == list(range(500))
    vdir = ivfpq_version_dir(spark, idx)
    assert _applied(spark, vdir) == {}

    if compact_between:
        codes = ivfpq_codes_path(spark, idx)
        summary = mt.compact_partitions(
            spark, codes, "list_id", target_bytes=1 << 30
        )
        assert summary["partitions"] >= 1  # build + append fragments

    # replay from the foreachBatch redelivery: anti-join inserts
    # nothing (all ids present — compacted or not), ledger converges
    ivfpq_ingest_batch(batch, 4, idx, run_id="r")
    assert _ids(spark, idx) == list(range(500))
    assert _applied(spark, vdir) == {"r": 4}

    # a further redelivery is a ledger fast-path no-op: zero file churn
    codes = ivfpq_codes_path(spark, idx)
    layout = mt.list_data_files(spark, codes)
    ivfpq_ingest_batch(batch, 4, idx, run_id="r")
    assert mt.list_data_files(spark, codes) == layout

    # the served index stays correct through every window
    queries = corpus.filter(F.col("vec_id").isin([0, 350, 450]))
    out = ivfpq_search(spark, idx, queries, k=5)
    assert out.groupBy("query_id").count().count() == 3


def test_committed_batch_replay_after_compaction_is_noop(
    spark, corpus, tmp_path
):
    """The other composition order: batch COMMITTED (ledger written),
    then compaction rewrites the codes files, then the batch is
    redelivered. The ledger fast-path must still no-op — the mark, not
    the file layout, is the idempotence state — and the compacted
    layout must survive the replay byte-for-byte."""
    idx = str(tmp_path / "idx")
    ivfpq_index_build(
        corpus.filter(F.col("vec_id") < 300), idx, n_iters=2
    )
    batch = corpus.filter(F.col("vec_id") >= 300)
    ivfpq_ingest_batch(batch, 0, idx, run_id="r")
    assert _ids(spark, idx) == list(range(500))

    codes = ivfpq_codes_path(spark, idx)
    summary = mt.compact_partitions(
        spark, codes, "list_id", target_bytes=1 << 30
    )
    assert summary["partitions"] >= 1
    vdir = ivfpq_version_dir(spark, idx)
    assert _applied(spark, vdir) == {"r": 0}  # ledger survived compaction

    layout = mt.list_data_files(spark, codes)
    ivfpq_ingest_batch(batch, 0, idx, run_id="r")
    assert mt.list_data_files(spark, codes) == layout
    assert _ids(spark, idx) == list(range(500))
