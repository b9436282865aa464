"""End-to-end exactly-once contract of the streaming IVF-PQ ingest
(streaming/vector_ingest.py): restart drains only new input; a
redelivered committed batch no-ops on the ledger; a replay under a NEW
run identity — and even a crash that committed only PART of a batch's
append — converges through the anti-join with zero duplicate ids and
codes bit-identical to build-time encoding."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from filmdatawarehouse_spark.io.sources import read_table
from filmdatawarehouse_spark.operators.ivfpq import (
    ivfpq_codes_path,
    ivfpq_index_append,
    ivfpq_index_build,
    ivfpq_search,
)
from filmdatawarehouse_spark.streaming.vector_ingest import (
    ivfpq_ingest_batch,
    write_stream_ivfpq_ingest,
)
from tests.test_ivfpq import _expected_assignment, _replay_artifacts

SCHEMA = "vec_id long, embedding array<float>"


@pytest.fixture()
def corpus(spark, sf_dir):
    return read_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )


def _ids(spark, idx) -> dict[int, tuple[int, list[int]]]:
    return {
        r.vec_id: (r.list_id, list(r.codes))
        for r in spark.read.parquet(ivfpq_codes_path(spark, idx)).collect()
    }


def test_stream_ingest_exactly_once_restart_and_replay(
    spark, corpus, tmp_path
):
    import numpy as np
    import os

    idx = str(tmp_path / "idx")
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    ivfpq_index_build(
        corpus.filter(F.col("vec_id") < 300), idx, n_iters=2
    )

    delta1 = corpus.filter(
        (F.col("vec_id") >= 300) & (F.col("vec_id") < 400)
    )
    delta1.coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = write_stream_ivfpq_ingest(stream, idx, ckpt)
    q.awaitTermination()
    stored = _ids(spark, idx)
    assert set(stored) == set(range(400))

    # RESTART against the same checkpoint: only the new file processes
    delta2 = corpus.filter(F.col("vec_id") >= 400)
    delta2.coalesce(1).write.mode("append").parquet(src)
    q2 = write_stream_ivfpq_ingest(
        spark.readStream.schema(SCHEMA).parquet(src), idx, ckpt
    )
    q2.awaitTermination()
    stored = _ids(spark, idx)
    assert sorted(stored) == list(range(500))  # every id exactly once

    # ingested codes are bit-identical to build-time encoding
    cents, books, _ = _replay_artifacts(spark, idx)
    for r in corpus.filter(F.col("vec_id") >= 300).collect():
        x = np.asarray(r.embedding, dtype=np.float64)
        assert stored[r.vec_id] == _expected_assignment(x, cents, books)

    # crash window 1: same (run, batch) redelivered after the ledger
    # write — must no-op on the ledger (no re-read, no new rows)
    replay = corpus.filter(F.col("vec_id") >= 400)
    ivfpq_ingest_batch(replay, 7, idx, run_id="r1")
    assert sorted(_ids(spark, idx)) == list(range(500))
    ivfpq_ingest_batch(replay, 7, idx, run_id="r1")
    assert sorted(_ids(spark, idx)) == list(range(500))

    # crash window 2: same rows under a NEW run identity (checkpoint
    # loss) — the anti-join finds nothing missing; still no duplicates
    ivfpq_ingest_batch(replay, 7, idx, run_id="r2")
    assert sorted(_ids(spark, idx)) == list(range(500))

    # the served index stays searchable across all of it
    queries = corpus.filter(F.col("vec_id").isin([0, 350, 450]))
    out = ivfpq_search(spark, idx, queries, k=5)
    assert out.groupBy("query_id").count().count() == 3


def test_ingest_partial_commit_converges(spark, corpus, tmp_path):
    """The window a ledger alone cannot close: a crash during the
    append's job commit left PART of the batch in the codes table and
    no ledger entry. Replay (necessarily under any run id) must insert
    exactly the missing rows."""
    idx = str(tmp_path / "idx")
    ivfpq_index_build(
        corpus.filter(F.col("vec_id") < 300), idx, n_iters=2
    )
    batch = corpus.filter(F.col("vec_id") >= 300)
    # simulate the partial commit with the raw (ledger-less) append of
    # half the batch — encoding is the same code path
    ivfpq_index_append(
        batch.filter(F.col("vec_id") < 400), idx
    )
    assert sorted(_ids(spark, idx)) == list(range(400))
    ivfpq_ingest_batch(batch, 3, idx, run_id="after-crash")
    assert sorted(_ids(spark, idx)) == list(range(500))  # no dupes, none missing


def test_ingest_fragmentation_compacts_in_place(spark, corpus, tmp_path):
    """r12 composition: the index's codes table IS a hive-partitioned
    parquet table, so streaming-ingest fragmentation (one small append
    per micro-batch) is healed by io.maintenance.compact_partitions on
    list_id — same ADC results after, fewer files, and the ingest
    LEDGER survives (compaction rewrites data files, never the
    version's commit state)."""
    from filmdatawarehouse_spark.io import fs, maintenance as mt
    from filmdatawarehouse_spark.operators.ivfpq import ivfpq_version_dir
    from filmdatawarehouse_spark.streaming.vector_ingest import _ledger_path

    idx = str(tmp_path / "idx")
    ivfpq_index_build(
        corpus.filter(F.col("vec_id") < 200), idx, n_iters=2
    )
    for i, lo in enumerate(range(200, 500, 30)):
        ivfpq_ingest_batch(
            corpus.filter(
                (F.col("vec_id") >= lo) & (F.col("vec_id") < lo + 30)
            ),
            i,
            idx,
            run_id="frag",
        )
    codes = ivfpq_codes_path(spark, idx)
    before = len(mt.list_data_files(spark, codes))
    queries = corpus.filter(F.col("vec_id") < 10)
    res_before = {
        (r.query_id, r.neighbor_id, round(r.score, 9))
        for r in ivfpq_search(spark, idx, queries, k=5).collect()
    }
    summary = mt.compact_partitions(
        spark, codes, "list_id", target_bytes=1 << 30
    )
    assert summary["partitions"] >= 1
    assert len(mt.list_data_files(spark, codes)) < before
    assert sorted(_ids(spark, idx)) == list(range(500))
    res_after = {
        (r.query_id, r.neighbor_id, round(r.score, 9))
        for r in ivfpq_search(spark, idx, queries, k=5).collect()
    }
    assert res_after == res_before
    ledger = fs.read_text(
        spark, _ledger_path(ivfpq_version_dir(spark, idx))
    )
    assert ledger is not None and "frag 9" in ledger  # high-water intact


def test_ingest_empty_batch_marks_ledger_only(spark, corpus, tmp_path):
    from filmdatawarehouse_spark.io import fs
    from filmdatawarehouse_spark.operators.ivfpq import ivfpq_version_dir
    from filmdatawarehouse_spark.streaming.vector_ingest import _ledger_path

    idx = str(tmp_path / "idx")
    ivfpq_index_build(corpus, idx, n_iters=1)
    before = sorted(_ids(spark, idx))
    empty = corpus.filter(F.col("vec_id") < 0)
    ivfpq_ingest_batch(empty, 0, idx, run_id="quiet")
    assert sorted(_ids(spark, idx)) == before
    vdir = ivfpq_version_dir(spark, idx)
    assert "quiet 0" in (fs.read_text(spark, _ledger_path(vdir)) or "")
