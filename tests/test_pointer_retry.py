"""Pointer reads tolerate one simulated non-atomic rename flip (r13,
VERDICT r12 item 4).

``io/fs.py`` documents that on object stores ``rename(OVERWRITE)`` is
copy+delete: a reader can observe the pointer MISSING for the flip
window, and a raw read would misreport an established table as "no
commits yet" (the MERGE sink would then bootstrap-diff a full snapshot;
an IVF search would raise "no index"). ``fs.read_text_retry`` bounds
that window with 3 reads + backoff; these tests drive each pointer
consumer through a deterministic one-read blackout — ``fs.read_text``
patched to report absent exactly once, armed AFTER the table/index is
established — and assert the committed state is still resolved. The
single-writer requirement is unchanged; the retry only removes the
READER's exposure to the flip.
"""

from __future__ import annotations

import pytest

from filmdatawarehouse_spark.io import fs


@pytest.fixture
def blackout(monkeypatch):
    """Patch ``fs.read_text`` so that, while ARMED, the next call
    returns None (the missing-pointer observation between delete and
    re-create) and disarms; every other call delegates to the real
    read. Tests arm it only after their setup commits. Also reports a
    non-atomic-rename scheme (r14: ``read_text_retry`` skips retries on
    local/HDFS where absence is the truth — these tests simulate an
    object store on a local path, so the scheme must lie with them)."""
    real = fs.read_text
    state = {"armed": False, "fired": 0}

    def flaky(spark, path):
        if state["armed"]:
            state["armed"] = False
            state["fired"] += 1
            return None
        return real(spark, path)

    monkeypatch.setattr(fs, "read_text", flaky)
    monkeypatch.setattr(fs, "_scheme", lambda spark, path: "s3a")
    return state


def _tiny_emb(spark):
    rows = [(i, [float((i * 5 + j) % 7) + 1.0 for j in range(8)])
            for i in range(20)]
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    )


def test_merge_pointer_survives_flip_blackout(spark, tmp_path, blackout):
    from filmdatawarehouse_spark.streaming.merge import (
        _read_pointer,
        merge_upsert_batch,
    )

    table = str(tmp_path / "t")
    batch = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    merge_upsert_batch(batch, 0, table, keys=["k"], run_id="r")
    blackout["armed"] = True
    cur, _ = _read_pointer(spark, table)
    assert blackout["fired"] == 1 and not blackout["armed"]
    assert cur == "v-r-0"


def test_ivf_pointer_survives_flip_blackout(spark, tmp_path, blackout):
    from filmdatawarehouse_spark.operators.ivfpq import (
        ivfpq_index_build,
        ivfpq_version_dir,
    )

    idx = str(tmp_path / "idx")
    ivfpq_index_build(_tiny_emb(spark), idx, n_lists=2, m=2, n_codes=4,
                      n_iters=1)
    blackout["armed"] = True
    vdir = ivfpq_version_dir(spark, idx)
    assert blackout["fired"] == 1 and not blackout["armed"]
    assert vdir.split("/")[-1].startswith("v-")


def test_ingest_ledger_survives_flip_blackout(spark, tmp_path, blackout):
    from filmdatawarehouse_spark.operators.ivfpq import (
        ivfpq_index_build,
        ivfpq_version_dir,
    )
    from filmdatawarehouse_spark.streaming.vector_ingest import (
        _applied,
        ivfpq_ingest_batch,
    )

    idx = str(tmp_path / "idx")
    ivfpq_index_build(_tiny_emb(spark), idx, n_lists=2, m=2, n_codes=4,
                      n_iters=1)
    delta = spark.createDataFrame(
        [(100, [2.0] * 8)], "vec_id bigint, embedding array<double>"
    )
    ivfpq_ingest_batch(delta, 5, idx, run_id="r1")
    vdir = ivfpq_version_dir(spark, idx)
    blackout["armed"] = True
    assert _applied(spark, vdir) == {"r1": 5}
    assert blackout["fired"] == 1 and not blackout["armed"]


def test_absent_pointer_still_reads_absent_and_bounded(spark, tmp_path, monkeypatch):
    """On a NON-atomic-rename store a genuinely new table must still
    read as absent — after exactly ``attempts`` underlying reads, never
    an unbounded loop."""
    calls = {"n": 0}
    real = fs.read_text

    def counting(spark_, path):
        calls["n"] += 1
        return real(spark_, path)

    monkeypatch.setattr(fs, "read_text", counting)
    monkeypatch.setattr(fs, "_scheme", lambda spark_, path: "s3a")
    out = fs.read_text_retry(spark, str(tmp_path / "nope"), attempts=3)
    assert out is None
    assert calls["n"] == 3


def test_atomic_scheme_absent_read_skips_retry(spark, tmp_path, monkeypatch):
    """ADVICE r13: on atomic-rename schemes (local FS here) an absent
    pointer is the truth — ONE underlying read, no backoff sleep, so a
    new table's legitimately-first pointer read is not taxed ~0.15 s."""
    calls = {"n": 0}
    real = fs.read_text

    def counting(spark_, path):
        calls["n"] += 1
        return real(spark_, path)

    monkeypatch.setattr(fs, "read_text", counting)
    out = fs.read_text_retry(spark, str(tmp_path / "nope"), attempts=3)
    assert out is None
    assert calls["n"] == 1


def test_atomic_scheme_detection_is_local_file(spark, tmp_path):
    """The detection itself: a local path resolves to the "file" scheme
    (in the atomic set); detection failure returns None (conservative —
    retries stay on)."""
    assert fs._scheme(spark, str(tmp_path / "x")) == "file"
