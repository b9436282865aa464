"""Writer fencing: two concurrent writers on one table — exactly one
commits per lease generation, the other refuses loudly (r14, VERDICT
r13 item 1).

``io/lease.py`` is the mechanism (lease file + fencing token verified
at commit time); these tests drive it three ways:

- lease-level: acquire/refuse/re-enter/steal/verify semantics;
- sink-level: the MERGE sink, the IVF-PQ ingest batch, and the IVF
  append each REFUSE under a foreign lease, and the committed state is
  untouched by the refused writer;
- interleave-level: a second writer commits in the middle of the first
  writer's batch (injected between the first writer's acquire and its
  pointer flip via a takeover) — the superseded writer's verify
  refuses BEFORE the flip, and the table holds exactly the surviving
  writer's generation.
"""

from __future__ import annotations

import time

import pytest

from filmdatawarehouse_spark.io import fs, lease
from filmdatawarehouse_spark.io.lease import WriterFencedError


def _batch(spark, rows):
    return spark.createDataFrame(rows, "k int, v string")


# ---------------------------------------------------------------- lease


def test_acquire_release_roundtrip(spark, tmp_path):
    root = str(tmp_path / "t")
    tok = lease.acquire(spark, root, owner="a")
    lease.verify(spark, root, tok)
    lease.release(spark, root, tok)
    # released: a different owner may acquire immediately
    tok2 = lease.acquire(spark, root, owner="b")
    lease.verify(spark, root, tok2)


def test_second_writer_refuses_while_held(spark, tmp_path):
    root = str(tmp_path / "t")
    lease.acquire(spark, root, owner="a")
    with pytest.raises(WriterFencedError, match="held by 'a'"):
        lease.acquire(spark, root, owner="b")


def test_same_owner_reenters_and_rotates_token(spark, tmp_path):
    """Crash replay: the SAME logical writer re-acquires instantly, and
    the abandoned token can no longer pass verify."""
    root = str(tmp_path / "t")
    old = lease.acquire(spark, root, owner="a")
    new = lease.acquire(spark, root, owner="a")  # replay after a crash
    assert new != old
    lease.verify(spark, root, new)
    with pytest.raises(WriterFencedError):
        lease.verify(spark, root, old)


def test_expired_lease_is_taken_over_and_fences_the_original(spark, tmp_path):
    """TTL takeover: a foreign writer may steal an expired lease; the
    original (paused, not dead) then refuses at verify — the GC-pause
    fencing story."""
    root = str(tmp_path / "t")
    old = lease.acquire(spark, root, owner="a")
    time.sleep(0.05)
    new = lease.acquire(spark, root, owner="b", ttl_s=0.01)
    lease.verify(spark, root, new)
    with pytest.raises(WriterFencedError):
        lease.verify(spark, root, old)
    # and the superseded writer's release refuses too (surfaces the
    # interleave) without removing the new holder's lease
    with pytest.raises(WriterFencedError):
        lease.release(spark, root, old)
    lease.verify(spark, root, new)


def test_break_lease_is_the_operator_override(spark, tmp_path):
    root = str(tmp_path / "t")
    tok = lease.acquire(spark, root, owner="a")
    assert lease.break_lease(spark, root) is True
    assert lease.break_lease(spark, root) is False
    with pytest.raises(WriterFencedError):
        lease.verify(spark, root, tok)
    lease.acquire(spark, root, owner="b")  # door is open again


def test_release_after_break_is_a_noop(spark, tmp_path):
    root = str(tmp_path / "t")
    tok = lease.acquire(spark, root, owner="a")
    lease.break_lease(spark, root)
    lease.release(spark, root, tok)  # nothing of ours left — no raise


def test_owner_must_be_nonempty(spark, tmp_path):
    with pytest.raises(ValueError, match="non-empty"):
        lease.acquire(spark, str(tmp_path / "t"), owner="  ")


# ----------------------------------------------------------- MERGE sink


def test_merge_refuses_under_foreign_lease(spark, tmp_path):
    from filmdatawarehouse_spark.streaming.merge import (
        current_snapshot,
        merge_upsert_batch,
    )

    table = str(tmp_path / "t")
    merge_upsert_batch(_batch(spark, [(1, "a")]), 0, table, keys=["k"],
                       run_id="A")
    assert current_snapshot(spark, table) == "v-A-0"
    lease.acquire(spark, table, owner="B")
    with pytest.raises(WriterFencedError):
        merge_upsert_batch(_batch(spark, [(2, "b")]), 1, table, keys=["k"],
                           run_id="A")
    # the refused writer changed nothing
    assert current_snapshot(spark, table) == "v-A-0"


def test_merge_replay_reenters_its_own_crashed_lease(spark, tmp_path):
    """A crash between commit steps leaves the lease behind; the
    foreachBatch replay (same run_id) must proceed immediately, not
    wait out a TTL."""
    from filmdatawarehouse_spark.streaming.merge import (
        current_snapshot,
        merge_upsert_batch,
    )

    table = str(tmp_path / "t")
    lease.acquire(spark, table, owner="A")  # the crashed attempt's lease
    merge_upsert_batch(_batch(spark, [(1, "a")]), 0, table, keys=["k"],
                       run_id="A")
    assert current_snapshot(spark, table) == "v-A-0"
    # success path released the lease: a new writer may enter
    lease.acquire(spark, table, owner="B")


def test_merge_interleave_exactly_one_commits(spark, tmp_path, monkeypatch):
    """The two-concurrent-writers simulation: writer B commits in the
    middle of writer A's batch (injected after A's acquire, via a
    takeover of A's lease). A's commit-time verify must refuse BEFORE
    the pointer flip, and the table must hold exactly B's generation —
    no silent interleave, no torn pointer."""
    import filmdatawarehouse_spark.streaming.merge as merge_mod

    table = str(tmp_path / "t")
    merge_mod.merge_upsert_batch(
        _batch(spark, [(1, "seed")]), 0, table, keys=["k"], run_id="seed"
    )

    real_read = merge_mod.read_merge_table
    state = {"armed": True}

    def hijack(spark_, path):
        # runs AFTER A's acquire (A reads its base under the lease):
        # simulate B taking over — operator broke A's stuck lease, B
        # acquired and committed its own batch — then let A continue
        if state["armed"] and path == table:
            state["armed"] = False
            lease.break_lease(spark_, table)
            merge_mod.merge_upsert_batch(
                _batch(spark_, [(2, "B")]), 0, table, keys=["k"], run_id="B"
            )
            lease.acquire(spark_, table, owner="B-stream")
        return real_read(spark_, path)

    monkeypatch.setattr(merge_mod, "read_merge_table", hijack)
    with pytest.raises(WriterFencedError):
        merge_mod.merge_upsert_batch(
            _batch(spark, [(3, "A")]), 1, table, keys=["k"], run_id="A"
        )
    # exactly one generation committed: B's, and A's refused flip left
    # B's pointer + snapshot intact
    assert merge_mod.current_snapshot(spark, table) == "v-B-0"
    rows = {
        (r.k, r.v)
        for r in merge_mod.read_merge_table(spark, table).collect()
    }
    assert rows == {(1, "seed"), (2, "B")}


# ------------------------------------------------------- vector writers


def _tiny_emb(spark, n=20, offset=0):
    rows = [
        (i + offset, [float((i * 5 + j) % 7) + 1.0 for j in range(8)])
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    )


@pytest.fixture(scope="module")
def pq_index(spark, tmp_path_factory):
    from filmdatawarehouse_spark.operators.ivfpq import ivfpq_index_build

    idx = str(tmp_path_factory.mktemp("fence") / "idx")
    ivfpq_index_build(_tiny_emb(spark), idx, n_lists=2, m=2, n_codes=4,
                      n_iters=1)
    return idx


def test_ingest_refuses_under_foreign_lease(spark, pq_index):
    from filmdatawarehouse_spark.operators.ivfpq import ivfpq_version_dir
    from filmdatawarehouse_spark.streaming.vector_ingest import (
        _applied,
        ivfpq_ingest_batch,
    )

    tok = lease.acquire(spark, pq_index, owner="other-stream")
    try:
        with pytest.raises(WriterFencedError):
            ivfpq_ingest_batch(
                _tiny_emb(spark, n=2, offset=100), 0, pq_index, run_id="r1"
            )
    finally:
        lease.release(spark, pq_index, tok)
    # the refused batch marked nothing
    vdir = ivfpq_version_dir(spark, pq_index)
    assert "r1" not in _applied(spark, vdir)


def test_ingest_commits_and_releases_after_the_holder_leaves(spark, pq_index):
    from filmdatawarehouse_spark.operators.ivfpq import ivfpq_version_dir
    from filmdatawarehouse_spark.streaming.vector_ingest import (
        _applied,
        ivfpq_ingest_batch,
    )

    ivfpq_ingest_batch(
        _tiny_emb(spark, n=2, offset=100), 0, pq_index, run_id="r1"
    )
    vdir = ivfpq_version_dir(spark, pq_index)
    assert _applied(spark, vdir) == {"r1": 0}
    # lease released on success: the next writer enters freely
    tok = lease.acquire(spark, pq_index, owner="next")
    lease.release(spark, pq_index, tok)


def test_ivf_append_refuses_under_foreign_lease(spark, tmp_path):
    from filmdatawarehouse_spark.operators.similarity import (
        ivf_index_build,
        ivf_index_append,
        ivf_index_vectors_path,
    )

    idx = str(tmp_path / "flat")
    ivf_index_build(_tiny_emb(spark), idx, n_lists=2, n_iters=1)
    before = spark.read.parquet(ivf_index_vectors_path(spark, idx)).count()
    tok = lease.acquire(spark, idx, owner="rebuild-in-flight")
    try:
        with pytest.raises(WriterFencedError):
            ivf_index_append(_tiny_emb(spark, n=3, offset=100), idx)
    finally:
        lease.release(spark, idx, tok)
    assert (
        spark.read.parquet(ivf_index_vectors_path(spark, idx)).count()
        == before
    )
    # and with the lease gone, the same append commits
    ivf_index_append(_tiny_emb(spark, n=3, offset=100), idx)
    assert (
        spark.read.parquet(ivf_index_vectors_path(spark, idx)).count()
        == before + 3
    )


def test_build_refuses_under_foreign_lease(spark, tmp_path):
    from filmdatawarehouse_spark.operators.similarity import ivf_index_build

    idx = str(tmp_path / "flat")
    lease.acquire(spark, idx, owner="other-builder")
    with pytest.raises(WriterFencedError):
        ivf_index_build(_tiny_emb(spark), idx, n_lists=2, n_iters=1)
    assert not fs.exists(spark, f"{idx}/INDEX")  # nothing committed


def test_partitioned_merge_refuses_under_foreign_lease(spark, tmp_path):
    from filmdatawarehouse_spark.streaming.merge import (
        merge_upsert_batch_partitioned,
    )

    table = str(tmp_path / "pt")
    b0 = spark.createDataFrame(
        [(1, "a", "d1"), (2, "b", "d2")], "k int, v string, day string"
    )
    merge_upsert_batch_partitioned(b0, table, keys=["k"],
                                   partition_col="day")
    tok = lease.acquire(spark, table, owner="other-stream")
    try:
        b1 = spark.createDataFrame(
            [(1, "CHANGED", "d1")], "k int, v string, day string"
        )
        with pytest.raises(WriterFencedError):
            merge_upsert_batch_partitioned(b1, table, keys=["k"],
                                           partition_col="day")
    finally:
        lease.release(spark, table, tok)
    rows = {(r.k, r.v) for r in spark.read.parquet(table).collect()}
    assert rows == {(1, "a"), (2, "b")}  # refused writer changed nothing
    # door open again: the same batch commits
    b1 = spark.createDataFrame(
        [(1, "CHANGED", "d1")], "k int, v string, day string"
    )
    merge_upsert_batch_partitioned(b1, table, keys=["k"],
                                   partition_col="day")
    rows = {(r.k, r.v) for r in spark.read.parquet(table).collect()}
    assert rows == {(1, "CHANGED"), (2, "b")}


def test_partitioned_merge_lease_file_invisible_to_scan(spark, tmp_path):
    """The _WRITER_LEASE file lives at the table root; Spark's default
    path filter must hide it from the scan and partition discovery (a
    visible one would break every read of the table)."""
    from filmdatawarehouse_spark.streaming.merge import (
        merge_upsert_batch_partitioned,
    )

    table = str(tmp_path / "pt")
    b0 = spark.createDataFrame([(1, "a", "d1")], "k int, v string, day string")
    merge_upsert_batch_partitioned(b0, table, keys=["k"], partition_col="day")
    lease.acquire(spark, table, owner="held-during-read")
    got = spark.read.parquet(table)
    assert {(r.k, r.v, r.day) for r in got.collect()} == {(1, "a", "d1")}


def test_partitioned_merge_fence_token_passthrough(spark, tmp_path):
    """A caller already holding the lease (the streaming sink, covering
    merge + compaction under ONE generation) passes its token through:
    the merge verifies it but does not release — the owner does."""
    from filmdatawarehouse_spark.streaming.merge import (
        merge_upsert_batch_partitioned,
    )

    table = str(tmp_path / "pt")
    tok = lease.acquire(spark, table, owner="stream")
    b0 = spark.createDataFrame([(1, "a", "d1")], "k int, v string, day string")
    merge_upsert_batch_partitioned(
        b0, table, keys=["k"], partition_col="day", fence_token=tok
    )
    lease.verify(spark, table, tok)  # still held after the merge
    lease.release(spark, table, tok)
    # and a FOREIGN token refuses before the overwrite
    tok2 = lease.acquire(spark, table, owner="stream2")
    with pytest.raises(WriterFencedError):
        merge_upsert_batch_partitioned(
            b0, table, keys=["k"], partition_col="day",
            fence_token="not-the-token",
        )
    lease.release(spark, table, tok2)


# --------------------------- r14 self-review fixes (regression tests)


def test_torn_lease_ages_out_not_permanent_lockout(spark, tmp_path):
    """A writer that died between creating the lease file and writing
    its body leaves a zero-byte lease. It must age out via the TTL like
    any other crash — the old empty-token branch skipped the TTL path
    and locked the table out forever."""
    root = str(tmp_path / "t")
    fs.mkdirs(spark, root)
    fs.create_text_exclusive(spark, f"{root}/{lease.LEASE}", "")
    # young torn lease: refused, naming the unreadable holder
    with pytest.raises(WriterFencedError, match="torn/unreadable"):
        lease.acquire(spark, root, owner="a", ttl_s=60.0)
    # expired torn lease: taken over
    time.sleep(0.05)
    tok = lease.acquire(spark, root, owner="a", ttl_s=0.01)
    lease.verify(spark, root, tok)


def test_whitespace_lease_is_malformed_not_a_crash(spark, tmp_path):
    """Whitespace-only lease content (a torn mid-copy observation) must
    parse as held-by-unknown, not raise IndexError out of verify."""
    assert lease._parse("  \t ") == ("", "")
    root = str(tmp_path / "t")
    tok = lease.acquire(spark, root, owner="a")
    fs.write_text_atomic(spark, f"{root}/{lease.LEASE}", "   ")
    with pytest.raises(WriterFencedError):
        lease.verify(spark, root, tok)


def test_heartbeat_keeps_live_writer_takeover_proof(spark, tmp_path):
    """The TTL clock runs from the lease mtime; the heartbeat refreshes
    it, so a LIVE writer holding the lease longer than the TTL is never
    takeover-eligible — stop the heartbeat and it ages out normally."""
    root = str(tmp_path / "t")
    tok = lease.acquire(spark, root, owner="a", ttl_s=0.8)
    stop = lease.start_heartbeat(spark, root, tok, interval_s=0.2)
    try:
        time.sleep(1.6)  # two TTLs elapse while the heartbeat runs
        with pytest.raises(WriterFencedError):
            lease.acquire(spark, root, owner="b", ttl_s=0.8)
        lease.verify(spark, root, tok)  # still ours
    finally:
        stop()
    time.sleep(1.0)  # no heartbeat: now it expires
    tok_b = lease.acquire(spark, root, owner="b", ttl_s=0.8)
    lease.verify(spark, root, tok_b)
    with pytest.raises(WriterFencedError):
        lease.verify(spark, root, tok)


def test_heartbeat_stops_after_takeover_without_clobbering(spark, tmp_path):
    """A heartbeat that observes a foreign token must stop refreshing —
    never write its own token back over the new holder's."""
    root = str(tmp_path / "t")
    tok = lease.acquire(spark, root, owner="a")
    stop = lease.start_heartbeat(spark, root, tok, interval_s=0.1)
    try:
        lease.break_lease(spark, root)
        tok_b = lease.acquire(spark, root, owner="b")
        time.sleep(0.5)  # several beat intervals
        lease.verify(spark, root, tok_b)  # b still holds
        with pytest.raises(WriterFencedError):
            lease.verify(spark, root, tok)
    finally:
        stop()


def test_merge_retains_the_true_previous_under_a_raced_commit(
    spark, tmp_path, monkeypatch
):
    """`prev` must be (re)read AFTER the lease is acquired: a commit
    landing between the unfenced probe and the acquire would otherwise
    make this writer prune the REAL previous snapshot (keep-two breach)
    and record a stale retained pointer."""
    import filmdatawarehouse_spark.streaming.merge as merge_mod

    table = str(tmp_path / "t")
    merge_mod.merge_upsert_batch(
        _batch(spark, [(1, "x0")]), 0, table, keys=["k"], run_id="X"
    )

    real_acquire = merge_mod.lease.acquire
    state = {"armed": True}

    def racing_acquire(spark_, root, owner, ttl_s=lease.DEFAULT_TTL_S):
        # writer B commits BETWEEN A's unfenced pointer probe and A's
        # acquire (B's own merge re-enters here with armed already off)
        if state["armed"] and owner == "A":
            state["armed"] = False
            merge_mod.merge_upsert_batch(
                _batch(spark_, [(2, "b0")]), 0, table, keys=["k"],
                run_id="B",
            )
        return real_acquire(spark_, root, owner, ttl_s)

    monkeypatch.setattr(merge_mod.lease, "acquire", racing_acquire)
    merge_mod.merge_upsert_batch(
        _batch(spark, [(3, "a1")]), 1, table, keys=["k"], run_id="A"
    )
    monkeypatch.undo()
    # A's pointer must retain B's snapshot (the true previous), and B's
    # snapshot dir must survive the prune (keep-two for live readers)
    from filmdatawarehouse_spark.streaming.merge import _read_pointer

    cur, retained = _read_pointer(spark, table)
    assert cur == "v-A-1"
    assert retained == "v-B-0"
    assert fs.is_dir(spark, f"{table}/v-B-0")
    rows = {
        (r.k, r.v)
        for r in merge_mod.read_merge_table(spark, table).collect()
    }
    assert rows == {(1, "x0"), (2, "b0"), (3, "a1")}


def test_failed_validation_does_not_leak_a_lease(spark, tmp_path):
    """Argument validation precedes acquire, and a mid-body failure
    releases: a corrected retry (or any other writer) must not be
    fenced out for the TTL by the failed call's leftover lease."""
    from filmdatawarehouse_spark.streaming.merge import (
        merge_upsert_batch,
        merge_upsert_batch_partitioned,
    )

    table = str(tmp_path / "pt")
    b = spark.createDataFrame([(1, "a", "d1")], "k int, v string, day string")
    with pytest.raises(ValueError, match="must not be merge keys"):
        merge_upsert_batch_partitioned(b, table, keys=["k", "day"],
                                       partition_col="day")
    tok = lease.acquire(spark, table, owner="next")  # no leftover lease
    lease.release(spark, table, tok)

    # mid-body failure in the snapshot sink (drift refusal) releases too
    table2 = str(tmp_path / "t2")
    merge_upsert_batch(_batch(spark, [(1, "a")]), 0, table2, keys=["k"],
                       run_id="A")
    drifted = spark.createDataFrame([(2, 9)], "k int, w int")  # drops v
    with pytest.raises(ValueError, match="missing snapshot column"):
        merge_upsert_batch(drifted, 1, table2, keys=["k"], run_id="A")
    tok = lease.acquire(spark, table2, owner="next")
    lease.release(spark, table2, tok)


def test_ingest_committed_replay_noops_under_foreign_lease(spark, pq_index):
    """The committed-replay fast path is read-only and UNFENCED (the
    MERGE sink's contract): a replay of an already-applied batch must
    no-op even while a rebuild holds the index lease — not fail."""
    from filmdatawarehouse_spark.operators.ivfpq import ivfpq_version_dir
    from filmdatawarehouse_spark.streaming.vector_ingest import (
        _applied,
        ivfpq_ingest_batch,
    )

    ivfpq_ingest_batch(
        _tiny_emb(spark, n=2, offset=200), 3, pq_index, run_id="rf"
    )
    vdir = ivfpq_version_dir(spark, pq_index)
    assert _applied(spark, vdir)["rf"] == 3
    tok = lease.acquire(spark, pq_index, owner="rebuild-in-flight")
    try:
        # committed replay: no-op, no WriterFencedError
        ivfpq_ingest_batch(
            _tiny_emb(spark, n=2, offset=200), 3, pq_index, run_id="rf"
        )
        # NEW batch still refuses while the lease is held
        with pytest.raises(WriterFencedError):
            ivfpq_ingest_batch(
                _tiny_emb(spark, n=2, offset=300), 4, pq_index, run_id="rf"
            )
    finally:
        lease.release(spark, pq_index, tok)


def test_failed_build_releases_its_lease(spark, tmp_path):
    """A build that fails mid-way must not fence its own retry out for
    the TTL (build owners are fresh per call — they cannot re-enter)."""
    from filmdatawarehouse_spark.operators.ivfpq import ivfpq_index_build

    idx = str(tmp_path / "idx")
    too_few = _tiny_emb(spark, n=2)  # n_codes=4 > 2 vectors: pq_train raises
    with pytest.raises(Exception, match="n_codes"):
        ivfpq_index_build(too_few, idx, n_lists=2, m=2, n_codes=4, n_iters=1)
    tok = lease.acquire(spark, idx, owner="retry")  # no leftover lease
    lease.release(spark, idx, tok)


# ------------------------------------------------- generation claims (r15)
# VERDICT r14 item 3: exclusive-create of _GEN/g-<n> is a CAS-emulating
# commit step — a superseded writer is REFUSED before the pointer flip,
# closing the break_lease-override interleave the lease verify alone
# could only surface afterwards. Plus the full GC-pause arc (item 6) and
# the ADVICE r14 heartbeat/atomic-write hardening.


def test_claim_roundtrip_and_snapshot_record(spark, tmp_path):
    root = str(tmp_path / "t")
    lease.claim_generation(spark, root, 1, "tok1", "v-a-0", owner="a")
    lease.verify_claim(spark, root, 1, "tok1")
    assert lease.claimed_generations(spark, root) == [1]
    assert lease.claim_snapshot(spark, root, 1) == "v-a-0"


def test_claim_refuses_superseded_generation(spark, tmp_path):
    """A writer whose target generation another commit has advanced
    past must refuse at the claim — BEFORE any flip."""
    root = str(tmp_path / "t")
    lease.claim_generation(spark, root, 1, "t1", "v-a-0", owner="a")
    lease.claim_generation(spark, root, 2, "t2", "v-a-1", owner="a",
                           committed_gen=1)
    # below the max claim: unconditionally superseded
    with pytest.raises(WriterFencedError, match="superseded"):
        lease.claim_generation(spark, root, 1, "tB", "v-b-0", owner="b",
                               committed_gen=2)
    # at the max claim but the pointer already advanced to it
    with pytest.raises(WriterFencedError, match="superseded"):
        lease.claim_generation(spark, root, 2, "tB", "v-b-0", owner="b",
                               committed_gen=2)
    # a LIVE foreign claim one ahead of the pointer: mid-flip, refused
    with pytest.raises(WriterFencedError, match="already claimed"):
        lease.claim_generation(spark, root, 2, "tB", "v-b-0", owner="b",
                               committed_gen=1)


def test_claim_same_owner_crash_replay_reenters(spark, tmp_path):
    """A writer that crashed between claim and flip replays with a
    rotated token (re-acquire rotates it); its own claim must re-enter
    immediately — and the abandoned token must no longer pass."""
    root = str(tmp_path / "t")
    lease.claim_generation(spark, root, 1, "old", "v-a-0", owner="a")
    lease.claim_generation(spark, root, 1, "new", "v-a-0", owner="a")
    lease.verify_claim(spark, root, 1, "new")
    with pytest.raises(WriterFencedError, match="claim"):
        lease.verify_claim(spark, root, 1, "old")


def test_claim_orphan_taken_over_after_ttl(spark, tmp_path):
    """A DIFFERENT writer may take over a claim only when the claimer
    died between claim and flip: claim older than the TTL while the
    pointer never advanced. The takeover rotates the token, so the
    original — if merely paused — refuses at verify_claim."""
    root = str(tmp_path / "t")
    lease.claim_generation(spark, root, 1, "tA", "v-a-0", owner="a")
    with pytest.raises(WriterFencedError, match="already claimed"):
        lease.claim_generation(spark, root, 1, "tB", "v-b-0", owner="b",
                               committed_gen=0, ttl_s=60.0)
    time.sleep(0.05)
    lease.claim_generation(spark, root, 1, "tB", "v-b-0", owner="b",
                           committed_gen=0, ttl_s=0.01)
    lease.verify_claim(spark, root, 1, "tB")
    with pytest.raises(WriterFencedError, match="claim"):
        lease.verify_claim(spark, root, 1, "tA")


def test_claims_prune_keep_two_and_never_reopen(spark, tmp_path):
    root = str(tmp_path / "t")
    for g in (1, 2, 3):
        lease.claim_generation(spark, root, g, f"t{g}", f"v-a-{g}",
                               owner="a", committed_gen=g - 1)
    lease.prune_claims(spark, root, 3)
    assert lease.claimed_generations(spark, root) == [2, 3]
    # a pruned generation stays closed: refused against the survivors
    with pytest.raises(WriterFencedError, match="superseded"):
        lease.claim_generation(spark, root, 1, "tX", "v-x-0", owner="x",
                               committed_gen=3)


def test_merge_commits_stamp_generation_and_prune_claims(spark, tmp_path):
    """End-to-end: sequential MERGE commits write g=<n> w=<token> into
    the pointer, keep claims at keep-two, and read back cleanly."""
    import filmdatawarehouse_spark.streaming.merge as merge_mod

    table = str(tmp_path / "t")
    for b in range(3):
        merge_mod.merge_upsert_batch(
            _batch(spark, [(b, f"v{b}")]), b, table, keys=["k"], run_id="A"
        )
    cur, prev, gen, tok = merge_mod._read_pointer_full(spark, table)
    assert (cur, prev, gen) == ("v-A-2", "v-A-1", 3)
    assert tok  # the flipping writer's fence token is recorded
    assert lease.claimed_generations(spark, table) == [2, 3]
    assert lease.claim_snapshot(spark, table, 3) == "v-A-2"
    rows = {
        (r.k, r.v)
        for r in merge_mod.read_merge_table(spark, table).collect()
    }
    assert rows == {(0, "v0"), (1, "v1"), (2, "v2")}


def test_merge_reads_legacy_pointer_without_generation(spark, tmp_path):
    """Pre-r15 pointers (no g= line) read as generation 0 and upgrade
    on the next commit — no regression false-positive, no reformat."""
    import filmdatawarehouse_spark.streaming.merge as merge_mod

    table = str(tmp_path / "t")
    merge_mod.merge_upsert_batch(
        _batch(spark, [(1, "a")]), 0, table, keys=["k"], run_id="A"
    )
    # rewrite the pointer in the legacy one-line format, drop claims
    fs.write_text_atomic(spark, f"{table}/_LATEST", "v-A-0")
    for g in lease.claimed_generations(spark, table):
        fs.delete(spark, f"{table}/{lease.GEN_DIR}/g-{g:020d}", False)
    cur, prev, gen, tok = merge_mod._read_pointer_full(spark, table)
    assert (cur, prev, gen, tok) == ("v-A-0", None, 0, "")
    merge_mod.merge_upsert_batch(
        _batch(spark, [(2, "b")]), 1, table, keys=["k"], run_id="A"
    )
    cur, prev, gen, _ = merge_mod._read_pointer_full(spark, table)
    assert (cur, prev, gen) == ("v-A-1", "v-A-0", 1)


def test_gc_pause_arc_pause_takeover_resume_refuse(spark, tmp_path,
                                                   monkeypatch):
    """The full GC-pause story in ONE arc (VERDICT r14 item 6): writer
    A's heartbeat is suspended past the TTL mid-batch; writer B takes
    over through the normal acquire path (no operator break) and
    commits; A resumes and must refuse at its commit-time verify — and
    the table holds exactly B's commit."""
    import filmdatawarehouse_spark.streaming.merge as merge_mod

    table = str(tmp_path / "t")
    merge_mod.merge_upsert_batch(
        _batch(spark, [(1, "seed")]), 0, table, keys=["k"], run_id="seed"
    )

    # suspend A's heartbeat: the thread never starts (a >TTL GC pause
    # stops beats exactly as thoroughly), so A's lease ages out mid-batch
    real_hb = lease.start_heartbeat

    def suspended_heartbeat(spark_, root_, token_, interval_s_):
        return lambda: None

    monkeypatch.setattr(lease, "start_heartbeat", suspended_heartbeat)

    real_read = merge_mod.read_merge_table
    state = {"armed": True}

    def pause_then_b_commits(spark_, path):
        # A is "paused" here, past its TTL; B enters via plain acquire
        if state["armed"] and path == table:
            state["armed"] = False
            time.sleep(0.6)  # A's ttl_s below is 0.3: fully expired
            monkeypatch.setattr(lease, "start_heartbeat", real_hb)
            merge_mod.merge_upsert_batch(
                _batch(spark_, [(2, "B")]), 0, table, keys=["k"],
                run_id="B", lease_ttl_s=0.3,
            )
            monkeypatch.setattr(lease, "start_heartbeat",
                                suspended_heartbeat)
        return real_read(spark_, path)

    monkeypatch.setattr(merge_mod, "read_merge_table", pause_then_b_commits)
    with pytest.raises(WriterFencedError):
        merge_mod.merge_upsert_batch(
            _batch(spark, [(3, "A")]), 1, table, keys=["k"], run_id="A",
            lease_ttl_s=0.3,
        )
    monkeypatch.setattr(merge_mod, "read_merge_table", real_read)
    assert merge_mod.current_snapshot(spark, table) == "v-B-0"
    rows = {
        (r.k, r.v)
        for r in merge_mod.read_merge_table(spark, table).collect()
    }
    assert rows == {(1, "seed"), (2, "B")}
    _, _, gen, _ = merge_mod._read_pointer_full(spark, table)
    assert gen == 2  # seed=1, B=2; A's generation never landed


def test_pointer_regression_detected_at_next_acquire(spark, tmp_path):
    """The pure-CAS residual's signature — a superseded writer's late
    flip won the pointer — must refuse LOUDLY at the next writer's
    acquire, in both detectable shapes."""
    import filmdatawarehouse_spark.streaming.merge as merge_mod
    from filmdatawarehouse_spark.io.lease import PointerRegressionError

    table = str(tmp_path / "t")
    for b in range(2):
        merge_mod.merge_upsert_batch(
            _batch(spark, [(b, "x")]), b, table, keys=["k"], run_id="A"
        )
    # shape 1: same-generation late flip — the pointer's recorded token
    # is not the surviving claim's (the claim takeover rotated it)
    _, _, gen, _ = merge_mod._read_pointer_full(spark, table)
    fs.write_text_atomic(
        spark, f"{table}/_LATEST",
        f"v-L-9\nv-A-0\ng={gen} w=loser-token",
    )
    with pytest.raises(PointerRegressionError, match="taken over"):
        merge_mod.merge_upsert_batch(
            _batch(spark, [(9, "y")]), 9, table, keys=["k"], run_id="C"
        )
    # shape 2: an OLD generation's late flip after newer commits
    fs.write_text_atomic(
        spark, f"{table}/_LATEST", "v-L-9\nv-A-0\ng=0 w=loser-token"
    )
    with pytest.raises(PointerRegressionError, match="regressed"):
        merge_mod.merge_upsert_batch(
            _batch(spark, [(9, "y")]), 9, table, keys=["k"], run_id="C"
        )


def test_index_commit_stamps_generation(spark, tmp_path):
    """The shared index committer (IVF flat + IVF-PQ) claims and stamps
    generations exactly like the MERGE sink."""
    from filmdatawarehouse_spark.operators.ivfpq import ivfpq_index_build
    from filmdatawarehouse_spark.operators.similarity import (
        _ivf_pointer_full,
    )

    idx = str(tmp_path / "idx")
    ivfpq_index_build(_tiny_emb(spark), idx, n_lists=2, m=2, n_codes=4,
                      n_iters=1)
    cur, prev, gen, tok = _ivf_pointer_full(spark, idx)
    assert gen == 1 and prev is None and cur.startswith("v-") and tok
    assert lease.claimed_generations(spark, idx) == [1]
    ivfpq_index_build(_tiny_emb(spark), idx, n_lists=2, m=2, n_codes=4,
                      n_iters=1)
    cur2, prev2, gen2, _ = _ivf_pointer_full(spark, idx)
    assert gen2 == 2 and prev2 == cur
    assert lease.claimed_generations(spark, idx) == [1, 2]


def test_heartbeat_refresh_never_rewrites_content(spark, tmp_path):
    """ADVICE r14: the heartbeat's refresh is a content-free mtime bump
    (fs.set_mtime_now) — a takeover's token can never be clobbered by a
    refresh, because the refresh writes no bytes."""
    root = str(tmp_path / "t")
    tok = lease.acquire(spark, root, owner="a")
    path = f"{root}/{lease.LEASE}"
    before_text = fs.read_text(spark, path)
    before_mt = fs.mtime_ms(spark, path)
    time.sleep(1.1)  # local-FS mtime granularity can be a full second
    assert fs.set_mtime_now(spark, path) is True
    assert fs.read_text(spark, path) == before_text
    assert fs.mtime_ms(spark, path) > before_mt
    lease.release(spark, root, tok)


def test_atomic_write_uses_unique_temp_names(spark, tmp_path):
    """ADVICE r14: concurrent rewrites of ONE path must never share a
    staging file — hammer a single path from threads and require the
    final content to be exactly one writer's COMPLETE body, with no
    temp leftovers. A raced rename is allowed to raise loudly (two
    simultaneous lease takeovers surface as an error, the safe mode);
    what the unique temp name forbids is the silent failure where one
    writer renames BYTES ANOTHER WRITER STAGED."""
    import threading

    target = str(tmp_path / "p")
    bodies = [f"writer-{i} content-{i}" for i in range(8)]

    def w(body: str) -> None:
        for _ in range(5):
            try:
                fs.write_text_atomic(spark, target, body)
            except Exception:  # noqa: BLE001 — raced rename: loud, allowed
                pass

    threads = [threading.Thread(target=w, args=(b,)) for b in bodies]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    # final read retried: Hadoop's LOCAL FS (ChecksumFs) renames the
    # data and its sidecar .crc non-atomically, so under this hammer a
    # read can transiently throw ChecksumException, and two same-
    # instant racers can even leave the path ABSENT (delete+place
    # window) — both local-test-FS artifacts, both benign for a lease
    # (absent reads as released; the next acquire re-creates). The
    # load-bearing claims: NEVER a mixed/cross-writer body, never a
    # leaked staging file.
    text = None
    for _ in range(5):
        try:
            text = fs.read_text(spark, target)
            break
        except Exception:  # noqa: BLE001 — stale local crc sidecar
            time.sleep(0.1)
    assert text is None or text in bodies
    leftovers = [
        p.name for p in tmp_path.iterdir() if p.name.startswith("p.tmp-")
    ]
    assert leftovers == []


def test_mtime_ms_absent_is_none_not_raise(spark, tmp_path):
    """ADVICE r14: a lease released between exists() and the stat must
    read as absent (None) — the acquire retry branch — not escape as a
    raw py4j not-found error. (The race itself is untestable
    deterministically; the contract for an absent path is.)"""
    assert fs.mtime_ms(spark, str(tmp_path / "never")) is None


# ----------------------------------------------- r15 review hardening
# Four defects the round's self-review found in the claim protocol's
# retention/liveness edges, each pinned here.


def test_stale_prune_never_unpins_newer_claims_snapshots(spark, tmp_path):
    """The late-flipper data-loss closure (r15 review), at the level
    where it lives: a superseded writer runs its prune with a STALE
    generation. ``prune_claims(stale)`` must remove only claims OLDER
    than its own neighborhood — the true winner's NEWER claims (and so
    their snapshots, via the keep-set union with
    ``claimed_snapshots``) survive, keeping the detected regression
    repairable. And the keep-set helper must report every surviving
    claim's snapshot, not any single generation's."""
    root = str(tmp_path / "t")
    lease.claim_generation(spark, root, 2, "t2", "v-a-2", owner="a",
                           committed_gen=1)
    lease.claim_generation(spark, root, 3, "t3", "v-a-3", owner="a",
                           committed_gen=2)
    # the winner's newer commit, claimed after taking over the loser
    lease.claim_generation(spark, root, 4, "tW", "v-W-9", owner="w",
                           committed_gen=3)
    # the superseded loser prunes with its stale generation (3)
    lease.prune_claims(spark, root, 3)
    assert lease.claimed_generations(spark, root) == [2, 3, 4]
    assert lease.claimed_snapshots(spark, root) == {
        "v-a-2", "v-a-3", "v-W-9",
    }  # the loser's keep-set union retains the winner's v-W-9
    # and a CURRENT pruner advances normally: keep-two of claims
    lease.prune_claims(spark, root, 4)
    assert lease.claimed_generations(spark, root) == [3, 4]
    assert "v-W-9" in lease.claimed_snapshots(spark, root)


def test_set_mtime_now_tristate_gone_is_none(spark, tmp_path):
    """File deleted under the refresh must read as None (caller STOPS),
    never as the False that triggers the content-rewrite fallback — a
    rewrite there resurrects a broken lease forever."""
    missing = str(tmp_path / "never")
    assert fs.set_mtime_now(spark, missing) is None
    present = str(tmp_path / "p")
    fs.write_text_atomic(spark, present, "x")
    assert fs.set_mtime_now(spark, present) is True


def test_failed_flip_releases_claim_for_fresh_owner_retry(
    spark, tmp_path, monkeypatch
):
    """Index builds use fresh-per-call owners: a commit that claimed its
    generation and then failed at the flip must release the claim, or
    the retry is fenced out for the full TTL."""
    from filmdatawarehouse_spark.io import fs as fs_mod
    from filmdatawarehouse_spark.operators.ivfpq import ivfpq_index_build

    idx = str(tmp_path / "idx")
    real_write = fs_mod.write_text_atomic
    state = {"fail_next_pointer_write": True}

    def flaky(spark_, path, text):
        if state["fail_next_pointer_write"] and path.endswith("/INDEX"):
            state["fail_next_pointer_write"] = False
            raise OSError("injected transient flip failure")
        return real_write(spark_, path, text)

    monkeypatch.setattr(fs_mod, "write_text_atomic", flaky)
    with pytest.raises(OSError, match="injected"):
        ivfpq_index_build(_tiny_emb(spark), idx, n_lists=2, m=2, n_codes=4,
                          n_iters=1)
    assert lease.claimed_generations(spark, idx) == []  # claim released
    # immediate retry (fresh owner + fresh token): no TTL wait
    ivfpq_index_build(_tiny_emb(spark), idx, n_lists=2, m=2, n_codes=4,
                      n_iters=1)
    assert lease.claimed_generations(spark, idx) == [1]


def test_reclaim_of_pruned_generation_is_refused_and_released(
    spark, tmp_path
):
    """Check-then-act closure: a writer that paused across a claim
    prune and exclusively re-created a pruned generation number must be
    refused by the post-create re-list — and its stale claim removed,
    not left to brick the generation."""
    root = str(tmp_path / "t")
    # survivors say the table is at generation 3
    lease.claim_generation(spark, root, 3, "t3", "v-a-3", owner="a")
    # the paused writer re-creates pruned g-1 (pre-check bypassed by
    # writing the file directly, as its create-exclusive would have)
    fs.write_text_atomic(
        spark, f"{root}/{lease.GEN_DIR}/g-{1:020d}", "tX v-x-1 x"
    )
    with pytest.raises(WriterFencedError, match="re-claimed|stale"):
        lease._recheck_claim_is_max(spark, root, 1, "tX")
    assert lease.claimed_generations(spark, root) == [3]  # g-1 released


# ----------------------------------------------- r16 ADVICE hardening


class _FakeJClass:
    def __init__(self, name):
        self._name = name

    def getName(self):
        return self._name


class _FakeJThrowable:
    """Minimal py4j-shaped Java throwable: getClass().getName() + a
    cause chain, like the objects `_is_not_found` walks."""

    def __init__(self, class_name, message="", cause=None):
        self._cls = _FakeJClass(class_name)
        self._msg = message
        self._cause = cause

    def getClass(self):
        return self._cls

    def getCause(self):
        return self._cause

    def __str__(self):
        return f"{self._cls.getName()}: {self._msg}"


class _FakePy4JError(Exception):
    def __init__(self, jthrowable):
        super().__init__(str(jthrowable))
        self.java_exception = jthrowable


def test_not_found_classified_by_java_class_not_message(spark):
    """ADVICE r15: classification must use the Java exception CLASS
    along the cause chain, so a store surfacing deletion as an
    untranslated NoSuchKey/404 (no 'FileNotFound' anywhere in the
    message) still reads as gone — the branch that stops the heartbeat
    instead of resurrecting a deleted lease via the rewrite fallback."""
    # classic translated case: Hadoop FileNotFoundException
    assert fs._is_not_found(_FakePy4JError(_FakeJThrowable(
        "java.io.FileNotFoundException", "File does not exist: /x")))
    # untranslated S3-style NoSuchKey class, generic message
    assert fs._is_not_found(_FakePy4JError(_FakeJThrowable(
        "com.amazonaws.services.s3.model.NoSuchKeyException",
        "The specified key does not exist")))
    # NoSuchKey buried as the CAUSE under a generic IOException wrapper
    assert fs._is_not_found(_FakePy4JError(_FakeJThrowable(
        "java.io.IOException", "request failed",
        cause=_FakeJThrowable("software.amazon.awssdk.services.s3.model.NoSuchKeyException"))))
    # 404 preserved only in the wrapper's message text
    assert fs._is_not_found(_FakePy4JError(_FakeJThrowable(
        "java.io.IOException", "GET /b/k: 404 Not Found")))
    # a genuinely different failure must NOT classify as gone
    assert not fs._is_not_found(_FakePy4JError(_FakeJThrowable(
        "java.io.IOException", "connection reset by peer")))
    assert not fs._is_not_found(_FakePy4JError(_FakeJThrowable(
        "org.apache.hadoop.security.AccessControlException", "denied")))
    # plain Python exceptions still classify by name/message
    assert fs._is_not_found(FileNotFoundError("gone"))
    assert not fs._is_not_found(OSError("disk full"))


def test_merge_failed_flip_releases_claim_for_replacement_writer(
    spark, tmp_path, monkeypatch
):
    """ADVICE r15: a transient pointer-flip failure AFTER
    claim_generation must release the claim — otherwise a REPLACEMENT
    writer (new run_id / new lease owner) is fenced out for the full
    claim TTL, not just the same-identity retry that can re-enter."""
    from filmdatawarehouse_spark.io import fs as fs_mod
    from filmdatawarehouse_spark.streaming.merge import (
        _read_pointer,
        merge_upsert_batch,
    )

    table = str(tmp_path / "t")
    merge_upsert_batch(_batch(spark, [(1, "a")]), 0, table, ["k"],
                       run_id="r1")

    real_write = fs_mod.write_text_atomic
    state = {"arm": True}

    def flaky(spark_, path, text):
        if state["arm"] and path.endswith("/_LATEST"):
            state["arm"] = False
            raise OSError("injected transient flip failure")
        return real_write(spark_, path, text)

    monkeypatch.setattr(fs_mod, "write_text_atomic", flaky)
    with pytest.raises(OSError, match="injected"):
        merge_upsert_batch(_batch(spark, [(2, "b")]), 1, table, ["k"],
                           run_id="r1")
    # the failed flip's claim (g=2) is gone; only the committed g=1 claim
    assert lease.claimed_generations(spark, table) == [1]
    # a REPLACEMENT writer under a brand-new identity commits at once —
    # no TTL wait behind the dead writer's leftover claim
    merge_upsert_batch(_batch(spark, [(2, "b")]), 0, table, ["k"],
                       run_id="r2")
    cur, _ = _read_pointer(spark, table)
    assert cur == "v-r2-0"
    assert lease.claimed_generations(spark, table)[-1] == 2
