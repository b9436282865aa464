"""Writer fencing for the pointer-commit protocols (r14, VERDICT r13
item 1).

``read_text_retry`` (r13) shields pointer READERS from the non-atomic-
rename flip window; nothing stopped two WRITERS. Two concurrent
``write_stream_merge_upsert`` streams (or two vector-ingest jobs, or an
append racing a rebuild) targeting one table would interleave pointer
flips and ledger writes silently — the reference's MySQL store
serializes writers for free (``dags/rentalFilmDAG.py:18-20``, InnoDB
row locks); a file-backed snapshot store has to fence them explicitly.

The fence is a LEASE FILE (``_WRITER_LEASE`` at the table/index root)
carrying a FENCING TOKEN, with three rules:

1. **Acquire before touching state.** A writer acquires the lease
   before its first read of the table it will rewrite (base snapshot,
   ingest ledger). If another writer holds an unexpired lease, acquire
   raises ``WriterFencedError`` — the second writer refuses LOUDLY at
   the door, never interleaves.
2. **Verify at commit time.** Immediately before the irreversible step
   (pointer flip, ledger write, parquet append) the writer re-reads the
   lease and requires its own token. A lease stolen in between —
   TTL expiry plus takeover, or an operator ``break_lease`` — fails the
   verify, so at most one writer's commit lands per lease generation.
   The token, not the TTL clock, is the correctness mechanism: even if
   acquisition itself raced on a store without atomic create-if-absent
   (``fs.create_text_exclusive``'s object-store caveat), the lease file
   holds ONE winner's token and every loser refuses at verify.
3. **Expiry is takeover, not timeout.** A crashed writer leaves its
   lease behind. The SAME logical writer (owner identity = the caller's
   ``run_id``) may re-acquire immediately — a foreachBatch replay after
   a crash must not wait out a TTL. A DIFFERENT writer may take over
   only once the lease file's mtime is older than ``ttl_s``; the
   takeover rewrites the token, so a paused-not-dead original that
   wakes up refuses at its next verify (the classic GC-pause fencing
   story).

Residual windows, stated honestly:

- the commit step itself (a pointer flip, a ledger write — or, for the
  append/overwrite writers, an entire Spark write JOB) is not atomic
  with the verify that precedes it. For a LIVE writer this window is
  closed by the heartbeat (``start_heartbeat``: the sinks refresh the
  lease mtime at ttl/3 for as long as they hold it, so a live writer
  is never takeover-ELIGIBLE no matter how long its job runs); what
  remains is the operator-override case — a ``break_lease`` plus new
  acquire landing inside a verify→commit gap can interleave one
  commit. Pointer flips are atomic renames over immutable snapshot
  dirs, so that worst case is "the superseded writer's flip wins the
  pointer", never a torn table, and the loser's next verify (or
  release) surfaces it. Shrinking it to zero needs a store with
  compare-and-swap (a transactional table format).
- the TTL clock is the driver's wall clock; cross-driver skew makes
  expiry approximate. That only affects LIVENESS (how soon a crashed
  writer's lease can be taken over) — correctness rides on the token.

Everything is O(1) driver-side py4j per acquire/verify/release — noise
next to the snapshot write it brackets (same budget argument as
``io.fs``).
"""

from __future__ import annotations

import time
import uuid

from pyspark.sql import SparkSession

from filmdatawarehouse_spark.io import fs

LEASE = "_WRITER_LEASE"
DEFAULT_TTL_S = 120.0


class WriterFencedError(RuntimeError):
    """Another writer holds (or took over) the lease — this writer must
    stop. Deliberately a hard error: the whole point of the fence is
    that the second writer refuses loudly instead of interleaving."""


def _lease_path(root: str) -> str:
    return f"{root.rstrip('/')}/{LEASE}"


def _parse(text: str | None) -> tuple[str, str]:
    """(token, owner) from the lease body; empty strings when absent or
    malformed — including whitespace-only content, a possible torn/
    mid-copy observation (a malformed lease is treated as
    held-by-unknown: it can be taken over on expiry, never silently
    matched)."""
    if not text:
        return "", ""
    parts = text.split(None, 1)
    if not parts:
        return "", ""
    return parts[0], (parts[1].strip() if len(parts) > 1 else "")


def acquire(
    spark: SparkSession,
    root: str,
    owner: str,
    ttl_s: float = DEFAULT_TTL_S,
) -> str:
    """Acquire the writer lease under ``root`` for ``owner``; returns
    the fencing token to pass to ``verify``/``release``. Raises
    ``WriterFencedError`` while a DIFFERENT owner's lease is younger
    than ``ttl_s``. The same owner re-acquires immediately (crash
    replay; the old token is invalidated), and an expired foreign lease
    is taken over (the crashed-writer path — the takeover rewrites the
    token so the original, if merely paused, refuses at verify).

    ``owner`` is the logical writer identity — the streaming sinks pass
    their ``run_id``. Two writers sharing an owner string are declaring
    themselves THE SAME writer and are not fenced from each other
    (exactly the contract run_id already carries for idempotence)."""
    if not owner or not owner.strip():
        raise ValueError("lease owner must be a non-empty identity")
    path = _lease_path(root)
    token = uuid.uuid4().hex
    body = f"{token} {owner}"
    fs.mkdirs(spark, root)
    for _ in range(2):  # one retry if the holder releases mid-probe
        if fs.create_text_exclusive(spark, path, body):
            return token
        text = fs.read_text(spark, path)
        if text is None:
            # released between the create and the read — loop to try
            # the exclusive create again
            continue
        held_token, held_owner = _parse(text)
        if held_token and held_owner == owner:
            fs.write_text_atomic(spark, path, body)
            return token
        mt = fs.mtime_ms(spark, path)
        if mt is None:
            continue  # released between the read and the stat — retry
        age_s = (time.time() * 1000 - mt) / 1000
        if age_s > ttl_s:
            # expired lease — foreign OR torn/empty (a writer that died
            # between create and body-write leaves a zero-byte lease;
            # it must age out like any other crash, not lock the table
            # forever): take over. The fencing token rotates, so a
            # previous holder that was merely paused can no longer pass
            # verify.
            fs.write_text_atomic(spark, path, body)
            return token
        raise WriterFencedError(
            f"writer lease at {path} is held by "
            f"{held_owner or '<torn/unreadable lease>'!r} "
            f"(age {age_s:.1f}s <= ttl {ttl_s}s); a second concurrent "
            "writer on one table is refused — stop the other writer, "
            "wait out the ttl, or break_lease() after confirming it "
            "is dead"
        )
    raise WriterFencedError(
        f"writer lease at {path} could not be acquired: repeated "
        "create/read races (another writer is actively cycling it)"
    )


def verify(spark: SparkSession, root: str, token: str) -> None:
    """Require that ``token`` still holds the lease — called immediately
    before the commit step. Raises ``WriterFencedError`` when the lease
    was taken over (or broken): the commit must NOT proceed."""
    held_token, held_owner = _parse(
        fs.read_text_retry(spark, _lease_path(root))
    )
    if held_token != token:
        raise WriterFencedError(
            f"writer lease at {_lease_path(root)} no longer holds this "
            f"writer's token (now {held_owner!r}): the lease was taken "
            "over after expiry or broken by an operator — this writer "
            "must not commit"
        )


def release(spark: SparkSession, root: str, token: str) -> None:
    """Release the lease after a successful commit. An already-absent
    lease is a no-op (broken after our verified commit — nothing of
    ours to remove); a lease now holding a DIFFERENT token raises, the
    same loud refusal as verify (it means a takeover landed between our
    verify and this release — the interleave the fence exists to
    surface)."""
    path = _lease_path(root)
    held_token, held_owner = _parse(fs.read_text(spark, path))
    if not held_token:
        return
    if held_token != token:
        raise WriterFencedError(
            f"writer lease at {path} was taken over by {held_owner!r} "
            "between this writer's commit verify and its release — "
            "the committed state is intact (the flip is atomic) but "
            "two writers are active on one table; stop one"
        )
    fs.delete(spark, path, recursive=False)


def release_quiet(spark: SparkSession, root: str, token: str) -> None:
    """Best-effort release for FAILURE paths: never raises. The caller's
    original error must propagate — a takeover discovered here is the
    thief's protocol to surface, and a leaked lease would fence the
    caller's own corrected retry out for the full TTL (fresh-owner API
    calls cannot re-enter the way a run-identity stream can)."""
    try:
        release(spark, root, token)
    except Exception:  # noqa: BLE001 — failure-path cleanup only
        pass


def start_heartbeat(
    spark: SparkSession,
    root: str,
    token: str,
    interval_s: float,
) -> "callable":
    """Refresh the held lease's mtime every ``interval_s`` from a daemon
    thread; returns a ``stop()`` callable. This is what keeps a LIVE
    writer from becoming takeover-eligible mid-batch: the TTL clock
    runs from the lease file's mtime, and acquire alone stamps it once —
    a snapshot/append/overwrite job longer than the TTL would otherwise
    open the takeover window while the writer is still working (the
    both-writers-land failure the fence exists to prevent). The refresh
    is read-verify-rewrite with the held token: if the token no longer
    matches (takeover after a real stall, operator break), the thread
    stops silently and the writer's own next ``verify`` raises the loud
    refusal. A refresh racing a takeover by milliseconds resolves to
    one winner either way — whichever write lands last holds the file,
    and the other side's verify fails. Size ``interval_s`` well under
    the TTL (the sinks use ttl/3)."""
    import threading

    stop_ev = threading.Event()

    def beat() -> None:
        while not stop_ev.wait(interval_s):
            try:
                held_token, held_owner = _parse(
                    fs.read_text(spark, _lease_path(root))
                )
                if held_token != token:
                    return  # taken over / broken: the verify will refuse
                fs.write_text_atomic(
                    spark, _lease_path(root), f"{token} {held_owner}"
                )
            except Exception:  # noqa: BLE001 — refresh is best-effort;
                return  # verify remains the correctness gate

    t = threading.Thread(target=beat, daemon=True, name="fdw-lease-heartbeat")
    t.start()

    def stop() -> None:
        stop_ev.set()
        t.join(timeout=10)

    return stop


def break_lease(spark: SparkSession, root: str) -> bool:
    """Operator override: force-remove the lease (False when none was
    held). Only for a writer KNOWN dead before its TTL — a live holder
    will refuse at its next verify, which is the safe failure mode."""
    return fs.delete(spark, _lease_path(root), recursive=False)
