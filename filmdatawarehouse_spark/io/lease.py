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
  acquire landing inside a verify→commit gap. Since r15 the pointer
  protocols close THAT window too with GENERATION CLAIMS
  (``claim_generation``): each commit must exclusively create
  ``_GEN/g-<n>`` for its target generation before flipping, so a
  superseded writer — whose generation was computed from a stale
  pointer read — is REFUSED at the claim (or at ``verify_claim``,
  re-read immediately before the flip), not just surfaced afterwards.
  The residual is the pure-CAS case: a writer paused for >TTL exactly
  between its claim re-verify and the single rename that follows.
  Pointer flips are atomic renames over immutable snapshot dirs, so
  even that worst case is "the superseded writer's flip wins the
  pointer" (detectable: the pointer's recorded generation falls behind
  the max claim — ``detect_pointer_regression``, checked at the next
  acquire), never a torn table. Zero needs a store with native
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
    is read-verify, then a CONTENT-FREE mtime bump (``fs.set_mtime_now``,
    ADVICE r14): a refresh that writes no bytes can never reinstate a
    superseded token over a takeover's, no matter how the read and the
    takeover interleave (the old read-check-rewrite could lose that
    update and let both writers pass verify within one generation).
    Only on stores without ``setTimes`` does it fall back to a token
    rewrite, re-reading afterwards and stopping if the content is not
    its own token — there the read→rewrite gap remains a narrow
    lost-update window, folded into the documented expiry/break
    residual (the claim protocol still refuses the superseded COMMIT).
    If the token no longer matches at the pre-bump read (takeover after
    a real stall, operator break), the thread stops silently and the
    writer's own next ``verify`` raises the loud refusal. Size
    ``interval_s`` well under the TTL (the sinks use ttl/3)."""
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
                refreshed = fs.set_mtime_now(spark, _lease_path(root))
                if refreshed:
                    continue  # content untouched: no takeover clobbered
                if refreshed is None:
                    return  # lease DELETED under us (operator break):
                    # stop — a rewrite here would resurrect it and
                    # fence the new writer out forever (r15 review)
                # store without setTimes: rewrite, then re-read — stop
                # (without restoring) if a takeover landed around the
                # rewrite, so no further beat reinstates our token
                fs.write_text_atomic(
                    spark, _lease_path(root), f"{token} {held_owner}"
                )
                after_token, _ = _parse(
                    fs.read_text(spark, _lease_path(root))
                )
                if after_token != token:
                    return
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


# ---------------------------------------------------------------------------
# Generation claims (r15, VERDICT r14 item 3): poor-man's compare-and-swap
# for the pointer flip. Every pointer-commit protocol numbers its commits
# with a monotonically increasing GENERATION (recorded in the pointer body);
# before flipping, a writer must exclusively create ``_GEN/g-<n>`` for its
# target generation. A superseded writer — one whose generation was computed
# from a pointer read that another commit has since advanced — finds its
# number already claimed (or below the max claim) and REFUSES before the
# flip, closing the break_lease-override interleave the lease alone could
# only surface after the fact. Exclusive create is NameNode-serialized on
# HDFS and driver-side-fine on the local FS; on object stores without
# conditional PUT it inherits ``fs.create_text_exclusive``'s caveat, which
# is why ``verify_claim`` re-reads the claim immediately before the flip —
# the same token-not-clock discipline as the lease itself.
# ---------------------------------------------------------------------------

GEN_DIR = "_GEN"
_CLAIM_KEEP = 2  # current + previous, mirroring keep-two snapshot retention


class PointerRegressionError(WriterFencedError):
    """The pointer's recorded generation is BEHIND the max claim: a
    superseded writer's late flip won the pointer (the pure-CAS
    residual). The committed data of the true winner may have been
    pruned by the loser — this is an operator-repair situation, which
    is exactly why it refuses loudly at the next writer's acquire
    instead of silently merging onto the regressed snapshot."""


def format_pointer_meta(gen: int, token: str) -> str:
    """The pointer body's generation/writer-token metadata line. The
    claim protocol OWNS this wire format (r15 review: it was duplicated
    across both pointer families); parse with ``split_pointer_meta``."""
    return f"g={gen} w={token}"


def split_pointer_meta(lines: list[str]) -> tuple[list[str], int, str]:
    """``(snapshot_name_lines, generation, writer_token)`` from a
    pointer body's non-empty lines. Metadata lines start with ``g=``;
    anything else is a snapshot name (legacy pointers have no metadata
    and read as generation 0 with an empty token, which exempts them
    from regression checks until their first claim-format commit). A
    torn metadata line parses as legacy rather than raising — the same
    held-by-unknown posture as ``_parse``."""
    gen, tok = 0, ""
    names: list[str] = []
    for ln in lines:
        if ln.startswith("g="):
            for part in ln.split():
                if part.startswith("g="):
                    try:
                        gen = int(part[2:])
                    except ValueError:
                        pass  # torn metadata: stay at legacy 0
                elif part.startswith("w="):
                    tok = part[2:]
        else:
            names.append(ln)
    return names, gen, tok


def _gen_dir(root: str) -> str:
    return f"{root.rstrip('/')}/{GEN_DIR}"


def _claim_path(root: str, gen: int) -> str:
    return f"{_gen_dir(root)}/g-{gen:020d}"


def _claim_parse(text: str | None) -> tuple[str, str, str]:
    """(token, snapshot, owner) from a claim body; empty strings when
    absent/torn (same held-by-unknown posture as the lease parser)."""
    if not text:
        return "", "", ""
    parts = text.split(None, 2)
    parts += [""] * (3 - len(parts))
    return parts[0], parts[1], parts[2].strip()


def claimed_generations(spark: SparkSession, root: str) -> list[int]:
    """Sorted generation numbers currently claimed under ``root``
    (empty before the first r15-format commit)."""
    out = []
    for name in fs.list_child_files(spark, _gen_dir(root)):
        if name.startswith("g-"):
            try:
                out.append(int(name[2:]))
            except ValueError:
                pass  # foreign garbage in _GEN: never a claim
    return sorted(out)


def claim_snapshot(spark: SparkSession, root: str, gen: int) -> str:
    """The snapshot name recorded in generation ``gen``'s claim (empty
    when the claim is absent/torn) — lets an operator identify the true
    winner after a detected regression."""
    return _claim_parse(fs.read_text(spark, _claim_path(root, gen)))[1]


def claimed_snapshots(spark: SparkSession, root: str) -> set[str]:
    """Snapshot names recorded in EVERY surviving claim — the pruners'
    keep-set extension. It must be all surviving claims, not just the
    pruner's own (gen, gen-1) neighborhood: a superseded writer's late
    flip runs ITS prune with a STALE generation, and consulting only
    its own neighborhood would let it delete the true winner's NEWER
    committed snapshots — destroying the repair target
    ``detect_pointer_regression`` points at (r15 review). O(#surviving
    claims) reads — keep-two, so ≤ ~3."""
    out: set[str] = set()
    for g in claimed_generations(spark, root):
        snap = claim_snapshot(spark, root, g)
        if snap:
            out.add(snap)
    return out


def claim_generation(
    spark: SparkSession,
    root: str,
    gen: int,
    token: str,
    snapshot: str,
    owner: str = "",
    committed_gen: int = 0,
    ttl_s: float = DEFAULT_TTL_S,
) -> None:
    """Exclusively claim generation ``gen`` for this writer, called
    after the lease ``verify`` and before the pointer flip. Raises
    ``WriterFencedError`` when the generation is already spoken for:

    - ``gen`` below the max existing claim — another commit advanced
      past this writer's base read: unconditionally superseded;
    - ``gen`` already claimed by a DIFFERENT live writer — it is
      mid-flip; this writer's base is stale either way;
    - claimed by a different writer that CRASHED between claim and flip
      (claim older than ``ttl_s`` while the pointer, per the caller's
      fresh ``committed_gen`` read, never advanced to it): taken over,
      token rotated — the crashed original, if merely paused, refuses
      at ``verify_claim``;
    - claimed by the SAME ``owner`` (this logical writer's own crash
      replay, token rotated by re-acquire): re-entered immediately, the
      lease's same-owner contract.
    """
    claims = claimed_generations(spark, root)
    mx = max(claims, default=0)
    if gen < mx or gen <= committed_gen:
        raise WriterFencedError(
            f"generation {gen} at {root} is superseded (max claim {mx}, "
            f"pointer at {committed_gen}): another writer committed past "
            "this writer's base read — it must not flip"
        )
    body = f"{token} {snapshot} {owner}".rstrip()
    path = _claim_path(root, gen)
    if fs.create_text_exclusive(spark, path, body):
        _recheck_claim_is_max(spark, root, gen, token)
        return
    # claim exists: same-owner replay, crashed claimer, or a live racer
    held_token, held_snap, held_owner = _claim_parse(
        fs.read_text(spark, path)
    )
    if held_token == token:
        _recheck_claim_is_max(spark, root, gen, token)
        return  # our own claim (a replayed commit step)
    if owner and held_owner == owner:
        fs.write_text_atomic(spark, path, body)
        _recheck_claim_is_max(spark, root, gen, token)
        return
    mt = fs.mtime_ms(spark, path)
    age_s = None if mt is None else (time.time() * 1000 - mt) / 1000
    if (
        age_s is not None
        and age_s > ttl_s
        and committed_gen < gen
    ):
        # claimer died between claim and flip; the generation must not
        # brick the table — take over, rotating the token so the
        # original refuses at verify_claim if it was merely paused
        fs.write_text_atomic(spark, path, body)
        _recheck_claim_is_max(spark, root, gen, token)
        return
    raise WriterFencedError(
        f"generation {gen} at {root} is already claimed by "
        f"{held_owner or '<torn/unreadable claim>'!r} "
        f"(snapshot {held_snap!r}, age "
        f"{'?' if age_s is None else f'{age_s:.1f}s'}): a second writer "
        "committed or is mid-flip — this writer's base is stale"
    )


def _recheck_claim_is_max(
    spark: SparkSession, root: str, gen: int, token: str
) -> None:
    """Post-acquisition recheck (r15 review): the pre-create staleness
    check is check-then-act, so a writer paused between its claim LIST
    and its claim CREATE could exclusively re-create a generation
    number ``prune_claims`` has since removed — reopening a superseded
    generation. Re-listing AFTER the acquisition closes that: any newer
    claim present by create time is seen, the stale claim is released,
    and the writer refuses. What remains is the claim-verify→flip
    window the module banner already documents."""
    claims = claimed_generations(spark, root)
    mx = max(claims, default=gen)
    if gen < mx:
        release_claim(spark, root, gen, token)
        raise WriterFencedError(
            f"generation {gen} at {root} was re-claimed after newer "
            f"commits (max claim now {mx}): this writer paused across a "
            "claim prune — its base is stale and it must not flip"
        )


def release_claim(
    spark: SparkSession, root: str, gen: int, token: str
) -> None:
    """Remove generation ``gen``'s claim IFF it still holds ``token`` —
    the FAILURE-path cleanup for writers whose claim owner cannot
    re-enter (fresh-per-call identities like index builds): a commit
    that claimed and then failed before flipping must not fence its
    own retry out for the full TTL. Never raises; a takeover observed
    here is the thief's protocol to surface (mirrors
    ``release_quiet``)."""
    try:
        path = _claim_path(root, gen)
        held_token, _, _ = _claim_parse(fs.read_text(spark, path))
        if held_token == token:
            fs.delete(spark, path, recursive=False)
    except Exception:  # noqa: BLE001 — failure-path cleanup only
        pass


def verify_claim(
    spark: SparkSession, root: str, gen: int, token: str
) -> None:
    """Require that this writer still holds generation ``gen``'s claim —
    re-read immediately before the pointer flip (the CAS-emulating
    read; see the module banner for the residual it leaves)."""
    held_token, _, held_owner = _claim_parse(
        fs.read_text_retry(spark, _claim_path(root, gen))
    )
    if held_token != token:
        raise WriterFencedError(
            f"generation claim {gen} at {root} no longer holds this "
            f"writer's token (now {held_owner!r}): the claim was taken "
            "over — this writer must not flip"
        )


def prune_claims(spark: SparkSession, root: str, committed_gen: int) -> None:
    """Best-effort removal of claims older than keep-two (claims for
    ``committed_gen`` and its predecessor stay, mirroring snapshot
    retention). A late re-claim of a pruned number is closed by
    ``claim_generation``'s pre-create refusal plus the post-create
    re-list (``_recheck_claim_is_max``, r15 review — the pre-check
    alone was check-then-act); the surviving residual is the
    claim-verify→flip window the module banner documents."""
    for g in claimed_generations(spark, root):
        if g < committed_gen - (_CLAIM_KEEP - 1):
            try:
                fs.delete(spark, _claim_path(root, g), recursive=False)
            except Exception:  # noqa: BLE001 — next commit's prune retries
                pass


def detect_pointer_regression(
    spark: SparkSession,
    root: str,
    pointer_gen: int,
    pointer_token: str,
) -> None:
    """Raise ``PointerRegressionError`` when the pointer was last
    flipped by a SUPERSEDED writer — the pure-CAS residual's signature
    (module banner). Called by the pointer protocols at acquire time so
    the NEXT writer refuses to build on a regressed snapshot. Two
    detectable shapes:

    - the pointer's recorded generation is ≥2 behind the max claim (one
      behind is a writer mid-flip or crashed pre-flip, which
      ``claim_generation``'s TTL takeover handles, not a regression):
      an OLD generation's late flip won after newer commits;
    - the pointer's recorded writer token differs from its own
      generation's surviving claim token: the loser of a same-
      generation claim takeover flipped last (the winner's token is in
      the claim — takeover rotates it; the loser's is in the pointer).

    Legacy pointers (no generation/token recorded) predate claims and
    are exempt — their tables carry no claim files until the first
    r15-format commit."""
    claims = claimed_generations(spark, root)
    mx = max(claims, default=0)
    if pointer_gen < mx - 1:
        raise PointerRegressionError(
            f"pointer at {root} records generation {pointer_gen} but "
            f"generation {mx} was claimed (snapshot "
            f"{claim_snapshot(spark, root, mx)!r}): a superseded "
            "writer's late flip regressed the pointer — repair by "
            "re-flipping to the max claim's snapshot (if its directory "
            "survived) or replaying the winner's batch before any new "
            "writer merges onto the regressed base"
        )
    if pointer_gen >= 1 and pointer_token and pointer_gen in claims:
        held_token, held_snap, _ = _claim_parse(
            fs.read_text(spark, _claim_path(root, pointer_gen))
        )
        if held_token and held_token != pointer_token:
            raise PointerRegressionError(
                f"pointer at {root} (generation {pointer_gen}) was "
                "flipped by a writer whose claim was taken over — the "
                f"claim's winner committed snapshot {held_snap!r}; "
                "repair by re-flipping to it (if its directory "
                "survived) or replaying the winner's batch before any "
                "new writer merges onto the regressed base"
            )
