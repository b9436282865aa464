"""Exactly-once streaming MERGE (keyed upsert) into a warehouse table.

``foreachBatch`` is at-least-once: after a crash between the sink action
and the checkpoint commit, the SAME micro-batch is redelivered. An append
sink duplicates rows under that replay; the two exactly-once recipes on a
non-transactional store are (a) partition-per-batch overwrite
(``streaming.dedup.write_stream_idempotent_parquet`` — append-shaped
facts) and (b) this module: an idempotent MERGE whose replay converges to
the same table, for upsert-shaped targets (dimensions, SCD current
tables, "latest state per key").

Storage is a versioned snapshot: each batch writes the FULL merged table
to ``<table>/v-<run_id>-<batch_id>/`` and then atomically flips the
``_LATEST`` pointer file (write-temp + rename through the Hadoop
FileSystem — ``io.fs``, so the table may live on HDFS/S3A; see that
module's banner for what "atomic" means per store). The snapshot
name carries a RUN identity alongside Spark's batch id because batch ids
alone are not an idempotence key: after a checkpoint loss the restarted
stream numbers its first micro-batch 0 again — with old AND new rows in
it — and a batch-id-only guard would skip it as already applied,
silently losing the new rows (review r09). Crash behavior:

- crash before the snapshot dir commits -> pointer still names the old
  snapshot; replay re-merges from it and overwrites the partial dir;
- crash after the pointer flip but before the checkpoint commit -> the
  SAME (run, batch) is redelivered, matches the pointer, and is a no-op
  (this also sidesteps Spark's cannot-overwrite-a-path-being-read rule);
- replay under a NEW run identity (fresh checkpoint, or a restart that
  re-delivers an uncommitted batch) RE-MERGES rather than skips: with a
  ``seq_col`` the re-merge is convergent at any delivery order (the CDC
  version-column contract — recommended); without one it is
  last-redelivery-wins, the inherent limit of arrival-order semantics
  under at-least-once delivery;
- duplicate rows can never appear: the table is keyed (one survivor per
  key by construction of the merge aggregate).

Retention: the CURRENT and the PREVIOUS snapshot are kept (older ones
are pruned), so a reader holding a lazy plan from ``read_merge_table``
survives one concurrent commit; long-lived readers should re-resolve per
query or materialize eagerly (``localCheckpoint``) — the certification
twin does the latter.

The merge itself is the scalable MERGE shape proven by
``queries/incremental.py:q_orders_upsert_merge``: union base + batch with
a priority column, one ``groupBy(keys)`` with ``max_by(struct, ...)`` —
ONE shuffle with map-side combine, no join, no window.

100 TB note: the snapshot rewrite is O(table) per micro-batch, which is
the right cost ONLY for dimension-sized upsert targets — exactly the
shape the reference rewrites wholesale every DAG run
(``dags/rentalFilmDAG.py``, dims re-loaded per run; per-batch cost
measured in SCALING.md via ``tools/merge_bench.py``). For fact-scale
streams use the partition-overwrite sink; at true lakehouse scale the
same ``merge_upsert_batch`` body targets a transactional format's MERGE
instead of the snapshot swap.
"""

from __future__ import annotations

import uuid

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from filmdatawarehouse_spark.io import fs, lease

POINTER = "_LATEST"

# AnalysisException error classes that mean "the table does not exist
# yet" (first batch): the path is absent, or present-but-empty so parquet
# schema inference fails. Everything else is a real read failure.
_MISSING_TABLE_CONDITIONS = ("PATH_NOT_FOUND", "UNABLE_TO_INFER_SCHEMA")


def _is_missing_table_error(e: AnalysisException) -> bool:
    """True iff the AnalysisException means the table path is absent
    (or empty — parquet cannot infer a schema from zero files)."""
    get = getattr(e, "getCondition", None) or getattr(
        e, "getErrorClass", None
    )
    cond = (get() if get is not None else None) or ""
    return any(c in cond for c in _MISSING_TABLE_CONDITIONS)


def _read_parquet_or_none(
    spark: SparkSession, table_path: str
) -> DataFrame | None:
    """``spark.read.parquet`` that maps ONLY table-absent errors to None.

    Transient remote-FS failures (S3 listing timeout, permission blip,
    corrupt footer) re-raise so the micro-batch fails and is replayed —
    treating them as "first batch" would merge with base=None and
    destroy existing rows in the overwritten partitions."""
    try:
        return spark.read.parquet(table_path)
    except AnalysisException as e:
        if _is_missing_table_error(e):
            return None
        raise


def _pointer_path(table_path: str) -> str:
    return f"{table_path.rstrip('/')}/{POINTER}"


def _snapshot_name(run_id: str, batch_id: int) -> str:
    return f"v-{run_id}-{batch_id}"


def _read_pointer(
    spark: SparkSession, table_path: str
) -> tuple[str | None, str | None]:
    """``(current, previous)`` from ONE pointer read. Since r11 the
    commit records the retained previous snapshot on the pointer's
    second line, so the pair is CONSISTENT by construction (the pointer
    flips atomically via rename) — a consumer never has to guess
    the previous from directory listings, which both (a) mistook a
    crashed not-yet-committed FUTURE snapshot for the previous
    (inverting the CDC feed) and (b) raced a concurrent commit between
    two pointer reads into diffing a snapshot against itself (r11
    review). Older pointers carry one line; callers fall back to the
    directory heuristic for them. All pointer I/O goes through the
    Hadoop FileSystem (``io.fs``) since r12 so the table path may live
    on HDFS/S3A, not just the driver's local disk."""
    cur, prev, _, _ = _read_pointer_full(spark, table_path)
    return cur, prev


def _read_pointer_full(
    spark: SparkSession, table_path: str
) -> tuple[str | None, str | None, int, str]:
    """``(current, previous, generation, writer_token)`` from ONE
    pointer read. Since r15 the commit appends a ``g=<n> w=<token>``
    line — the monotone generation + flipping writer's fence token that
    back the claim protocol (``io.lease.claim_generation``); legacy
    pointers (one or two bare snapshot lines) read as generation 0 with
    an empty token, which exempts them from regression checks until
    their first r15-format commit."""
    text = fs.read_text_retry(spark, _pointer_path(table_path))
    if text is None:
        return None, None, 0, ""
    names, gen, tok = lease.split_pointer_meta(
        [ln.strip() for ln in text.splitlines() if ln.strip()]
    )
    if not names:
        return None, None, gen, tok

    def _resolve(name: str) -> str:
        # legacy pointer format (pre-run-identity): a bare batch id whose
        # snapshot lives at v-<id>; resolve it so an upgraded sink can
        # still read and merge onto a table committed by the old code
        return name if name.startswith("v-") else f"v-{name}"

    cur = _resolve(names[0])
    prev = _resolve(names[1]) if len(names) > 1 else None
    return cur, prev, gen, tok


def current_snapshot(
    spark: SparkSession, table_path: str
) -> str | None:
    """The committed snapshot's directory name (``v-<run>-<batch>``), or
    None before the first commit."""
    return _read_pointer(spark, table_path)[0]


def read_merge_table(spark: SparkSession, table_path: str) -> DataFrame | None:
    """The current committed snapshot (None before the first batch)."""
    snap = current_snapshot(spark, table_path)
    if snap is None:
        return None
    return spark.read.parquet(f"{table_path.rstrip('/')}/{snap}")


def _snapshot_pair(
    spark: SparkSession, table_path: str
) -> tuple[str | None, str | None]:
    """Consistent ``(current, previous)`` for CDC. Post-r11 pointers
    carry both (one atomic read — no race, no guessing). For a LEGACY
    single-line pointer, fall back to the directory heuristic with the
    future-partial exclusion: a same-run name at/above the current
    batch is a crashed not-yet-committed snapshot (the module's
    documented crash window) and must never be diffed — the old
    len==1 shortcut returned exactly that, inverting the feed (r11
    review). Residual legacy ambiguity (a candidate from a DIFFERENT
    run identity) is indistinguishable by name from a crashed future
    partial, so it is REFUSED too (r12, same policy as the
    missing-prev-dir branch below — refuse, never guess; the r11 code
    returned a sole cross-run candidate, which could feed one inverted
    CDC diff). A legacy table simply yields no feed until its first
    post-upgrade commit writes the two-line pointer."""
    cur, prev = _read_pointer(spark, table_path)
    if cur is None:
        return None, None
    root = table_path.rstrip("/")
    if prev is not None:
        if not fs.is_dir(spark, f"{root}/{prev}"):
            return cur, None  # retention raced/cleaned: refuse, not guess
        return cur, prev
    others = [
        d
        for d in fs.list_child_dirs(spark, root)
        if d.startswith("v-") and d != cur
    ]
    run, _, tail = cur.rpartition("-")
    cur_batch = int(tail) if tail.isdigit() else None
    same_run: list[tuple[int, str]] = []
    for d in others:
        head, _, dtail = d.rpartition("-")
        if head == run and dtail.isdigit():
            if cur_batch is not None and int(dtail) < cur_batch:
                same_run.append((int(dtail), d))
            # at/above the current batch: crashed future partial — drop
    if same_run:
        return cur, max(same_run)[1]
    return cur, None


def previous_snapshot(spark: SparkSession, table_path: str) -> str | None:
    """The RETAINED pre-commit snapshot's dir name, or None when there
    is no unambiguous one (see ``_snapshot_pair``)."""
    return _snapshot_pair(spark, table_path)[1]


def read_merge_changes(
    spark: SparkSession,
    table_path: str,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame | None:
    """CDC feed off the snapshot MERGE sink: the (keys...,
    change_type ∈ insert/update/delete) diff between the RETAINED
    previous snapshot and the current one — exactly what the sink's
    keep-two retention exists to make possible (the reader that
    resolved the old pointer finishes; the incremental consumer diffs).
    Returns None before two snapshots exist or when a prune-crash left
    the previous ambiguous (re-runs disambiguate after the next batch).

    One full-outer join on the keys (single shuffle); ``compare_cols``
    defaults to every non-key column of the current snapshot. Consume
    after each drained ``write_stream_merge_upsert`` run: the diff then
    covers that run's LAST batch — for per-batch granularity attach a
    consumer inside the sink's foreachBatch instead.
    """
    # ONE consistent pair — resolving current and previous through two
    # separate pointer reads raced a concurrent commit into diffing a
    # snapshot against itself (silently empty feed; r11 review)
    cur, prev = _snapshot_pair(spark, table_path)
    if cur is None or prev is None:
        return None
    return _changes_between(spark, table_path, keys, compare_cols, cur, prev)


def _changes_between(
    spark: SparkSession,
    table_path: str,
    keys: list[str],
    compare_cols: list[str] | None,
    cur: str,
    prev: str | None,
) -> DataFrame:
    """The (keys..., change_type) diff of snapshot ``prev`` → ``cur``.
    ``prev=None`` means "before the table existed": every current row is
    an insert (the bootstrap feed of the per-batch consumer hook)."""
    from filmdatawarehouse_spark.warehouse.scd import snapshot_diff

    root = table_path.rstrip("/")
    new = spark.read.parquet(f"{root}/{cur}")
    old = (
        spark.read.parquet(f"{root}/{prev}")
        if prev is not None
        else spark.createDataFrame([], new.schema)
    )
    # r13: across an additive schema evolution the previous snapshot
    # lacks the new column(s) — null-fill them so the diff stays
    # computable and HONEST: a key whose new value is non-null reads as
    # an update (null→value under eqNullSafe), null→null as unchanged
    for f in new.schema.fields:
        if f.name not in old.columns:
            old = old.withColumn(f.name, F.lit(None).cast(f.dataType))
    cols = (
        [c for c in new.columns if c not in keys]
        if compare_cols is None
        else compare_cols
    )
    if not cols:
        raise ValueError(
            "keys cover every column: nothing to compare — pass "
            "compare_cols or drop a key"
        )
    return snapshot_diff(old, new, keys, cols)


def merged_frame(
    base: DataFrame | None,
    batch_df: DataFrame,
    keys: list[str],
    seq_col: str | None = None,
    schema_evolution: str = "strict",
) -> DataFrame:
    """The MERGE plan: base ∪ batch with a priority column, ONE
    ``groupBy(keys)`` + ``max_by(struct, (seq, prio))`` — a single
    exchange with partial (map-side) aggregation, no join, no window
    sort (plan-pinned by tests/test_stream_merge.py). Survivorship is
    lexicographic (seq, prio): greatest ``seq_col`` wins, batch beats
    base on ties; without ``seq_col``, batch always beats base.
    Within-batch duplicates resolve in the same aggregate.

    Schema drift (r13): a batch whose columns differ from the snapshot
    used to be handled WRONG in both directions — a dropped column was
    silently projected away (the merged snapshot lost it for EVERY row,
    not just the batch's), an added column died on an opaque unresolved-
    column error. Now:

    - a batch missing snapshot columns is REFUSED in every mode (a
      stream cannot retract a column; project the snapshot explicitly
      if that is really the intent);
    - a batch ADDING value columns is refused under ``"strict"`` (the
      default) and accepted under ``schema_evolution="additive"`` —
      snapshot rows null-fill the new columns and the merged snapshot
      carries the widened schema from this batch on (the standard
      mergeSchema semantics). Keys and ``seq_col`` are never evolvable:
      null keys would silently re-group history and null seqs would
      corrupt survivorship, so those additions are refused outright.
    """
    cols = batch_df.columns
    # internal-name collision guard (the total_col pattern from
    # operators/prefix.py): withColumn would silently REPLACE a caller
    # '_prio', breaking survivorship, and '_s' would collide with the
    # aggregate alias — corrupt results, not an error, so reject loudly
    for reserved in ("_prio", "_s"):
        if reserved in cols:
            raise ValueError(
                f"batch_df must not contain reserved column {reserved!r}"
            )
    if schema_evolution not in ("strict", "additive"):
        raise ValueError(
            f"unknown schema_evolution {schema_evolution!r}: "
            "expected 'strict' or 'additive'"
        )
    value_cols = [c for c in cols if c not in keys]
    if not value_cols:
        raise ValueError(
            "batch_df has no non-key columns to merge; a key-only upsert "
            "target needs no MERGE — dedup/append instead"
        )
    prio = (
        F.struct(F.col(seq_col), F.col("_prio"))
        if seq_col
        else F.col("_prio")
    )
    src = batch_df.withColumn("_prio", F.lit(1))
    if base is not None:
        batch_set = set(cols)
        dropped = [c for c in base.columns if c not in batch_set]
        added = [c for c in cols if c not in set(base.columns)]
        if dropped:
            raise ValueError(
                f"batch_df is missing snapshot column(s) {dropped}: a "
                "MERGE batch cannot retract columns — null-fill them in "
                "the batch, or project the snapshot explicitly"
            )
        bad_added = [c for c in added if c in keys or c == seq_col]
        if bad_added:
            raise ValueError(
                f"batch_df adds key/seq column(s) {bad_added} absent "
                "from the snapshot: keys and the survivorship column "
                "are not evolvable (null history would re-group rows / "
                "corrupt survivorship)"
            )
        if added and schema_evolution != "additive":
            raise ValueError(
                f"batch_df adds column(s) {added} not in the snapshot; "
                "pass schema_evolution='additive' to widen the table "
                "(snapshot rows null-fill the new columns)"
            )
        src = (
            base.withColumn("_prio", F.lit(0))
            .unionByName(src, allowMissingColumns=bool(added))
        )
    return (
        src.groupBy(*keys)
        .agg(F.max_by(F.struct(*value_cols), prio).alias("_s"))
        .select(*keys, "_s.*")
    )


def merge_upsert_batch(
    batch_df: DataFrame,
    batch_id: int,
    table_path: str,
    keys: list[str],
    seq_col: str | None = None,
    run_id: str = "api",
    on_changes=None,
    schema_evolution: str = "strict",
    lease_ttl_s: float = lease.DEFAULT_TTL_S,
    lease_owner: str | None = None,
) -> None:
    """Idempotently MERGE one micro-batch into the snapshot table.

    ``(run_id, batch_id)`` is the idempotence key: a replay of the same
    pair after the pointer flip is a no-op; any other delivery re-merges
    (convergent with ``seq_col`` — see the module docstring for the
    checkpoint-loss rationale). ``seq_col`` is stored in the table so
    later batches keep comparing against it.

    ``on_changes(changes_df, batch_id)`` (r12) is the PER-BATCH CDC
    consumer ``read_merge_changes``'s docstring defers to: called after
    each commit with the (keys..., change_type) diff this batch applied
    (the first commit feeds every row as an insert — the bootstrap).
    Delivery is AT-LEAST-ONCE, the only honest contract under replay: a
    crash after the pointer flip but before the checkpoint commit
    redelivers the batch, whose merge no-ops but whose diff — still
    exactly (retained previous → current), readable thanks to keep-two
    — is re-fed; downstream must be idempotent on (batch_id, keys), the
    standard CDC consumer contract. A consumer exception fails the
    micro-batch for replay — it is part of the batch's work, not a
    fire-and-forget.

    ``schema_evolution`` ('strict' | 'additive', r13) is
    ``merged_frame``'s drift policy: 'additive' lets a batch WIDEN the
    table with new value columns (snapshot rows null-fill; the CDC diff
    stays computable across the boundary — old side null-filled, so
    null→value reads as an update). Missing columns and key/seq
    additions are refused in every mode.

    Writer fencing (r14): the read→merge→flip cycle runs under the
    ``io.lease`` writer lease, re-verified immediately before the
    pointer flip — a SECOND concurrent writer refuses with
    ``WriterFencedError`` instead of interleaving flips and losing the
    other's merge (the lost-update a stale ``base`` read would cause).
    ``lease_owner`` is the crash-re-entry identity (default:
    ``run_id``). It matters that the owner be STABLE across the
    restarts of one logical writer: the streaming wrapper passes its
    checkpoint location (stable per stream, unique by Spark's own
    checkpoint exclusivity), because run identities are deliberately
    fresh per start (the idempotence contract) and a crash-restart
    under a fresh owner would wait out the TTL on its own leftover
    lease. A genuinely different writer waits out ``lease_ttl_s`` (or
    an operator breaks the lease). The committed-replay fast path below
    is read-only and stays unfenced."""
    spark = batch_df.sparkSession
    snap = _snapshot_name(run_id, batch_id)
    prev = current_snapshot(spark, table_path)
    if prev == snap:
        # replay after the pointer flip: already merged. Re-feed the
        # consumer (at-least-once): the pointer's second line is the
        # retained pre-commit snapshot this batch's diff runs against.
        if on_changes is not None:
            _, retained = _read_pointer(spark, table_path)
            on_changes(
                _changes_between(
                    spark, table_path, keys, None, snap, retained
                ),
                batch_id,
            )
        return
    # fence BEFORE the base read: a stale base merged under a raced
    # flip is the lost-update failure mode, not just a torn pointer
    token = lease.acquire(
        spark, table_path, owner=lease_owner or run_id, ttl_s=lease_ttl_s
    )
    # heartbeat for as long as we hold the lease: the TTL clock runs
    # from the lease mtime, and the snapshot write below is a whole
    # Spark job — without refreshes a batch longer than the TTL becomes
    # takeover-eligible WHILE STILL WRITING (r14 review)
    stop_hb = lease.start_heartbeat(
        spark, table_path, token, lease_ttl_s / 3.0
    )
    try:
        # re-read the pointer UNDER the lease: a commit landing between
        # the unfenced probe above and the acquire would otherwise make
        # this writer retain a stale `prev` — pruning the REAL previous
        # snapshot (keep-two breach for concurrent readers) and feeding
        # the CDC consumer a diff against the wrong baseline
        prev, _, base_gen, ptoken = _read_pointer_full(spark, table_path)
        if prev == snap:
            # our own (run, batch) landed between probe and lease (a
            # concurrent replay of this very writer): re-enter the
            # committed-replay fast path above
            stop_hb()
            lease.release(spark, table_path, token)
            return merge_upsert_batch(
                batch_df, batch_id, table_path, keys, seq_col, run_id,
                on_changes, schema_evolution, lease_ttl_s, lease_owner,
            )
        # refuse to merge onto a REGRESSED base: a superseded writer's
        # late flip (the pure-CAS residual, io.lease banner) is loud at
        # the next acquire, not silently compounded
        lease.detect_pointer_regression(spark, table_path, base_gen, ptoken)
        base = read_merge_table(spark, table_path)
        merged = merged_frame(
            base, batch_df, keys, seq_col, schema_evolution=schema_evolution
        )

        root = table_path.rstrip("/")
        merged.write.mode("overwrite").parquet(f"{root}/{snap}")
        # still-the-writer check at the last possible moment: a lease
        # broken + re-acquired during the snapshot write must refuse
        # HERE, before the irreversible flip
        lease.verify(spark, table_path, token)
        # claim this commit's generation (r15): exclusive-create of
        # _GEN/g-<n> is the CAS-emulating step — a writer whose base
        # read another commit has since advanced is REFUSED before the
        # flip (io.lease.claim_generation), closing the break_lease-
        # override interleave the verify alone could only surface
        g_next = base_gen + 1
        _, _, fresh_gen, _ = _read_pointer_full(spark, table_path)
        lease.claim_generation(
            spark, table_path, g_next, token, snap,
            owner=lease_owner or run_id, committed_gen=fresh_gen,
            ttl_s=lease_ttl_s,
        )
        try:
            lease.verify_claim(spark, table_path, g_next, token)
            # line 2 records the retained previous snapshot so CDC
            # consumers get a consistent (current, previous) pair from
            # one atomic read; line 3 stamps generation + writer token
            # for the claim protocol; the write is temp-file + rename
            # through the Hadoop FileSystem (atomic on local/HDFS; see
            # io.fs for the object-store caveat)
            meta = lease.format_pointer_meta(g_next, token)
            fs.write_text_atomic(
                spark,
                _pointer_path(table_path),
                f"{snap}\n{meta}" if prev is None
                else f"{snap}\n{prev}\n{meta}",
            )
        except BaseException:
            # a claim left behind by a failed flip fences out any
            # REPLACEMENT writer (new run_id) for the full claim TTL —
            # only the same (run_id, lease_owner) re-enters past it; a
            # same-token release here keeps that liveness without ever
            # deleting a thief's claim (release_claim is token-checked;
            # mirrors operators.similarity._commit_index_version)
            lease.release_claim(spark, table_path, g_next, token)
            raise
        # claims keep-two prune FIRST (so the about-to-expire claim
        # cannot pin its snapshot an extra round and keep-two holds);
        # then the snapshot prune RETAINS the previous snapshot so a
        # reader that resolved it just before this commit can still
        # finish its query (a crash here just leaves garbage for the
        # next batch's prune — never corrupts the committed snapshot),
        # plus the snapshot named by EVERY surviving claim (r15 review:
        # all of them, not this writer's own neighborhood — a
        # superseded late-flipper prunes with a STALE generation, which
        # removes only OLD claims, so the true winner's newer
        # snapshots stay claim-pinned and its detected regression
        # stays repairable).
        lease.prune_claims(spark, table_path, g_next)
        keep = {snap, prev} | lease.claimed_snapshots(spark, table_path)
        for d in fs.list_child_dirs(spark, root):
            if d.startswith("v-") and d not in keep:
                try:
                    fs.delete(spark, f"{root}/{d}")
                except Exception:
                    pass  # best-effort: next batch's prune retries
        if on_changes is not None:
            on_changes(
                _changes_between(spark, table_path, keys, None, snap, prev),
                batch_id,
            )
    except BaseException:
        # failure path: stop refreshing and best-effort release — a
        # leaked lease would fence a fresh-owner retry out for the full
        # TTL, and buys the replay nothing (a stable owner re-enters
        # anyway; a crashed PROCESS still ages out via the TTL)
        stop_hb()
        lease.release_quiet(spark, table_path, token)
        raise
    stop_hb()
    lease.release(spark, table_path, token)


def write_stream_merge_upsert(
    df: DataFrame,
    table_path: str,
    keys: list[str],
    checkpoint_dir: str,
    seq_col: str | None = None,
    run_id: str | None = None,
    on_changes=None,
    schema_evolution: str = "strict",
    lease_ttl_s: float = lease.DEFAULT_TTL_S,
):
    """Start the exactly-once MERGE sink for ``df`` (returns the started
    StreamingQuery; availableNow so a restart drains new input and
    stops). Each start gets a fresh run identity unless the caller pins
    one — see the module docstring for why batch ids alone are not an
    idempotence key. ``on_changes`` attaches the per-batch CDC consumer
    (at-least-once; see ``merge_upsert_batch``); ``schema_evolution``
    ('strict' | 'additive') is ``merged_frame``'s drift policy. Each
    batch runs under the ``io.lease`` writer fence keyed on the
    CHECKPOINT location — stable across restarts of this logical stream
    (run identities are fresh per start by design, so a crashed
    stream's restart re-enters its own leftover lease instantly instead
    of waiting out the TTL) and exclusive by Spark's own checkpoint
    locking — so a second concurrent stream on the same table refuses
    loudly (``merge_upsert_batch``'s r14 contract)."""
    rid = run_id or uuid.uuid4().hex[:12]

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        merge_upsert_batch(
            batch_df, batch_id, table_path, keys, seq_col, run_id=rid,
            on_changes=on_changes, schema_evolution=schema_evolution,
            lease_ttl_s=lease_ttl_s, lease_owner=f"ckpt:{checkpoint_dir}",
        )

    return (
        df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def merge_upsert_batch_partitioned(
    batch_df: DataFrame,
    table_path: str,
    keys: list[str],
    partition_col: str | list[str],
    seq_col: str | None = None,
    owner: str | None = None,
    lease_ttl_s: float = lease.DEFAULT_TTL_S,
    fence_token: str | None = None,
) -> None:
    """Partition-pruned MERGE: O(touched partitions) per batch instead of
    the snapshot sink's O(table) — the scale path for LARGE upsert
    targets partitioned on a batch-local column (date-keyed facts with
    in-day corrections, the reference's fact layout).

    Mechanics per batch: the batch's distinct partition values (a bounded
    collect — micro-batches touch few partitions by construction) prune
    the base read, ``merged_frame`` merges only those partitions, and a
    DYNAMIC partition overwrite replaces exactly them. ``localCheckpoint``
    breaks the read-overwrite lineage (Spark refuses a plan that reads
    the path it overwrites) by materializing the merged partitions to
    executor storage first.

    Idempotence needs no pointer or ledger here: a replay re-derives and
    overwrites the same partitions, and merging an already-applied batch
    is a fixed point (with ``seq_col`` this holds at ANY delivery order —
    use it). The trade against the snapshot sink: no all-or-nothing
    pointer flip, so atomicity is per-partition — a crash mid-write
    leaves some partitions new and some old until the replay repairs
    them; readers see partition-level, not table-level, consistency.
    Pick this form when the target is too large to rewrite and
    partition-level consistency is acceptable; pick the snapshot sink
    for dimension-sized targets needing an atomic cutover.

    CONTRACT — partition-stable keys: a key's partition value must never
    change across batches (the date-keyed-fact norm). The prune reads
    only the batch's partitions, so a key UPDATE arriving under a new
    partition value cannot see — and therefore cannot retire — the old
    row in the unread partition; both would remain. Keys that migrate
    partitions need the snapshot sink (or a delete-record convention).

    ``partition_col`` may be a LIST for multi-level layouts
    (``day=X/hour=Y`` facts): the batch's distinct partition TUPLES
    prune the base read (per-tuple AND of equalities, NULL levels via
    the explicit isNull arm) and the dynamic overwrite replaces exactly
    those leaf partitions. The table's real layout must match the list
    exactly — the same flatten hazard ``io.maintenance
    .compact_partitions`` documents applies to any writer.

    Writer fencing (r14): replay-convergence makes ONE writer's
    redeliveries safe, but TWO concurrent writers still race the
    read→merge→overwrite cycle — both read the same base, each
    overwrites the touched partitions WITHOUT the other's rows (the
    classic lost update), so this sink takes the same ``io.lease``
    fence as the snapshot sink: acquire before the base read, verify
    before the dynamic overwrite. ``owner`` is the crash-re-entry
    identity (a replaying caller passes its stable run id; default is a
    fresh identity per call); ``fence_token`` lets a caller that
    ALREADY holds the table lease (the streaming sink, which must also
    cover its post-merge compaction — see
    ``write_stream_merge_partitioned``) pass it through instead of
    deadlocking on a second acquire — the lease is then verified here
    but released by its owner. The lease file (``_WRITER_LEASE``) is
    underscore-prefixed, so Spark's default path filter hides it from
    the table scan and partition discovery.
    """
    spark = batch_df.sparkSession
    # cheap argument validation BEFORE the lease: an invalid call must
    # not leak a fresh-owner lease its corrected retry cannot re-enter
    pcols = (
        [partition_col] if isinstance(partition_col, str)
        else list(partition_col)
    )
    if not pcols:
        raise ValueError("partition_col must name at least one column")
    overlap = set(pcols) & set(keys)
    if overlap:
        raise ValueError(
            f"partition column(s) must not be merge keys: {sorted(overlap)}"
        )
    own_lease = fence_token is None
    token = fence_token or lease.acquire(
        spark,
        table_path,
        owner=owner or f"mergep-{uuid.uuid4().hex[:8]}",
        ttl_s=lease_ttl_s,
    )
    # heartbeat only when WE own the lease (a caller-held token is the
    # caller's to refresh — the streaming sink heartbeats across the
    # whole merge+compaction span)
    stop_hb = (
        lease.start_heartbeat(spark, table_path, token, lease_ttl_s / 3.0)
        if own_lease
        else None
    )
    try:
        _merge_partitioned_body(
            spark, batch_df, table_path, keys, pcols, seq_col, token
        )
    except BaseException:
        if own_lease:
            stop_hb()
            lease.release_quiet(spark, table_path, token)
        raise
    if own_lease:
        stop_hb()
        lease.release(spark, table_path, token)


def _merge_partitioned_body(
    spark: SparkSession,
    batch_df: DataFrame,
    table_path: str,
    keys: list[str],
    pcols: list[str],
    seq_col: str | None,
    token: str,
) -> None:
    """The prune→merge→overwrite cycle of the partitioned sink, run
    UNDER the caller's lease (see ``merge_upsert_batch_partitioned``)."""
    touched = [
        tuple(r) for r in batch_df.select(*pcols).distinct().collect()
    ]
    # existence probe through SPARK, not os.path: this sink targets the
    # large remote-fs tables (HDFS/S3) where a local isdir() check would
    # silently report "no table", merge with base=None, and overwrite
    # the touched partitions with batch-only rows — quiet data loss.
    # Only the two path-absent error classes mean "first batch"; any
    # other failure (S3 listing timeout, permission blip, corrupt
    # footer) must FAIL the batch for replay — swallowing it would
    # dynamic-overwrite the touched partitions with batch-only rows
    base_all = _read_parquet_or_none(spark, table_path)
    base = None
    if base_all is not None:
        # equality never matches NULL, so a null-partition batch
        # (__HIVE_DEFAULT_PARTITION__ on disk) needs the explicit isNull
        # arm or its existing rows would be invisible to the merge and
        # duplicate on every update
        if len(pcols) == 1:
            # keep the In/InSet form: an OR-chain of equalities grows
            # the plan linearly in touched-partition count and loses
            # Catalyst's OptimizeIn (r11 review) — a backfill batch can
            # touch hundreds of days
            vals = [t[0] for t in touched if t[0] is not None]
            pred = F.col(pcols[0]).isin(vals)
            if any(t[0] is None for t in touched):
                pred = pred | F.col(pcols[0]).isNull()
            base = base_all.filter(pred)
        else:
            pred = None
            for t in touched:
                cond = None
                for c, v in zip(pcols, t):
                    arm = (
                        F.col(c).isNull()
                        if v is None
                        else F.col(c) == F.lit(v)
                    )
                    cond = arm if cond is None else cond & arm
                pred = cond if pred is None else pred | cond
            base = base_all.filter(pred) if pred is not None else None
    merged = merged_frame(base, batch_df, keys, seq_col).localCheckpoint(
        eager=True
    )
    # still-the-writer check before the irreversible overwrite: a lease
    # taken over during the merge must refuse HERE (r14 fence contract)
    lease.verify(spark, table_path, token)
    # dynamic overwrite is set PER WRITE, never on the session conf: a
    # save/set/restore of the session-global flag races a concurrent
    # sink in the same session, whose overwrite could then run in
    # 'static' mode and truncate every untouched partition
    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*pcols)
        .parquet(table_path)
    )


def write_stream_merge_partitioned(
    df: DataFrame,
    table_path: str,
    keys: list[str],
    partition_col: str | list[str],
    checkpoint_dir: str,
    seq_col: str | None = None,
    compact_target_bytes: int | None = None,
    lease_ttl_s: float = lease.DEFAULT_TTL_S,
):
    """Start the partition-pruned MERGE sink (availableNow; returns the
    started StreamingQuery). No run identity is needed for IDEMPOTENCE
    (every delivery re-merges its touched partitions and convergence is
    the mechanism; use ``seq_col`` so that holds at any delivery order),
    but the CHECKPOINT location serves as the writer-fence owner (stable
    across restarts of this logical stream — a crashed batch's restart
    re-enters its own leftover lease instantly — and exclusive by
    Spark's checkpoint locking): each batch holds the table lease across
    BOTH the merge and the follow-up compaction — compaction racing a
    concurrent writer's overwrite could write back the pre-merge files
    it had just read (resurrected rows), so it must run under the same
    lease generation, not after release.

    ``compact_target_bytes``: the merged overwrite writes one file per
    (task, partition) pair, so a stream of micro-batches fragments ITS
    OWN hot partitions — this sink is the primary small-files producer
    the maintenance module exists for. When set, each batch is followed
    by ``io.maintenance.compact_partitions`` at that target; the victim
    criterion is self-stabilizing, so only partitions the stream
    actually fragmented are rewritten (normally the just-touched ones)
    and a quiet batch compacts nothing. Compaction is idempotent and
    carries the same per-partition crash contract as the merge itself —
    a replay repairs both. Production alternative: leave this None and
    run ``compact_partitions`` on a schedule; at large per-partition
    volumes the scheduled form amortizes re-reads across many batches.
    """

    owner = f"ckpt:{checkpoint_dir}"

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        token = lease.acquire(
            spark, table_path, owner=owner, ttl_s=lease_ttl_s
        )
        stop_hb = lease.start_heartbeat(
            spark, table_path, token, lease_ttl_s / 3.0
        )
        try:
            merge_upsert_batch_partitioned(
                batch_df, table_path, keys, partition_col, seq_col,
                fence_token=token,
            )
            if compact_target_bytes is not None:
                from filmdatawarehouse_spark.io.maintenance import (
                    compact_partitions,
                )

                lease.verify(spark, table_path, token)
                compact_partitions(
                    spark,
                    table_path,
                    partition_col,
                    target_bytes=compact_target_bytes,
                )
        except BaseException:
            stop_hb()
            lease.release_quiet(spark, table_path, token)
            raise
        stop_hb()
        lease.release(spark, table_path, token)

    return (
        df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
