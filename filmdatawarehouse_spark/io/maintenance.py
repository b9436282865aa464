"""Incremental table maintenance: file-level stats and partition-selective
small-file compaction for plain-parquet tables.

`io.sinks.compact_parquet` rewrites the WHOLE table — the right tool for
dimension-sized locations, an O(table) non-starter for the large fact
tables where small files actually accumulate (streaming appends and daily
dynamic overwrites land KB-sized files in the HOT partitions only; the
cold 99 % of a 100 TB table is already compact). This module is the scale
path:

1. ``partition_file_stats`` — the planner's input, O(partitions) py4j
   round-trips via per-directory ContentSummary (JVM/namenode-side
   aggregation; the per-FILE ``list_data_files`` walk costs ~6 ms/file
   through py4j — measured r10 — and exists for file-level forensics
   and tests, not planning). For pathological backlogs, plan and
   compact one partition-prefix at a time.
2. ``compaction_plan`` — victims = partitions whose file count exceeds
   what their bytes justify at ``target_bytes``/file. Self-stabilizing:
   a compacted partition stops being a victim, so re-runs are no-ops.
3. ``compact_partitions`` — ONE Spark job rewrites every victim
   partition: partition-pruned read (arbitrary deterministic predicates
   on partition columns prune — the cast-to-string match below is
   evaluated driver-side on partition metadata), rows binned to
   ``ceil(bytes/target)`` output files per partition via a dense global
   bin index + ``repartitionByRange`` (contiguous ranges → each task
   holds whole bins → file sizes land near target; boundary sampling can
   merge adjacent bins, so counts are approximate within +1), then a
   DYNAMIC partition overwrite replaces exactly the victim partitions.
   ``localCheckpoint`` breaks the read-overwrite lineage (same mechanics
   and crash contract as ``streaming.merge.merge_upsert_batch_partitioned``:
   per-partition atomicity via the committer; a re-run repairs).

Reference parity note: the reference (dags/rentalFilmDAG.py) rewrites its
warehouse wholesale every run and never needs maintenance; this module is
part of the engine's own 100 TB operations surface, like the skew and
quarantine tooling.
"""

from __future__ import annotations

import math
import urllib.parse
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

HIVE_DEFAULT_PARTITION = "__HIVE_DEFAULT_PARTITION__"


def vacuum_compact_leftovers(spark: SparkSession, table_path: str) -> list[str]:
    """Remove crash leftovers of ``io.sinks.compact_parquet``'s rename
    swap: a crash in its window leaves ``<table>_compact_<token>`` (the
    unswapped rewrite) and/or ``<table>_compact_old_<token>`` (the
    pre-swap copy) SIBLING directories behind. Both are safe to delete
    only while the main path exists and holds data files — the old-copy
    dir is the documented recovery point for the one crash state where
    the table itself is missing, so vacuuming refuses to touch anything
    in that state. Returns the deleted paths."""
    jvm = spark._jvm
    main = jvm.org.apache.hadoop.fs.Path(table_path)
    fs = main.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(main) or not list_data_files(spark, table_path):
        raise ValueError(
            f"{table_path} is missing or empty: a _compact_old_* sibling "
            "may be the recovery copy — restore it, don't vacuum it"
        )
    qualified = fs.getFileStatus(main).getPath()
    parent, base = qualified.getParent(), qualified.getName()
    removed: list[str] = []
    for st in fs.listStatus(parent):
        name = st.getPath().getName()
        if st.isDirectory() and (
            name.startswith(f"{base}_compact_")
            or name.startswith(f"{base}_compact_old_")
        ):
            fs.delete(st.getPath(), True)
            removed.append(st.getPath().toString())
    return sorted(removed)


def list_data_files(
    spark: SparkSession, table_path: str
) -> list[tuple[str, int]]:
    """``(path_relative_to_table, bytes)`` for every data file under
    ``table_path``, via the Hadoop FileSystem API (portable to HDFS/S3A —
    an ``os.walk`` would silently see nothing on a remote store). Hidden
    and metadata entries (``_SUCCESS``, ``_temporary``, dotfiles) are
    skipped at every path level, matching what a Spark scan would read."""
    jvm = spark._jvm
    root = jvm.org.apache.hadoop.fs.Path(table_path)
    fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(root):
        return []
    prefix = fs.getFileStatus(root).getPath().toString().rstrip("/") + "/"
    out: list[tuple[str, int]] = []
    it = fs.listFiles(root, True)
    while it.hasNext():
        st = it.next()
        full = st.getPath().toString()
        rel = full[len(prefix):] if full.startswith(prefix) else full
        parts = rel.split("/")
        if any(p.startswith(("_", ".")) for p in parts):
            continue
        out.append((rel, int(st.getLen())))
    out.sort()
    return out


@dataclass(frozen=True)
class PartitionPlan:
    """One victim partition: its raw dir value (None = table root /
    unpartitioned data), decoded value string (None = NULL partition),
    current file count, total bytes, and target output file count."""

    raw_value: str | None
    value: str | None
    n_files: int
    total_bytes: int
    n_out: int


def partition_file_stats(
    spark: SparkSession, table_path: str, partition_col: str
) -> dict[str | None, tuple[int, int]]:
    """``{raw_partition_value: (n_files, total_bytes)}``. Key None groups
    files at the table root (unpartitioned data).

    O(partitions) py4j round-trips, NOT O(files): one ``listStatus`` on
    the root plus one ``ContentSummary`` per partition directory (which
    the filesystem computes JVM-side and, on HDFS, namenode-side).
    Measured r10 on a 10,624-file table: the per-file ``listFiles`` walk
    costs ~6 ms/file through py4j (65 s); this form plans the same
    table in under a second. ContentSummary counts what a Spark scan
    reads (hidden checksum/metadata files are excluded by the local
    ChecksumFileSystem, verified in tests) — with one remote-store
    caveat: on HDFS the summary is a raw inode walk, so a WRITE IN
    FLIGHT (``_temporary`` staging) inflates a partition's counts until
    it commits. Plan from the table's single writer (the streaming sink
    calls compaction after its own write completes) or quiesce writers;
    a transiently inflated plan costs a redundant rewrite, never
    correctness (the rewrite reads committed data only)."""
    jvm = spark._jvm
    root = jvm.org.apache.hadoop.fs.Path(table_path)
    fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(root):
        return {}
    head = f"{partition_col}="
    stats: dict[str | None, tuple[int, int]] = {}
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if name.startswith(("_", ".")):
            continue
        if st.isDirectory() and name.startswith(head):
            cs = fs.getContentSummary(st.getPath())
            n, b = int(cs.getFileCount()), int(cs.getLength())
            if n:
                stats[name[len(head):]] = (n, b)
        elif st.isFile():
            n, b = stats.get(None, (0, 0))
            stats[None] = (n + 1, b + int(st.getLen()))
    return stats


def compaction_plan(
    spark: SparkSession,
    table_path: str,
    partition_col: str,
    target_bytes: int = 128 << 20,
    min_files: int = 2,
    max_partitions: int = 128,
) -> list[PartitionPlan]:
    """Victim partitions, worst-fragmented first: a partition is a victim
    iff its file count exceeds BOTH ``ceil(bytes/target)`` (what its data
    justifies) and ``min_files - 1``. ``max_partitions`` bounds one run's
    rewrite (and the plan-expression size in ``compact_partitions``);
    re-run to drain a larger backlog — the criterion is self-stabilizing
    so already-compacted partitions never re-enter the plan."""
    if target_bytes <= 0:
        raise ValueError(f"target_bytes must be positive: {target_bytes}")
    victims = []
    for raw, (n_files, total) in partition_file_stats(
        spark, table_path, partition_col
    ).items():
        n_out = max(1, math.ceil(total / target_bytes))
        if n_files >= min_files and n_files > n_out:
            value = (
                None
                if raw is None or raw == HIVE_DEFAULT_PARTITION
                else urllib.parse.unquote(raw)
            )
            victims.append(
                PartitionPlan(raw, value, n_files, total, n_out)
            )
    victims.sort(key=lambda p: (-(p.n_files - p.n_out), str(p.raw_value)))
    return victims[:max_partitions]


def compact_partitions(
    spark: SparkSession,
    table_path: str,
    partition_col: str,
    target_bytes: int = 128 << 20,
    min_files: int = 2,
    max_partitions: int = 128,
) -> dict:
    """Rewrite every victim partition of a hive-partitioned parquet table
    into ~``target_bytes`` files in ONE Spark job (module docstring has
    the full mechanics and crash contract). Returns a summary dict:
    ``{"partitions": N, "files_before": B, "files_after": A}`` —
    files_after is re-listed from disk, not inferred.

    The victim predicate matches partition values TYPED — the decoded
    dir string is normalized through the table's inferred partition
    dtype JVM-side (``lit(value).cast(dtype)``), the same inference the
    scan applies — so dirs that don't round-trip as strings (a
    zero-padded ``month=05`` read back as integer 5) still match their
    rows and partition-prune. Victims sharing one normalized value
    (``month=05`` + ``month=5`` — a table Spark already reads as ONE
    value) MERGE: the typed predicate reads every colliding dir, the
    rewrite lands in the canonical dir Spark writes for that value, and
    the stale non-canonical dirs' files are deleted afterward — so
    compaction HEALS the duplicate-encoding state instead of rewriting
    one dir and silently duplicating rows (and a crash between the
    overwrite and the cleanup is repaired by the re-run the same way).
    A dir value that does not cast to the inferred dtype is refused.
    Binary/float partition columns remain out of contract.

    Victim partitions whose parquet files hold ZERO rows cannot be
    rewritten by an overwrite (nothing to write) — their dead files are
    deleted directly instead, so the plan still converges; scan output
    is unchanged (the files contributed no rows), though an empty dir
    no longer advertises its partition value to directory listings.
    Unpartitioned tables are rejected — whole-table rewrites belong to
    ``io.sinks.compact_parquet``.
    """
    plans = compaction_plan(
        spark, table_path, partition_col, target_bytes, min_files,
        max_partitions,
    )
    if any(p.raw_value is None for p in plans):
        raise ValueError(
            f"{table_path} has data files outside {partition_col}= "
            "directories; use io.sinks.compact_parquet for "
            "unpartitioned locations"
        )
    if not plans:
        return {"partitions": 0, "files_before": 0, "files_after": 0}

    df = spark.read.parquet(table_path)
    if partition_col not in df.columns:
        raise ValueError(
            f"{partition_col!r} is not a column of {table_path}"
        )
    if "_gbin" in df.columns:
        raise ValueError("table must not contain reserved column '_gbin'")
    pcol_type = df.schema[partition_col].dataType

    # normalize every dir value in the TABLE (not just victims) through
    # the inferred partition dtype — one tiny driver-side job. Values
    # that don't round-trip as strings ('05' under an int column) still
    # compare typed; dirs collapsing to one typed value merge (module
    # docstring); an uncastable dir value is refused.
    all_stats = partition_file_stats(spark, table_path, partition_col)
    all_raw = [r for r in all_stats if r is not None]
    decoded = {
        r: (None if r == HIVE_DEFAULT_PARTITION else urllib.parse.unquote(r))
        for r in all_raw
    }
    norm: dict[str, tuple] = {}
    if any(v is not None for v in decoded.values()):
        norm_rows = [
            (r, v) for r, v in decoded.items() if v is not None
        ]
        norm_df = spark.createDataFrame(
            norm_rows, "raw string, dec string"
        ).select(
            "raw",
            F.col("dec").cast(pcol_type).alias("typed"),
            F.col("dec").cast(pcol_type).cast("string").alias("norm"),
        )
        norm = {r.raw: (r.typed, r.norm) for r in norm_df.collect()}
    for r, v in decoded.items():
        if v is not None and norm[r][0] is None:
            raise ValueError(
                f"partition dir value {r!r} does not cast to the "
                f"inferred {partition_col} type {pcol_type.simpleString()}"
            )

    def _key(raw: str | None) -> str | None:
        """Normalized partition value (None = NULL partition)."""
        if raw is None or raw == HIVE_DEFAULT_PARTITION:
            return None
        return norm[raw][1]

    # merge victims by normalized value: the typed predicate reads every
    # colliding dir of the value, so sizes and n_out must pool too
    merged: dict[str | None, dict] = {}
    victim_keys = {_key(p.raw_value) for p in plans}
    for raw, (n_f, n_b) in all_stats.items():
        if raw is None:
            continue  # non-victim files at the table root: not ours
        key = _key(raw)
        if key not in victim_keys:
            continue
        m = merged.setdefault(
            key, {"raws": [], "files": 0, "bytes": 0}
        )
        m["raws"].append(raw)
        m["files"] += n_f
        m["bytes"] += n_b
    for m in merged.values():
        m["n_out"] = max(1, math.ceil(m["bytes"] / target_bytes))
    files_before = sum(m["files"] for m in merged.values())

    # victim predicate + per-value dense bin ranges, both as chained
    # expressions over the (bounded) plan — no join, the probe stays on
    # the partition column so the scan reads ONLY victim partitions
    pcol = F.col(partition_col)
    pred = None
    offset_expr = None
    n_out_expr = None
    offset = 0
    for key, m in merged.items():
        typed = None if key is None else norm[m["raws"][0]][0]
        cond = (
            pcol.isNull()
            if key is None
            else pcol == F.lit(typed).cast(pcol_type)
        )
        pred = cond if pred is None else pred | cond
        w_off = F.when(cond, F.lit(offset))
        w_n = F.when(cond, F.lit(m["n_out"]))
        offset_expr = w_off if offset_expr is None else offset_expr.when(
            cond, F.lit(offset)
        )
        n_out_expr = w_n if n_out_expr is None else n_out_expr.when(
            cond, F.lit(m["n_out"])
        )
        offset += m["n_out"]
    total_bins = offset

    data_cols = [c for c in df.columns if c != partition_col]
    if not data_cols:
        # Spark cannot even WRITE such a table
        # (ALL_PARTITION_COLUMNS_NOT_ALLOWED), so the overwrite below
        # would fail obscurely; reject up front instead of erroring
        # inside xxhash64()
        raise ValueError(
            f"{table_path} has no columns besides {partition_col!r}; "
            "Spark cannot rewrite an all-partition-column table"
        )
    row_hash = F.pmod(
        F.xxhash64(*[F.col(c) for c in data_cols]), n_out_expr
    )
    gbin = (offset_expr + row_hash).alias("_gbin")
    victims = df.filter(pred).select(*df.columns, gbin)
    binned = (
        victims.repartitionByRange(max(1, total_bins), F.col("_gbin"))
        .drop("_gbin")
        .localCheckpoint(eager=True)
    )
    present = {
        r.v
        for r in binned.select(
            pcol.cast("string").alias("v")
        ).distinct().collect()
    }
    if present:
        (
            binned.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(partition_col)
            .parquet(table_path)
        )

    # post-write cleanup, two dead-file classes (module docstring):
    # zero-row victims the overwrite could not touch, and stale
    # non-canonical dirs whose rows were rewritten under the normalized
    # value. "Stale" is judged on DECODED values (decoded != key), never
    # on dir-name spelling: a hive-ESCAPED dir of an unchanged value is
    # the canonical dir itself and must not be purged.
    jvm = spark._jvm
    fs = jvm.org.apache.hadoop.fs.Path(table_path).getFileSystem(
        spark._jsc.hadoopConfiguration()
    )

    def _purge(raw_dir: str) -> None:
        d = jvm.org.apache.hadoop.fs.Path(
            table_path, f"{partition_col}={raw_dir}"
        )
        if not fs.exists(d):
            return
        for st in fs.listStatus(d):
            if st.isFile():
                fs.delete(st.getPath(), False)

    for key, m in merged.items():
        rewritten = key in present
        for raw in m["raws"]:
            if not rewritten:
                _purge(raw)  # zero-row victim: files are dead weight
            elif key is not None and decoded[raw] != key:
                _purge(raw)  # value normalized away from this spelling

    def _canonical_raw(key: str | None, m: dict) -> str:
        if key is None:
            return HIVE_DEFAULT_PARTITION
        for raw in m["raws"]:
            if decoded[raw] == key:
                return raw
        return key

    after = partition_file_stats(spark, table_path, partition_col)
    files_after = sum(
        after.get(_canonical_raw(key, m), (0, 0))[0]
        for key, m in merged.items()
    )
    return {
        "partitions": len(merged),
        "files_before": files_before,
        "files_after": files_after,
    }
