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
    reads (hidden checksum/metadata files are excluded by the
    filesystem, verified in tests)."""
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

    The victim predicate matches partition VALUES as strings
    (``cast(partition_col AS string) == decoded_dir_value``), which
    partition-prunes (driver-side metadata evaluation) and is exact for
    the string/int/date partition columns real tables use; binary or
    float partition columns (a bad idea regardless) are out of contract.
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
    files_before = sum(p.n_files for p in plans)
    if not plans:
        return {"partitions": 0, "files_before": 0, "files_after": 0}

    df = spark.read.parquet(table_path)
    if partition_col not in df.columns:
        raise ValueError(
            f"{partition_col!r} is not a column of {table_path}"
        )
    if "_gbin" in df.columns:
        raise ValueError("table must not contain reserved column '_gbin'")
    pcol_str = F.col(partition_col).cast("string")

    # victim predicate + per-partition dense bin ranges, both as chained
    # expressions over the (bounded) plan — no join, the probe stays on
    # the partition column so the scan reads ONLY victim partitions
    pred = None
    offset_expr = None
    n_out_expr = None
    offset = 0
    for p in plans:
        cond = (
            pcol_str.isNull() if p.value is None else pcol_str == p.value
        )
        pred = cond if pred is None else pred | cond
        w_off = F.when(cond, F.lit(offset))
        w_n = F.when(cond, F.lit(p.n_out))
        offset_expr = w_off if offset_expr is None else offset_expr.when(
            cond, F.lit(offset)
        )
        n_out_expr = w_n if n_out_expr is None else n_out_expr.when(
            cond, F.lit(p.n_out)
        )
        offset += p.n_out
    total_bins = offset

    data_cols = [c for c in df.columns if c != partition_col]
    gbin = (
        offset_expr
        + F.pmod(F.xxhash64(*[F.col(c) for c in data_cols]), n_out_expr)
    ).alias("_gbin")
    victims = df.filter(pred).select(*df.columns, gbin)
    binned = (
        victims.repartitionByRange(max(1, total_bins), F.col("_gbin"))
        .drop("_gbin")
        .localCheckpoint(eager=True)
    )
    (
        binned.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(table_path)
    )
    after = partition_file_stats(spark, table_path, partition_col)
    files_after = sum(
        after.get(p.raw_value, (0, 0))[0] for p in plans
    )
    return {
        "partitions": len(plans),
        "files_before": files_before,
        "files_after": files_after,
    }
