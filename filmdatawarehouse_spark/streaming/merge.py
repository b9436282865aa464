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
to ``<table>/v-<batch_id>/`` and then atomically flips the ``_LATEST``
pointer file (write-temp + ``os.replace``). Every crash window converges
under replay:

- crash before the version dir commits -> pointer still names the old
  version; replay re-merges from it and overwrites the partial dir;
- crash after the pointer flip but before the checkpoint commit ->
  replay sees ``current_version == batch_id`` and is a no-op (this also
  sidesteps Spark's cannot-overwrite-a-path-being-read rule);
- duplicate rows can never appear: the table is keyed (one survivor per
  key by construction of the merge aggregate).

The merge itself is the scalable MERGE shape proven by
``queries/incremental.py:q_orders_upsert_merge``: union base + batch with
a priority, one ``groupBy(keys)`` with ``max_by(struct, ...)`` — ONE
shuffle with map-side combine, no join, no window sort.

100 TB note: the snapshot rewrite is O(table) per micro-batch, which is
the right cost ONLY for dimension-sized upsert targets — exactly the
shape the reference rewrites wholesale every DAG run
(``dags/rentalFilmDAG.py``, dims re-loaded per run). For fact-scale
streams use the partition-overwrite sink; at true lakehouse scale the
same ``merge_upsert_batch`` body targets a transactional format's MERGE
instead of the snapshot swap.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

POINTER = "_LATEST"


def _pointer_path(table_path: str) -> str:
    return os.path.join(table_path, POINTER)


def current_version(table_path: str) -> int | None:
    """The committed snapshot's batch id, or None before the first commit."""
    try:
        with open(_pointer_path(table_path)) as f:
            return int(f.read().strip())
    except (OSError, ValueError):
        return None


def read_merge_table(spark: SparkSession, table_path: str) -> DataFrame | None:
    """The current committed snapshot (None before the first batch)."""
    v = current_version(table_path)
    if v is None:
        return None
    return spark.read.parquet(os.path.join(table_path, f"v-{v}"))


def merged_frame(
    base: DataFrame | None,
    batch_df: DataFrame,
    keys: list[str],
    seq_col: str | None = None,
) -> DataFrame:
    """The MERGE plan: base ∪ batch with a priority column, ONE
    ``groupBy(keys)`` + ``max_by(struct, (seq, prio))`` — a single
    exchange with partial (map-side) aggregation, no join, no window
    sort (plan-pinned by tests/test_stream_merge.py). Survivorship is
    lexicographic (seq, prio): greatest ``seq_col`` wins, batch beats
    base on ties; without ``seq_col``, batch always beats base.
    Within-batch duplicates resolve in the same aggregate."""
    cols = batch_df.columns
    value_cols = [c for c in cols if c not in keys]
    prio = (
        F.struct(F.col(seq_col), F.col("_prio"))
        if seq_col
        else F.col("_prio")
    )
    src = batch_df.withColumn("_prio", F.lit(1))
    if base is not None:
        src = (
            base.select(*cols).withColumn("_prio", F.lit(0)).unionByName(src)
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
) -> None:
    """Idempotently MERGE one micro-batch into the snapshot table.

    Survivorship per key: with ``seq_col``, the row with the greatest
    sequence value wins (batch beats base on ties) — the final table is
    then independent of micro-batch arrival order, the CDC version-column
    contract. Without it, batch rows always beat base rows
    (last-write-wins by arrival). ``seq_col`` is stored in the table so
    later batches keep comparing against it.
    """
    spark = batch_df.sparkSession
    if current_version(table_path) == batch_id:
        return  # replay after the pointer flip: already merged, no-op
    base = read_merge_table(spark, table_path)
    merged = merged_frame(base, batch_df, keys, seq_col)

    vdir = os.path.join(table_path, f"v-{batch_id}")
    merged.write.mode("overwrite").parquet(vdir)
    tmp = _pointer_path(table_path) + f".tmp-{batch_id}"
    with open(tmp, "w") as f:
        f.write(str(batch_id))
    os.replace(tmp, _pointer_path(table_path))  # atomic commit
    # best-effort prune of superseded snapshots (a crash here just leaves
    # garbage for the next batch's prune — never corrupts the committed one)
    for d in os.listdir(table_path):
        if d.startswith("v-") and d != f"v-{batch_id}":
            shutil.rmtree(os.path.join(table_path, d), ignore_errors=True)


def write_stream_merge_upsert(
    df: DataFrame,
    table_path: str,
    keys: list[str],
    checkpoint_dir: str,
    seq_col: str | None = None,
):
    """Start the exactly-once MERGE sink for ``df`` (returns the started
    StreamingQuery; availableNow so a restart drains new input and stops)."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        merge_upsert_batch(batch_df, batch_id, table_path, keys, seq_col)

    return (
        df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
