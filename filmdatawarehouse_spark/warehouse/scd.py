"""Slowly-changing-dimension (SCD2) merge, emulated without a table format.

The reference has no update semantics at all — every load is a blind append
(`dags/rentalFilmDAG.py:39`), so re-runs duplicate and updates are
impossible. This gives the engine the standard warehouse answer: SCD type 2
(row versioning with validity ranges) implemented as pure DataFrame algebra
(anti-join + union + window), the MERGE-INTO emulation for plain parquet.
With Delta/Iceberg on the classpath the same call maps to a native MERGE.

Contract: dimension rows carry (key, attributes..., valid_from TIMESTAMP,
valid_to TIMESTAMP nullable, is_current BOOLEAN). ``scd2_apply`` takes the
current dimension state and a batch of incoming snapshots (key, attributes,
effective_ts) and returns the new state:

- unchanged rows pass through;
- changed attributes close the current version (valid_to = effective_ts,
  is_current = false) and open a new one;
- brand-new keys open their first version.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key: str,
    attrs: list[str],
    effective_ts: str = "effective_ts",
) -> DataFrame:
    """Return the new SCD2 dimension state after applying ``updates``.

    ``dim`` columns: key, *attrs, valid_from, valid_to, is_current.
    ``updates`` columns: key, *attrs, effective_ts (one row per key — apply
    batches in event order; for multi-row batches pre-reduce to the latest).
    All logic is joins/unions — a single shuffle on the key, no windows over
    the full history.
    """
    current = dim.filter(F.col("is_current"))
    history = dim.filter(~F.col("is_current"))

    attr_neq = None
    for a in attrs:
        ne = ~F.col(f"cur.{a}").eqNullSafe(F.col(f"upd.{a}"))
        attr_neq = ne if attr_neq is None else (attr_neq | ne)

    joined = current.alias("cur").join(
        updates.alias("upd"), F.col(f"cur.{key}") == F.col(f"upd.{key}"), "full_outer"
    )

    # 1. current rows with no update, or with an identical snapshot → keep
    unchanged = joined.filter(
        F.col(f"upd.{key}").isNull()
        | (F.col(f"cur.{key}").isNotNull() & ~attr_neq)
    ).select("cur.*")

    # 2. current rows whose attributes changed → close the version
    closed = (
        joined.filter(
            F.col(f"cur.{key}").isNotNull()
            & F.col(f"upd.{key}").isNotNull()
            & attr_neq
        )
        .select(
            "cur.*",
            F.col(f"upd.{effective_ts}").alias("_close_ts"),
        )
        .withColumn("valid_to", F.col("_close_ts"))
        .withColumn("is_current", F.lit(False))
        .drop("_close_ts")
    )

    # 3. changed keys + brand-new keys → open a new current version
    opened = (
        joined.filter(
            F.col(f"upd.{key}").isNotNull()
            & (F.col(f"cur.{key}").isNull() | attr_neq)
        )
        .select(
            F.col(f"upd.{key}").alias(key),
            *[F.col(f"upd.{a}").alias(a) for a in attrs],
            F.col(f"upd.{effective_ts}").alias("valid_from"),
        )
        .withColumn("valid_to", F.lit(None).cast("timestamp"))
        .withColumn("is_current", F.lit(True))
    )

    cols = [key, *attrs, "valid_from", "valid_to", "is_current"]
    return (
        history.select(*cols)
        .unionByName(unchanged.select(*cols))
        .unionByName(closed.select(*cols))
        .unionByName(opened.select(*cols))
    )


def scd2_initial(updates: DataFrame, key: str, attrs: list[str],
                 effective_ts: str = "effective_ts") -> DataFrame:
    """Bootstrap an SCD2 dimension from a first snapshot batch."""
    return (
        updates.select(
            F.col(key),
            *[F.col(a) for a in attrs],
            F.col(effective_ts).alias("valid_from"),
        )
        .withColumn("valid_to", F.lit(None).cast("timestamp"))
        .withColumn("is_current", F.lit(True))
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str | list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Change-data capture between two full snapshots: (key..., change_type)
    with change_type ∈ {'insert', 'delete', 'update'} — the diff a
    warehouse computes to turn snapshot dumps into an incremental feed
    (unchanged keys are omitted). ``key`` may be a composite (list).

    One full-outer join on the key(s); change classification is pure
    column logic (null-side checks + attribute inequality), so the whole
    diff is a single shuffle at any scale. Null-safe comparison
    (`eqNullSafe`) treats NULL→value transitions as updates, not
    matches, and keeps composite keys with NULL parts joinable.
    """
    keys = [key] if isinstance(key, str) else list(key)
    if not compare_cols:
        raise ValueError(
            "compare_cols must name at least one non-key column "
            "(an empty list would classify nothing as changed)"
        )
    o = old.select(
        F.lit(True).alias("_in_old"),
        *[F.col(k).alias(f"_ko_{k}") for k in keys],
        *[F.col(c).alias(f"_o_{c}") for c in compare_cols],
    )
    n = new.select(
        F.lit(True).alias("_in_new"),
        *[F.col(k).alias(f"_kn_{k}") for k in keys],
        *[F.col(c).alias(f"_n_{c}") for c in compare_cols],
    )
    cond = None
    for k in keys:
        arm = o[f"_ko_{k}"].eqNullSafe(n[f"_kn_{k}"])
        cond = arm if cond is None else cond & arm
    joined = o.join(n, cond, "full_outer")
    changed = None
    for c in compare_cols:
        neq = ~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))
        changed = neq if changed is None else (changed | neq)
    # side presence is judged on a literal-TRUE marker, never on the key
    # values: a row whose (composite) key is entirely NULL is still a
    # PRESENT row, not an absent side
    return (
        joined.select(
            *[
                F.coalesce(F.col(f"_ko_{k}"), F.col(f"_kn_{k}")).alias(k)
                for k in keys
            ],
            F.when(F.col("_in_old").isNull(), F.lit("insert"))
            .when(F.col("_in_new").isNull(), F.lit("delete"))
            .when(changed, F.lit("update"))
            .alias("change_type"),
        )
        .filter(F.col("change_type").isNotNull())
    )


def merge_aggregate_delta(
    snapshot: DataFrame,
    delta: DataFrame,
    keys: list[str],
    sum_cols: list[str],
    count_col: str | None = None,
) -> DataFrame:
    """Incremental aggregate maintenance: fold a (pre-aggregated) delta
    into an existing aggregate snapshot WITHOUT recomputing from the base
    fact — union the two aggregates and re-sum per key. Counts and sums
    are distributive, so the result is exactly the aggregate of
    base ∪ increment; at 100 TB this turns a daily full-table aggregate
    into work proportional to the increment (the snapshot side is already
    one row per key).

    Both inputs must share (keys + sum_cols [+ count_col]) schemas — the
    caller aggregates the increment with the same expressions that built
    the snapshot.
    """
    cols = list(sum_cols) + ([count_col] if count_col else [])
    unioned = snapshot.select(*keys, *cols).unionByName(
        delta.select(*keys, *cols)
    )
    return unioned.groupBy(*keys).agg(
        *[F.sum(c).alias(c) for c in cols]
    )
