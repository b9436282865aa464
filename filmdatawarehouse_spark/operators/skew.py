"""Skew-aware join utility: key salting.

AQE's skew-join handling (on by default in ``session.get_spark``) splits
oversized SORT-MERGE partitions at runtime, but it cannot help when a single
hot key must aggregate or when the join is already shuffle-hash. Salting is
the explicit fix: split each hot left-side key into ``salt_factor`` synthetic
sub-keys and replicate the (small) right side across all salts — turning one
straggler task into ``salt_factor`` parallel ones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _row_salt(df: DataFrame, salt_factor: int):
    """Deterministic per-row salt: hash of the whole row, mod salt_factor.
    Unlike ``F.rand`` this is stable under task retries and between runs —
    a recomputed partition salts identically, so speculative/retried tasks
    can never double- or mis-place rows."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt_factor)).cast(
        "int"
    )


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    salt_factor: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join a skewed large frame to a small frame on ``on``.

    The large side gets a deterministic row-hash salt; the small side is
    exploded ``salt_factor``× — acceptable because it is small. Output
    columns = large ∪ small minus the duplicate key.

    Only ``inner`` and ``left`` joins are supported: in a right/full-outer
    join every unmatched small-side key would surface once PER EXPLODED
    SALT (salt_factor duplicate rows), which is silently wrong — rejected
    rather than deduplicated.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports inner/left only (got {how!r}): unmatched "
            "small-side keys would appear salt_factor times in outer results"
        )
    salted_large = large.withColumn("_salt", _row_salt(large, salt_factor))
    salted_small = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_factor)]))
    )
    return (
        salted_large.join(salted_small, [on, "_salt"], how)
        .drop("_salt")
    )


def salted_group_count(df: DataFrame, key: str, salt_factor: int = 16) -> DataFrame:
    """Two-stage count for a skewed grouping key: pre-aggregate on
    (key, salt), then final-aggregate on key. The hot key's rows spread over
    ``salt_factor`` map-side partial counts instead of one reducer."""
    return (
        df.withColumn("_salt", _row_salt(df, salt_factor))
        .groupBy(key, "_salt")
        .agg(F.count(F.lit(1)).alias("_partial"))
        .groupBy(key)
        .agg(F.sum("_partial").cast("bigint").alias("count"))
    )
