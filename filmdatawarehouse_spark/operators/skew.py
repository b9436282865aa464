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


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    salt_factor: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join a skewed large frame to a small frame on ``on``.

    The large side gets a random-but-bounded salt (deterministic per row via
    a hash of the whole row would also work; random is fine because the salt
    never leaves the join); the small side is exploded ``salt_factor``× —
    acceptable because it is small. Output columns = large ∪ small minus the
    duplicate key.
    """
    salted_large = large.withColumn(
        "_salt", (F.rand(seed=42) * salt_factor).cast("int")
    )
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
        df.withColumn("_salt", (F.rand(seed=42) * salt_factor).cast("int"))
        .groupBy(key, "_salt")
        .agg(F.count(F.lit(1)).alias("_partial"))
        .groupBy(key)
        .agg(F.sum("_partial").cast("bigint").alias("count"))
    )
