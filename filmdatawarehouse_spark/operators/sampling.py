"""Deterministic sampling / dataset splitting.

Training pipelines need splits that are STABLE: re-running over a grown
corpus must keep yesterday's train doc in train (no RNG, no dependence on
row order or partitioning). The standard answer is hash-based assignment —
a pure function of a key — rather than ``df.sample``/``sampleBy`` (seeded
Bernoulli over partition order, which reshuffles membership whenever the
data layout changes).

The hash is the repo's portable md5-derived 32-bit integer, so the SQL
oracle replays assignments exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SPLIT_BUCKETS = 10_000


def hash_bucket(key: Column, salt: str = "split") -> Column:
    """Deterministic bucket in [0, SPLIT_BUCKETS): md5 of salt:key → first
    8 hex chars → int → mod. Independent of row order, partitioning, and
    Spark version; identical in any engine with md5."""
    h = F.conv(
        F.substring(F.md5(F.concat_ws(":", F.lit(salt), key.cast("string"))), 1, 8),
        16,
        10,
    ).cast("bigint")
    return F.pmod(h, F.lit(SPLIT_BUCKETS))


def hash_split(
    df: DataFrame,
    key: str,
    fractions: dict[str, float] | None = None,
    salt: str = "split",
) -> DataFrame:
    """Attach a ``split`` label by hashed key. ``fractions`` maps label →
    fraction (must sum to ≤ 1; any remainder goes to the last label).
    Assignment is per-key, so duplicate keys land in the same split —
    train/test leakage through duplicated rows is structurally impossible
    at the key level.
    """
    fractions = fractions or {"train": 0.8, "val": 0.1, "test": 0.1}
    bucket = hash_bucket(F.col(key), salt)
    expr = None
    cum = 0.0
    labels = list(fractions.items())
    for name, frac in labels[:-1]:
        cum += frac
        cond = bucket < F.lit(int(round(cum * SPLIT_BUCKETS)))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = labels[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return df.withColumn("split", expr)
