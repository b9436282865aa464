"""Data-quality expectation checks: declarative constraints evaluated as a
violation report — the dbt-test / Great-Expectations shape, run inside the
engine.

Reference analog: none — the reference DAG loads facts with no constraint
checking at all (`dags/rentalFilmDAG.py:39` appends blind); SURVEY.md §2.10
only counts dropped rows. A 100 TB warehouse needs loud, cheap invariant
checks between load and publish.

Scale shape: every check is one aggregation or one broadcast/shuffle
anti-join over the constrained table; the report is O(#checks) rows. No
check ever materializes violating ROWS by default (counts only) — at
100 TB the violation set itself can be huge; use the returned counts to
decide whether to pay for samples.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _report(name: str, violations: Column) -> list[Column]:
    return [
        F.lit(name).alias("check_name"),
        violations.cast("bigint").alias("n_violations"),
        (violations == 0).cast("int").alias("passed"),
    ]


def check_unique(df: DataFrame, cols: list[str], name: str) -> DataFrame:
    """Violations = rows beyond the first per key (0 when the key is
    unique). One map-side-combinable aggregation."""
    dup = df.groupBy(*cols).agg(F.count(F.lit(1)).alias("_n")).filter(
        F.col("_n") > 1
    )
    extra = dup.agg(
        F.coalesce(F.sum(F.col("_n") - 1), F.lit(0)).alias("_v")
    ).select(*_report(name, F.col("_v")))
    return extra


def check_not_null(df: DataFrame, col: str, name: str) -> DataFrame:
    return df.agg(
        F.count(F.when(F.col(col).isNull(), 1)).alias("_v")
    ).select(*_report(name, F.col("_v")))


def check_range(
    df: DataFrame, predicate: Column, name: str
) -> DataFrame:
    """Violations = rows where ``predicate`` is FALSE or NULL (a null
    check result is a violation — unknown is not a pass)."""
    return df.agg(
        F.count(F.when(~F.coalesce(predicate, F.lit(False)), 1)).alias("_v")
    ).select(*_report(name, F.col("_v")))


def check_foreign_key(
    child: DataFrame,
    child_col: str,
    parent: DataFrame,
    parent_col: str,
    name: str,
) -> DataFrame:
    """Violations = child rows whose key has no parent (anti-join; Spark
    broadcasts the parent key set when it fits, else shuffles on the key).
    Null child keys are NOT violations here — pair with check_not_null
    when the FK is mandatory."""
    orphans = child.select(F.col(child_col).alias("_k")).filter(
        F.col("_k").isNotNull()
    ).join(
        parent.select(F.col(parent_col).alias("_k")).distinct(),
        "_k",
        "left_anti",
    )
    return orphans.agg(F.count(F.lit(1)).alias("_v")).select(
        *_report(name, F.col("_v"))
    )


def check_accepted_values(
    df: DataFrame, col: str, allowed: list, name: str
) -> DataFrame:
    """Violations = rows whose value is outside the ``allowed`` set (NULL
    counts as a violation — pair with check_not_null to distinguish).
    The allowed set is a literal in the plan (dbt's accepted_values):
    an O(|allowed|) isin filter at scan speed, no join."""
    ok = F.col(col).isin(list(allowed))
    return df.agg(
        F.count(F.when(~F.coalesce(ok, F.lit(False)), 1)).alias("_v")
    ).select(*_report(name, F.col("_v")))


def check_freshness(
    df: DataFrame, ts_col: str, max_age_seconds: int, now: str, name: str
) -> DataFrame:
    """Violation (0 or 1) = the table's MAX event time is older than
    ``max_age_seconds`` before ``now`` — the is-my-feed-stale check.
    ``now`` is an explicit ISO timestamp, not current_timestamp(): a
    nondeterministic clock in the plan would break retries, caching, and
    any cross-engine certification. One max aggregation."""
    stale = (
        F.unix_seconds(F.lit(now).cast("timestamp"))
        - F.unix_seconds(F.max(F.col(ts_col)))
    ) > max_age_seconds
    # an EMPTY table has no freshness at all -> violation
    return df.agg(
        F.when(F.coalesce(stale, F.lit(True)), 1).otherwise(0).alias("_v")
    ).select(*_report(name, F.col("_v")))


def run_checks(checks: list[DataFrame]) -> DataFrame:
    """Union the one-row reports into (check_name, n_violations, passed)."""
    if not checks:
        raise ValueError("no checks given")
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out
