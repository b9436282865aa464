"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``filmdatawarehouse_spark``; this module only adapts
the engine's query registry to the driver's interface.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the top-10 query
    (join → group-sum → top-k), the reference's marquee analytics query
    (`filmETLs.ipynb:579-586`)."""
    from filmdatawarehouse_spark.queries.parity import q_top10

    return q_top10(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ extended)."""
    from filmdatawarehouse_spark.queries.registry import all_queries

    return {name: fn for name, (fn, _sql) in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for every hash-checkable query."""
    from filmdatawarehouse_spark.queries.registry import all_queries

    return {
        name: sql for name, (_fn, sql) in all_queries().items() if sql is not None
    }
