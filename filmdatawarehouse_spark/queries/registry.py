"""Single registry of every (query, oracle) pair the engine declares.

Aggregates the parity queries (reference SURVEY.md §2 surface) and the
extended large-scale pipeline queries (dedup / similarity / text analysis /
windows) into one dict for the driver contract (``__spark_entry__``), tests,
and the bench harness.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]
Entry = tuple[QueryFn, str | None]  # (spark builder, duckdb oracle sql or None)


def all_queries() -> dict[str, Entry]:
    from filmdatawarehouse_spark.queries.parity import PARITY_QUERIES

    registry: dict[str, Entry] = dict(PARITY_QUERIES)

    try:
        from filmdatawarehouse_spark.queries.extended import EXTENDED_QUERIES

        registry.update(EXTENDED_QUERIES)
    except ImportError:
        pass

    try:
        from filmdatawarehouse_spark.queries.relational import RELATIONAL_QUERIES

        registry.update(RELATIONAL_QUERIES)
    except ImportError:
        pass

    try:
        from filmdatawarehouse_spark.queries.pipeline import (
            curate_documents,
            curate_documents_oracle,
        )

        registry["pipeline_curate_documents"] = (
            curate_documents,
            curate_documents_oracle(),
        )
    except ImportError:
        pass
    return registry
