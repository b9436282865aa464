"""Generic format-parameterized sources/sinks: parquet, ORC, CSV, JSON.

The reference reads exactly one connector (MySQL via SQLAlchemy,
`dags/rentalFilmDAG.py:18-20`); a standalone engine needs the standard file
formats. Schemas are always declared (never inferred — schema inference is a
full extra pass over the data and non-deterministic on messy input), which
also keeps CSV/JSON reads streaming-compatible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_READ_OPTIONS: dict[str, dict[str, str]] = {
    "csv": {"header": "true"},
    "json": {},
    "parquet": {},
    "orc": {},
}


def read_source(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: T.StructType | str | None = None,
    **options: str,
) -> DataFrame:
    """Read a table in any supported format with a declared schema.

    Parquet/ORC carry their own schema (pass one only to assert it); CSV and
    JSON REQUIRE one here — ``inferSchema`` is deliberately not exposed.
    """
    if fmt not in _READ_OPTIONS:
        raise ValueError(f"unsupported format {fmt!r}; use one of {sorted(_READ_OPTIONS)}")
    if fmt in ("csv", "json") and schema is None:
        raise ValueError(f"{fmt} reads require an explicit schema (no inference)")
    reader = spark.read.format(fmt)
    for k, v in {**_READ_OPTIONS[fmt], **options}.items():
        reader = reader.option(k, v)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def write_source(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    **options: str,
) -> None:
    """Write in any supported format; CSV gets headers by default."""
    if fmt not in _READ_OPTIONS:
        raise ValueError(f"unsupported format {fmt!r}; use one of {sorted(_READ_OPTIONS)}")
    writer = df.write.format(fmt).mode(mode)
    if fmt == "csv":
        writer = writer.option("header", "true")
    for k, v in options.items():
        writer = writer.option(k, v)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)
