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


CORRUPT_COL = "_corrupt_record"


def read_with_quarantine(
    spark: SparkSession,
    path: str,
    fmt: str,
    schema: T.StructType | str,
    **options: str,
) -> tuple[DataFrame, DataFrame]:
    """PERMISSIVE CSV/JSON ingest split into (clean, quarantine).

    At pipeline scale malformed rows are a WHEN, not an IF, and the two
    easy modes are both wrong: FAILFAST turns one bad row into a dead
    load; DROPMALFORMED silently loses data (and Spark drops rows with
    no record of how many). PERMISSIVE + ``columnNameOfCorruptRecord``
    keeps the raw text of every unparseable row; this helper returns the
    parsed rows (corrupt column stripped) and the quarantine frame — the
    PARTIALLY-parsed row (fields that did decode survive, a type-error
    row keeps its good columns) plus the raw line as ``raw_record`` —
    for a dead-letter sink.

    Both frames are lazy projections of ONE read — Catalyst shares the
    scan if both are consumed in one job, and at 100 TB the quarantine
    filter pushes nothing extra (same scan, opposite null test).

    Implementation is a plain TEXT scan + ``from_json``/``from_csv``
    expressions rather than the format reader's own corrupt-column
    capture: the scan-level corrupt column carries a Spark restriction
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN — even
    ``clean.count()`` trips it, because the count references only the
    filter's corrupt column against the raw scan) that every downstream
    consumer would have to know about. Expression-level parsing has no
    such restriction, keeps the raw line for free, and is the same
    one-pass scan. CSV quarantine reads are HEADERLESS by contract —
    large-scale CSV shards are headerless by convention, and a header
    line is indistinguishable from a malformed row at expression level.
    """
    return split_quarantine(spark.read.text(path), fmt, schema, **options)


def split_quarantine(
    raw: DataFrame,
    fmt: str,
    schema: T.StructType | str,
    **options: str,
) -> tuple[DataFrame, DataFrame]:
    """The (clean, quarantine) split as pure expressions over any frame
    with a ``value: string`` column — BATCH OR STREAMING. Because the
    split is ``from_json``/``from_csv`` + complementary filters (no
    scan-level corrupt column, no action), the identical code path runs
    under ``spark.read.text`` (see ``read_with_quarantine``) and
    ``spark.readStream.text``/Kafka ``value`` frames; streaming ingest
    composes this with the exactly-once MERGE sink for clean rows and
    the partition-per-batch parquet sink for the dead letter
    (tests/test_stream_merge.py::test_streaming_ingest_pipeline...).
    """
    if fmt not in ("csv", "json"):
        raise ValueError("quarantine reads support csv/json only")
    declared = (
        T._parse_datatype_string(schema) if isinstance(schema, str) else schema
    )
    if CORRUPT_COL in declared.fieldNames():
        raise ValueError(f"schema must not declare {CORRUPT_COL!r}")
    with_corrupt = T.StructType(
        declared.fields + [T.StructField(CORRUPT_COL, T.StringType(), True)]
    )
    from pyspark.sql import functions as F

    parse_opts = {
        "mode": "PERMISSIVE",
        "columnNameOfCorruptRecord": CORRUPT_COL,
        **options,
    }
    if fmt == "json":
        rec = F.from_json(F.col("value"), with_corrupt, parse_opts)
    else:
        rec = F.from_csv(
            F.col("value"), with_corrupt.simpleString(), parse_opts
        )
    parsed = raw.select(F.col("value"), rec.alias("_rec"))
    # A blank/whitespace-only line is DIRTY, not an all-NULL clean row:
    # from_json turns it into a NULL struct (whose corrupt field reads as
    # NULL — a corrupt-only test would wave it into clean as a phantom
    # row), while from_csv turns it into a NON-null all-NULL struct with
    # corrupt unset — two different phantom shapes, both wrong. Clean
    # therefore requires a non-blank raw line AND a non-null parsed struct
    # AND no corrupt capture; quarantine is the exact complement, so row
    # conservation (clean + quarantine == input lines) holds by
    # construction. (Spark's own CSV reader silently *drops* blank lines;
    # the dead-letter contract preserves them with their raw text.)
    # rlike(\S), not trim() != '': F.trim strips only ASCII space, so a
    # tab- or CR-only line would slip past a trim-based blank check (in
    # the CSV single-string-column case it would then parse as a "clean"
    # row) — whitespace-ONLY means no non-whitespace character at all.
    # coalesce(..., False): a NULL value row (a Kafka tombstone on the
    # `value` frames this function advertises) makes rlike NULL, and a
    # NULL predicate fails BOTH filters — the row would vanish from
    # clean AND quarantine, breaking conservation. NULL input is dirty.
    is_clean = (
        F.coalesce(F.col("value").rlike(r"\S"), F.lit(False))
        & F.col("_rec").isNotNull()
        & F.col(f"_rec.{CORRUPT_COL}").isNull()
    )
    clean = parsed.filter(is_clean).select("_rec.*").drop(CORRUPT_COL)
    # the PARTIALLY-parsed fields survive alongside the raw line: a
    # type-error row keeps its good columns in the dead-letter record
    # (a NULL-struct row keeps only raw_record — all fields NULL)
    quarantine = (
        parsed.filter(~is_clean)
        .select(F.col("value").alias("raw_record"), F.col("_rec.*"))
        .drop(CORRUPT_COL)
    )
    return clean, quarantine


def read_merged_schema(
    spark: SparkSession, path: str, fmt: str = "parquet", **options: str
) -> DataFrame:
    """Schema-evolution read-back: union the schemas of every file under
    ``path`` (``mergeSchema``), NULL-backfilling columns that older
    partitions predate — the read side of a fact table that gained a
    column mid-history. Parquet/ORC only (self-describing footers).

    100 TB note: schema merging reads every file FOOTER up front (not the
    data); on very wide histories pin the expected schema explicitly and
    skip the merge pass instead.
    """
    if fmt not in ("parquet", "orc"):
        raise ValueError("mergeSchema applies to parquet/orc")
    return (
        spark.read.format(fmt)
        .option("mergeSchema", "true")
        .options(**options)
        .load(path)
    )


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
