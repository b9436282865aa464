"""Declared schemas for every table the engine touches.

The reference has *no* schema declarations anywhere — schemas exist only as the
column list of each ``SELECT`` string plus pandas dtype inference
(`dags/rentalFilmDAG.py:36,43,50,69,76,77,88`), which silently coerces MySQL
DECIMAL to float64. We declare every schema once, explicitly, so dtype drift is
impossible and streaming sources (which require a schema) share the same
definitions.

Two families:

1. the Sakila-shaped operational + warehouse star schema the reference defines
   (`SURVEY.md §1.1`, FIXTURES.md §1/§3), used by the warehouse job builders
   and their unit tests;
2. the driver's synthetic TPC-H-style test corpus (`/root/testdata/sf*`,
   TESTDATA.md) that the correctness/bench harness runs on.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# 1. Sakila-shaped operational sources (reference SELECT projections)
# ---------------------------------------------------------------------------

STAFF = T.StructType(
    [
        T.StructField("staff_id", T.IntegerType()),
        T.StructField("first_name", T.StringType()),
        T.StructField("last_name", T.StringType()),
        T.StructField("store_id", T.IntegerType()),
    ]
)

FILM = T.StructType(
    [
        T.StructField("film_id", T.IntegerType()),
        T.StructField("title", T.StringType()),
        T.StructField("release_year", T.IntegerType()),
        T.StructField("language_id", T.IntegerType()),
    ]
)

STORE = T.StructType(
    [
        T.StructField("store_id", T.IntegerType()),
        T.StructField("manager_staff_id", T.IntegerType()),
        T.StructField("address_id", T.IntegerType()),
    ]
)

RENTAL = T.StructType(
    [
        T.StructField("rental_id", T.IntegerType()),
        T.StructField("rental_date", T.TimestampType()),
        T.StructField("inventory_id", T.IntegerType()),
        T.StructField("customer_id", T.IntegerType()),
    ]
)

INVENTORY = T.StructType(
    [
        T.StructField("inventory_id", T.IntegerType()),
        T.StructField("film_id", T.IntegerType()),
        T.StructField("store_id", T.IntegerType()),
    ]
)

PAYMENT = T.StructType(
    [
        T.StructField("payment_id", T.IntegerType()),
        T.StructField("staff_id", T.IntegerType()),
        T.StructField("rental_id", T.IntegerType()),
        T.StructField("payment_date", T.TimestampType()),
        T.StructField("amount", T.DecimalType(10, 2)),
    ]
)

# Warehouse outputs (FIXTURES.md §3). fact tables carry int date keys:
# date_id = YYYYMMDD (`dags/rentalFilmDAG.py:80`), month key = YYYYMM01
# (`dags/rentalFilmDAG.py:92`).

DIM_DATE = T.StructType(
    [
        T.StructField("date_id", T.IntegerType()),
        T.StructField("full_date", T.TimestampType()),
        T.StructField("month", T.IntegerType()),
        T.StructField("year", T.IntegerType()),
    ]
)

FACT_DAILY_INVENTORY = T.StructType(
    [
        T.StructField("date_id", T.IntegerType()),
        T.StructField("film_id", T.IntegerType()),
        T.StructField("store_id", T.IntegerType()),
        T.StructField("inventory_count", T.LongType()),
    ]
)

FACT_MONTHLY_PAYMENT = T.StructType(
    [
        T.StructField("staff_id", T.IntegerType()),
        T.StructField("rental_id", T.IntegerType()),
        T.StructField("date_id", T.IntegerType()),
        T.StructField("monthly_payment_total", T.DecimalType(18, 2)),
    ]
)

# ---------------------------------------------------------------------------
# 2. Driver test corpus (/root/testdata/sf*, TESTDATA.md)
# ---------------------------------------------------------------------------

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)

# Multimodal assets: opaque binary payload + typed metadata (SURVEY.md §7
# phase E / the extended pipeline surface). No testdata table ships binary
# columns, so the engine defines the schema and tests synthesize rows.
MEDIA_ASSETS = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("media_type", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ]
)
