"""Oracle-checked query for incremental (delta-vs-corpus) dedup
(operators/dedup.py:incremental_dedup_flags).

The corpus/delta split is derived from doc_id so both engines replay it
exactly: corpus = doc_id % 7 != 0; delta = the % 7 == 0 docs (natural new
batch, some of which are near-duplicates of corpus docs) plus verbatim
COPIES of the % 11 == 3 corpus docs under shifted ids — guaranteeing the
exact-duplicate path fires regardless of corpus composition.

The oracle verifies near-dup flags by brute-force exact Jaccard over
delta × corpus (the same contract as dedup_minhash_lsh: LSH candidate
recall at threshold 0.8 with 32 perms / 2-row bands is ~1-1e-7 per pair,
so the exact-verify tail makes the engine answer exact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from filmdatawarehouse_spark.io.sources import read_table
from filmdatawarehouse_spark.operators import dedup as dd

DELTA_MOD = 7
COPY_MOD = 11
COPY_RESIDUE = 3
ID_SHIFT = 10_000_000
THRESHOLD = 0.8


def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    is_delta = F.pmod(F.col("doc_id"), F.lit(DELTA_MOD)) == 0
    corpus = docs.filter(~is_delta).select("doc_id", "text")
    injected = (
        docs.filter(
            (F.pmod(F.col("doc_id"), F.lit(COPY_MOD)) == COPY_RESIDUE) & ~is_delta
        )
        .select((F.col("doc_id") + F.lit(ID_SHIFT)).alias("doc_id"), "text")
    )
    delta = docs.filter(is_delta).select("doc_id", "text").unionAll(injected)
    # No n_corpus: the corpus is a FILTERED scan, so sizing it costs a full
    # pass over documents — at 100 TB an extra job per invocation for a
    # guard the census aggregation handles distributed anyway (VERDICT r03
    # item 6). n_corpus is for callers that KNOW a bound from ingest
    # metadata, never something to compute eagerly here.
    return dd.incremental_dedup_flags(corpus, delta, threshold=THRESHOLD)


def _shingles(src: str) -> str:
    return f"""
        SELECT doc_id, list_distinct(list_transform(
                 [s[i] || ' ' || s[i+1] || ' ' || s[i+2]
                  for i in range(1, len(s)-1)],
                 g -> ('0x' || substr(md5(g), 1, 8))::BIGINT
               )) AS shingles
        FROM (SELECT doc_id, string_split(text, ' ') AS s FROM {src})
    """


INCREMENTAL_ORACLE = f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents WHERE doc_id % {DELTA_MOD} <> 0
    ), delta AS (
      SELECT doc_id, text FROM documents WHERE doc_id % {DELTA_MOD} = 0
      UNION ALL
      SELECT doc_id + {ID_SHIFT} AS doc_id, text FROM documents
      WHERE doc_id % {COPY_MOD} = {COPY_RESIDUE}
        AND doc_id % {DELTA_MOD} <> 0
    ), shc AS ({_shingles("corpus")}), shd AS ({_shingles("delta")}),
    exact AS (
      SELECT DISTINCT d.doc_id FROM delta d
      JOIN corpus c ON d.text = c.text
    ), near AS (
      SELECT DISTINCT d.doc_id
      FROM shd d JOIN shc c
        ON len(d.shingles) > 0 AND len(c.shingles) > 0
       AND len(list_intersect(d.shingles, c.shingles))::DOUBLE
           / len(list_distinct(list_concat(d.shingles, c.shingles)))
           >= {THRESHOLD}
    )
    SELECT d.doc_id,
           (e.doc_id IS NOT NULL)::INT AS exact_dup,
           (n.doc_id IS NOT NULL)::INT AS near_dup,
           (e.doc_id IS NULL AND n.doc_id IS NULL)::INT AS accept
    FROM delta d
    LEFT JOIN exact e USING (doc_id)
    LEFT JOIN near n USING (doc_id)
"""

INCREMENTAL_QUERIES = {
    "dedup_incremental": (q_incremental_dedup, INCREMENTAL_ORACLE),
}


ROLLUP_SPLIT = "1998-06-01"


def q_incremental_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-aggregate maintenance: the daily orders
    rollup built as BASE (orders before the split date) merged with a
    DELTA batch (orders after it) must equal the full recompute — the
    correctness contract behind every incremental pipeline run
    (reference analog: the DAG's full re-reads per daily run are exactly
    what this replaces at scale; SURVEY §2.6/§2.9).

    Merge rule: full outer on the day key, counts and DECIMAL sums added
    with null→0 coalescing — the standard additive-measure MV merge.
    At 100 TB the base aggregate is a stored table and only the delta
    partition is scanned; here both derive from the same table so the
    oracle (full recompute) certifies merge ≡ recompute exactly.

    Scale shape: two map-side-combined aggregates (base days, delta
    days) + one day-keyed merge join of two dimension-sized frames.
    """
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderdate", "o_totalprice"
    )
    split = F.lit(ROLLUP_SPLIT)

    def rollup(df):
        return df.groupBy(F.to_date("o_orderdate").alias("day")).agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("total"),
        )

    # The base/delta predicates must PARTITION the rows: a bare
    # (< split) / (>= split) pair silently drops NULL dates from BOTH
    # sides (NULL fails both), while the full-recompute oracle would keep
    # them as a NULL day group — merge != recompute the day a NULL date
    # appears. Route NULLs explicitly into the delta (new/unknown data
    # belongs to the incoming batch), making the split provably total.
    base = rollup(o.filter(F.col("o_orderdate") < split))
    delta = rollup(
        o.filter(
            (F.col("o_orderdate") >= split) | F.col("o_orderdate").isNull()
        )
    )
    b = base.select(
        "day",
        F.col("n_orders").alias("n_b"),
        F.col("total").alias("t_b"),
    )
    d = delta.select(
        "day",
        F.col("n_orders").alias("n_d"),
        F.col("total").alias("t_d"),
    )
    zero = F.lit(0).cast("decimal(18,2)")
    return (
        b.join(d, "day", "full_outer")
        .select(
            "day",
            (
                F.coalesce(F.col("n_b"), F.lit(0))
                + F.coalesce(F.col("n_d"), F.lit(0))
            ).cast("bigint").alias("n_orders"),
            (
                F.coalesce(F.col("t_b"), zero) + F.coalesce(F.col("t_d"), zero)
            ).cast("double").alias("total_price"),
        )
    )


INCREMENTAL_ROLLUP_ORACLE = """
    SELECT CAST(o_orderdate AS DATE) AS day,
           COUNT(*)::BIGINT AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_price
    FROM orders GROUP BY 1
"""


UPSERT_MOD = 10
UPSERT_RESIDUE = 3
# insert keys are NEGATIVE mirrors of the update keys: -(k+1) is disjoint
# from every real o_orderkey (>= 0) at ANY scale factor — an additive
# shift (+1e9, the first cut) collides with real keys once o_orderkey
# exceeds the shift (TPC-H reaches 6M x SF), silently merging a real
# order with a synthetic insert and breaking the MERGE contract


def q_orders_upsert_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO / last-write-wins upsert semantics without a mutable
    table format: a deterministic update batch (derived from orders so
    both engines replay it — keys % 10 == 3 get status 'U' and a 10%
    price bump; the same rows re-keyed to negative mirrors are brand-new
    inserts) is merged onto the base by key, updates winning over base rows, inserts
    (the same rows under negative mirror keys, disjoint from every real
    key at any SF) appearing once. Prices stay at DECIMAL scale 4 end to end — the
    10% bump is an EXACT scale-2 × scale-2 product; re-quantizing it to
    scale 2 would hit the engines' different rounding modes (Spark
    HALF_UP vs DuckDB HALF_EVEN on the .005 boundary — observed 158
    rows off by a cent before this was removed).

    Implementation is the scalable MERGE shape: union the two sides with
    a priority column and keep max_by(struct) per key — ONE shuffle with
    map-side combine, no join, no window (a row_number window would sort
    per key for the same result). The decimal bump is exact
    (price × 1.10 in DECIMAL), so the hash gate certifies both the
    survivorship rule and the update arithmetic.
    """
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    base = o.select(
        "o_orderkey",
        "o_orderstatus",
        F.col("o_totalprice").cast("decimal(28,4)").alias("price"),
        F.lit(0).alias("prio"),
    )
    upd_src = o.filter(
        F.pmod(F.col("o_orderkey"), F.lit(UPSERT_MOD)) == UPSERT_RESIDUE
    ).select(
        "o_orderkey",
        F.lit("U").alias("o_orderstatus"),
        (
            F.col("o_totalprice").cast("decimal(18,2)")
            * F.lit("1.10").cast("decimal(4,2)")
        ).cast("decimal(28,4)").alias("price"),
    )
    updates = upd_src.select("*", F.lit(1).alias("prio")).unionAll(
        upd_src.select(
            (-(F.col("o_orderkey") + F.lit(1))).alias("o_orderkey"),
            "o_orderstatus",
            "price",
            F.lit(1).alias("prio"),
        )
    )
    merged = (
        base.unionAll(updates)
        .groupBy("o_orderkey")
        .agg(
            F.max_by(
                F.struct("o_orderstatus", "price"), F.col("prio")
            ).alias("s")
        )
    )
    return merged.select(
        "o_orderkey",
        F.col("s.o_orderstatus").alias("o_orderstatus"),
        F.col("s.price").cast("double").alias("price"),
    )


UPSERT_ORACLE = f"""
    WITH upd AS (
      SELECT o_orderkey, 'U' AS o_orderstatus,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * CAST('1.10' AS DECIMAL(4,2))
                  AS DECIMAL(28,4)) AS price
      FROM orders WHERE o_orderkey % {UPSERT_MOD} = {UPSERT_RESIDUE}
    )
    SELECT o_orderkey,
           coalesce(u.o_orderstatus, b.o_orderstatus) AS o_orderstatus,
           CAST(coalesce(u.price, b.price) AS DOUBLE) AS price
    FROM (SELECT o_orderkey, o_orderstatus,
                 CAST(o_totalprice AS DECIMAL(28,4)) AS price
          FROM orders) b
    FULL OUTER JOIN upd u USING (o_orderkey)
    UNION ALL
    SELECT -(o_orderkey + 1), o_orderstatus,
           CAST(price AS DOUBLE)
    FROM upd
"""


INCREMENTAL_QUERIES["incremental_daily_rollup"] = (
    q_incremental_daily_rollup,
    INCREMENTAL_ROLLUP_ORACLE,
)
INCREMENTAL_QUERIES["orders_upsert_merge"] = (
    q_orders_upsert_merge,
    UPSERT_ORACLE,
)
