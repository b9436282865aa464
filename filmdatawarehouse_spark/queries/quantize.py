"""Oracle-checked queries for scalar quantization (operators/quantize.py).

``embedding_quantize_codes`` pins the code assignment itself (per-vector
weighted code digest — integer arithmetic, so the hash match is exact);
``embedding_quantize_error`` is the certification row: reconstruction error
must sit under the analytic bucket-width bound, same pinned-ok contract as
sketch_accuracy / similarity_ann_recall.

The oracle recomputes EVERYTHING independently (per-dimension min/max
included) — the Spark side collects only the d-row stats frame (O(d)
driver data, the ANN-centroid contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from filmdatawarehouse_spark.io.sources import read_table
from filmdatawarehouse_spark.operators import quantize as qz


def _stats(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, list]:
    emb = read_table(spark, sf_dir, "embeddings")
    rows = qz.dimension_stats(emb).orderBy("pos").collect()
    return emb, [(r["mn"], r["mx"]) for r in rows]


def q_quantize_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector integer digest of the SQ8 codes: sum of (1-based dim
    index × code) + code min/max — pins every code value through exact
    integer arithmetic without emitting an array column."""
    emb, stats = _stats(spark, sf_dir)
    codes = qz.quantize_vectors(emb, stats)
    weighted = F.transform(
        F.col("codes"), lambda c, i: ((i + 1) * c).cast("bigint")
    )
    return codes.select(
        "vec_id",
        F.aggregate(
            weighted, F.lit(0).cast("bigint"), lambda acc, x: acc + x
        ).alias("code_sum"),
        F.array_min("codes").alias("code_min"),
        F.array_max("codes").alias("code_max"),
    )


def q_quantize_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Certification row: worst reconstruction error over every
    (vector, dimension) vs the bucket-width bound."""
    emb, stats = _stats(spark, sf_dir)
    return qz.reconstruction_report(emb, stats)


N = qz.N_LEVELS

_CODES_CTE = f"""
    flat AS (
      SELECT vec_id,
             unnest(embedding)::DOUBLE AS x,
             generate_subscripts(embedding, 1) AS i
      FROM embeddings
    ), dims AS (
      SELECT i, min(x) AS mn, max(x) AS mx FROM flat GROUP BY i
    ), codes AS (
      SELECT vec_id, i, x, mn, mx,
             CASE WHEN mx = mn THEN 0
                  ELSE LEAST({N - 1},
                             floor((x - mn) / (mx - mn) * {float(N)!r})::INT)
             END AS code
      FROM flat JOIN dims USING (i)
    )
"""

QUANTIZE_ORACLES = {
    "embedding_quantize_codes": f"""
        WITH {_CODES_CTE}
        SELECT vec_id,
               SUM(i * code)::BIGINT AS code_sum,
               MIN(code)::INT AS code_min,
               MAX(code)::INT AS code_max
        FROM codes GROUP BY vec_id
    """,
    "embedding_quantize_error": f"""
        WITH {_CODES_CTE}, err AS (
          SELECT vec_id,
                 MAX(abs(x - (mn + (code::DOUBLE + 0.5) * (mx - mn)
                              / {float(N)!r}))) AS vec_err
          FROM codes GROUP BY vec_id
        ), bound AS (
          SELECT max(mx - mn) / {2.0 * N!r} AS b FROM dims
        )
        SELECT COUNT(*)::BIGINT AS n_vecs,
               MAX(vec_err) AS max_abs_err,
               (SELECT b FROM bound) AS err_bound,
               (MAX(vec_err) <= (SELECT b FROM bound) * 1.0000001)::INT AS ok
        FROM err
    """,
}

QUANTIZE_QUERIES = {
    "embedding_quantize_codes": (
        q_quantize_codes,
        QUANTIZE_ORACLES["embedding_quantize_codes"],
    ),
    "embedding_quantize_error": (
        q_quantize_error,
        QUANTIZE_ORACLES["embedding_quantize_error"],
    ),
}
