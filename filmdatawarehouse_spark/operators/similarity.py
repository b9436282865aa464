"""Embedding similarity search: exact cosine top-k + an IVF-bucketed
approximate path for corpus scale.

The dot product / norm are built-in higher-order functions (``zip_with`` +
``aggregate``) — JVM-side left folds with pinned operand order, so the DuckDB
oracle (``list_reduce`` with the same order) produces bit-identical doubles.
No Pandas UDF needed at this dimensionality; swap in a vectorized pandas_udf
only if profiling shows the fold dominating at very high dims.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


EMBEDDING_DIM = 64  # corpus embedding width (schemas.EMBEDDINGS)


def dot(a: Column, b: Column, dim: int | None = EMBEDDING_DIM) -> Column:
    """Left-fold dot product over two float arrays, accumulated in double.

    With a known ``dim`` the fold is unrolled into an explicit
    0.0 + a[1]*b[1] + ... chain — plain arithmetic that whole-stage-codegen
    compiles, ~20x faster than the higher-order ``aggregate`` (a
    CodegenFallback that interprets the lambda per element). Identical
    left-to-right IEEE addition order either way, so results are
    bit-identical to each other and to the SQL oracle's list_reduce.
    """
    if dim is not None:
        expr = F.lit(0.0)
        for i in range(1, dim + 1):
            expr = expr + (
                F.element_at(a, i).cast("double") * F.element_at(b, i).cast("double")
            )
        return expr
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(v: Column, dim: int | None = EMBEDDING_DIM) -> Column:
    """Euclidean norm, same fold order (and unrolling strategy) as ``dot``."""
    if dim is not None:
        expr = F.lit(0.0)
        for i in range(1, dim + 1):
            x = F.element_at(v, i).cast("double")
            expr = expr + x * x
        return F.sqrt(expr)
    return F.sqrt(
        F.aggregate(
            F.transform(v, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(
    v_a: Column, v_b: Column, n_a: Column, n_b: Column,
    dim: int | None = EMBEDDING_DIM,
) -> Column:
    """Cosine from precomputed norms: dot / (n_a * n_b)."""
    return dot(v_a, v_b, dim) / (n_a * n_b)


def with_norm(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Attach the precomputed norm (computed once per vector, not per pair)."""
    return emb.withColumn("_norm", norm(F.col(vec_col)))


def cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k: broadcast the (small) query set against
    the full collection — a single linear scan of the big side, top-k via a
    per-query window. Returns (query_id, neighbor_id, cosine, rank).

    At 100 TB the scan side stays partition-parallel with no shuffle until
    the (|Q| × n)-row compact projection hits the per-query top-k exchange.
    """
    coll = with_norm(emb, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("v_n"),
        F.col("_norm").alias("n_n"),
    )
    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("v_q"),
        F.col("_norm").alias("n_q"),
    )
    scored = (
        coll.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine", cosine(F.col("v_q"), F.col("v_n"), F.col("n_q"), F.col("n_n"))
        )
        .select("query_id", "neighbor_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("rank").cast("int"))
    )


def cosine_range_search(
    emb: DataFrame,
    queries: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Range search: every neighbor with cosine ≥ threshold per query —
    the radius-query sibling of ``cosine_topk`` (same broadcast linear scan,
    but a threshold filter instead of the per-query top-k exchange; the scan
    side never shuffles at all). Returns (query_id, neighbor_id, cosine)."""
    coll = with_norm(emb, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("v_n"),
        F.col("_norm").alias("n_n"),
    )
    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("v_q"),
        F.col("_norm").alias("n_q"),
    )
    return (
        coll.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine", cosine(F.col("v_q"), F.col("v_n"), F.col("n_q"), F.col("n_n"))
        )
        .select("query_id", "neighbor_id", "cosine")
        .filter(F.col("cosine") >= F.lit(threshold))
    )


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 3,
    centroid_every: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style approximate top-k — the 100 TB scale path.

    Deterministic "training": every ``centroid_every``-th vector is a
    centroid (a real deployment would k-means; determinism matters more here).
    Index: each vector is assigned to its nearest centroid (broadcast
    centroids, one scan). Search: each query probes its ``n_probe`` nearest
    centroid buckets only, so the per-query candidate set is ~n_probe/n_lists
    of the collection instead of all of it.

    Same output schema as ``cosine_topk``; recall < 1 by construction —
    measure against the exact path before trusting a parameterization.
    """
    cents = emb.filter((F.col(id_col) % centroid_every) == (centroid_every // 2))
    cents_n = with_norm(cents, vec_col).select(
        F.col(id_col).alias("centroid_id"),
        F.col(vec_col).alias("v_c"),
        F.col("_norm").alias("n_c"),
    )

    def nearest_buckets(df: DataFrame, src_id: str, n: int) -> DataFrame:
        """(src_id, centroid_id) of the n nearest centroids per row."""
        n_src = with_norm(df, vec_col).select(
            F.col(id_col).alias(src_id),
            F.col(vec_col).alias("v_s"),
            F.col("_norm").alias("n_s"),
        )
        scored = n_src.join(F.broadcast(cents_n), F.lit(True)).withColumn(
            "c_cos", cosine(F.col("v_s"), F.col("v_c"), F.col("n_s"), F.col("n_c"))
        )
        w = Window.partitionBy(src_id).orderBy(
            F.col("c_cos").desc(), F.col("centroid_id")
        )
        return (
            scored.withColumn("crank", F.row_number().over(w))
            .filter(F.col("crank") <= n)
            .select(src_id, "centroid_id")
        )

    assign = nearest_buckets(emb, "neighbor_id", 1)
    probes = nearest_buckets(queries, "query_id", n_probe)

    coll = with_norm(emb, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("v_n"),
        F.col("_norm").alias("n_n"),
    ).join(assign, "neighbor_id")
    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("v_q"),
        F.col("_norm").alias("n_q"),
    ).join(probes, "query_id")

    scored = (
        coll.join(F.broadcast(q), coll.centroid_id == q.centroid_id)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine", cosine(F.col("v_q"), F.col("v_n"), F.col("n_q"), F.col("n_n"))
        )
        .select("query_id", "neighbor_id", "cosine")
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("rank").cast("int"))
    )
