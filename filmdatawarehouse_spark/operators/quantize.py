"""Scalar quantization (SQ8-style) for embedding columns.

The storage/bandwidth lever of a 100 TB vector corpus: float32 embeddings
quantized to one byte per dimension shrink the table ~4× and make the ANN
scan memory-bound instead of IO-bound. Codes are per-DIMENSION uniform
buckets over the dataset's min/max range — the standard FAISS
``ScalarQuantizer(QT_8bit)`` layout (public), re-expressed as DataFrame ops.

No reference analog (SURVEY.md §2 — the reference has no vector surface);
sibling of operators/similarity.py.

Determinism contract (shared with the DuckDB oracle twins): codes use
``floor`` (never ``round`` — engines disagree on tie-breaking), every
float32 is cast to double before arithmetic, and per-dataset reductions are
min/max/count only (order-independent — no float sums across rows).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_LEVELS = 256


def dimension_stats(
    emb: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """(pos, mn, mx) per dimension, 0-based — one posexplode + a two-phase
    min/max aggregate keyed by dimension (d groups; partial aggregation
    makes the shuffle O(partitions × d), not O(rows × d))."""
    return (
        emb.select(F.posexplode(vec_col).alias("pos", "x"))
        .groupBy("pos")
        .agg(
            F.min(F.col("x").cast("double")).alias("mn"),
            F.max(F.col("x").cast("double")).alias("mx"),
        )
    )


def _code(x: Column, mn: Column, mx: Column, n_levels: int) -> Column:
    """floor((x-mn)/(mx-mn) * n) clamped to [0, n-1]; constant dimensions
    (mx == mn) collapse to code 0."""
    scaled = (x - mn) / (mx - mn) * F.lit(float(n_levels))
    return (
        F.when(mx == mn, F.lit(0))
        .otherwise(
            F.least(F.lit(n_levels - 1), F.floor(scaled).cast("int"))
        )
        .cast("int")
    )


def quantize_vectors(
    emb: DataFrame,
    stats: list[tuple[float, float]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_levels: int = N_LEVELS,
) -> DataFrame:
    """(id, codes array<int>): quantize each vector against per-dimension
    ``stats`` = [(mn, mx), ...] passed as literals (O(d) driver data, the
    same contract as the ANN centroid arrays in operators/similarity.py) —
    the quantization itself is a ZERO-SHUFFLE codegen'd projection of the
    scan, embarrassingly parallel at any corpus size."""
    mns = F.array(*[F.lit(float(mn)) for mn, _ in stats])
    mxs = F.array(*[F.lit(float(mx)) for _, mx in stats])
    codes = F.transform(
        F.col(vec_col),
        lambda x, i: _code(
            x.cast("double"),
            F.element_at(mns, i + 1),
            F.element_at(mxs, i + 1),
            n_levels,
        ),
    )
    return emb.select(F.col(id_col), codes.alias("codes"))


def reconstruction_report(
    emb: DataFrame,
    stats: list[tuple[float, float]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_levels: int = N_LEVELS,
) -> DataFrame:
    """One-row certification frame: quantize → reconstruct bucket midpoints
    → worst absolute error over every (vector, dimension), checked against
    the analytic bound max_range/(2·n_levels).

    All reductions are MAX/COUNT (order-independent), so the doubles are
    bit-identical in any engine — same contract as the sketch_accuracy
    gate. Returns (n_vecs, max_abs_err, err_bound, ok).
    """
    mns = F.array(*[F.lit(float(mn)) for mn, _ in stats])
    mxs = F.array(*[F.lit(float(mx)) for _, mx in stats])
    n = F.lit(float(n_levels))

    def recon_err(x: Column, i: Column) -> Column:
        mn = F.element_at(mns, i + 1)
        mx = F.element_at(mxs, i + 1)
        code = _code(x, mn, mx, n_levels)
        recon = mn + (code.cast("double") + F.lit(0.5)) * (mx - mn) / n
        return F.abs(x - recon)

    per_vec = emb.select(
        F.col(id_col),
        F.array_max(
            F.transform(
                F.col(vec_col), lambda x, i: recon_err(x.cast("double"), i)
            )
        ).alias("vec_err"),
    )
    bound = max((mx - mn) for mn, mx in stats) / (2.0 * n_levels)
    return per_vec.agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.max("vec_err").alias("max_abs_err"),
        F.lit(float(bound)).alias("err_bound"),
        (F.max("vec_err") <= F.lit(float(bound)) * F.lit(1.0000001))
        .cast("int")
        .alias("ok"),
    )
