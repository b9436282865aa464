"""Scalar + product quantization for embedding columns.

The storage/bandwidth lever of a 100 TB vector corpus: float32 embeddings
quantized to one byte per dimension shrink the table ~4× and make the ANN
scan memory-bound instead of IO-bound. Codes are per-DIMENSION uniform
buckets over the dataset's min/max range — the standard FAISS
``ScalarQuantizer(QT_8bit)`` layout (public), re-expressed as DataFrame ops.

Product quantization (r12, the PQ half of FAISS's IVF-PQ, public) goes
further: split each vector into ``m`` subvectors, k-means each subspace
into ``n_codes`` centroids, store one small int per subspace — m bytes
per vector at n_codes ≤ 256 (a 64-dim float32 embedding compresses
256/m ×), searched WITHOUT reconstruction via asymmetric distance (ADC):
per query, one (m × n_codes) lookup table of subvector inner products,
then each stored code costs m table lookups + adds. Codebooks are
O(m · n_codes · d/m) floats — task-closure-sized at any corpus size, the
same contract as the IVF centroid matrix (operators/similarity.py).

No reference analog (SURVEY.md §2 — the reference has no vector surface);
sibling of operators/similarity.py.

Determinism contract (shared with the DuckDB oracle twins): codes use
``floor`` (never ``round`` — engines disagree on tie-breaking), every
float32 is cast to double before arithmetic, and per-dataset reductions are
min/max/count only (order-independent — no float sums across rows). The
PQ side is certified by pytest oracles (numpy replay + recall gates), not
cross-engine hashes — k-means float sums are order-sensitive by nature,
the same boundary ``kmeans_centroids`` draws.
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


# ---------------------------------------------------------------------------
# Product quantization (r12) — train / encode / ADC top-k
# ---------------------------------------------------------------------------


def _split_dims(dim: int, m: int) -> list[tuple[int, int]]:
    """[(start, end), ...] of the m contiguous subspaces. ``dim % m == 0``
    is required — silent ragged splits would make codes incomparable."""
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    d = dim // m
    return [(j * d, (j + 1) * d) for j in range(m)]


def pq_train(
    emb: DataFrame,
    m: int = 8,
    n_codes: int = 16,
    n_iters: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Deterministic per-subspace L2 k-means. Returns a numpy
    ``(m, n_codes, dim/m)`` codebook tensor.

    Init = the ``n_codes`` lowest-id vectors' subvectors (the
    ``kmeans_centroids`` seed trick — deterministic, no RNG). Each Lloyd
    pass is ONE zero-shuffle ``mapInPandas`` scan emitting per-partition
    partial sums for ALL m subspaces at once (m × n_codes tiny rows per
    partition), combined driver-side — the collection never leaves the
    executors, and driver memory is O(m · n_codes · d/m). Assignment is
    plain L2 (``argmin ||x−c||² = argmax(c·x − ½||c||²)``) — PQ
    subvectors are not unit vectors, so spherical k-means would be
    wrong here. Empty clusters keep their previous centroid."""
    import numpy as np
    import pandas as pd

    seed_rows = sorted(
        emb.select(id_col, vec_col).orderBy(id_col).limit(n_codes).collect(),
        key=lambda r: r[id_col],
    )
    if len(seed_rows) < n_codes:
        raise ValueError(
            f"need at least n_codes={n_codes} vectors to seed, "
            f"have {len(seed_rows)}"
        )
    full = np.stack(
        [np.asarray(r[vec_col], dtype=np.float64) for r in seed_rows]
    )
    spans = _split_dims(full.shape[1], m)
    books = np.stack([full[:, s:e] for s, e in spans])  # (m, n_codes, dsub)
    base = emb.select(vec_col)

    for _ in range(n_iters):
        bks = books.copy()

        def partial(batches, _b=bks, _spans=spans, _k=n_codes):
            cnt = np.zeros((len(_spans), _k), dtype=np.int64)
            acc = np.zeros_like(_b)
            for pdf in batches:
                if not len(pdf):
                    continue
                x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
                for j, (s, e) in enumerate(_spans):
                    sub = x[:, s:e]
                    # argmin L2 via the expanded form; ties -> lowest code
                    scores = sub @ _b[j].T - 0.5 * (_b[j] * _b[j]).sum(axis=1)
                    a = np.argmax(scores, axis=1)
                    cnt[j] += np.bincount(a, minlength=_k)
                    np.add.at(acc[j], a, sub)
            rows = [
                (j, c, int(cnt[j, c]), list(acc[j, c]))
                for j in range(len(_spans))
                for c in range(_k)
            ]
            yield pd.DataFrame(
                rows, columns=["sub", "cluster", "cnt", "vsum"]
            )

        parts = base.mapInPandas(
            partial, "sub int, cluster int, cnt long, vsum array<double>"
        ).collect()
        cnt = np.zeros((m, n_codes), dtype=np.int64)
        acc = np.zeros_like(books)
        for r in parts:
            cnt[r.sub, r.cluster] += r.cnt
            acc[r.sub, r.cluster] += np.asarray(r.vsum, dtype=np.float64)
        live = cnt > 0
        books[live] = acc[live] / cnt[live][:, None]
    return books


def pq_encode(
    emb: DataFrame,
    codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """``(id, *extra_cols, codes array<int>)`` — one zero-shuffle
    ``mapInPandas`` scan against the (tiny) codebook tensor in the task
    closure; ``codes[j]`` is the L2-nearest centroid of subspace j
    (ties -> lowest code). This is the frame a PQ-compressed corpus
    STORES: m small ints per vector instead of dim floats.
    ``extra_cols`` are carried through the scan unchanged (the IVF-PQ
    build threads ``list_id`` this way — one pass, no join-back)."""
    import numpy as np
    import pandas as pd

    books = np.asarray(codebooks, dtype=np.float64)
    m, _, dsub = books.shape
    spans = [(j * dsub, (j + 1) * dsub) for j in range(m)]
    half = 0.5 * (books * books).sum(axis=2)  # (m, n_codes)
    keep = [id_col, *extra_cols]
    keep_t = ", ".join(
        f"{c} {emb.schema[c].dataType.simpleString()}" for c in keep
    )

    def scan(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            if x.shape[1] != m * dsub:
                raise ValueError(
                    f"vector dim {x.shape[1]} != codebook dim {m * dsub}"
                )
            codes = np.empty((len(x), m), dtype=np.int32)
            for j, (s, e) in enumerate(spans):
                codes[:, j] = np.argmax(
                    x[:, s:e] @ books[j].T - half[j], axis=1
                )
            out = pdf[keep].copy()
            out["codes"] = list(codes)
            yield out

    return emb.select(*keep, vec_col).mapInPandas(
        scan, f"{keep_t}, codes array<int>"
    )


def pq_reconstruction_mse(
    emb: DataFrame,
    codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """One-row report ``(n_vecs, mse, mean_baseline_mse)``: squared L2
    reconstruction error of encode→decode, vs quantizing every vector to
    the corpus-mean reference (rate-0 baseline) — PQ training is only
    correct if it beats the baseline it degenerates to at n_codes=1.
    Pytest-oracle surface (float means), not a cross-engine hash."""
    import numpy as np
    import pandas as pd

    books = np.asarray(codebooks, dtype=np.float64)
    m, _, dsub = books.shape
    spans = [(j * dsub, (j + 1) * dsub) for j in range(m)]
    half = 0.5 * (books * books).sum(axis=2)

    def scan(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            recon = np.empty_like(x)
            for j, (s, e) in enumerate(spans):
                a = np.argmax(x[:, s:e] @ books[j].T - half[j], axis=1)
                recon[:, s:e] = books[j][a]
            err = ((x - recon) ** 2).sum(axis=1)
            yield pd.DataFrame(
                {
                    "n": [len(x)],
                    "sq_err": [float(err.sum())],
                    "x_sum": [list(x.sum(axis=0))],
                    "x_sq": [float((x * x).sum())],
                }
            )

    parts = emb.select(vec_col).mapInPandas(
        scan, "n long, sq_err double, x_sum array<double>, x_sq double"
    ).collect()
    n = sum(r.n for r in parts)
    if n == 0:
        raise ValueError("empty collection")
    sq = sum(r.sq_err for r in parts)
    xs = np.sum([np.asarray(r.x_sum) for r in parts], axis=0)
    xsq = sum(r.x_sq for r in parts)
    mean = xs / n
    # Σ||x − mean||² = Σ||x||² − n·||mean||²
    base = xsq - n * float(mean @ mean)
    spark = emb.sparkSession
    return spark.createDataFrame(
        [(n, sq / n, base / n)],
        "n_vecs long, mse double, mean_baseline_mse double",
    )


def pq_topk(
    codes_df: DataFrame,
    queries: DataFrame,
    codebooks,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric-distance top-k over a PQ-ENCODED collection:
    ``(query_id, neighbor_id, score, rank)`` where score approximates
    the inner product ⟨query, neighbor⟩ (equal to cosine when the
    collection was normalized before encoding).

    The scan reads CODES ONLY — m small ints per row, never the floats:
    the I/O shape that makes a 100 TB vector corpus searchable. Per
    query, the (m × n_codes) lookup table of subvector inner products is
    built once driver-side from the bounded query set (the
    ``cosine_topk`` broadcast contract); each stored code then costs m
    table gathers + adds inside one zero-shuffle Arrow scan, and the
    per-query top-k window is the plan's single exchange. Self-matches
    (same id) are excluded, matching ``cosine_topk``."""
    import numpy as np
    import pandas as pd

    books = np.asarray(codebooks, dtype=np.float64)
    m, n_codes, dsub = books.shape
    spans = [(j * dsub, (j + 1) * dsub) for j in range(m)]
    q_rows = queries.select(id_col, vec_col).collect()
    if not q_rows:
        return codes_df.sparkSession.createDataFrame(
            [],
            "query_id long, neighbor_id long, score double, rank int",
        )
    qids = np.asarray([r[id_col] for r in q_rows])
    qm = np.stack(
        [np.asarray(r[vec_col], dtype=np.float64) for r in q_rows]
    )
    # LUT[q, j, c] = q_sub_j · books[j, c]
    lut = np.stack(
        [qm[:, s:e] @ books[j].T for j, (s, e) in enumerate(spans)],
        axis=1,
    )

    def scan(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            codes = np.stack(pdf["codes"].to_numpy()).astype(np.int64)
            ids = pdf[id_col].to_numpy()
            # scores[q, row] = Σ_j LUT[q, j, codes[row, j]]
            scores = np.zeros((len(qids), len(ids)))
            for j in range(m):
                scores += lut[:, j, codes[:, j]]
            out_q, out_n, out_s = [], [], []
            for qi in range(len(qids)):
                mask = ids != qids[qi]
                out_q.append(np.full(int(mask.sum()), qids[qi]))
                out_n.append(ids[mask])
                out_s.append(scores[qi][mask])
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "neighbor_id": np.concatenate(out_n),
                    "score": np.concatenate(out_s),
                }
            )

    cand = codes_df.select(id_col, "codes").mapInPandas(
        scan, "query_id long, neighbor_id long, score double"
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "score", F.col("rank").cast("int")
        )
    )


def pq_topk_refined(
    emb: DataFrame,
    codes_df: DataFrame,
    codebooks,
    queries: DataFrame,
    k: int = 5,
    shortlist: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The production IVF-PQ search recipe: ADC over the compressed codes
    produces a per-query SHORTLIST (``pq_topk`` with k=shortlist — the
    only stage that touches every row, reading m small ints each), then
    the float vectors of ONLY the shortlist rows (|Q| × shortlist, tiny)
    are joined back and re-scored with exact cosine. Returns
    ``(query_id, neighbor_id, cosine, rank)`` — the same contract as
    ``cosine_topk``, which it approximates at a fraction of the float
    I/O; recall is tunable through ``shortlist`` (the recall gate in
    tests/test_pq.py measures it, never assumes it).

    At 100 TB: the codes table is the only full scan (≤ m bytes/vector);
    the refine join moves |Q| × shortlist rows — broadcast-sized for any
    bounded query set — so full-precision vectors are fetched for ~0.1%
    of the corpus instead of 100%."""
    cand = pq_topk(
        codes_df, queries, codebooks, k=shortlist,
        id_col=id_col, vec_col=vec_col,
    )
    return exact_refine(cand, emb, queries, k, id_col, vec_col)


def exact_refine(
    cand: DataFrame,
    emb: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact-cosine re-rank of an approximate shortlist: join the
    ``(query_id, neighbor_id)`` candidate pairs back to the float
    vectors (shortlist side small; query side broadcast) and keep the
    per-query top-k by TRUE cosine — the shared tail of every
    quantized search recipe (``pq_topk_refined`` here,
    ``ivfpq_search_refined`` in ``operators.ivfpq``)."""
    from filmdatawarehouse_spark.operators.similarity import (
        fold_dot_udf,
        fold_norm_udf,
    )

    from pyspark.sql.window import Window

    nbrs = emb.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_vn")
    )
    qs = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_vq")
    )
    dim = None  # arrays may be any (uniform) width; fold takes the batch's
    scored = (
        cand.select("query_id", "neighbor_id")
        .join(nbrs, "neighbor_id")
        .join(F.broadcast(qs), "query_id")
        .withColumn(
            "cosine",
            fold_dot_udf(dim)(F.col("_vq"), F.col("_vn"))
            / (
                fold_norm_udf(dim)(F.col("_vq"))
                * fold_norm_udf(dim)(F.col("_vn"))
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "cosine", F.col("rank").cast("int")
        )
    )
