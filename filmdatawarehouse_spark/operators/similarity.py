"""Embedding similarity search: exact cosine top-k + an IVF-bucketed
approximate path for corpus scale.

Dot product / norm keep one contract everywhere: a LEFT FOLD with pinned
operand order, so the DuckDB oracle (``list_reduce`` with the same order)
produces bit-identical doubles. Three implementations of that one fold:

- ``fold_dot_udf`` / ``fold_norm_udf`` — Arrow-native UDFs (r17; r16
  shipped them as pandas_udfs, but the pandas boundary collapses array
  element NULLs to NaN — ADVICE r16 — so they now read the Arrow list
  buffers directly), THE FRAME-LEVEL DEFAULT since r16: the 64-term
  unrolled Catalyst chain
  they replace measured 0.5-1.2 s of driver-side analysis per fresh
  DataFrame build plus ~0.25 s of codegen per execution (a ~1,000-node
  expression tree), paid by every similarity-family query at any data
  size; the UDF is one expression node and one vectorized numpy loop per
  batch (guide §1 measurement in OPTIMIZATION_r16.md, §4.2 pattern),
  bit-identical by construction (same IEEE op sequence).
- ``dot`` / ``norm`` with a known ``dim`` — the unrolled JVM expression
  chain (whole-stage-codegen'd). Still right for ONE-OFF scalar uses
  where an Arrow stage isn't plumbed.
- ``dot`` / ``norm`` with ``dim=None`` — the higher-order ``aggregate``
  fold (CodegenFallback, interpreted): the compatibility form for
  ragged/unknown widths.
"""

from __future__ import annotations

# module-level, not function-local: pandas_udf / arrow_udf resolve the
# stringified type hints ("pd.Series" / "pa.Array" — PEP 563 is active
# here) against THIS module's globals, so `pd` and `pa` must exist at
# annotation-eval time
import pandas as pd
import pyarrow as pa

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType
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


def _list_batch_view(arr: "pa.Array"):
    """Decompose an Arrow list<double> batch into flat numpy views:
    (row_null, starts, lengths, values_f64, child_null_or_None).

    The pandas boundary the r16 fold UDFs used converts child NULLs to
    NaN (ADVICE r16: a null element then ranked TOP in every cosine
    window instead of dropping out) — the raw Arrow buffers keep the
    child validity bitmap, so NULL and data-NaN stay distinguishable."""
    import numpy as np

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    row_null = (
        arr.is_null().to_numpy(zero_copy_only=False)
        if arr.null_count
        else np.zeros(len(arr), dtype=bool)
    )
    offsets = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    starts, lengths = offsets[:-1], offsets[1:] - offsets[:-1]
    values = arr.values
    child_null = (
        values.is_null().to_numpy(zero_copy_only=False)
        if values.null_count
        else None
    )
    vals = values.to_numpy(zero_copy_only=False).astype(
        np.float64, copy=False
    )
    return row_null, starts, lengths, vals, child_null


def _gather(starts, d, vals, child_null, rows):
    """(matrix [len(rows), d], per-row any-null flag) for the FIRST ``d``
    elements of each selected row — only positions the fold touches can
    null it out, exactly like the ``element_at`` chain."""
    import numpy as np

    idx = starts[rows][:, None] + np.arange(d, dtype=np.int64)[None, :]
    mat = vals[idx]
    bad = (
        child_null[idx].any(axis=1)
        if child_null is not None
        else np.zeros(len(rows), dtype=bool)
    )
    return mat, bad


def fold_dot_udf(dim: int | None = EMBEDDING_DIM):
    """Arrow-native dot product with the EXACT left-fold order of
    ``dot``: per row, acc = 0.0 then acc + a[i]*b[i] for i = 1..dim — the
    identical IEEE-double operation sequence (numpy multiply and add are
    separate correctly-rounded ufuncs; no FMA fusion across calls), so
    results are bit-identical to the unrolled JVM chain and to the SQL
    oracle's ``list_reduce`` (r16 measurement: 0 bit-mismatches over the
    corpus; the chain it replaces cost 0.5-1.2 s of driver analysis per
    fresh build — module banner has the full story).

    NULL handling matches the expression chain it replaced, including
    inside arrays (r17, ADVICE r16 — the pandas boundary collapsed
    element-NULL to NaN, which Spark sorts ABOVE every real cosine):
    a NULL row, a NULL element in any position the fold reads, a row
    shorter than ``dim``, or (``dim=None``) an a/b length mismatch all
    yield NULL, exactly as ``element_at`` / ``zip_with`` null
    propagation did; data NaN still propagates as NaN. ``dim=None``
    takes each row's own width (ragged batches handled per width group,
    not crashed — ADVICE r16); two empty arrays fold to 0.0 like
    ``aggregate`` over an empty zip."""
    import numpy as np

    @F.arrow_udf(DoubleType())
    def _dot(a: pa.Array, b: pa.Array) -> pa.Array:
        n = len(a)
        if not n:
            return pa.array([], type=pa.float64())
        a_null, a_st, a_len, a_vals, a_cn = _list_batch_view(a)
        b_null, b_st, b_len, b_vals, b_cn = _list_batch_view(b)
        out = np.zeros(n, dtype=np.float64)
        valid = ~(a_null | b_null)
        if dim is not None:
            valid &= (a_len >= dim) & (b_len >= dim)
            rows = np.flatnonzero(valid)
            if rows.size:
                ma, bad_a = _gather(a_st, dim, a_vals, a_cn, rows)
                mb, bad_b = _gather(b_st, dim, b_vals, b_cn, rows)
                acc = np.zeros(rows.size, dtype=np.float64)
                for i in range(dim):
                    acc = acc + ma[:, i] * mb[:, i]
                out[rows] = acc
                valid[rows[bad_a | bad_b]] = False
        else:
            valid &= a_len == b_len
            for d in np.unique(a_len[valid]):
                rows = np.flatnonzero(valid & (a_len == d))
                if d == 0:
                    continue  # empty fold = the 0.0 init, already set
                ma, bad_a = _gather(a_st, int(d), a_vals, a_cn, rows)
                mb, bad_b = _gather(b_st, int(d), b_vals, b_cn, rows)
                acc = np.zeros(rows.size, dtype=np.float64)
                for i in range(int(d)):
                    acc = acc + ma[:, i] * mb[:, i]
                out[rows] = acc
                valid[rows[bad_a | bad_b]] = False
        return pa.array(out, type=pa.float64(), mask=~valid)

    return _dot


def fold_norm_udf(dim: int | None = EMBEDDING_DIM):
    """Arrow-native Euclidean norm with the EXACT fold order of ``norm``
    (see ``fold_dot_udf`` for the fold and NULL contracts; ``sqrt`` is
    IEEE correctly-rounded in numpy and the JVM alike)."""
    import numpy as np

    @F.arrow_udf(DoubleType())
    def _norm(v: pa.Array) -> pa.Array:
        n = len(v)
        if not n:
            return pa.array([], type=pa.float64())
        v_null, v_st, v_len, v_vals, v_cn = _list_batch_view(v)
        out = np.zeros(n, dtype=np.float64)
        valid = ~v_null
        if dim is not None:
            valid &= v_len >= dim
            rows = np.flatnonzero(valid)
            if rows.size:
                m, bad = _gather(v_st, dim, v_vals, v_cn, rows)
                acc = np.zeros(rows.size, dtype=np.float64)
                for i in range(dim):
                    x = m[:, i]
                    acc = acc + x * x
                out[rows] = np.sqrt(acc)
                valid[rows[bad]] = False
        else:
            for d in np.unique(v_len[valid]):
                rows = np.flatnonzero(valid & (v_len == d))
                if d == 0:
                    continue  # sqrt(0.0) = 0.0, already set
                m, bad = _gather(v_st, int(d), v_vals, v_cn, rows)
                acc = np.zeros(rows.size, dtype=np.float64)
                for i in range(int(d)):
                    x = m[:, i]
                    acc = acc + x * x
                out[rows] = np.sqrt(acc)
                valid[rows[bad]] = False
        return pa.array(out, type=pa.float64(), mask=~valid)

    return _norm


def with_norm(
    emb: DataFrame, vec_col: str = "embedding",
    dim: int | None = EMBEDDING_DIM,
) -> DataFrame:
    """Attach the precomputed norm (computed once per vector, not per
    pair) — Arrow fold stage (bit-identical to the expression chain)."""
    return emb.withColumn("_norm", fold_norm_udf(dim)(F.col(vec_col)))


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
            "cosine",
            fold_dot_udf(EMBEDDING_DIM)(F.col("v_q"), F.col("v_n"))
            / (F.col("n_q") * F.col("n_n")),
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
            "cosine",
            fold_dot_udf(EMBEDDING_DIM)(F.col("v_q"), F.col("v_n"))
            / (F.col("n_q") * F.col("n_n")),
        )
        .select("query_id", "neighbor_id", "cosine")
        .filter(F.col("cosine") >= F.lit(threshold))
    )



def _score_rows_for_list(
    list_id, nids, m, per_list, qm, qids, k, out_q, out_n, out_c
) -> None:
    """Score one list's rows against the queries probing that list and
    append per-query PARTIAL top-k arrays: (cosine desc, neighbor_id
    asc) — the same ordering the final window uses, so no qualifying
    row is lost. Shared by the in-memory (``ivf_topk``) and persisted
    (``ivf_index_search``) paths so their exact-parity cannot drift
    (r11 review: this loop was duplicated)."""
    import numpy as np

    qi = per_list.get(int(list_id))
    if qi is None or not len(qi):
        return
    sims = qm[qi] @ m.T
    for row_q, qx in enumerate(qi):
        s = sims[row_q]
        mask = nids != qids[qx]
        s, nn = s[mask], nids[mask]
        if not len(s):
            continue
        top = min(k, len(s))
        sel = np.lexsort((nn, -s))[:top]
        out_q.append(np.full(top, qids[qx]))
        out_n.append(nn[sel])
        out_c.append(s[sel])


def _probe_lists(queries: DataFrame, cents, id_col: str, vec_col: str, n_probe: int):
    """Localize the (bounded) query set and invert its n_probe nearest
    centroid lists: returns (qids, qm, {list -> query indexes})."""
    import numpy as np

    q_pdf = queries.select(id_col, vec_col).toPandas()
    qids = q_pdf[id_col].to_numpy()
    if not len(qids):
        return qids, None, {}
    qm = np.stack(q_pdf[vec_col].to_numpy()).astype(np.float64)
    qm /= np.sqrt((qm * qm).sum(axis=1))[:, None]
    order = np.argsort(-(qm @ cents.T), axis=1, kind="stable")[:, :n_probe]
    per_list = {
        int(l): np.nonzero((order == l).any(axis=1))[0]
        for l in np.unique(order)
    }
    return qids, qm, per_list


TOPK_SCHEMA = "query_id long, neighbor_id long, cosine double, rank int"


def _rank_topk(cand: DataFrame, k: int) -> DataFrame:
    """Final per-query top-k over the partial-top-k candidate rows."""
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "cosine", F.col("rank").cast("int")
        )
    )


def kmeans_centroids(
    emb: DataFrame,
    n_lists: int = 16,
    n_iters: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Deterministic spherical k-means-lite: seeded init + a few distributed
    Lloyd iterations. Returns a unit-normalized numpy ``(n_lists, dim)``
    centroid matrix.

    Init = the ``n_lists`` lowest-id vectors (a TakeOrdered, not a full
    sort) — deterministic, and on this corpus as good as random init.
    Each Lloyd pass is one zero-shuffle ``mapInPandas`` scan emitting
    per-partition partial sums (``n_lists`` rows per partition: cluster,
    count, vector sum); the driver combines ``n_lists × n_partitions`` tiny
    rows and renormalizes. Driver memory is O(n_lists · dim) — the
    collection itself never leaves the executors.
    """
    import numpy as np
    import pandas as pd

    seed_rows = sorted(
        emb.select(id_col, vec_col).orderBy(id_col).limit(n_lists).collect(),
        key=lambda r: r[id_col],
    )
    cents = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in seed_rows])
    cents /= np.sqrt((cents * cents).sum(axis=1))[:, None]
    base = emb.select(vec_col)
    k = cents.shape[0]

    for _ in range(n_iters):
        c_t = cents.T.copy()

        def partial(batches, _ct=c_t, _k=k):
            d = _ct.shape[0]
            cnt = np.zeros(_k, dtype=np.int64)
            acc = np.zeros((_k, d), dtype=np.float64)
            for pdf in batches:
                if not len(pdf):
                    continue
                m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
                m /= np.sqrt((m * m).sum(axis=1))[:, None]
                a = np.argmax(m @ _ct, axis=1)
                cnt += np.bincount(a, minlength=_k)
                np.add.at(acc, a, m)
            yield pd.DataFrame(
                {
                    "cluster": np.arange(_k, dtype=np.int64),
                    "cnt": cnt,
                    "vsum": list(acc),
                }
            )

        parts = base.mapInPandas(
            partial, "cluster long, cnt long, vsum array<double>"
        ).collect()
        cnt = np.zeros(k, dtype=np.int64)
        acc = np.zeros_like(cents)
        for r in parts:
            cnt[r.cluster] += r.cnt
            acc[r.cluster] += np.asarray(r.vsum, dtype=np.float64)
        live = cnt > 0
        cents[live] = acc[live] / cnt[live][:, None]
        cents /= np.sqrt((cents * cents).sum(axis=1))[:, None]
    return cents


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 8,
    n_lists: int = 16,
    n_iters: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k — the 100 TB scale path, recall-certified by
    the registered ``similarity_ann_recall`` oracle query.

    Train: deterministic spherical k-means (``kmeans_centroids``). Search:
    the (small, by definition) query set is localized; each query picks its
    ``n_probe`` nearest centroid lists in numpy on the driver. The whole
    assign+score step is then ONE zero-shuffle ``mapInPandas`` scan of the
    collection: every partition assigns its vectors to lists (argmax — no
    window, no shuffle), scores them against only the queries probing those
    lists, and emits a per-partition partial top-k per query. The only
    shuffle in the plan is the final per-query top-k over those
    ``≤ k × n_partitions`` rows per query.

    Scanned fraction ≈ n_probe / n_lists of the collection per query;
    recall < 1 by construction — the gate measures it (recall@5 ≥ 0.9 on
    this corpus; see ``queries/extended.py:q_similarity_ann_recall``).
    The default 8/16 fraction is what the corpus demands: the test
    embeddings are near-isotropic (max pairwise cosine ≈ 0.5), the
    worst case for any partition-based ANN — real embedding corpora
    cluster, and lower n_probe/n_lists fractions hold the same recall.
    Same output schema as ``cosine_topk``.
    """
    import numpy as np
    import pandas as pd

    cents = kmeans_centroids(emb, n_lists, n_iters, id_col, vec_col)
    qids, qm, per_list = _probe_lists(queries, cents, id_col, vec_col, n_probe)
    if not len(qids):
        return emb.sparkSession.createDataFrame([], TOPK_SCHEMA)
    c_t = cents.T.copy()

    def scan(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy()
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            m /= np.sqrt((m * m).sum(axis=1))[:, None]
            assign = np.argmax(m @ c_t, axis=1)
            out_q: list[np.ndarray] = []
            out_n: list[np.ndarray] = []
            out_c: list[np.ndarray] = []
            for l in np.unique(assign):
                rows = np.nonzero(assign == l)[0]
                _score_rows_for_list(
                    l, ids[rows], m[rows], per_list, qm, qids, k,
                    out_q, out_n, out_c,
                )
            if out_q:
                yield pd.DataFrame(
                    {
                        "query_id": np.concatenate(out_q),
                        "neighbor_id": np.concatenate(out_n),
                        "cosine": np.concatenate(out_c),
                    }
                )

    cand = emb.select(id_col, vec_col).mapInPandas(
        scan, "query_id long, neighbor_id long, cosine double"
    )
    return _rank_topk(cand, k)


# ---------------------------------------------------------------------------
# Persisted IVF index: build once, append increments, search with storage-
# level partition pruning (r11). Commit protocol: every (re)build writes a
# fresh VERSION dir (v-<token>/{centroids,vectors}) and atomically flips
# the INDEX pointer — a rebuild that dies mid-write can never pair new
# centroids with old-assignment vectors (r11 review; the same pointer
# pattern as streaming.merge's snapshot sink, including (r12) its
# keep-two retention: the immediately-previous committed version
# survives one rebuild, so a search that resolved the old pointer keeps
# reading intact files. All pointer/prune I/O goes through the Hadoop
# FileSystem (io.fs) so the index may live on HDFS/S3A — see that
# module's banner for the per-store atomic-rename contract.
# ---------------------------------------------------------------------------

IVF_POINTER = "INDEX"


def _ivf_pointer_path(index_path: str) -> str:
    return f"{index_path.rstrip('/')}/{IVF_POINTER}"


def _commit_index_version(
    spark,
    index_path: str,
    token: str,
    lease_token: str | None = None,
    lease_owner: str = "",
) -> None:
    """Atomic pointer flip + keep-two prune, shared by every persisted
    index family (flat IVF here; IVF-PQ in ``operators.ivfpq``). Line 2
    of the pointer records the RETAINED previous version — the keep-two
    contract concurrent readers rely on (see ``ivf_index_build``); the
    trailing ``g=<n> w=<fence>`` line stamps the monotone generation +
    writer token backing the r15 claim protocol. Any older ``v-*`` dir
    not named by a surviving claim is pruned best-effort: a failed
    delete is garbage for the next commit's prune, never corruption.
    ``lease_token`` (r14): the caller's writer-fence token, re-verified
    immediately before the flip; the generation claim (r15,
    ``io.lease.claim_generation``) then refuses a superseded builder
    BEFORE the flip — exclusive-create of the generation number is the
    CAS-emulating step — instead of only surfacing it after."""
    from filmdatawarehouse_spark.io import fs, lease

    if lease_token is not None:
        lease.verify(spark, index_path, lease_token)
    root = index_path.rstrip("/")
    try:
        prev, _, base_gen, ptoken = _ivf_pointer_full(spark, index_path)
    except ValueError:
        prev, base_gen, ptoken = None, 0, ""  # first commit
    lease.detect_pointer_regression(spark, index_path, base_gen, ptoken)
    g_next = base_gen + 1
    fence = lease_token or token
    lease.claim_generation(
        spark, index_path, g_next, fence, token,
        owner=lease_owner, committed_gen=base_gen,
    )
    try:
        lease.verify_claim(spark, index_path, g_next, fence)
        meta = lease.format_pointer_meta(g_next, fence)
        fs.write_text_atomic(
            spark,
            _ivf_pointer_path(index_path),
            f"{token}\n{meta}" if prev is None
            else f"{token}\n{prev}\n{meta}",
        )
    except BaseException:
        # builds use fresh-per-call owners (no crash re-entry path): a
        # failure between claim and flip must release the claim or the
        # RETRY is fenced out for the full TTL (r15 review)
        lease.release_claim(spark, index_path, g_next, fence)
        raise
    # claims prune FIRST (so keep-two holds: the about-to-expire claim
    # must not pin its snapshot an extra round), then retain EVERY
    # surviving claim's snapshot, not just this writer's neighborhood —
    # a superseded late-flipper's stale prune_claims removes only OLD
    # claims, never the winner's newer ones, so the winner's versions
    # still outlive its snapshot prune (r15 review; mirrors
    # streaming.merge)
    lease.prune_claims(spark, index_path, g_next)
    keep = {token, prev} | lease.claimed_snapshots(spark, index_path)
    for d in fs.list_child_dirs(spark, root):
        if d.startswith("v-") and d not in keep:
            try:
                fs.delete(spark, f"{root}/{d}")
            except Exception:
                pass


def _ivf_pointer_pair(spark, index_path: str) -> tuple[str, str | None]:
    """``(current, retained_previous)`` version names from ONE atomic
    pointer read (two-line format since r12, mirroring streaming.merge;
    single-line pointers from r11 read as (current, None))."""
    cur, prev, _, _ = _ivf_pointer_full(spark, index_path)
    return cur, prev


def _ivf_pointer_full(
    spark, index_path: str
) -> tuple[str, str | None, int, str]:
    """``(current, retained_previous, generation, writer_token)`` from
    ONE pointer read. The ``g=<n> w=<token>`` metadata line (r15) backs
    the claim protocol; pre-r15 pointers read as generation 0 with an
    empty token, exempting them from regression checks until their
    first r15-format commit (mirrors ``streaming.merge``)."""
    from filmdatawarehouse_spark.io import fs

    from filmdatawarehouse_spark.io import lease

    text = fs.read_text_retry(spark, _ivf_pointer_path(index_path))
    if text is None:
        raise ValueError(
            f"no IVF index at {index_path} (missing {IVF_POINTER} pointer)"
        )
    names, gen, tok = lease.split_pointer_meta(
        [ln.strip() for ln in text.splitlines() if ln.strip()]
    )
    if not names:
        raise ValueError(f"empty {IVF_POINTER} pointer at {index_path}")
    return names[0], (names[1] if len(names) > 1 else None), gen, tok


def ivf_index_version_dir(spark, index_path: str) -> str:
    """The committed version directory of a persisted IVF index."""
    cur, _ = _ivf_pointer_pair(spark, index_path)
    return f"{index_path.rstrip('/')}/{cur}"


def ivf_index_vectors_path(spark, index_path: str) -> str:
    """The committed vectors table (hive-partitioned by list_id) — the
    location maintenance ops like ``io.maintenance.compact_partitions``
    should target."""
    return f"{ivf_index_version_dir(spark, index_path)}/vectors"


def _centroids_of(spark, version_dir: str):
    """The version's unit-normalized centroid matrix — an O(n_lists)
    bounded collect by construction."""
    import numpy as np

    rows = (
        spark.read.parquet(f"{version_dir}/centroids")
        .orderBy("list_id")
        .collect()
    )
    if not rows:
        raise ValueError(f"no centroids under {version_dir}")
    return np.stack(
        [np.asarray(r.centroid, dtype=np.float64) for r in rows]
    )


def _assign_lists(emb: DataFrame, cents, id_col: str, vec_col: str) -> DataFrame:
    """``(id, vector, list_id)`` via ONE zero-shuffle ``mapInPandas`` scan
    against the (tiny) centroid matrix held in the task closure."""
    import numpy as np

    c_t = cents.T.copy()
    id_t = emb.schema[id_col].dataType.simpleString()
    vec_t = emb.schema[vec_col].dataType.simpleString()

    def scan(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            m /= np.sqrt((m * m).sum(axis=1))[:, None]
            out = pdf[[id_col, vec_col]].copy()
            out["list_id"] = np.argmax(m @ c_t, axis=1).astype("int32")
            yield out

    return emb.select(id_col, vec_col).mapInPandas(
        scan, f"{id_col} {id_t}, {vec_col} {vec_t}, list_id int"
    )


def ivf_index_build(
    emb: DataFrame,
    index_path: str,
    n_lists: int = 16,
    n_iters: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialize an IVF index on disk: a fresh version dir holding
    ``centroids`` (n_lists tiny rows) + ``vectors`` PARTITIONED BY
    list_id, committed by an atomic pointer flip (module banner).
    ``ivf_topk`` retrains and rescans per call — right for one-shot
    queries, wrong for a served collection; the persisted form pays
    k-means once and gives every later search STORAGE-level pruning
    (the probed lists' partitions are the only files opened — the scan
    fraction n_probe/n_lists moves from compute-skip to I/O-skip, the
    difference that matters at 100 TB) and ``ivf_index_append``
    incremental growth without retraining.

    Concurrency contract (r12, tightened from the r11 claim): a SEARCH
    concurrent with ONE rebuild is safe — it resolves the pointer once,
    and the keep-two retention (mirroring ``streaming.merge``) keeps
    the version it resolved on disk through the flip; only a SECOND
    rebuild prunes it, so re-resolve per query for long-lived serving.
    An APPEND concurrent with a rebuild is NOT merged: the rebuild
    indexes exactly the ``emb`` it was given, so rows appended into the
    superseded version survive there (retained, readable) but are
    absent from the new current version — include every increment in
    the rebuild's input. Single-writer is ENFORCED since r14: builds
    and appends acquire the ``io.lease`` writer fence at the index
    root, so the concurrent case REFUSES (``WriterFencedError``)
    instead of silently losing the append.
    """
    import uuid

    from filmdatawarehouse_spark.io import lease

    spark = emb.sparkSession
    token = f"v-{uuid.uuid4().hex[:8]}"
    fence = lease.acquire(spark, index_path, owner=f"build-{token}")
    # heartbeat while held: training + the vectors write are long jobs —
    # a live build must never become takeover-eligible mid-write, and a
    # FAILED build must release rather than fence its own retry out
    # (fresh-owner leases cannot re-enter; r14 review)
    stop_hb = lease.start_heartbeat(
        spark, index_path, fence, lease.DEFAULT_TTL_S / 3.0
    )
    try:
        vdir = f"{index_path.rstrip('/')}/{token}"
        cents = kmeans_centroids(emb, n_lists, n_iters, id_col, vec_col)
        (
            spark.createDataFrame(
                [
                    (i, [float(x) for x in cents[i]])
                    for i in range(cents.shape[0])
                ],
                "list_id int, centroid array<double>",
            )
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{vdir}/centroids")
        )
        (
            _assign_lists(emb, cents, id_col, vec_col)
            .write.mode("overwrite")
            .partitionBy("list_id")
            .parquet(f"{vdir}/vectors")
        )
        # atomic commit: keep-two pointer flip + prune, refusing if the
        # writer fence was taken over during the build (shared helper)
        _commit_index_version(
            spark, index_path, token,
            lease_token=fence, lease_owner=f"build-{token}",
        )
    except BaseException:
        stop_hb()
        lease.release_quiet(spark, index_path, fence)
        raise
    stop_hb()
    lease.release(spark, index_path, fence)


def ivf_index_append(
    new_emb: DataFrame,
    index_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    owner: str | None = None,
) -> None:
    """Add vectors to an existing index WITHOUT retraining: assign against
    the stored centroids (one zero-shuffle scan of the increment only)
    and append into the matching list partitions of the committed
    version. Centroids drift from optimal as the distribution shifts —
    the recall gate (``similarity_ann_recall``'s pattern) is the rebuild
    trigger, not a row-count heuristic. Plain parquet append is
    at-least-once under replay: wrap the caller in the streaming MERGE
    ledger (or diff ids against the index) when the increment source
    redelivers.

    Writer fencing (r14): the resolve→assign→append cycle runs under
    the ``io.lease`` writer fence at the index root, re-verified just
    before the append — a second concurrent append (or an append racing
    a rebuild: the silently-lost-rows case the build docstring
    documents) refuses with ``WriterFencedError``. ``owner`` is the
    logical writer identity for crash re-entry (a replaying caller
    passes its stable run id); default is a fresh identity per call."""
    import uuid

    from filmdatawarehouse_spark.io import lease

    spark = new_emb.sparkSession
    fence = lease.acquire(
        spark, index_path, owner=owner or f"append-{uuid.uuid4().hex[:8]}"
    )
    # heartbeat while held (the append is a whole Spark job) + release
    # on failure (a fresh-owner lease cannot be re-entered by a retry)
    stop_hb = lease.start_heartbeat(
        spark, index_path, fence, lease.DEFAULT_TTL_S / 3.0
    )
    try:
        vdir = ivf_index_version_dir(spark, index_path)  # ONCE for both
        cents = _centroids_of(spark, vdir)
        assigned = _assign_lists(new_emb, cents, id_col, vec_col)
        lease.verify(spark, index_path, fence)
        (
            assigned
            .write.mode("append")
            .partitionBy("list_id")
            .parquet(f"{vdir}/vectors")
        )
    except BaseException:
        stop_hb()
        lease.release_quiet(spark, index_path, fence)
        raise
    stop_hb()
    lease.release(spark, index_path, fence)


def ivf_index_search(
    spark,
    index_path: str,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k over a persisted IVF index. The (bounded) query set picks
    its ``n_probe`` nearest lists driver-side; the collection read is
    ``vectors`` FILTERED ON THE PARTITION COLUMN — Spark prunes the
    un-probed lists' files at the source (PartitionFilters, plan-tested)
    — then one zero-shuffle ``mapInPandas`` scores each partition's rows
    against only the queries probing their lists (the SAME scoring
    helper as ``ivf_topk``, so the two paths cannot drift), with the
    per-query top-k window as the plan's single exchange. An empty
    query set returns an empty frame of the same schema — a served
    entry point must not crash on a quiet batch (r11 review)."""
    import numpy as np
    import pandas as pd

    vdir = ivf_index_version_dir(spark, index_path)  # resolved ONCE per search
    cents = _centroids_of(spark, vdir)
    qids, qm, per_list = _probe_lists(queries, cents, id_col, vec_col, n_probe)
    if not len(qids):
        return spark.createDataFrame([], TOPK_SCHEMA)
    probed = sorted(per_list)

    def scan(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            out_q: list[np.ndarray] = []
            out_n: list[np.ndarray] = []
            out_c: list[np.ndarray] = []
            for l, grp in pdf.groupby("list_id"):
                m = np.stack(grp[vec_col].to_numpy()).astype(np.float64)
                m /= np.sqrt((m * m).sum(axis=1))[:, None]
                _score_rows_for_list(
                    l, grp[id_col].to_numpy(), m, per_list, qm, qids, k,
                    out_q, out_n, out_c,
                )
            if out_q:
                yield pd.DataFrame(
                    {
                        "query_id": np.concatenate(out_q),
                        "neighbor_id": np.concatenate(out_n),
                        "cosine": np.concatenate(out_c),
                    }
                )

    vecs = spark.read.parquet(f"{vdir}/vectors").filter(
        F.col("list_id").isin(probed)
    )
    cand = vecs.mapInPandas(
        scan, "query_id long, neighbor_id long, cosine double"
    )
    return _rank_topk(cand, k)
