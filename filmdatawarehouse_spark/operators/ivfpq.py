"""Persisted IVF-PQ index: coarse inverted lists + product-quantized
residuals, on disk, behind the same keep-two pointer commit as the flat
IVF index (``operators.similarity``) and the snapshot MERGE sink.

This is the layout a 100 TB vector corpus actually serves from
(FAISS's IVFADC / Jégou et al., "Product Quantization for Nearest
Neighbor Search", TPAMI 2011): the coarse quantizer prunes the scan to
``n_probe/n_lists`` of the collection AT THE STORAGE LAYER (codes are
hive-partitioned by ``list_id``, so un-probed lists' files are never
opened — PartitionFilters, plan-tested), and product quantization cuts
what IS scanned to ``m`` bytes per vector (64-dim float64 → 8 codes is
64×). Search is asymmetric-distance (ADC): per query, one
``(m × n_codes)`` lookup table of subvector inner products built
driver-side from the bounded query set, then each stored code costs m
gathers + adds inside a zero-shuffle Arrow scan.

Residual encoding: vectors are unit-normalized, assigned to their
nearest coarse centroid ``c_l``, and PQ encodes the RESIDUAL
``x̂ − c_l`` (much lower variance than raw vectors → tighter codebooks).
Scoring decomposes exactly: ``q̂·x̂_recon = q̂·c_l + Σ_j LUT[j, code_j]``
— the per-list offset is a scalar per (query, list), so ONE LUT serves
every list.

Index layout (one version dir per build, committed by the shared
pointer flip; all pointer/prune I/O through ``io.fs`` — Hadoop
FileSystem, portable to HDFS/S3A):

    <index>/INDEX                  two-line pointer (current, retained)
    <index>/v-<token>/centroids    n_lists × (list_id, centroid)
    <index>/v-<token>/codebooks    m·n_codes × (sub, code, centroid)
    <index>/v-<token>/codes        (id, codes) PARTITIONED BY list_id

Concurrency contract: identical to ``ivf_index_build`` — one
concurrent rebuild is safe for readers (keep-two), appends and
rebuilds are single-writer, an append concurrent with a rebuild is
not merged into the new version.

No reference analog: the reference (iistatiehh/FilmDataWareHouse)
stops at exact SQL over rental facts; this module is part of the
LLM-training-pipeline extension surface (SURVEY.md §6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from filmdatawarehouse_spark.operators.quantize import (
    exact_refine,
    pq_encode,
    pq_train,
)
from filmdatawarehouse_spark.operators.similarity import (
    _centroids_of,
    _commit_index_version,
    _ivf_pointer_pair,
    _probe_lists,
    kmeans_centroids,
)

def ivfpq_version_dir(spark: SparkSession, index_path: str) -> str:
    """The committed version directory of a persisted IVF-PQ index."""
    cur, _ = _ivf_pointer_pair(spark, index_path)
    return f"{index_path.rstrip('/')}/{cur}"


def ivfpq_codes_path(spark: SparkSession, index_path: str) -> str:
    """The committed codes table (hive-partitioned by list_id) — the
    location maintenance ops like ``compact_partitions`` target."""
    return f"{ivfpq_version_dir(spark, index_path)}/codes"


def _residuals(
    emb: DataFrame, cents, id_col: str, vec_col: str
) -> DataFrame:
    """``(id, list_id, residual array<double>)`` via ONE zero-shuffle
    ``mapInPandas`` scan: unit-normalize, assign to the argmax-cosine
    centroid (ties -> lowest list, matching ``_assign_lists``), subtract
    it. The frame is lazy — each training pass recomputes it at one
    matmul per batch, cheaper than materializing dim floats per row."""
    import numpy as np

    c = cents.copy()
    id_t = emb.schema[id_col].dataType.simpleString()

    def scan(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            norms = np.sqrt((x * x).sum(axis=1))
            if not np.all(norms > 0.0):  # refuse-don't-guess (ADVICE
                # r12): NaN residuals would silently corrupt codebook
                # training and every later ADC score
                bad = pdf[id_col].to_numpy()[norms == 0.0][:5]
                raise ValueError(
                    f"zero-norm {vec_col} for {id_col} in {list(bad)}: "
                    "the zero vector cannot be unit-normalized — filter "
                    "or impute these rows before indexing"
                )
            x /= norms[:, None]
            a = np.argmax(x @ c.T, axis=1)
            out = pdf[[id_col]].copy()
            out["list_id"] = a.astype("int32")
            out["residual"] = list(x - c[a])
            yield out

    return emb.select(id_col, vec_col).mapInPandas(
        scan, f"{id_col} {id_t}, list_id int, residual array<double>"
    )


def _codebooks_of(spark: SparkSession, version_dir: str):
    """The version's ``(m, n_codes, dsub)`` codebook tensor — an
    O(m·n_codes) bounded collect by construction."""
    import numpy as np

    rows = (
        spark.read.parquet(f"{version_dir}/codebooks")
        .orderBy("sub", "code")
        .collect()
    )
    if not rows:
        raise ValueError(f"no codebooks under {version_dir}")
    m = max(r.sub for r in rows) + 1
    n_codes = max(r.code for r in rows) + 1
    if len(rows) != m * n_codes:
        raise ValueError(
            f"ragged codebooks under {version_dir}: "
            f"{len(rows)} rows != {m}×{n_codes}"
        )
    flat = np.stack([np.asarray(r.centroid, dtype=np.float64) for r in rows])
    return flat.reshape(m, n_codes, -1)


def ivfpq_index_build(
    emb: DataFrame,
    index_path: str,
    n_lists: int = 16,
    m: int = 8,
    n_codes: int = 16,
    n_iters: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialize an IVF-PQ index: coarse k-means (shared with the flat
    IVF path), PQ trained on the COARSE RESIDUALS, codes written
    partitioned by ``list_id``, committed by the shared keep-two pointer
    flip. Build cost is the flat index's k-means plus ``n_iters + 1``
    residual scans (each one matmul per batch); what it buys every later
    search is the module-banner I/O shape: probed-lists-only file reads
    of m-byte codes instead of dim-float vectors. Runs under the
    index-root writer fence (r14, shared with ``ivf_index_build``): a
    concurrent build/append/ingest refuses instead of interleaving."""
    import uuid

    from filmdatawarehouse_spark.io import lease

    spark = emb.sparkSession
    token = f"v-{uuid.uuid4().hex[:8]}"
    fence = lease.acquire(spark, index_path, owner=f"build-{token}")
    # heartbeat + release-on-failure: same rationale as ivf_index_build
    stop_hb = lease.start_heartbeat(
        spark, index_path, fence, lease.DEFAULT_TTL_S / 3.0
    )
    try:
        vdir = f"{index_path.rstrip('/')}/{token}"
        cents = kmeans_centroids(emb, n_lists, n_iters, id_col, vec_col)
        res = _residuals(emb, cents, id_col, vec_col)
        books = pq_train(
            res, m=m, n_codes=n_codes, n_iters=n_iters,
            id_col=id_col, vec_col="residual",
        )
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
            spark.createDataFrame(
                [
                    (j, c, [float(x) for x in books[j, c]])
                    for j in range(books.shape[0])
                    for c in range(books.shape[1])
                ],
                "sub int, code int, centroid array<double>",
            )
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{vdir}/codebooks")
        )
        (
            pq_encode(
                res, books, id_col=id_col, vec_col="residual",
                extra_cols=("list_id",),
            )
            .write.mode("overwrite")
            .partitionBy("list_id")
            .parquet(f"{vdir}/codes")
        )
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


def ivfpq_index_append(
    new_emb: DataFrame,
    index_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    owner: str | None = None,
) -> None:
    """Add vectors WITHOUT retraining: assign against the stored coarse
    centroids, encode residuals with the stored codebooks (both one
    zero-shuffle scan of the increment only), append into the matching
    list partitions of the committed version. Same caveats as
    ``ivf_index_append``: recall-gate as the rebuild trigger, wrap the
    caller in a MERGE ledger when the increment source redelivers —
    and the same r14 writer fence at the index root (``owner`` is the
    crash-re-entry identity; default fresh per call)."""
    import uuid

    from filmdatawarehouse_spark.io import lease

    spark = new_emb.sparkSession
    fence = lease.acquire(
        spark, index_path, owner=owner or f"append-{uuid.uuid4().hex[:8]}"
    )
    # heartbeat + release-on-failure: same rationale as ivf_index_append
    stop_hb = lease.start_heartbeat(
        spark, index_path, fence, lease.DEFAULT_TTL_S / 3.0
    )
    try:
        vdir = ivfpq_version_dir(spark, index_path)  # ONCE for all three
        cents = _centroids_of(spark, vdir)
        books = _codebooks_of(spark, vdir)
        res = _residuals(new_emb, cents, id_col, vec_col)
        encoded = pq_encode(
            res, books, id_col=id_col, vec_col="residual",
            extra_cols=("list_id",),
        )
        lease.verify(spark, index_path, fence)
        (
            encoded
            .write.mode("append")
            .partitionBy("list_id")
            .parquet(f"{vdir}/codes")
        )
    except BaseException:
        stop_hb()
        lease.release_quiet(spark, index_path, fence)
        raise
    stop_hb()
    lease.release(spark, index_path, fence)


def ivfpq_search(
    spark: SparkSession,
    index_path: str,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC top-k over a persisted IVF-PQ index:
    ``(query_id, neighbor_id, score, rank)`` where score approximates
    the cosine ``q̂·x̂`` by ``q̂·c_l + Σ_j LUT[j, code_j]``.

    The (bounded) query set picks its ``n_probe`` nearest lists
    driver-side; the collection read is ``codes`` FILTERED ON THE
    PARTITION COLUMN (un-probed lists' files never opened) and carries
    m small ints per row — never the floats. Per batch the scan emits
    per-query PARTIAL top-k rows (score desc, neighbor_id asc — the
    final window's ordering, so no qualifying row is lost), and that
    window is the plan's single exchange. Self-matches excluded,
    matching ``cosine_topk``. Empty query set → empty frame, same
    schema (served-entry-point contract)."""
    import numpy as np
    import pandas as pd

    vdir = ivfpq_version_dir(spark, index_path)  # resolved ONCE per search
    stored = spark.read.parquet(f"{vdir}/codes")
    # id columns take the INDEX's id type (build/append accept any id
    # type via pq_encode's dynamic schema; the search must match it)
    id_t = stored.schema[id_col].dataType.simpleString()
    q_id_t = queries.schema[id_col].dataType.simpleString()
    if q_id_t != id_t:  # refuse-don't-guess (ADVICE r12): a mismatched
        # id type makes the numpy self-match mask (nids != qids) never
        # match and the output coercion undefined — never a wrong answer
        raise TypeError(
            f"queries.{id_col} is {q_id_t} but the stored index keys "
            f"are {id_t}: cast the query frame's id column to the "
            "index's id type before searching"
        )
    out_schema = f"query_id {id_t}, neighbor_id {id_t}, score double"
    cents = _centroids_of(spark, vdir)
    books = _codebooks_of(spark, vdir)
    n_sub, _, dsub = books.shape
    qids, qm, per_list = _probe_lists(queries, cents, id_col, vec_col, n_probe)
    if not len(qids):
        return spark.createDataFrame([], f"{out_schema}, rank int")
    probed = sorted(per_list)
    # LUT[q, j, c] = q̂_sub_j · books[j, c]; offsets[q, l] = q̂ · c_l
    lut = np.stack(
        [qm[:, j * dsub : (j + 1) * dsub] @ books[j].T for j in range(n_sub)],
        axis=1,
    )
    offsets = qm @ cents.T

    def scan(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            out_q: list[np.ndarray] = []
            out_n: list[np.ndarray] = []
            out_s: list[np.ndarray] = []
            for l, grp in pdf.groupby("list_id"):
                qi = per_list.get(int(l))
                if qi is None or not len(qi):
                    continue
                codes = np.stack(grp["codes"].to_numpy()).astype(np.int64)
                nids = grp[id_col].to_numpy()
                sub_lut = lut[qi]  # (|qi|, m, n_codes) — gathered once
                scores = np.broadcast_to(
                    offsets[qi, int(l)][:, None], (len(qi), len(nids))
                ).copy()
                for j in range(n_sub):
                    scores += sub_lut[:, j, codes[:, j]]
                for row_q, qx in enumerate(qi):
                    s = scores[row_q]
                    mask = nids != qids[qx]
                    s, nn = s[mask], nids[mask]
                    if not len(s):
                        continue
                    top = min(k, len(s))
                    sel = np.lexsort((nn, -s))[:top]
                    out_q.append(np.full(top, qids[qx]))
                    out_n.append(nn[sel])
                    out_s.append(s[sel])
            if out_q:
                yield pd.DataFrame(
                    {
                        "query_id": np.concatenate(out_q),
                        "neighbor_id": np.concatenate(out_n),
                        "score": np.concatenate(out_s),
                    }
                )

    codes_df = stored.filter(F.col("list_id").isin(probed))
    cand = codes_df.mapInPandas(scan, out_schema)
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


def ivfpq_search_refined(
    spark: SparkSession,
    index_path: str,
    queries: DataFrame,
    emb: DataFrame,
    k: int = 5,
    shortlist: int = 100,
    n_probe: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The full IVFADC serving recipe: ADC over the probed lists' codes
    produces a per-query SHORTLIST (the only stage that touches stored
    rows — m bytes each, probed lists only), then the float vectors of
    ONLY the |Q| × shortlist candidates are joined back from ``emb``
    and re-scored with exact cosine (shared ``exact_refine`` tail).
    Returns the ``cosine_topk`` contract; recall is tunable through
    ``shortlist`` and ``n_probe`` and is MEASURED in tests, never
    assumed."""
    cand = ivfpq_search(
        spark, index_path, queries, k=shortlist, n_probe=n_probe,
        id_col=id_col, vec_col=vec_col,
    )
    return exact_refine(cand, emb, queries, k, id_col, vec_col)
