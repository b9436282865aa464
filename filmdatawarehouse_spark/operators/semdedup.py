"""SemDeDup: semantic deduplication over an embedding column (Abbas et
al., "SemDeDup: Data-efficient learning at web-scale through semantic
deduplication", 2023).

Where MinHash/SimHash catch LEXICAL near-duplicates, SemDeDup prunes
documents that SAY the same thing: cluster the embedding space with
k-means, then inside each cluster drop every vector whose cosine to an
already-kept cluster member clears a threshold. The pairwise work is
confined to clusters — O(Σ|c|²·d) instead of O(N²·d) — which is the
whole scale argument: at 100 TB you size ``n_clusters`` so the expected
cluster is a few thousand rows (n_clusters ≈ N / target_cluster_size)
and every cluster's greedy pass fits one task. A cluster that exceeds
``cluster_cap`` REFUSES loudly (resize n_clusters / re-train) rather
than running a quadratic task to an OOM — the same refuse-don't-guess
policy as ``dup_clusters``' max_iters and the MERGE sink's ambiguous
pointer.

Determinism contract (what the numpy-replay oracle pins): clusters come
from ``kmeans_centroids`` (seeded init, fixed iteration count);
assignment is argmax cosine with ties to the LOWEST list; the greedy
pass visits ids ASCENDING and a dropped row records ``dup_of`` = the
FIRST kept row attaining its maximum cosine (numpy argmax order —
lowest kept id among ties). The threshold is INCLUSIVE: a row whose
max cosine to a kept cluster-mate is EXACTLY ``threshold`` is DROPPED
(``sims >= threshold`` — the boundary belongs to the duplicate side,
matching the paper's "within epsilon" ball). Cosines are computed on
float64-normalized vectors — inputs need not be unit-norm, and the
realized boundary is the post-normalization dot product.
``tests/test_semdedup.py`` pins both sides of the boundary at ±1e-6
and the exact-equality case (VERDICT r13 item 4).

Plan shape: one zero-shuffle assignment scan (centroids in the task
closure) + ONE hash exchange on cluster_id into the grouped Arrow
stage. No driver-side pair loops; the only collects are the k-means
partials (O(n_clusters · dim)).

No reference analog (the reference stops at exact SQL over rental
facts); part of the LLM-training-pipeline extension surface
(SURVEY.md §6), sibling to ``dedup_embedding_cosine`` (exact, global)
and the persisted ANN indexes (``operators.ivfpq``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from filmdatawarehouse_spark.operators.similarity import (
    _assign_lists,
    kmeans_centroids,
)

CLUSTER_CAP = 100_000


def semantic_dedup(
    emb: DataFrame,
    n_clusters: int = 16,
    threshold: float = 0.95,
    n_iters: int = 4,
    cluster_cap: int = CLUSTER_CAP,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """``(id, cluster_id, keep boolean, dup_of id|null)`` — the SemDeDup
    verdict for every input row. ``keep`` rows form the deduplicated
    corpus; each dropped row names the kept cluster-mate it duplicates
    (cosine ≥ threshold; see the module banner for the deterministic
    tie rules). Raises on any cluster larger than ``cluster_cap``."""
    import numpy as np
    import pandas as pd

    cents = kmeans_centroids(emb, n_clusters, n_iters, id_col, vec_col)
    assigned = _assign_lists(emb, cents, id_col, vec_col)
    id_t = emb.schema[id_col].dataType.simpleString()

    def greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) > cluster_cap:
            raise ValueError(
                f"cluster {int(pdf['list_id'].iloc[0])} has {len(pdf)} rows "
                f"> cluster_cap={cluster_cap}: the greedy pass would run a "
                "quadratic task — raise n_clusters (target N/n_clusters of "
                "a few thousand) or cluster_cap if the memory is truly there"
            )
        pdf = pdf.sort_values(id_col, kind="stable").reset_index(drop=True)
        x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
        norms = np.sqrt((x * x).sum(axis=1))
        if not np.all(norms > 0.0):  # refuse-don't-guess (ADVICE r12):
            # a zero vector has no direction — normalizing yields NaN
            # rows whose cosines are silently False (always kept) and
            # whose NaN scores corrupt argmax assignment
            bad = pdf[id_col].to_numpy()[norms == 0.0][:5]
            raise ValueError(
                f"zero-norm {vec_col} for {id_col} in {list(bad)}: "
                "cosine similarity is undefined for the zero vector — "
                "filter or impute these rows before semantic_dedup"
            )
        x /= norms[:, None]
        n = len(pdf)
        keep = np.zeros(n, dtype=bool)
        # object list, not an int64 buffer: dup_of carries the id
        # column's own values (any id type the schema declares)
        dup_of: list = [None] * n
        kept_rows: list[int] = []
        for i in range(n):
            if kept_rows:
                sims = x[kept_rows] @ x[i]
                j = int(np.argmax(sims))  # first max -> lowest kept id
                if sims[j] >= threshold:
                    dup_of[i] = pdf[id_col].iloc[kept_rows[j]]
                    continue
            keep[i] = True
            kept_rows.append(i)
        out = pdf[[id_col, "list_id"]].rename(columns={"list_id": "cluster_id"})
        out["keep"] = keep
        out["dup_of"] = pd.Series(dup_of, dtype=object)
        return out

    return assigned.groupBy("list_id").applyInPandas(
        greedy,
        f"{id_col} {id_t}, cluster_id int, keep boolean, dup_of {id_t}",
    )
