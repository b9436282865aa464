"""Micro-bench: PQ ADC search vs exact brute-force cosine, plus the
PERSISTED index paths (flat IVF vs IVF-PQ) with real on-disk byte
accounting (r12).

`tests/test_pq.py` / `tests/test_ivfpq.py` certify CORRECTNESS
(numpy-replay exact codes/ADC scores, measured refine recall); this
measures the WIN the compression and the inverted lists exist for — the
bytes a search must scan and the wall time. The byte accounting is the
structural number that holds at any scale: exact reads dim × 4B floats
per row, ADC reads m × 4B int32 codes (m bytes in a production int8
layout; parquet int32 here), refine adds |Q| × shortlist float rows;
the persisted indexes additionally PRUNE to n_probe/n_lists of the
files at the source, reported here as actual parquet bytes on disk
(vectors dir vs codes dir) times the probed fraction.

Usage: python tools/pq_bench.py [sf_dir]   (default /root/testdata/sf0.1)
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    from pyspark.sql import functions as F

    from filmdatawarehouse_spark.io.sources import read_table
    from filmdatawarehouse_spark.operators.quantize import (
        pq_encode,
        pq_topk,
        pq_topk_refined,
        pq_train,
    )
    from filmdatawarehouse_spark.operators.similarity import (
        EMBEDDING_DIM,
        cosine_topk,
        norm,
    )
    from filmdatawarehouse_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("pq-bench")

    emb = read_table(spark, sf_dir, "embeddings")
    unit = emb.select(
        "vec_id",
        F.transform(
            "embedding", lambda x: x.cast("double") / norm(F.col("embedding"))
        ).alias("embedding"),
    ).localCheckpoint(eager=True)  # isolate the normalize cost from timings
    n = unit.count()
    queries = unit.filter(F.col("vec_id") < 10)

    m, n_codes, shortlist = 8, 16, max(100, n // 50)
    t0 = time.time()
    books = pq_train(unit, m=m, n_codes=n_codes, n_iters=4)
    train_s = time.time() - t0
    codes = pq_encode(unit, books).localCheckpoint(eager=True)  # the stored table

    def timed(fn):
        t = time.time()
        rows = fn().count()
        return round(time.time() - t, 4), rows

    exact_s, _ = timed(lambda: cosine_topk(unit, queries, k=5))
    adc_s, _ = timed(lambda: pq_topk(codes, queries, books, k=5))
    refine_s, _ = timed(
        lambda: pq_topk_refined(
            unit, codes, books, queries, k=5, shortlist=shortlist
        )
    )

    exact_set = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk(unit, queries, k=5).collect()
    }
    refined_set = {
        (r.query_id, r.neighbor_id)
        for r in pq_topk_refined(
            unit, codes, books, queries, k=5, shortlist=shortlist
        ).collect()
    }
    recall = len(exact_set & refined_set) / len(exact_set)

    # --- persisted index paths: flat IVF vs IVF-PQ, real disk bytes ---
    import shutil
    import tempfile

    from filmdatawarehouse_spark.operators.ivfpq import (
        ivfpq_codes_path,
        ivfpq_index_build,
        ivfpq_search_refined,
        ivfpq_version_dir,
    )
    from filmdatawarehouse_spark.operators.similarity import (
        ivf_index_build,
        ivf_index_search,
        ivf_index_vectors_path,
    )

    def dir_bytes(path: str) -> int:
        return sum(
            os.path.getsize(os.path.join(dp, f))
            for dp, _, files in os.walk(path)
            for f in files
            if f.endswith(".parquet")
        )

    n_lists, n_probe = 16, 4
    tmp = tempfile.mkdtemp(prefix="annbench-")
    try:
        ivf_idx = os.path.join(tmp, "ivf")
        pq_idx = os.path.join(tmp, "ivfpq")
        t0 = time.time()
        ivf_index_build(unit, ivf_idx, n_lists=n_lists)
        ivf_build_s = time.time() - t0
        t0 = time.time()
        ivfpq_index_build(unit, pq_idx, n_lists=n_lists, m=m, n_codes=n_codes)
        ivfpq_build_s = time.time() - t0
        ivf_search_s, _ = timed(
            lambda: ivf_index_search(spark, ivf_idx, queries, k=5, n_probe=n_probe)
        )
        ivfpq_search_s, _ = timed(
            lambda: ivfpq_search_refined(
                spark, pq_idx, queries, unit, k=5,
                shortlist=shortlist, n_probe=n_probe,
            )
        )
        ivfpq_set = {
            (r.query_id, r.neighbor_id)
            for r in ivfpq_search_refined(
                spark, pq_idx, queries, unit, k=5,
                shortlist=shortlist, n_probe=n_probe,
            ).collect()
        }
        ivfpq_recall = len(exact_set & ivfpq_set) / len(exact_set)
        vectors_bytes = dir_bytes(ivf_index_vectors_path(spark, ivf_idx))
        codes_bytes = dir_bytes(ivfpq_codes_path(spark, pq_idx))
        persisted = {
            "n_lists": n_lists,
            "n_probe": n_probe,
            "ivf_build_s": round(ivf_build_s, 4),
            "ivfpq_build_s": round(ivfpq_build_s, 4),
            "ivf_search_s": ivf_search_s,
            "ivfpq_refined_search_s": ivfpq_search_s,
            "ivfpq_refined_recall_at_5": round(ivfpq_recall, 4),
            "vectors_parquet_bytes": vectors_bytes,
            "codes_parquet_bytes": codes_bytes,
            # what a probed search actually opens, flat vs PQ
            "scan_bytes_ivf": int(vectors_bytes * n_probe / n_lists),
            "scan_bytes_ivfpq": int(codes_bytes * n_probe / n_lists),
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "n_vectors": n,
                "m": m,
                "n_codes": n_codes,
                "shortlist": shortlist,
                "train_s": round(train_s, 4),
                "exact_s": exact_s,
                "adc_s": adc_s,
                "refine_s": refine_s,
                "refine_recall_at_5": round(recall, 4),
                "bytes_per_row_exact": EMBEDDING_DIM * 4,
                "bytes_per_row_codes": m * 4,
                "bytes_per_row_codes_int8_layout": m,
                **persisted,
            }
        )
    )


if __name__ == "__main__":
    main()
