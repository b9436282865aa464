"""Micro-bench: PQ ADC search vs exact brute-force cosine (r12).

`tests/test_pq.py` certifies CORRECTNESS (numpy-replay exact codes/ADC
scores, measured refine recall); this measures the WIN the compression
exists for — the bytes a search must scan and the wall time, exact vs
ADC vs shortlist+refine, over the sf's embeddings table. The byte
accounting is the structural number that holds at any scale: exact reads
dim × 4B floats per row, ADC reads m × 4B int32 codes (m bytes in a
production int8 layout; parquet int32 here), refine adds |Q| × shortlist
float rows.

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
            }
        )
    )


if __name__ == "__main__":
    main()
