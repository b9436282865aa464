"""Empirical scaling probe (r14, VERDICT r13 item 5): measure — not
argue — how the two heaviest extended operators scale with corpus size.

SCALING.md predicts near-LINEAR cost for MinHash/LSH dedup (the banded
shuffle moves O(n) signature-derived rows; candidate verification is
~linear at bounded bucket occupancy) and for the IVF-PQ build (k-means
passes + residual encode are O(n) scans), with SEARCH sublinear in the
corpus (n_probe/n_lists of the lists are read). Those were shuffle-byte
arithmetic through r13; this tool generates two deterministic synthetic
corpora from the SAME generator at 1x and FACTOR x the sf0.1 shape
(5,000 docs / 2,000 x 64-d vectors), runs the same operators on both,
and reports wall seconds + actual shuffle bytes per stage-set plus the
observed scaling exponent log(t_Nx / t_1x) / log(N) — apples-to-apples
by construction (same generator, same duplicate rate, same cluster
structure; measuring sf0.1 against a differently-generated corpus
would confound the exponent with distribution shift).

Shuffle bytes come from the Spark UI REST API (the session here enables
`spark.ui.enabled` just for this probe; localhost only): the sum of
completed stages' shuffle write bytes, differenced around each measured
operation.

Usage:
    python tools/scale_probe.py [--factor 10] [--base-docs 5000]
        [--base-vecs 2000]

Prints a JSON record and a ready-to-paste markdown table; leaves
nothing behind (corpora and indexes build under a temp dir removed at
exit).
"""

from __future__ import annotations

import argparse
import json
import math
import os
import shutil
import sys
import tempfile
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

VOCAB_CORE = [
    "batch", "part", "spark", "line", "column", "order", "small", "sort",
    "fast", "value", "scan", "hash", "slow", "group", "agg", "filter",
    "query", "big", "key", "window", "join", "shuffle", "merge", "read",
    "write", "cache", "plan", "stage", "task", "row",
]


def _gen_docs(spark, n_docs: int, seed: int, out_dir: str) -> str:
    """documents-shaped corpus (doc_id, text, lang, source, n_chars):
    10-100 words per doc from a power-law-ish vocabulary, ~2% planted
    near-duplicates (one word substituted — the workload MinHash exists
    for), deterministic in (n_docs, seed). Generation is distributed
    (mapInPandas over an id range), never a driver-side list."""
    import numpy as np
    import pandas as pd

    vocab = np.array(
        VOCAB_CORE + [f"tok{i}" for i in range(470)], dtype=object
    )
    probs = 1.0 / np.arange(1, len(vocab) + 1) ** 0.8
    probs /= probs.sum()

    def gen(batches):
        for pdf in batches:
            rows = []
            for doc_id in pdf["id"].to_numpy():
                rng = np.random.default_rng(seed * 1_000_003 + int(doc_id))
                n_words = int(rng.integers(10, 101))
                words = rng.choice(vocab, size=n_words, p=probs)
                if doc_id % 50 == 49:  # ~2%: near-dup of doc_id-1
                    prev = np.random.default_rng(
                        seed * 1_000_003 + int(doc_id) - 1
                    )
                    n_prev = int(prev.integers(10, 101))
                    words = prev.choice(vocab, size=n_prev, p=probs)
                    words[0] = "mutated"
                text = " ".join(words)
                rows.append(
                    (
                        int(doc_id),
                        text,
                        ["en", "de", "fr", "es", "it"][int(doc_id) % 5],
                        f"src{int(doc_id) % 20}",
                        len(text),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
            )

    path = f"{out_dir}/docs_{n_docs}"
    (
        spark.range(0, n_docs, 1, 32)
        .mapInPandas(
            gen,
            "doc_id bigint, text string, lang string, source string, "
            "n_chars bigint",
        )
        .write.mode("overwrite")
        .parquet(path)
    )
    return path


def _gen_vecs(spark, n_vecs: int, seed: int, out_dir: str) -> str:
    """embeddings-shaped corpus (vec_id, embedding float[64], label):
    10 gaussian clusters, deterministic in (n_vecs, seed)."""
    import numpy as np
    import pandas as pd

    centers = np.random.default_rng(seed).normal(size=(10, 64))

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rows = []
            for vid in ids:
                rng = np.random.default_rng(seed * 7_000_003 + int(vid))
                label = int(vid) % 10
                v = centers[label] + 0.3 * rng.normal(size=64)
                rows.append((int(vid), [float(x) for x in v], label))
            yield pd.DataFrame(
                rows, columns=["vec_id", "embedding", "label"]
            )

    path = f"{out_dir}/vecs_{n_vecs}"
    (
        spark.range(0, n_vecs, 1, 32)
        .mapInPandas(gen, "vec_id bigint, embedding array<float>, label int")
        .write.mode("overwrite")
        .parquet(path)
    )
    return path


def _shuffle_write_bytes(ui_port: int) -> int:
    """Sum of completed stages' shuffle write bytes from the local UI
    REST API — differenced around each measured op by the caller."""
    base = f"http://127.0.0.1:{ui_port}/api/v1/applications"
    with urllib.request.urlopen(base, timeout=10) as r:
        apps = json.load(r)
    app_id = apps[0]["id"]
    total = 0
    with urllib.request.urlopen(
        f"{base}/{app_id}/stages?status=complete", timeout=10
    ) as r:
        for st in json.load(r):
            total += st.get("shuffleWriteBytes", 0)
    return total


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--base-docs", type=int, default=5000)
    ap.add_argument("--base-vecs", type=int, default=2000)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from filmdatawarehouse_spark.operators.dedup import minhash_dedup_pairs
    from filmdatawarehouse_spark.operators.ivfpq import (
        ivfpq_index_build,
        ivfpq_search_refined,
    )
    from filmdatawarehouse_spark.operators.cache import release_managed
    from filmdatawarehouse_spark.session import get_spark

    spark = get_spark(
        "fdw-scale-probe",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4049"},
    )
    ui_port = int(spark.sparkContext.uiWebUrl.rsplit(":", 1)[1])
    work = tempfile.mkdtemp(prefix="fdw-scale-probe-")
    results: dict[str, dict] = {}
    try:
        # JVM/codegen warm-up outside any measurement
        spark.range(1000).groupBy((F.col("id") % 7).alias("k")).count(
        ).write.format("noop").mode("overwrite").save()

        for scale in (1, args.factor):
            n_docs = args.base_docs * scale
            n_vecs = args.base_vecs * scale
            docs_path = _gen_docs(spark, n_docs, 42, work)
            vecs_path = _gen_vecs(spark, n_vecs, 42, work)
            docs = spark.read.parquet(docs_path)
            vecs = spark.read.parquet(vecs_path)
            rec: dict[str, float] = {"n_docs": n_docs, "n_vecs": n_vecs}

            def timed(name, fn):
                s0 = _shuffle_write_bytes(ui_port)
                t0 = time.perf_counter()
                fn()
                rec[f"{name}_sec"] = round(time.perf_counter() - t0, 3)
                rec[f"{name}_shuffle_mb"] = round(
                    (_shuffle_write_bytes(ui_port) - s0) / 1e6, 3
                )
                release_managed()

            timed(
                "minhash",
                lambda: minhash_dedup_pairs(docs, n_docs=n_docs)
                .write.format("noop").mode("overwrite").save(),
            )
            idx = f"{work}/idx_{scale}"
            # n_lists scales with sqrt(n) (SCALING.md sizing rule) so the
            # per-list occupancy stays comparable across scales
            n_lists = max(16, int(math.sqrt(n_vecs)))
            timed(
                "ivfpq_build",
                lambda: ivfpq_index_build(
                    vecs, idx, n_lists=n_lists, m=8, n_codes=16, n_iters=4
                ),
            )
            q = vecs.filter(F.col("vec_id") < 10)
            timed(
                "ivfpq_search",
                lambda: ivfpq_search_refined(
                    spark, idx, q, vecs, k=5, shortlist=300,
                    n_probe=max(4, n_lists // 2),
                )
                .write.format("noop").mode("overwrite").save(),
            )
            rec["n_lists"] = n_lists
            results[f"{scale}x"] = rec

        base, big = results["1x"], results[f"{args.factor}x"]
        exponents = {
            op: round(
                math.log(big[f"{op}_sec"] / base[f"{op}_sec"])
                / math.log(args.factor),
                3,
            )
            for op in ("minhash", "ivfpq_build", "ivfpq_search")
            if base.get(f"{op}_sec") and big.get(f"{op}_sec")
        }
        out = {
            "factor": args.factor,
            "results": results,
            "observed_exponents": exponents,
        }
        print(json.dumps(out, indent=1))
        print("\nmarkdown:\n")
        print("| op | 1x sec | 1x shuffle MB | "
              f"{args.factor}x sec | {args.factor}x shuffle MB | "
              "observed exponent |")
        print("|---|---|---|---|---|---|")
        for op in ("minhash", "ivfpq_build", "ivfpq_search"):
            print(
                f"| {op} | {base[f'{op}_sec']} | "
                f"{base[f'{op}_shuffle_mb']} | {big[f'{op}_sec']} | "
                f"{big[f'{op}_shuffle_mb']} | {exponents[op]} |"
            )
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
