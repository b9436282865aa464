"""Empirical scaling probe (r14, VERDICT r13 item 5; extended r15 with
the inverted-index family + exact GEMM dedup, VERDICT r14 item 2):
measure — not argue — how the heaviest extended operators scale with
corpus size.

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

r15 legs (VERDICT r14 item 2): the inverted-index pair family —
``text_containment_pairs`` and ``text_sparse_cosine_pairs``, run as the
REGISTERED query functions over a probe-local sf_dir so the measured
plan is exactly the certified one — and the exact block-GEMM embedding
dedup (``operators.dedup.embedding_cosine_pairs``). Predictions to
check against: the DF-capped inverted indexes move ~linear-or-less
bytes (the caps are ABSOLUTE rarity thresholds, so a 10x corpus pushes
MORE terms over the cap and out of the index — sublinear kept-postings
is correct behavior, not a measurement artifact); the exact GEMM is the
documented n² correctness anchor — its expected exponent is ~2, and
the probe's value is confirming the BOUNDED-memory claim (block tasks
+ distributed re-score), not pretending it's the production route
(that's IVF/SemDeDup).

Shuffle bytes come from the Spark UI REST API (the session here enables
`spark.ui.enabled` just for this probe; localhost only): the sum of
completed stages' shuffle write bytes, differenced around each measured
operation. ``spark.ui.retainedStages`` is raised to 20,000 (ADVICE
r14): at --factor 10 a run can outgrow the 1,000-stage default and
silently DEFLATE the differenced bytes for the large run — the exact
number the tool exists to measure.

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

    path = f"{out_dir}/documents.parquet"
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

    path = f"{out_dir}/embeddings.parquet"
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
    ap.add_argument(
        "--ops",
        default="minhash,ivfpq_build,ivfpq_search,containment,"
        "containment_prefix,sparse_cosine,gemm_dedup",
        help="comma list of legs to run (the exact-GEMM anchor is n² by "
        "design — skip it at large bases)",
    )
    args = ap.parse_args()
    want = set(args.ops.split(","))

    from pyspark.sql import functions as F

    from filmdatawarehouse_spark.operators.dedup import (
        embedding_cosine_pairs,
        minhash_dedup_pairs,
    )
    from filmdatawarehouse_spark.operators.ivfpq import (
        ivfpq_index_build,
        ivfpq_search_refined,
    )
    from filmdatawarehouse_spark.operators.cache import release_managed
    from filmdatawarehouse_spark.queries.extended import (
        COSINE_T,
        q_text_containment_pairs,
        q_text_containment_prefix_pairs,
        q_text_sparse_cosine_pairs,
    )
    from filmdatawarehouse_spark.session import get_spark

    spark = get_spark(
        "fdw-scale-probe",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": "4049",
            # ADVICE r14: evicted early stages silently deflate the
            # differenced shuffle bytes at --factor 10
            "spark.ui.retainedStages": "20000",
        },
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
            # per-scale dir shaped like a test-corpus sf_dir, so the
            # REGISTERED query functions run on it unchanged (the
            # measured plan is exactly the certified one)
            sfdir = f"{work}/corpus{scale}"
            docs_path = _gen_docs(spark, n_docs, 42, sfdir)
            vecs_path = _gen_vecs(spark, n_vecs, 42, sfdir)
            docs = spark.read.parquet(docs_path)
            vecs = spark.read.parquet(vecs_path)
            rec: dict[str, float] = {"n_docs": n_docs, "n_vecs": n_vecs}

            def timed(name, fn):
                if name not in want:
                    return
                s0 = _shuffle_write_bytes(ui_port)
                t0 = time.perf_counter()
                try:
                    fn()
                except Exception as exc:  # noqa: BLE001 — keep probing;
                    # the failed leg renders as n/a in the report
                    rec[f"{name}_error"] = f"{type(exc).__name__}: {exc}"[:200]
                    print(f"probe: {name} FAILED: {exc}", file=sys.stderr)
                    release_managed()
                    return
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
            # r15 legs: the inverted-index pair family as the REGISTERED
            # queries over the probe-local sf_dir, + the exact GEMM
            # anchor (expected exponent ~2 by design; see module banner)
            timed(
                "containment",
                lambda: q_text_containment_pairs(spark, sfdir)
                .write.format("noop").mode("overwrite").save(),
            )
            timed(
                "containment_prefix",
                lambda: q_text_containment_prefix_pairs(spark, sfdir)
                .write.format("noop").mode("overwrite").save(),
            )
            timed(
                "sparse_cosine",
                lambda: q_text_sparse_cosine_pairs(spark, sfdir)
                .write.format("noop").mode("overwrite").save(),
            )
            timed(
                "gemm_dedup",
                lambda: embedding_cosine_pairs(vecs, threshold=COSINE_T)
                .write.format("noop").mode("overwrite").save(),
            )
            rec["n_lists"] = n_lists
            results[f"{scale}x"] = rec

        ops = (
            "minhash", "ivfpq_build", "ivfpq_search",
            "containment", "containment_prefix", "sparse_cosine",
            "gemm_dedup",
        )
        base, big = results["1x"], results[f"{args.factor}x"]

        def exp_of(suffix: str, op: str) -> float | None:
            b, g = base.get(f"{op}_{suffix}"), big.get(f"{op}_{suffix}")
            if not b or not g or b <= 0 or g <= 0:
                return None  # zero/absent axis: exponent undefined
            return round(math.log(g / b) / math.log(args.factor), 3)

        exponents = {
            op: e for op in ops if (e := exp_of("sec", op)) is not None
        }
        byte_exponents = {
            op: e
            for op in ops
            if (e := exp_of("shuffle_mb", op)) is not None
        }
        out = {
            "factor": args.factor,
            "results": results,
            "observed_exponents": exponents,
            "observed_byte_exponents": byte_exponents,
        }
        print(json.dumps(out, indent=1))
        print("\nmarkdown:\n")
        print("| op | 1x sec | 1x shuffle MB | "
              f"{args.factor}x sec | {args.factor}x shuffle MB | "
              "wall exp | byte exp |")
        print("|---|---|---|---|---|---|---|")
        for op in ops:
            # ADVICE r14: an op with a zero/failed timing must render as
            # n/a, not KeyError the report after the runs completed
            print(
                f"| {op} | {base.get(f'{op}_sec', 'n/a')} | "
                f"{base.get(f'{op}_shuffle_mb', 'n/a')} | "
                f"{big.get(f'{op}_sec', 'n/a')} | "
                f"{big.get(f'{op}_shuffle_mb', 'n/a')} | "
                f"{exponents.get(op, 'n/a')} | "
                f"{byte_exponents.get(op, 'n/a')} |"
            )
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
