"""Misra-Gries pass-1 throughput vs vocabulary size (VERDICT r08 item 7).

SCALING.md carries an honest caveat from r06: on the synthetic 31-word
certification corpus the OLD per-token Python dict loop beat the shipped
all-Arrow merge pass (every token hits the ``counters[w] += 1`` fast path
when the vocabulary fits in the k counters), while on realistic Zipf
streams the Arrow pass wins ~2x. This tool turns that caveat into a
measured CROSSOVER: it times both passes single-threaded over Zipf-1.2
streams at a sweep of vocabulary sizes and reports the vocab size where
the Arrow pass overtakes the dict loop.

Methodology (mirrors the r06 measurement): documents of ~60 tokens;
the Arrow pass is the REAL production kernel — ``split_pattern ->
list_flatten -> value_counts`` per batch folded through
``operators.frequent.mg_merge`` (k=64) — fed the same 8k-doc Arrow
batches ``mapInArrow`` delivers; the dict baseline is the classic
element-wise MG update over ``str.split()`` tokens (the r05 shape,
reimplemented here ONLY as a measurement baseline). Deterministic
seed; token mass is identical across variants at each vocab size.

Usage: python tools/mg_bench.py [--tokens 2000000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
K = 64
BATCH_DOCS = 8192
DOC_TOKENS = 60


def make_docs(vocab: int, n_tokens: int, seed: int = 7) -> list[str]:
    rng = np.random.default_rng(seed)
    ranks = np.arange(1, vocab + 1, dtype=np.float64)
    p = 1.0 / ranks**1.2
    p /= p.sum()
    toks = rng.choice(vocab, size=n_tokens, p=p)
    words = np.char.add("w", toks.astype("U7"))
    n_docs = n_tokens // DOC_TOKENS
    return [
        " ".join(words[i * DOC_TOKENS : (i + 1) * DOC_TOKENS])
        for i in range(n_docs)
    ]


def arrow_pass(docs: list[str]) -> tuple[float, int]:
    """The production kernel: per-batch C-speed histogram + mg_merge."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if REPO not in sys.path:
        sys.path.insert(0, REPO)
    from filmdatawarehouse_spark.operators.frequent import mg_merge

    batches = [
        pa.array(docs[i : i + BATCH_DOCS])
        for i in range(0, len(docs), BATCH_DOCS)
    ]
    t0 = time.perf_counter()
    summary = None
    for arr in batches:
        toks = pc.list_flatten(pc.split_pattern(arr, " "))
        vc = toks.value_counts()
        hist = pa.table(
            {"word": vc.field("values"), "est": pc.cast(vc.field("counts"), pa.int64())}
        )
        summary = mg_merge(summary, hist, K)
    dt = time.perf_counter() - t0
    return dt, summary.num_rows


def dict_pass(docs: list[str]) -> tuple[float, int]:
    """r05 baseline: element-wise MG over str.split() tokens."""
    t0 = time.perf_counter()
    counters: dict[str, int] = {}
    for doc in docs:
        for w in doc.split():
            if w in counters:
                counters[w] += 1
            elif len(counters) < K:
                counters[w] = 1
            else:
                dead = [x for x, c in counters.items() if c == 1]
                for x in counters:
                    counters[x] -= 1
                for x in dead:
                    del counters[x]
    dt = time.perf_counter() - t0
    return dt, len(counters)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--tokens", type=int, default=2_000_000)
    args = ap.parse_args()

    vocabs = [32, 128, 512, 2048, 8192, 32768, 131072, 524288]
    rows = []
    crossover = None
    for v in vocabs:
        docs = make_docs(v, args.tokens)
        n = len(docs) * DOC_TOKENS
        dt_a, _ = arrow_pass(docs)
        dt_d, _ = dict_pass(docs)
        row = {
            "vocab": v,
            "arrow_mtok_s": round(n / dt_a / 1e6, 2),
            "dict_mtok_s": round(n / dt_d / 1e6, 2),
            "arrow_over_dict": round(dt_d / dt_a, 2),
        }
        rows.append(row)
        if crossover is None and dt_a < dt_d:
            crossover = v
        print(json.dumps(row))
    print(
        json.dumps(
            {
                "k": K,
                "tokens": args.tokens,
                "crossover_vocab": crossover,
                "note": "smallest swept vocab where the Arrow pass beats "
                "the per-token dict loop (single thread, Zipf-1.2)",
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
