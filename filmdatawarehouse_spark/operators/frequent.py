"""Distributed heavy hitters: Misra–Gries candidate pass + exact recount.

The two-pass frequent-items shape that works at 100 TB where a full word
histogram does not: the classic one-shuffle ``explode → groupBy(word)``
histogram moves one row per TOKEN (≈ corpus-sized shuffle) and its hottest
reducer gets the hottest word. Here:

- **Pass 1 (zero shuffle)**: each partition runs a Misra–Gries summary with
  ``k`` counters over its tokens and emits ≤ k candidate rows. Guarantee
  (standard distributed-MG argument): an item with global count
  C > N/k must end pass 1 with a positive counter in at least one
  partition — if it survived nowhere, every partition had
  count_p ≤ n_p/k, summing to C ≤ N/k. So the union of survivors is a
  SUPERSET of every global 1/k-heavy hitter, at ≤ k rows per partition.
- **Pass 2 (one bounded shuffle)**: exact recount of candidate tokens only
  — a broadcast semi-join keeps ≤ k × n_partitions distinct words' tokens,
  then a map-side-combined count and the exact ``count > N/k`` filter.

The final answer is EXACT and partitioning-independent (extra candidates
fall to the threshold filter; missing ones are impossible by the superset
guarantee) — which is what makes it hash-certifiable against a plain
full-histogram SQL oracle. Reference analog: none (extended training-data
surface); the algorithm is the published Misra–Gries (1982) summary.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MG_COUNTERS = 64


def mg_candidates(
    docs: DataFrame,
    k: int = MG_COUNTERS,
    text_col: str = "text",
) -> DataFrame:
    """Per-partition Misra–Gries survivors: ≤ ``k`` (word, est) rows per
    partition, est = the (under-)count the summary retained. Zero-shuffle
    Arrow stage; state is exactly ``k`` counters regardless of partition
    size."""
    import pandas as pd

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        for pdf in batches:
            for txt in pdf[text_col]:
                for w in (txt or "").split(" "):
                    if w in counters:
                        counters[w] += 1
                    elif len(counters) < k:
                        counters[w] = 1
                    else:
                        # decrement-all step, dropping zeroed counters
                        dead = []
                        for key in counters:
                            counters[key] -= 1
                            if counters[key] == 0:
                                dead.append(key)
                        for key in dead:
                            del counters[key]
        yield pd.DataFrame(
            {"word": list(counters), "est": list(counters.values())}
        )

    return docs.select(text_col).mapInPandas(summarize, "word string, est long")


def heavy_hitters_exact(
    docs: DataFrame,
    k: int = MG_COUNTERS,
    text_col: str = "text",
) -> DataFrame:
    """All words with exact corpus frequency > N/k (N = total tokens),
    with their exact counts — computed without ever shuffling the full
    token stream: MG candidates (pass 1) bound the recount (pass 2).

    Output: (word, cnt, total_tokens) — total rides along so the
    threshold is visible/certifiable in the result itself.
    """
    cand = mg_candidates(docs, k, text_col).select("word").distinct()
    tokens = docs.select(
        F.explode(F.split(F.col(text_col), " ")).alias("word")
    )
    total = tokens.agg(F.count(F.lit(1)).alias("total_tokens"))
    counts = (
        tokens.join(F.broadcast(cand), "word", "left_semi")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(
            F.col("cnt").cast("double")
            > F.col("total_tokens").cast("double") / F.lit(float(k))
        )
        .select("word", "cnt", "total_tokens")
    )
