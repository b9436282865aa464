"""Iterative graph queries over the exact near-dup pair graph.

``graph_bfs_hops`` runs bounded-depth BFS (multi-source shortest hops)
with K fixed Spark iterations — the iterative-algorithm pattern the
engine's connected-components operators use (persist + localCheckpoint
per round, monotone frontier) — against a DuckDB RECURSIVE CTE oracle.
Distances are exact integers, so the hash gate is trivial to satisfy and
any lost/extra edge or early-terminated frontier hash-fails.

Edges are the EXACT Jaccard >= 0.7 pairs from the prefix-filter join
(``queries/extended.q_text_prefix_filter_pairs``): deterministic,
engine-replayable (the oracle brute-forces the same pair set), and
already subquadratic to produce at scale.

Reference analog: none (extended training-data surface); BFS itself is
textbook (level-synchronous frontier expansion).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BFS_MAX_HOPS = 4
BFS_SEED_MOD = 10  # seeds = docs with doc_id % BFS_SEED_MOD == 0
# (mod 10 so seeds actually intersect the near-dup clusters at the
#  certification SFs — mod 100 left every seed isolated at sf0.01 and the
#  BFS rounds never expanded)


def q_graph_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum hop count (<= BFS_MAX_HOPS) from the seed set (doc_id %
    10 == 0) to every reachable document over the exact near-dup pair
    graph. Level-synchronous BFS: K rounds of (frontier ⋈ edges) →
    min-aggregate, each round persisted and localCheckpoint'd to keep
    the plan flat (the dedup_clusters discipline).

    Scale shape: each round shuffles |frontier ⋈ edges| rows on doc_id
    with map-side min-combine; the edge frame is persisted once. K is a
    fixed bound, so the plan depth is constant. Distances are ints —
    no float anywhere.
    """
    from filmdatawarehouse_spark.io.sources import read_table
    from filmdatawarehouse_spark.operators.cache import managed_persist
    from filmdatawarehouse_spark.queries.extended import (
        prefix_filter_pairs_shared,
    )

    # shared, session-scoped pair frame (VERDICT r07 item 4): in a warm
    # session that also ran `text_prefix_filter_pairs`, the ~2s PPJoin
    # build is already persisted and BFS pays only the edge symmetrization
    pairs = prefix_filter_pairs_shared(spark, sf_dir).select(
        "doc_id_a", "doc_id_b"
    )
    # symmetric adjacency, persisted once for the K join rounds
    edges = managed_persist(
        pairs.select(
            F.col("doc_id_a").alias("src"), F.col("doc_id_b").alias("dst")
        ).unionAll(
            pairs.select(
                F.col("doc_id_b").alias("src"), F.col("doc_id_a").alias("dst")
            )
        )
    )

    seeds = (
        read_table(spark, sf_dir, "documents")
        .select("doc_id")
        .filter(F.col("doc_id") % BFS_SEED_MOD == 0)
    )
    # localCheckpoint ONLY (the dedup_clusters discipline, dedup.py:762):
    # the checkpoint already materializes each round's frontier as cached
    # RDD blocks, so wrapping it in managed_persist would store a second
    # copy of every round for zero benefit.
    #
    # LAZY checkpoint + count (r17, VERDICT r16 item 4): with
    # eager=True every round ran TWO jobs — the checkpoint
    # materialization
    # and then the fixed-point count over the just-cached blocks. A lazy
    # checkpoint defers materialization to the first action, so the
    # count job itself computes AND caches the round's frontier: K+1
    # fewer jobs per query, blocks and results bit-identical (the same
    # RDD is materialized by the same single-stage plan either way).
    dists = seeds.select(
        "doc_id", F.lit(0).cast("int").alias("hops")
    ).localCheckpoint(eager=False)
    reached = dists.count()  # materializes the checkpoint (one job)
    for _k in range(1, BFS_MAX_HOPS + 1):
        expanded = (
            dists.join(edges, dists.doc_id == edges.src)
            .select(F.col("dst").alias("doc_id"), (F.col("hops") + 1).alias("hops"))
            .unionAll(dists)
            .groupBy("doc_id")
            .agg(F.min("hops").cast("int").alias("hops"))
        )
        dists = expanded.localCheckpoint(eager=False)
        # fixed-point early exit (measured r08, SCALING.md): in
        # level-synchronous BFS a node's hop label is final at first
        # discovery, so an unchanged reached-count proves no label can
        # change either — further rounds are provably identity. The
        # count doubles as the checkpoint materialization (see above);
        # at sf0.1 the seed set reaches its closure in ONE round and
        # the early exit saves the other three rounds entirely.
        now = dists.count()
        if now == reached:
            break
        reached = now
    return dists


def graph_bfs_hops_oracle() -> str:
    """Recursive-CTE BFS over the brute-forced exact pair graph; UNION
    (not UNION ALL) deduplicates states so the recursion terminates, and
    the hop cap mirrors BFS_MAX_HOPS."""
    from filmdatawarehouse_spark.queries.extended import (
        PPJOIN_T_DEN,
        PPJOIN_T_NUM,
    )

    return f"""
        WITH RECURSIVE w AS (
          SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        ), sh AS (
          SELECT DISTINCT doc_id,
                 ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle
          FROM w, unnest(range(1, greatest(len(ws) - 1, 1))) AS t(i)
        ), sizes AS (
          SELECT doc_id, COUNT(*)::BIGINT AS n FROM sh GROUP BY doc_id
        ), inter AS (
          SELECT a.doc_id AS pa, b.doc_id AS pb, COUNT(*)::BIGINT AS ni
          FROM sh a JOIN sh b
            ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id
        ), pairs AS (
          SELECT pa, pb FROM inter
          JOIN sizes sa ON sa.doc_id = pa
          JOIN sizes sb ON sb.doc_id = pb
          WHERE {PPJOIN_T_DEN} * ni >= {PPJOIN_T_NUM} * (sa.n + sb.n - ni)
        ), edges AS (
          SELECT pa AS src, pb AS dst FROM pairs
          UNION ALL
          SELECT pb AS src, pa AS dst FROM pairs
        ), bfs AS (
          SELECT doc_id, 0 AS hops FROM documents
          WHERE doc_id % {BFS_SEED_MOD} = 0
          UNION
          SELECT e.dst AS doc_id, b.hops + 1 AS hops
          FROM bfs b JOIN edges e ON e.src = b.doc_id
          WHERE b.hops < {BFS_MAX_HOPS}
        )
        SELECT doc_id, MIN(hops)::INT AS hops FROM bfs GROUP BY doc_id
    """


GRAPH_QUERIES = {
    "graph_bfs_hops": (q_graph_bfs_hops, graph_bfs_hops_oracle()),
}
