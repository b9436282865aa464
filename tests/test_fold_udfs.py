"""Bit-identity of the Arrow fold UDFs vs the pinned expression chain.

r16 optimization: the frame-level similarity paths compute dot/norm via
``fold_dot_udf``/``fold_norm_udf`` (one vectorized numpy left fold per
Arrow batch) instead of the 64-term unrolled Catalyst chain, whose
~1,000-node tree cost 0.5-1.2 s of driver-side analysis per fresh build
(OPTIMIZATION_r16.md "similarity family"). The determinism contract —
the oracle replays the SAME left-to-right IEEE-double fold — survives
only if the two implementations are BIT-identical, which is what these
tests pin, on the real corpus and on adversarial values (denormals,
huge/tiny magnitudes, nulls).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from filmdatawarehouse_spark.io.sources import read_table
from filmdatawarehouse_spark.operators.similarity import (
    EMBEDDING_DIM,
    dot,
    fold_dot_udf,
    fold_norm_udf,
    norm,
)


def test_fold_norm_bit_identical_on_corpus(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings")
    both = emb.select(
        "vec_id",
        norm(F.col("embedding")).alias("chain"),
        fold_norm_udf()(F.col("embedding")).alias("fold"),
    ).collect()
    assert both, "empty embeddings table"
    bad = [(r.vec_id, r.chain, r.fold) for r in both if r.chain != r.fold]
    assert not bad, f"norm fold drifted from the chain: {bad[:3]}"


def test_fold_dot_bit_identical_on_corpus_pairs(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings").limit(40)
    a = emb.select(F.col("vec_id").alias("ida"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("idb"), F.col("embedding").alias("vb"))
    pairs = a.crossJoin(b)
    both = pairs.select(
        "ida",
        "idb",
        dot(F.col("va"), F.col("vb")).alias("chain"),
        fold_dot_udf()(F.col("va"), F.col("vb")).alias("fold"),
    ).collect()
    assert both
    bad = [r for r in both if r.chain != r.fold]
    assert not bad, f"dot fold drifted from the chain: {bad[:3]}"


def test_fold_handles_null_and_adversarial_values(spark):
    # denormal, negative-zero, large/small magnitude mixes — the cases
    # where a reassociated or FMA-fused sum WOULD drift; plus a NULL
    # vector, which must stay NULL like the expression chain.
    dim = 4
    rows = [
        (1, [1e308, 1.0, -1e308, 1.0]),
        (2, [5e-324, 1.0, -1.0, 5e-324]),
        (3, [-0.0, 0.0, 1e-200, 1e200]),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    got = df.select(
        "vec_id",
        norm(F.col("v"), dim).alias("chain"),
        fold_norm_udf(dim)(F.col("v")).alias("fold"),
        dot(F.col("v"), F.col("v"), dim).alias("chain_dot"),
        fold_dot_udf(dim)(F.col("v"), F.col("v")).alias("fold_dot"),
    ).collect()
    for r in got:
        assert r.chain == r.fold or (r.chain is None and r.fold is None), r
        assert r.chain_dot == r.fold_dot or (
            r.chain_dot is None and r.fold_dot is None
        ), r
    null_row = [r for r in got if r.vec_id == 4][0]
    assert null_row.fold is None and null_row.fold_dot is None
