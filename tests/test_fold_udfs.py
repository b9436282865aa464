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


def test_fold_null_elements_match_chain(spark):
    # ADVICE r16: the r16 pandas fold turned a NULL *element* into NaN
    # (the pandas boundary loses the child validity bitmap), and NaN
    # sorts ABOVE every real cosine in Spark — a null-bearing vector
    # flipped from silently-dropped to top-ranked. The Arrow-native fold
    # must yield NULL exactly like the expression chain; a data NaN must
    # stay NaN (both engines rank it — that is the chain's semantic).
    dim = 3
    rows = [
        (1, [1.0, 2.0, 3.0]),
        (2, [1.0, None, 3.0]),  # NULL element -> NULL (not NaN)
        (3, [float("nan"), 1.0, 1.0]),  # data NaN -> NaN
        (4, [1.0, 2.0, None]),  # NULL in last fold position -> NULL
    ]
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    got = {
        r.vec_id: r
        for r in df.select(
            "vec_id",
            norm(F.col("v"), dim).alias("chain"),
            fold_norm_udf(dim)(F.col("v")).alias("fold"),
            dot(F.col("v"), F.col("v"), dim).alias("chain_dot"),
            fold_dot_udf(dim)(F.col("v"), F.col("v")).alias("fold_dot"),
        ).collect()
    }
    for vid in (1, 2, 3, 4):
        r = got[vid]
        # NaN != NaN, so compare through repr-equality on the pair
        assert (r.chain == r.fold) or (r.chain is None and r.fold is None) or (
            str(r.chain) == str(r.fold)
        ), r
        assert (r.chain_dot == r.fold_dot) or (
            r.chain_dot is None and r.fold_dot is None
        ) or (str(r.chain_dot) == str(r.fold_dot)), r
    assert got[2].fold is None and got[2].fold_dot is None
    assert got[4].fold is None and got[4].fold_dot is None
    assert str(got[3].fold) == "nan" and str(got[3].fold_dot) == "nan"


def test_fold_short_and_ragged_arrays_yield_null(spark):
    # ADVICE r16: with dim=None the r16 fold crashed on ragged batches
    # (np.stack ValueError) and with a fixed dim it raised IndexError on
    # short arrays. The Arrow fold yields NULL for rows the fold cannot
    # read (short of dim; a/b width mismatch) — the non-ANSI
    # element_at / zip_with null propagation the chain had — and still
    # folds every well-formed row in the same batch.
    rows = [
        (1, [1.0, 2.0, 3.0, 4.0], [1.0, 1.0, 1.0, 1.0]),
        (2, [1.0, 2.0], [1.0, 1.0, 1.0, 1.0]),  # a shorter than dim
        (3, [1.0, 2.0, 3.0], [1.0, 2.0, 3.0]),  # uniform but != dim
        (4, [], []),  # empty pair: dim=None folds to 0.0
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, a array<double>, b array<double>"
    )
    got = {
        r.vec_id: r
        for r in df.select(
            "vec_id",
            fold_dot_udf(4)(F.col("a"), F.col("b")).alias("fixed"),
            fold_dot_udf(None)(F.col("a"), F.col("b")).alias("auto"),
            fold_norm_udf(4)(F.col("a")).alias("nfixed"),
            fold_norm_udf(None)(F.col("a")).alias("nauto"),
        ).collect()
    }
    assert got[1].fixed == 10.0 and got[1].auto == 10.0
    assert got[1].nfixed == got[1].nauto
    assert got[2].fixed is None and got[2].nfixed is None
    assert got[2].auto is None  # ragged pair: zip_with null semantics
    assert got[2].nauto == (1.0 + 2.0 * 2.0) ** 0.5
    assert got[3].fixed is None and got[3].auto == 14.0
    assert got[4].auto == 0.0 and got[4].nauto == 0.0
    assert got[4].fixed is None and got[4].nfixed is None
