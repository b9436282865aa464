"""text_containment_prefix_pairs: the prefix-filtered candidate plan
must be OUTPUT-IDENTICAL to the plain inverted-index containment query
(exactness is the whole contract — the prefix filter may only remove
pairs that provably cannot reach the threshold), including on corpora
engineered to stress the asymmetric min-size bound."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from filmdatawarehouse_spark.queries.extended import (
    CONTAIN_DF_CAP,
    CONTAIN_T,
    CONTAIN_T_DEN,
    CONTAIN_T_NUM,
    q_text_containment_pairs,
    q_text_containment_prefix_pairs,
)


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_integer_threshold_matches_float():
    assert CONTAIN_T_NUM / CONTAIN_T_DEN == CONTAIN_T


def test_prefix_output_identical_on_corpus(spark, sf_dir):
    """Frame identity on the certification corpus — same rows, same
    exact values (ints + the one shared double expression)."""
    plain = _rows(q_text_containment_pairs(spark, sf_dir))
    pref = _rows(q_text_containment_prefix_pairs(spark, sf_dir))
    assert pref == plain
    assert plain  # non-vacuous: the corpus has qualifying pairs


def test_prefix_finds_subdocument_containment(spark, tmp_path):
    """The asymmetric case the min-size prefix bound exists for: a
    SHORT doc pasted inside a LONG one (containment 1.0, tiny
    Jaccard) must survive prefix filtering, while sharing only
    df-capped shingles keeps the pair visible to both plans."""
    short = "alpha beta gamma delta epsilon zeta"
    long_ = short + " " + " ".join(f"filler{i}" for i in range(60))
    unrelated = " ".join(f"other{i}" for i in range(40))
    rows = [(1, short), (2, long_), (3, unrelated)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    sf = str(tmp_path / "corpus")
    df.write.parquet(f"{sf}/documents.parquet")
    plain = _rows(q_text_containment_pairs(spark, sf))
    pref = _rows(q_text_containment_prefix_pairs(spark, sf))
    assert pref == plain
    assert {(a, b) for (a, b, *_) in plain} == {(1, 2)}
    (rec,) = [r for r in plain if r[0] == 1]
    assert rec[5] == pytest.approx(1.0)  # full containment


def test_prefix_candidates_subset_of_plain(spark, sf_dir):
    """Safety direction is free (verification is exact); this pins the
    POINT of the variant — the candidate stage emits no more pairs
    than the plain plan's, and strictly fewer on the certification
    corpus (the rarity prefix must prune something real)."""
    from filmdatawarehouse_spark.queries.extended import (
        shingle_rows_shared,
    )

    sh = shingle_rows_shared(spark, sf_dir)
    census = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    kept = sh.join(
        census.filter(F.col("df") <= CONTAIN_DF_CAP), "shingle"
    )
    plain_cand = (
        kept.alias("a")
        .join(kept.alias("b"), "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
        )
        .distinct()
        .count()
    )
    # the prefix plan's candidate count: rebuild its cand stage shape
    from pyspark.sql.window import Window

    w_rank = Window.partitionBy("doc_id").orderBy("df", "shingle")
    w_size = Window.partitionBy("doc_id")
    ranked = (
        kept.withColumn("rn", F.row_number().over(w_rank))
        .withColumn("n", F.count(F.lit(1)).over(w_size))
    )
    need = F.floor(
        (F.lit(CONTAIN_T_NUM) * F.col("n") + F.lit(CONTAIN_T_DEN - 1))
        / F.lit(CONTAIN_T_DEN)
    )
    pref = ranked.filter(F.col("rn") <= F.col("n") - need + F.lit(1))
    pref_cand = (
        pref.alias("p")
        .join(ranked.alias("f"), "shingle")
        .filter(
            (F.col("p.n") < F.col("f.n"))
            | (
                (F.col("p.n") == F.col("f.n"))
                & (F.col("p.doc_id") < F.col("f.doc_id"))
            )
        )
        .select(
            F.least("p.doc_id", "f.doc_id").alias("doc_id_a"),
            F.greatest("p.doc_id", "f.doc_id").alias("doc_id_b"),
        )
        .distinct()
        .count()
    )
    assert pref_cand <= plain_cand
    assert pref_cand < plain_cand


# ------------------------------------------ r16: size-keyed dispatcher


def test_dispatcher_selection_tracks_measured_crossover():
    """The plan choice is the measured byte crossover (SCALING.md
    "Round-15"): plain at/below CONTAIN_DISPATCH_DOCS, prefix beyond."""
    from filmdatawarehouse_spark.queries.extended import (
        CONTAIN_DISPATCH_DOCS,
        containment_plan_for,
    )

    assert containment_plan_for(0) == "plain"
    assert containment_plan_for(CONTAIN_DISPATCH_DOCS) == "plain"
    assert containment_plan_for(CONTAIN_DISPATCH_DOCS + 1) == "prefix"
    assert containment_plan_for(10 * CONTAIN_DISPATCH_DOCS) == "prefix"
    # the constant sits inside the measured bracket: plain was cheaper
    # at 200k docs, more expensive at 400k
    assert 200_000 <= CONTAIN_DISPATCH_DOCS < 400_000


def test_dispatcher_output_identical_on_both_branches(
    spark, sf_dir, monkeypatch
):
    """Frame identity through the dispatcher on BOTH branches: the
    certification corpus is far below the crossover (plain branch);
    forcing the threshold to 0 drives the same corpus through the
    prefix branch — output must be identical either way."""
    from filmdatawarehouse_spark.queries import extended

    plain = _rows(q_text_containment_pairs(spark, sf_dir))
    auto = _rows(extended.q_text_containment_auto_pairs(spark, sf_dir))
    assert auto == plain and plain
    monkeypatch.setattr(extended, "CONTAIN_DISPATCH_DOCS", 0)
    forced = _rows(extended.q_text_containment_auto_pairs(spark, sf_dir))
    assert forced == plain
