"""Unit tests for the repetition-filter operators (operators/repetition.py).
Oracle parity at corpus scale is covered by test_parity_queries; these pin
the fraction definitions on hand-computed fixtures.
"""

from __future__ import annotations

import pytest

from filmdatawarehouse_spark.operators import repetition as rep


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _panel(spark, text):
    rows = rep.repetition_metrics(_docs(spark, [(1, text)])).collect()
    assert len(rows) == 1
    return rows[0].asDict()


def test_metrics_all_distinct_words(spark):
    m = _panel(spark, "a b c d e f")
    assert m["n_words"] == 6
    assert m["dup_word_frac"] == 0.0
    # every bigram unique -> top count 1 over 5 positions
    assert m["top_bigram_count"] == 1
    assert m["top_bigram_frac"] == pytest.approx(1 / 5)
    # 2 distinct 5-grams, none repeated
    assert m["dup_5gram_frac"] == 0.0
    assert m["mean_word_len"] == 1.0


def test_metrics_fully_repeated_doc(spark):
    # "x y" * 4 -> 8 words, 2 distinct
    m = _panel(spark, "x y x y x y x y")
    assert m["n_words"] == 8
    assert m["dup_word_frac"] == pytest.approx(6 / 8)
    # bigrams: "x y" x4, "y x" x3 -> top 4 of 7 positions
    assert m["top_bigram_count"] == 4
    assert m["top_bigram_frac"] == pytest.approx(4 / 7)
    # 5-gram positions: 4, grams "x y x y x"(pos 1,3) and "y x y x y"(pos 2,4)
    # -> all 4 positions carry a duplicated gram
    assert m["dup_5gram_frac"] == 1.0


def test_metrics_short_doc_no_5grams(spark):
    # 3 words: bigram positions 2, zero 5-gram positions -> frac pinned 0.0
    m = _panel(spark, "aa bb aa")
    assert m["n_words"] == 3
    assert m["dup_word_frac"] == pytest.approx(1 / 3)
    assert m["top_bigram_count"] == 1
    assert m["dup_5gram_frac"] == 0.0
    assert m["mean_word_len"] == 2.0


def test_single_word_doc_no_bigrams(spark):
    m = _panel(spark, "hello")
    assert m["n_words"] == 1
    assert m["top_bigram_count"] == 0
    assert m["top_bigram_frac"] == 0.0
    assert m["dup_5gram_frac"] == 0.0


def test_gate_drops_only_repetitive_docs(spark):
    docs = _docs(
        spark,
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "spam spam spam spam spam spam spam spam"),
        ],
    )
    got = {r["doc_id"]: r["keep"] for r in rep.repetition_gate(docs).collect()}
    assert got[1] == 1
    assert got[2] == 0  # dup_word_frac 7/8 > 0.8, top bigram 7/7 > 0.18


def test_gate_returns_every_doc(spark):
    docs = _docs(spark, [(i, f"w{i} unique words here") for i in range(10)])
    assert rep.repetition_gate(docs).count() == 10
