"""Unit tests for delta-vs-corpus incremental dedup
(operators/dedup.py:incremental_dedup_flags). Oracle parity at corpus scale
is covered by test_parity_queries.
"""

from __future__ import annotations

from filmdatawarehouse_spark.operators import dedup as dd


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _flags(spark, corpus_rows, delta_rows, **kw):
    out = dd.incremental_dedup_flags(
        _docs(spark, corpus_rows), _docs(spark, delta_rows), **kw
    ).collect()
    return {r["doc_id"]: (r["exact_dup"], r["near_dup"], r["accept"]) for r in out}

def test_exact_near_and_new(spark):
    corpus = [
        (1, "the quick brown fox jumps over the lazy dog again today"),
        (2, "completely unrelated corpus document about spark engines"),
    ]
    delta = [
        # verbatim copy of corpus doc 1
        (10, "the quick brown fox jumps over the lazy dog again today"),
        # near-dup of corpus doc 1: one word changed -> high shingle overlap
        (11, "the quick brown fox jumps over the lazy cat again today"),
        # brand new
        (12, "totally fresh content sharing no shingles with anything here"),
    ]
    got = _flags(spark, corpus, delta, threshold=0.5)
    assert got[10] == (1, 1, 0)  # exact implies near at any threshold <= 1
    assert got[11] == (0, 1, 0)
    assert got[12] == (0, 0, 1)


def test_short_doc_only_exact_path(spark):
    corpus = [(1, "hi there"), (2, "some long corpus document right here")]
    delta = [(10, "hi there"), (11, "bye now")]
    got = _flags(spark, corpus, delta, threshold=0.8)
    # < 3 words -> no shingles -> near path can't fire, exact still does
    assert got[10] == (1, 0, 0)
    assert got[11] == (0, 0, 1)


def test_delta_not_compared_to_itself(spark):
    corpus = [(1, "base corpus document with several plain words inside")]
    delta = [
        (10, "identical new document repeated across the delta batch fully"),
        (11, "identical new document repeated across the delta batch fully"),
    ]
    got = _flags(spark, corpus, delta, threshold=0.5)
    # intra-delta duplicates are NOT flagged (that's the self-join dedup's
    # job after acceptance) — both enter as new
    assert got[10] == (0, 0, 1)
    assert got[11] == (0, 0, 1)


def test_every_delta_doc_reported_once(spark):
    corpus = [(i, f"corpus doc number {i} with filler words") for i in range(20)]
    delta = [(100 + i, f"corpus doc number {i} with filler words") for i in range(5)]
    df = dd.incremental_dedup_flags(
        _docs(spark, corpus), _docs(spark, delta), threshold=0.8
    )
    rows = df.collect()
    assert len(rows) == 5
    assert all(r["exact_dup"] == 1 and r["accept"] == 0 for r in rows)
