"""Unit edge cases for chunk_documents (the registry oracle test covers the
corpus path; these pin the boundary arithmetic)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from filmdatawarehouse_spark.io.sources import literal_rows
from filmdatawarehouse_spark.operators.chunking import chunk_documents

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


def _chunks(spark, text, chunk_words=4, stride=3):
    df = literal_rows(spark, [{"doc_id": 1, "text": text}], SCHEMA)
    rows = chunk_documents(
        df, chunk_words=chunk_words, stride=stride
    ).orderBy("chunk_id").collect()
    return [(r.chunk_id, r.chunk_words, r.chunk_text) for r in rows]


def test_short_doc_single_chunk(spark):
    assert _chunks(spark, "a b") == [(0, 2, "a b")]


def test_exact_fit_single_chunk(spark):
    assert _chunks(spark, "a b c d") == [(0, 4, "a b c d")]


def test_one_word_over_adds_truncated_chunk(spark):
    # 5 words, chunk 4, stride 3: chunks [0,4) and [3,5)
    assert _chunks(spark, "a b c d e") == [(0, 4, "a b c d"), (1, 2, "d e")]


def test_stride_boundary_full_final_chunk(spark):
    # 7 words: ceil((7-4)/3)=1 extra chunk covering [3,7) — full width,
    # every word covered, no empty trailing chunk
    assert _chunks(spark, "a b c d e f g") == [
        (0, 4, "a b c d"),
        (1, 4, "d e f g"),
    ]


def test_overlap_words_shared(spark):
    got = _chunks(spark, "a b c d e f g h", chunk_words=4, stride=2)
    # chunks at 0,2,4: [a..d],[c..f],[e..h]
    assert got == [(0, 4, "a b c d"), (1, 4, "c d e f"), (2, 4, "e f g h")]
    # consecutive chunks share chunk_words - stride = 2 words
    for (_, _, t1), (_, _, t2) in zip(got, got[1:]):
        assert t1.split()[-2:] == t2.split()[:2]


def test_empty_text_one_empty_chunk(spark):
    # split('', ' ') is [''] in both engines: one 1-"word" chunk
    assert _chunks(spark, "") == [(0, 1, "")]


def test_bad_params_raise(spark):
    df = literal_rows(spark, [{"doc_id": 1, "text": "x"}], SCHEMA)
    with pytest.raises(ValueError):
        chunk_documents(df, stride=0)
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_words=0)
    # stride > chunk_words would leave word gaps between chunks
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_words=8, stride=9)


def test_every_word_covered(spark):
    text = " ".join(f"w{i}" for i in range(50))
    rows = _chunks(spark, text, chunk_words=8, stride=5)
    covered = set()
    for chunk_id, _n, chunk_text in rows:
        start = chunk_id * 5
        for j, w in enumerate(chunk_text.split()):
            assert w == f"w{start + j}"
            covered.add(start + j)
    assert covered == set(range(50))
