"""Oracle-checked query for document chunking
(operators/chunking.py:chunk_documents).

The DuckDB twin replays the exact window arithmetic: chunk ``i`` of a doc
covers 0-based words ``[i*stride, i*stride + chunk_words)``; DuckDB list
slicing is 1-based inclusive, so the slice is ``ws[i*s+1 : i*s+c]``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from filmdatawarehouse_spark.io.sources import read_table
from filmdatawarehouse_spark.operators.chunking import (
    CHUNK_STRIDE,
    CHUNK_WORDS,
    chunk_documents,
)


def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    return chunk_documents(docs)


CHUNK_ORACLE = f"""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ), p AS (
      SELECT doc_id, ws,
             1 + CAST(ceil(greatest(len(ws) - {CHUNK_WORDS}, 0)
                           / {CHUNK_STRIDE}.0) AS INT) AS n_chunks
      FROM w
    )
    , e AS (
      SELECT doc_id, ws, unnest(range(0, n_chunks)) AS i FROM p
    )
    SELECT doc_id,
           CAST(i AS INT) AS chunk_id,
           CAST(len(ws[i * {CHUNK_STRIDE} + 1
                       : i * {CHUNK_STRIDE} + {CHUNK_WORDS}]) AS INT)
             AS chunk_words,
           array_to_string(ws[i * {CHUNK_STRIDE} + 1
                              : i * {CHUNK_STRIDE} + {CHUNK_WORDS}], ' ')
             AS chunk_text
    FROM e
"""

CHUNKING_QUERIES = {
    "chunk_documents": (q_chunk_documents, CHUNK_ORACLE),
}
