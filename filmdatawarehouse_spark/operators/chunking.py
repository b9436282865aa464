"""Document chunking: split long documents into fixed-size overlapping
word windows — the step between curation and tokenization in an LLM
training pipeline (context-length-bounded training examples that keep
boundary context via overlap).

Reference analog: none (the reference is a film-rental warehouse,
`dags/rentalFilmDAG.py`); this is extended training-pipeline surface.

Scale shape: pure map-side — split / sequence / explode / slice are all
whole-stage-codegen JVM expressions, no shuffle, no Python. At 100 TB the
operator streams through the corpus partition-local; output size is
input × (1 + overlap fraction).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CHUNK_WORDS = 32
CHUNK_STRIDE = 24  # 8-word overlap between consecutive chunks


def chunk_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_words: int = CHUNK_WORDS,
    stride: int = CHUNK_STRIDE,
) -> DataFrame:
    """One row per (doc, chunk): chunk ``i`` covers words
    ``[i*stride, i*stride + chunk_words)`` of the whitespace-split text.

    Chunk count is ``1 + ceil(max(0, n_words - chunk_words) / stride)`` —
    a single (possibly short) chunk for docs that fit, and a final chunk
    that may be shorter than ``chunk_words`` otherwise. Every word is in
    at least one chunk; consecutive chunks share ``chunk_words - stride``
    words of context.

    Output: (id, chunk_id, chunk_words, chunk_text), chunk_id 0-based.
    """
    if stride <= 0 or chunk_words <= 0:
        raise ValueError("chunk_words and stride must be positive")
    if stride > chunk_words:
        # stride > chunk_words leaves word gaps between consecutive chunks,
        # breaking the every-word-covered guarantee above
        raise ValueError(
            f"stride ({stride}) must be <= chunk_words ({chunk_words}); "
            "a larger stride would skip words between chunks"
        )
    words: Column = F.split(F.col(text_col), " ")
    n_words = F.size(words)
    n_chunks = F.lit(1) + F.ceil(
        F.greatest(n_words - F.lit(chunk_words), F.lit(0))
        / F.lit(float(stride))
    ).cast("int")
    chunk = F.explode(F.sequence(F.lit(0), n_chunks - F.lit(1)))
    out = docs.select(
        F.col(id_col),
        chunk.alias("chunk_id"),
        words.alias("_words"),
    )
    # slice() is 1-based; the final chunk is naturally truncated
    piece = F.slice(
        F.col("_words"), F.col("chunk_id") * F.lit(stride) + F.lit(1), chunk_words
    )
    return out.select(
        F.col(id_col),
        F.col("chunk_id").cast("int").alias("chunk_id"),
        F.size(piece).cast("int").alias("chunk_words"),
        F.array_join(piece, " ").alias("chunk_text"),
    )
