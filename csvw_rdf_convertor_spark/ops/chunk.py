"""Document chunking: sliding token windows for training-data pipelines.

LLM pre-training and RAG indexing both need documents cut into
fixed-size token windows with overlap (context-length packing,
retrieval granularity). The operator is a pure narrow plan:

    tokens (staged)  →  window starts via ``sequence``  →  ``posexplode``
    →  ``slice`` + ``array_join`` per window

Zero shuffle, zero UDFs — every step is a native codegen expression, so a
100 TB corpus chunks at scan speed and the fan-out (≈ n_tokens / stride
rows per document) never concentrates on the driver. Beyond-reference op
(the reference repo has no corpus-chunking equivalent); the DuckDB oracle
replays it 1:1 with ``range`` + list slicing (gate ``text_chunk_windows``).

Staging rule (CLAUDE.md): ``toks`` is materialized as a real column BEFORE
the generator so CollapseProject cannot inline the split into per-window
expressions and re-tokenize once per chunk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.column import Column


def tokens_nonempty(text: Column) -> Column:
    """Whitespace tokens with empties dropped (mirrors DuckDB
    ``list_filter(string_split_regex(trim(x), '\\s+'), t -> t <> '')``)."""
    return F.filter(F.split(F.trim(text), r"\s+"), lambda t: t != "")


def chunk_documents(docs: DataFrame, *, size: int = 16, overlap: int = 4,
                    text_col: str = "text", id_col: str = "doc_id",
                    ) -> DataFrame:
    """Cut each document into sliding windows of ``size`` tokens advancing
    by ``size - overlap`` tokens (the last window may be shorter; documents
    with zero tokens produce no chunks).

    Returns ``(id_col, chunk_idx, n_tokens, chunk_text)`` — one row per
    window, ``chunk_idx`` 0-based in document order.
    """
    if not 0 <= overlap < size:
        raise ValueError(f"need 0 <= overlap < size, got {overlap=} {size=}")
    stride = size - overlap
    staged = (docs
              .withColumn("_toks", tokens_nonempty(F.col(text_col)))
              .withColumn("_n", F.size("_toks"))
              .where(F.col("_n") > 0)
              # window start offsets 0, stride, 2*stride, ... < n
              .withColumn("_starts", F.sequence(
                  F.lit(0), F.col("_n") - 1, F.lit(stride))))
    return (staged
            .select(F.col(id_col),
                    F.posexplode("_starts").alias("chunk_idx", "_start"),
                    F.col("_toks"), F.col("_n"))
            .select(
                F.col(id_col),
                F.col("chunk_idx").cast("long").alias("chunk_idx"),
                F.least(F.lit(size), F.col("_n") - F.col("_start"))
                 .cast("long").alias("n_tokens"),
                F.array_join(F.slice(F.col("_toks"), F.col("_start") + 1,
                                     F.lit(size)), " ").alias("chunk_text")))


def sql_chunk_documents(table: str = "documents", *, size: int = 16,
                        overlap: int = 4, text_col: str = "text",
                        id_col: str = "doc_id") -> str:
    """DuckDB oracle twin of :func:`chunk_documents` (kept adjacent so the
    two formulations cannot drift); ``chunk_text`` is md5-compressed by the
    gate caller, not here."""
    stride = size - overlap
    return rf"""
WITH d AS (
  SELECT {id_col},
         list_filter(string_split_regex(trim({text_col}), '\s+'),
                     t -> t <> '') AS toks
  FROM {table}),
s AS (SELECT {id_col}, toks, len(toks) AS n FROM d WHERE len(toks) > 0)
SELECT {id_col},
       (start // {stride})::BIGINT AS chunk_idx,
       least({size}, n - start)::BIGINT AS n_tokens,
       array_to_string(toks[start + 1 : least(start + {size}, n)], ' ')
         AS chunk_text
FROM (SELECT {id_col}, toks, n, unnest(range(0, n, {stride})) AS start FROM s)
"""
