"""Document chunking for training-data pipelines: fixed-token windows
with overlap.

Not a reference operator (xapian indexes whole documents); this is part
of the Spark-era LLM-pipeline surface next to ops/dedup.py and
ops/textstats.py.  An LLM pretraining corpus is consumed in
context-window-sized pieces, and the standard preparation step is to
split each document into chunks of ``chunk_tokens`` tokens advancing by
``chunk_tokens - overlap`` so adjacent chunks share ``overlap`` tokens
of context.

Scale shape: one narrow per-row transform — tokenize, per-row start
offsets via ``sequence``, ``posexplode`` + ``slice`` — with NO shuffle
and no Python; at 100 TB this is a pure map stage that pipelines with
the parquet scan.  Tokenization uses the same ``[a-z0-9_]+`` lowercase
regex as ops/textstats.py so chunk boundaries are reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOKEN_RE = "[a-z0-9_]+"


def chunk_documents(
    docs: DataFrame,
    content_col: str = "text",
    id_col: str = "docid",
    chunk_tokens: int = 128,
    overlap: int = 16,
) -> DataFrame:
    """Split each document into token windows of ``chunk_tokens`` with
    ``overlap`` tokens shared between adjacent chunks.

    Chunk k (0-based ``chunk_id``) covers token offsets
    ``[k*stride, k*stride + chunk_tokens)`` with
    ``stride = chunk_tokens - overlap``; starts run while
    ``start < n_tokens``, so the final chunk may be short and a document
    shorter than one stride still yields exactly one chunk.  Documents
    with zero tokens yield no chunks.

    Returns (id_col, chunk_id, n_tokens, chunk_text).
    """
    if chunk_tokens <= 0:
        raise ValueError("chunk_tokens must be > 0")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = F.regexp_extract_all(
        F.lower(F.col(content_col)), F.lit(TOKEN_RE), 0
    )
    base = docs.select(
        F.col(id_col), toks.alias("_toks"), F.size(toks).alias("_n")
    ).where(F.col("_n") > 0)
    starts = F.sequence(
        F.lit(0), F.col("_n") - F.lit(1), F.lit(stride)
    )
    exploded = base.select(
        id_col, "_toks",
        F.posexplode(starts).alias("chunk_id", "_start"),
    )
    chunk = F.slice(
        F.col("_toks"), F.col("_start") + F.lit(1), F.lit(chunk_tokens)
    )
    return exploded.select(
        F.col(id_col),
        F.col("chunk_id").cast("int").alias("chunk_id"),
        F.size(chunk).cast("int").alias("n_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )
