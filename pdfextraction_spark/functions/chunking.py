"""Document chunking for training-sequence preparation.

Pretraining pipelines cut documents into fixed-size token windows with
overlap (stride < window) before packing/tokenization. This is a pure
per-row transform — no shuffle at all: the chunk array is a staged
``transform`` over the bound token array (the staging rule from
functions/similarity.py), then one explode.

Chunk layout (the standard sliding-window convention): starts at
0, stride, 2*stride, ...; chunk i covers tokens
[i*stride, i*stride + chunk_tokens). A doc with n <= chunk_tokens
yields exactly one chunk; otherwise ceil((n - chunk_tokens) / stride)
+ 1 chunks, so the last window always reaches the end of the doc and
no trailing window is a strict suffix of the previous one. All
arithmetic is integer-exact, so the DuckDB oracle reproduces chunk
boundaries bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 128,
    stride: int = 96,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, chunk_idx, n_tokens, chunk_text) sliding windows.

    ``stride`` must be in (0, chunk_tokens]; overlap between adjacent
    chunks is chunk_tokens - stride tokens."""
    if not 0 < stride <= chunk_tokens:
        raise ValueError("stride must be in (0, chunk_tokens]")
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.col(text_col), " ").alias("toks"),
    ).withColumn("n", F.size("toks"))
    n = F.col("n")
    last_start_idx = F.when(n <= chunk_tokens, F.lit(0)).otherwise(
        F.floor((n - chunk_tokens + stride - 1) / stride).cast("int")
    )
    chunks = F.transform(
        F.sequence(F.lit(0), last_start_idx),
        lambda i: F.struct(
            i.cast("int").alias("chunk_idx"),
            F.least(n - i * stride, F.lit(chunk_tokens))
            .cast("long")
            .alias("n_tokens"),
            F.array_join(
                F.slice(F.col("toks"), i * stride + 1, chunk_tokens), " "
            ).alias("chunk_text"),
        ),
    )
    staged = base.withColumn("cs", chunks)
    return staged.select("doc_id", F.explode("cs").alias("c")).select(
        "doc_id",
        F.col("c.chunk_idx").alias("chunk_idx"),
        F.col("c.n_tokens").alias("n_tokens"),
        F.col("c.chunk_text").alias("chunk_text"),
    )
