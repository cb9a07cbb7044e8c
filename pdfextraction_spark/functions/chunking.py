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

from pyspark.sql import DataFrame, Window, functions as F

from .sampling import hash_uniform


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


def pack_chunks(
    chunks: DataFrame,
    capacity: int = 2048,
    n_shards: int = 64,
    id_col: str = "doc_id",
    idx_col: str = "chunk_idx",
    len_col: str = "n_tokens",
) -> DataFrame:
    """Concatenation packing: assign each chunk a (shard, bin_id,
    bin_offset) so training examples are built by concatenating a
    bin's chunks in order and cutting at ``capacity`` tokens — the
    standard pretraining packing scheme (concatenate-then-slice), not
    bin-packing optimization.

    A chunk belongs to the bin where its first token lands;
    ``bin_offset`` is that token's position within the bin, and a
    chunk with bin_offset + n_tokens > capacity straddles into the
    next bin (the tokenizer splits it there — that's the
    concatenate-then-slice contract, no padding waste).

    Scale shape: a single GLOBAL ordered window would serialize onto
    one task, so packing is SHARDED — the content-deterministic md5-32
    uniform on the doc id buckets docs into ``n_shards`` independent
    packing streams, each a partitioned running sum. Determinism:
    shard assignment is content-based and the within-shard order is
    (doc_id, chunk_idx), so the layout is reproducible across runs,
    partitionings, and engines; bins are only ever underfull at each
    shard's tail (n_shards * <1 bin of waste corpus-wide)."""
    shard = F.floor(
        hash_uniform(F.col(id_col)) * n_shards
    ).cast("int")
    with_shard = chunks.withColumn("shard", shard)
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col(id_col).asc(), F.col(idx_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum_end = F.sum(F.col(len_col)).over(w)
    start = (cum_end - F.col(len_col)).cast("long")
    return with_shard.select(
        id_col,
        idx_col,
        len_col,
        "shard",
        F.floor(start / capacity).cast("long").alias("bin_id"),
        F.pmod(start, F.lit(capacity)).cast("long").alias("bin_offset"),
    )
