"""Embedding similarity search (array<float> columns, JVM-side math).

- cosine_sim: F.zip_with/F.aggregate dot products — whole-stage
  codegen, no Python
- brute_force_topk: exact top-k per query (cross join; broadcast the
  query side — correct baseline and the verifier for the ANN path)
- lsh_bucket_topk: random-hyperplane (sign) LSH — queries only join
  candidates sharing a bucket; the scale path (candidates/query drops
  from N to N/2^bits on average)
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np
from pyspark.sql import DataFrame, Window, functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(_dot(a, a))


def cosine_sim(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def _as_double(col):
    return F.transform(col, lambda v: v.cast("double"))


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k for every query vector.

    queries: (query_id, embedding). Output: (query_id, vec_id, sim,
    rank). Ties broken by vec_id for determinism."""
    e = embeddings.select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("v")
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        _as_double(F.col(vec_col)).alias("qv"),
    )
    scored = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(cosine_sim(F.col("qv"), F.col("v")), 6).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def random_hyperplanes(dim: int, bits: int = 8, seed: int = 42) -> List[List[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((bits, dim)).tolist()


def lsh_bucket_id(vec_col, planes: Sequence[Sequence[float]]):
    """Sign-LSH bucket: bit i set iff dot(vec, plane_i) > 0."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        arr = F.array(*[F.lit(float(x)) for x in plane])
        bucket = bucket + F.when(
            _dot(_as_double(vec_col), arr) > 0, F.lit(1 << i).cast("long")
        ).otherwise(0)
    return bucket


def lsh_bucket_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    bits: int = 6,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    planes: Optional[List[List[float]]] = None,
) -> DataFrame:
    """Approximate top-k: only candidates in the query's LSH bucket are
    scored. Recall measured against brute_force_topk in tests."""
    planes = planes or random_hyperplanes(dim, bits)
    e = embeddings.select(
        F.col(id_col).alias("vec_id"),
        _as_double(F.col(vec_col)).alias("v"),
        lsh_bucket_id(F.col(vec_col), planes).alias("bucket"),
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        _as_double(F.col(vec_col)).alias("qv"),
        lsh_bucket_id(F.col(vec_col), planes).alias("bucket"),
    )
    scored = (
        e.join(F.broadcast(q), "bucket")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(cosine_sim(F.col("qv"), F.col("v")), 6).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
