"""Bucketed-table helpers: co-located, shuffle-free joins.

At 100 TB the dominant repeated cost is re-shuffling the extraction
output every time it is joined back to transcripts (or to itself
across runs). Writing both sides bucketed by ``conv_id`` with matching
bucket counts lets Spark's bucketing rules plan sort-merge joins with
ZERO Exchange on either side (asserted in tests/test_bucketed.py).

With an Iceberg catalog this maps to a bucket partition transform
(``bucket(N, conv_id)``) + storage-partitioned joins; the local
implementation uses the session catalog's parquet bucketing, which has
identical planning semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    buckets: int = 32,
    bucket_col: str = "conv_id",
    sort_col: str = "turn_idx",
    mode: str = "overwrite",
) -> None:
    (
        df.write.mode(mode)
        .bucketBy(buckets, bucket_col)
        .sortBy(bucket_col, sort_col)
        .format("parquet")
        .saveAsTable(table)
    )


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on, how: str = "inner"
) -> DataFrame:
    """Join two tables bucketed on the same key/count — planned without
    any Exchange (bucketing supplies the co-partitioning)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
