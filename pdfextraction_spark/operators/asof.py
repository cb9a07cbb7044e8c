"""As-of (nearest-past) join — the relational generalization of the
reference's nearest-neighbor pairing family (SURVEY.md §2.3 J2/J3).

``asof_join(left, right, ...)``: for every left row, the single right
row with the greatest right.ts <= left.ts within the same key.

Formulation: range join on (key, ts-predicate) then ``max`` of a
(ts, values...) struct per left id — one shuffle each side, AQE skew
handling, broadcastable right side. At extreme scale the union+window
form (tag streams, one window pass carrying the last right value
forward) shuffles each input once instead of materializing the range
join; both are provided.

DuckDB's native ASOF JOIN is the test oracle (__spark_entry__
``asof_latest_click``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_id: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
) -> DataFrame:
    """Inner as-of join: per left row (unique ``left_id``), the latest
    right timestamp at-or-before ``left_ts`` within ``key``. Output =
    left columns + ``asof_ts``."""
    r = right.select(F.col(key).alias("__k"), F.col(right_ts).alias("__rts"))
    best = (
        left.select(key, left_id, left_ts)
        .join(r, (F.col(key) == F.col("__k")) & (F.col("__rts") <= F.col(left_ts)))
        .groupBy(left_id)
        .agg(F.max("__rts").alias("asof_ts"))
    )
    return left.join(best, left_id, "inner")


def asof_join_union_window(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_id: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
) -> DataFrame:
    """Union+window formulation (single shuffle per input): tag the two
    streams, sort within key by (ts, tag), carry the last right ts
    forward, keep left rows that saw one."""
    lt = left.select(
        F.col(key).alias("__k"), F.col(left_id).alias("__id"),
        F.col(left_ts).alias("__ts"), F.lit(1).alias("__tag"),
        F.lit(None).cast(right.schema[right_ts].dataType).alias("__rts"),
    )
    rt = right.select(
        F.col(key).alias("__k"), F.lit(None).cast(lt.schema["__id"].dataType).alias("__id"),
        F.col(right_ts).alias("__ts"), F.lit(0).alias("__tag"),
        F.col(right_ts).alias("__rts"),
    )
    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__tag")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = lt.unionByName(rt).withColumn(
        "asof_ts", F.last("__rts", ignorenulls=True).over(w)
    )
    matched = carried.filter(
        (F.col("__tag") == 1) & F.col("asof_ts").isNotNull()
    ).select(F.col("__id").alias(left_id), "asof_ts")
    return left.join(matched, left_id, "inner")
