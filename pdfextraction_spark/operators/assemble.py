"""Final per-conversation JSON assembly — the reference's clean user
download (result_merger.py:168-210 create_final_json_output).

One JSON document per conversation:

    {"extracted_fields": {field: value, ...},          # longest-wins
     "extracted_tables": [{"headers": [...],
                           "data": [[cell|null, ...], ...],
                           "total_rows": n}, ...],     # turn-ordered
     "processing_summary": {"total_fields": n, "total_tables": n,
                            "total_table_rows": n, "total_turns": n,
                            "successful_turns": n, "failed_turns": n}}

Differences from the reference, by engine design: pages -> turns;
table identity = headers signature (no LLM table_name);
document_info's wall-clock timestamp is a lineage column on the
output table, not payload (determinism). Field order and map key
order are canonical (struct order / sorted field names) so the JSON
is byte-reproducible and oracle-checkable.

Pure DataFrame composition: three aggregations on conv_id + two
joins; serialization via to_json (Jackson, JVM-side)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .merge import merge_conversation_fields

_EMPTY_TABLES_DDL = (
    "array<struct<headers:array<string>,data:array<array<string>>,"
    "total_rows:bigint>>"
)


def assemble_conversation_json(extracted: DataFrame,
                               tables: DataFrame) -> DataFrame:
    """(conv_id, final_json) per conversation."""
    fields = (
        merge_conversation_fields(extracted)
        .groupBy("conv_id")
        .agg(
            F.map_from_entries(
                F.array_sort(F.collect_list(F.struct("field", "value")))
            ).alias("extracted_fields")
        )
    )
    # group on the headers ARRAY itself (Spark arrays are valid
    # grouping keys and order lexicographically) — no serialized
    # signature, so header text containing the would-be separator
    # can never conflate two distinct tables
    per_table = (
        tables.groupBy("conv_id", "headers")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct("turn_idx", "table_idx", "row_idx", "cells")
                    )
                ),
                lambda s: s["cells"],
            ).alias("data"),
            F.count("*").alias("total_rows"),
        )
    )
    tbls = (
        per_table.groupBy("conv_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("headers", "data", "total_rows"))
            ).alias("extracted_tables")
        )
    )
    summary = extracted.groupBy("conv_id").agg(
        F.count("*").alias("total_turns"),
        F.sum(F.col("parse_failed").cast("long")).alias("failed_turns"),
    )
    joined = (
        summary.join(fields, "conv_id", "left")
        .join(tbls, "conv_id", "left")
        .withColumn(
            "extracted_fields",
            F.coalesce(
                "extracted_fields", F.from_json(F.lit("{}"), "map<string,string>")
            ),
        )
        .withColumn(
            "extracted_tables",
            F.coalesce(
                "extracted_tables", F.array().cast(_EMPTY_TABLES_DDL)
            ),
        )
    )
    total_table_rows = F.aggregate(
        "extracted_tables",
        F.lit(0).cast("bigint"),
        lambda acc, t: acc + t["total_rows"],
    )
    final = F.to_json(
        F.struct(
            F.col("extracted_fields"),
            F.col("extracted_tables"),
            F.struct(
                F.size("extracted_fields").cast("long").alias("total_fields"),
                F.size("extracted_tables").cast("long").alias("total_tables"),
                total_table_rows.alias("total_table_rows"),
                F.col("total_turns"),
                (F.col("total_turns") - F.col("failed_turns")).alias(
                    "successful_turns"
                ),
                F.col("failed_turns"),
            ).alias("processing_summary"),
        )
    )
    return joined.select("conv_id", final.alias("final_json"))
