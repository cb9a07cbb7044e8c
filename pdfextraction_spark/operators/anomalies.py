"""Typed extraction-anomaly records — the engine's analogue of the
reference's conflict/anomaly detector
(/root/reference/services/result_merger.py:212-244
detect_conflicts_and_anomalies), upgrading the r2 boolean flags
(conflict_detected / anomaly) to one typed record stream a user can
route, count, and join (VERDICT r2 item 5).

Record shape (one row per anomaly):

    (conv_id, anomaly_type, subject, issue, detail)

- field_conflict (:224-230): a merged field saw >1 distinct non-null
  value across turns; subject = field name, detail carries the
  occurrence count, resolution matches the merger (longest wins).
- inconsistent_row_structure (:233-242): a table spanning multiple
  turns whose rows carry differing filled-cell counts; subject = the
  US-joined headers signature, detail lists the distinct counts
  (reference: "Row lengths vary: {set}"). Single-turn tables are NOT
  flagged, mirroring the reference's spans_multiple_pages gate.

Pure DataFrame composition: two grouped aggregations + a union — both
single hash-shuffles on conv_id-rooted keys with map-side partial
aggregation; no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .merge import merge_conversation_fields

US = "\x1f"

FIELD_CONFLICT = "field_conflict"
ROW_STRUCTURE = "inconsistent_row_structure"


def field_conflict_anomalies(extracted: DataFrame) -> DataFrame:
    """One record per conflicting merged field
    (result_merger.py:224-230)."""
    merged = merge_conversation_fields(extracted)
    return merged.filter(F.col("conflict_detected")).select(
        "conv_id",
        F.lit(FIELD_CONFLICT).alias("anomaly_type"),
        F.col("field").alias("subject"),
        F.lit("Multiple different values found across turns").alias("issue"),
        F.concat(
            F.lit("resolved to longest value; occurrences="),
            F.col("n_occurrences").cast("string"),
        ).alias("detail"),
    )


def row_structure_anomalies(tables: DataFrame) -> DataFrame:
    """One record per multi-turn table whose rows disagree on filled
    cell counts (result_merger.py:233-242; 'filled' = non-null, the
    engine's fixed-width-row equivalent of the reference's per-row
    dict length)."""
    filled = F.size(F.filter("cells", lambda c: c.isNotNull()))
    per_table = tables.groupBy("conv_id", "headers").agg(
        F.count_distinct("turn_idx").alias("n_turns"),
        F.array_sort(F.collect_set(filled)).alias("counts"),
    )
    return (
        per_table.filter((F.col("n_turns") > 1) & (F.size("counts") > 1))
        .select(
            "conv_id",
            F.lit(ROW_STRUCTURE).alias("anomaly_type"),
            F.array_join("headers", US).alias("subject"),
            F.lit("Inconsistent row structure across turns").alias("issue"),
            F.concat(
                F.lit("row cell counts vary: ["),
                F.array_join(
                    F.transform("counts", lambda c: c.cast("string")), ", "
                ),
                F.lit("]"),
            ).alias("detail"),
        )
    )


def extraction_anomalies(extracted: DataFrame,
                         tables: DataFrame) -> DataFrame:
    """All typed anomaly records for a corpus: field conflicts +
    multi-turn row-structure inconsistencies, unioned into one
    stream."""
    return field_conflict_anomalies(extracted).unionByName(
        row_structure_anomalies(tables)
    )
