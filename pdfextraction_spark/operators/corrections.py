"""Corrections overlay — the batch-world analogue of the reference's
human-validated feedback loop (VERDICT r2 item 6).

The reference stores user-validated step-2 JSON per document and every
downstream step prefers it over the machine result
(/root/reference/app.py:822 ``doc.step2_validated_json or
doc.get_step_result(2)``; storage.py:70-76). In a batch engine the
same contract is a validated-overrides TABLE applied over the merged
field output:

    merged:       (conv_id, field, value, source_turn,
                   conflict_detected, n_occurrences)   [machine]
    corrections:  (conv_id, field, corrected_value)    [human]

Output — one row per (conv_id, field) present in either input:

- override:  correction exists -> value = corrected_value,
  source = 'validated', machine_value keeps the replaced value
  (provenance; the reference keeps both via step_results vs
  step2_validated_json)
- passthrough: no correction -> machine value, source = 'machine'
- addition:  correction for a field the machine never extracted ->
  validated value with null machine provenance

Scale plan: corrections are human-sized (tiny), so the overlay is a
BROADCAST left join — the corpus-sized merged side never shuffles.
Added fields need corrections MINUS merged keys; that anti-join
shuffles only the (conv_id, field) key projection of merged, never
its payload. (A full-outer join would be one operator, but Spark
cannot broadcast a full-outer side — it would sort-merge-shuffle the
whole merged table.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

SOURCE_VALIDATED = "validated"
SOURCE_MACHINE = "machine"

_OUT_COLS = ["conv_id", "field", "value", "source", "machine_value",
             "source_turn", "conflict_detected"]


def apply_corrections(merged: DataFrame,
                      corrections: DataFrame) -> DataFrame:
    """Overlay validated (conv_id, field, corrected_value) rows over
    merge_conversation_fields output; override wins, provenance
    retained."""
    # a hand-maintained corrections table can carry duplicate
    # (conv_id, field) rows; collapse them deterministically (max
    # corrected_value wins, nulls lose) so the broadcast left join
    # cannot fan out and the overlay output is stable
    c = (
        corrections.select("conv_id", "field", "corrected_value")
        .groupBy("conv_id", "field")
        .agg(F.max("corrected_value").alias("corrected_value"))
    )
    validated = F.col("corrected_value").isNotNull()
    overlaid = (
        merged.join(F.broadcast(c), ["conv_id", "field"], "left")
        .select(
            "conv_id",
            "field",
            F.when(validated, F.col("corrected_value"))
            .otherwise(F.col("value")).alias("value"),
            F.when(validated, F.lit(SOURCE_VALIDATED))
            .otherwise(F.lit(SOURCE_MACHINE)).alias("source"),
            F.when(validated, F.col("value")).alias("machine_value"),
            "source_turn",
            "conflict_detected",
        )
    )
    added = (
        c.join(merged.select("conv_id", "field"),
               ["conv_id", "field"], "left_anti")
        .select(
            "conv_id",
            "field",
            F.col("corrected_value").alias("value"),
            F.lit(SOURCE_VALIDATED).alias("source"),
            F.lit(None).cast("string").alias("machine_value"),
            F.lit(None).cast("int").alias("source_turn"),
            F.lit(False).alias("conflict_detected"),
        )
    )
    return overlaid.select(_OUT_COLS).unionByName(added.select(_OUT_COLS))


def fixture_corrections(turns: DataFrame) -> DataFrame:
    """Deterministic validated-overrides fixture derived from the
    conversation ids themselves (no external data, reproducible in the
    loop-oracle golden): conversations whose numeric suffix is
    divisible by 5 get an 'Employee Name' override; divisible by 10
    additionally get a human-added 'Reviewer Note'."""
    num = F.regexp_replace("conv_id", r"\D", "").cast("int")
    convs = turns.select("conv_id").distinct().withColumn("n", num)
    override = convs.filter(F.col("n") % 5 == 0).select(
        "conv_id",
        F.lit("Employee Name").alias("field"),
        F.concat(F.lit("Validated Name "), F.col("n").cast("string"))
        .alias("corrected_value"),
    )
    addition = convs.filter(F.col("n") % 10 == 0).select(
        "conv_id",
        F.lit("Reviewer Note").alias("field"),
        F.concat(F.lit("reviewed-"), F.col("n").cast("string"))
        .alias("corrected_value"),
    )
    return override.unionByName(addition)
