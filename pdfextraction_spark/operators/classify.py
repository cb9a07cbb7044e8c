"""Step-1 block classification (form / table / mixed) — the
deterministic replacement for the reference's first LLM call.

The reference classifies each page by prompting a model with the raw
text (/root/reference/services/openai_service.py:256-283; output shape
/root/reference/services/prompts.py:14-40: classification + confidence
+ regions). This engine derives the same decision from structure the
extraction pipeline already computed, per SURVEY.md §2.10:

- field evidence  = extracted lines labeled 'fields' (X1-X13 density
  via the layout kernel's span labels)
- table evidence  = W4 table regions found by the coordinate table
  extractor

Classification rule (deterministic, mirrored by the SQL oracle):

    table regions > 0 and field lines > 0  -> 'mixed'
    table regions > 0                      -> 'table'
    field lines  > 0                       -> 'form'
    neither                                -> 'unknown'  (reference
                                              emits 'unknown' only on
                                              LLM error; here it marks
                                              structure-free pages)

Confidence is a pinned monotone function of the evidence count
(0.5 + 0.1 * min(field_lines + 2 * regions, 4); 0.0 for unknown) —
the reference's confidence is model-reported and unreproducible, so
the engine defines its own deterministic scale. The reference's
``regions`` list is summarized as counts (n_table_regions,
n_field_lines) rather than prose descriptions.

Pure DataFrame composition over the two extraction operators — one
hash shuffle on (conv_id, turn_idx) for the region counts, then an
equi-join; no new kernel code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def classify_blocks(extracted: DataFrame, tables: DataFrame) -> DataFrame:
    """Per-turn block classification for decodable pdf_layout turns.

    ``extracted``: output of extract_turns/extract_dataframe (native
    spans array). ``tables``: output of extract_tables (one row per
    table row). Returns (conv_id, turn_idx, block_class, confidence,
    n_table_regions, n_field_lines)."""
    fields = (
        extracted.filter(
            (F.col("payload_kind") == "pdf_layout") & ~F.col("parse_failed")
        )
        .select(
            "conv_id",
            "turn_idx",
            F.size(
                F.filter("spans", lambda s: s["label"] == F.lit("fields"))
            ).cast("long").alias("n_field_lines"),
        )
    )
    regions = (
        tables.groupBy("conv_id", "turn_idx")
        .agg(F.count_distinct("table_idx").alias("n_table_regions"))
    )
    joined = fields.join(regions, ["conv_id", "turn_idx"], "left").withColumn(
        "n_table_regions", F.coalesce("n_table_regions", F.lit(0)).cast("long")
    )
    has_t = F.col("n_table_regions") > 0
    has_f = F.col("n_field_lines") > 0
    block_class = (
        F.when(has_t & has_f, "mixed")
        .when(has_t, "table")
        .when(has_f, "form")
        .otherwise("unknown")
    )
    evidence = F.col("n_field_lines") + 2 * F.col("n_table_regions")
    confidence = F.when(
        has_t | has_f,
        F.round(0.5 + 0.1 * F.least(evidence, F.lit(4)), 2),
    ).otherwise(F.lit(0.0))
    return joined.select(
        "conv_id",
        "turn_idx",
        block_class.alias("block_class"),
        confidence.alias("confidence"),
        "n_table_regions",
        "n_field_lines",
    )
