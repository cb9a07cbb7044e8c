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


def derive_templates(extracted: DataFrame,
                     validated_pages: DataFrame,
                     corrections: DataFrame | None = None) -> DataFrame:
    """Template CREATION (reference multipage_processor.py:72-97
    ``create_enhanced_template``): the extraction template for a
    conversation is the field schema of its human-validated page
    (base_structure = the validated turn's extracted field set) plus
    any human-added correction fields (the feedback-derived
    enhancements), stamped with the source page and a version.

    Output: (conv_id, field, created_from_turn, template_version) —
    one row per template field per conversation that has a validated
    page. Scale: one (conv, turn)-selective join projects the pairs of
    the validated turns only; corrections are human-sized and
    broadcast."""
    from .merge import parse_field_pairs

    pairs = parse_field_pairs(extracted).filter(
        F.col("value").isNotNull() & (F.trim("value") != "")
    )
    vp = validated_pages.select(
        "conv_id", F.col("turn_idx").alias("__vturn")
    )
    base = (
        pairs.join(F.broadcast(vp),
                   (pairs["conv_id"] == vp["conv_id"])
                   & (pairs["turn_idx"] == F.col("__vturn")))
        .select(pairs["conv_id"], "field", "__vturn")
        .distinct()
    )
    if corrections is not None:
        added = (
            corrections.select("conv_id", "field")
            .join(F.broadcast(vp), "conv_id")
            .select("conv_id", "field", "__vturn")
            .distinct()
        )
        base = base.unionByName(added).distinct()
    return base.select(
        "conv_id", "field",
        F.col("__vturn").alias("created_from_turn"),
        F.lit("1.0").alias("template_version"),
    )


def template_apply(extracted: DataFrame,
                   validated_pages: DataFrame,
                   corrections: DataFrame | None = None) -> DataFrame:
    """Template PROPAGATION (multipage_processor.py:99-159
    ``process_all_pages`` / ``_process_single_page``): apply each
    conversation's validated-page template to every sibling layout
    page. Every page is re-read against the template's field schema —
    one output row per (page, template field):

    - the page's own extraction carries the value (longest-wins within
      the page, earliest position wins ties — the result_merger tie
      rule applied per page instead of per conversation),
    - a field the page lacks comes out value=NULL, found=false (the
      reference's enhanced extraction returns empty for absent
      fields — pages are never backfilled from other pages),
    - on the VALIDATION page itself a human correction overrides the
      machine value (app.py:822 validated-JSON precedence), source =
      'validated',
    - lineage columns carry created_from_turn + template_version
      (the reference's page_metadata stamp).

    Scale: pairs and pages are (conv, turn)-keyed aggregations with
    map-side combine; the template×pages grid is a conv-keyed shuffle
    join (bounded fields per conversation); corrections broadcast.
    No step is driver-side and nothing is quadratic in pages — the
    grid is |pages| x |template fields|, the output's own size."""
    from ..payload import KIND_PDF
    from .merge import parse_field_pairs

    tmpl = derive_templates(extracted, validated_pages, corrections)
    pages = (
        extracted.filter(F.col("payload_kind") == KIND_PDF)
        .select("conv_id", "turn_idx")
        .distinct()
    )
    pairs = parse_field_pairs(extracted).filter(
        F.col("value").isNotNull() & (F.trim("value") != "")
    )
    pick = F.struct(
        F.length("value").alias("l"),
        (-F.col("pos")).alias("p"),
    )
    page_vals = pairs.groupBy("conv_id", "turn_idx", "field").agg(
        F.max_by("value", pick).alias("__pval")
    )
    grid = pages.join(tmpl, "conv_id")
    out = grid.join(page_vals, ["conv_id", "turn_idx", "field"], "left")
    if corrections is not None:
        c = (
            corrections.select("conv_id", "field", "corrected_value")
            .groupBy("conv_id", "field")
            .agg(F.max("corrected_value").alias("__cval"))
        )
        out = out.join(F.broadcast(c), ["conv_id", "field"], "left")
    else:
        out = out.withColumn("__cval", F.lit(None).cast("string"))
    on_vpage = F.col("turn_idx") == F.col("created_from_turn")
    corrected = on_vpage & F.col("__cval").isNotNull()
    value = F.when(corrected, F.col("__cval")).otherwise(F.col("__pval"))
    source = (
        F.when(corrected, F.lit(SOURCE_VALIDATED))
        .when(F.col("__pval").isNotNull(), F.lit(SOURCE_MACHINE))
        .otherwise(F.lit("missing"))
    )
    return out.select(
        "conv_id", "turn_idx", "field",
        value.alias("value"),
        source.alias("source"),
        value.isNotNull().alias("found"),
        "created_from_turn", "template_version",
    )


def fixture_validated_pages(extracted: DataFrame) -> DataFrame:
    """Deterministic validation-page fixture: the FIRST field-bearing
    turn of each conversation plays the human-selected validation page
    (the reference's user picks one page to validate; first-with-data
    is the reproducible analogue). Output: (conv_id, turn_idx)."""
    from .merge import parse_field_pairs

    pairs = parse_field_pairs(extracted).filter(
        F.col("value").isNotNull() & (F.trim("value") != "")
    )
    return pairs.groupBy("conv_id").agg(
        F.min("turn_idx").alias("turn_idx")
    )


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
