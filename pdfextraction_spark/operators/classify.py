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

from typing import Iterator

import numpy as np
import pyarrow as pa
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


_FUSED_DDL = ("conv_id string, turn_idx int, block_class string, "
              "confidence double, n_table_regions long, n_field_lines long")

_FUSED_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("block_class", pa.string()),
        ("confidence", pa.float64()),
        ("n_table_regions", pa.int64()),
        ("n_field_lines", pa.int64()),
    ]
)


def _classify_batches(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
    from ..kernels.extract import _decode_envelopes_flat, detect_kinds
    from ..kernels.layout import reflow_flat
    from ..kernels.tables import tables_flat
    from ..payload import KIND_PDF

    for batch in it:
        texts = batch.column("text").to_pandas()
        conv = batch.column("conv_id").to_pylist()
        turn = batch.column("turn_idx").to_pylist()
        kinds = detect_kinds(texts)
        pdf_idx = np.flatnonzero(kinds == KIND_PDF)
        out = {k: [] for k in ("conv_id", "turn_idx", "block_class",
                               "confidence", "n_table_regions",
                               "n_field_lines")}
        if len(pdf_idx):
            sv = texts.fillna("").to_numpy(dtype=object)
            pdf_texts = [sv[i] for i in pdf_idx.tolist()]
            # ONE decode feeds both kernels (the fusion this operator
            # exists for)
            sizes, t_arr, coord, failed = _decode_envelopes_flat(pdf_texts)
            lines = reflow_flat(len(pdf_texts), sizes, t_arr, coord, failed)
            tables = tables_flat(len(pdf_texts), sizes, t_arr, coord, failed)
            for j, i in enumerate(pdf_idx.tolist()):
                if failed[j] or not lines[j]:
                    continue  # undecodable/empty: parse_failed turns
                nf = sum(1 for label, _t in lines[j] if label == "fields")
                nt = len(tables[j])
                cls = ("mixed" if nf and nt else "table" if nt
                       else "form" if nf else "unknown")
                conf = 0.0 if cls == "unknown" else round(
                    0.5 + 0.1 * min(nf + 2 * nt, 4), 2
                )
                out["conv_id"].append(conv[i])
                out["turn_idx"].append(turn[i])
                out["block_class"].append(cls)
                out["confidence"].append(conf)
                out["n_table_regions"].append(nt)
                out["n_field_lines"].append(nf)
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(out["conv_id"], type=pa.string()),
                pa.array(out["turn_idx"], type=pa.int32()),
                pa.array(out["block_class"], type=pa.string()),
                pa.array(out["confidence"], type=pa.float64()),
                pa.array(out["n_table_regions"], type=pa.int64()),
                pa.array(out["n_field_lines"], type=pa.int64()),
            ],
            schema=_FUSED_SCHEMA,
        )


def classify_turns(turns: DataFrame) -> DataFrame:
    """Fused single-pass classifier: one narrow mapInArrow stage that
    decodes each pdf_layout envelope ONCE and runs both evidence
    kernels — no second extraction pass, no join, no shuffle. Agrees
    row-for-row with classify_blocks() (pinned in tests); prefer this
    form in pipelines, and the compositional form when the extraction
    and table outputs are already materialized."""
    return turns.select("conv_id", "turn_idx", "text").mapInArrow(
        _classify_batches, _FUSED_DDL
    )
