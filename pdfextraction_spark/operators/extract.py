"""Spark extraction operator — one fused mapInArrow stage.

The reference's three sequential steps (classify -> identify ->
extract, app.py:206-904) collapse into a single narrow Arrow stage
(SURVEY.md §7.1): detect payload kind, strip/reflow, emit text +
spans + metrics. No shuffle; whole batches flow Arrow -> NumPy ->
Arrow with zero per-row Python at the Spark boundary.
"""

from __future__ import annotations

from typing import Iterator, List

import pyarrow as pa
from pyspark.sql import DataFrame

from ..kernels import extract_batch
from ..schema import EXTRACTED_ARROW, SPAN_ARROW

_PASSTHROUGH = ["conv_id", "turn_idx", "role"]


def _spans_to_arrow(spans_lists: List[List[tuple]]) -> pa.Array:
    return pa.array(
        [
            [{"label": l, "start": s, "end": e} for (l, s, e) in spans]
            for spans in spans_lists
        ],
        type=SPAN_ARROW,
    )


def _extract_batches(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
    for batch in it:
        texts = batch.column("text").to_pandas()
        out = extract_batch(texts)
        arrays = [
            batch.column("conv_id"),
            batch.column("turn_idx").cast(pa.int32()),
            batch.column("role"),
            pa.array(out["payload_kind"], type=pa.string()),
            pa.array(out["extracted_text"], type=pa.string()),
            _spans_to_arrow(list(out["spans"])),
            pa.array(out["blocks_kept"], type=pa.int32()),
            pa.array(out["blocks_dropped"], type=pa.int32()),
            pa.array(out["parse_failed"], type=pa.bool_()),
        ]
        yield pa.RecordBatch.from_arrays(arrays, schema=EXTRACTED_ARROW)


def extract_turns(turns: DataFrame) -> DataFrame:
    """Apply the fused extraction stage to a transcripts DataFrame.

    Input requires columns (conv_id, turn_idx, role, text); output has
    EXTRACTED_SCHEMA. Narrow transformation — preserves partitioning.
    """
    cols = [c for c in _PASSTHROUGH if c in turns.columns] + ["text"]
    ddl = (
        "conv_id string, turn_idx int, role string, payload_kind string, "
        "extracted_text string, "
        "spans array<struct<label:string,start:int,end:int>>, "
        "blocks_kept int, blocks_dropped int, parse_failed boolean"
    )
    return turns.select(*cols).mapInArrow(_extract_batches, ddl)
