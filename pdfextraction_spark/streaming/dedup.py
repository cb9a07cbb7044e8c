"""Streaming exact deduplication — first-arrival-wins over a document
stream.

The batch engine dedups with a hash-groupBy (functions/dedup.py
exact_dedup: min id wins). A continuously-ingesting corpus wants the
streaming formulation instead: keep the FIRST arrival of each
normalized text, drop later copies, with the dedup state bounded so it
doesn't grow forever.

Spark-native building blocks, no custom state code:

- ``dropDuplicatesWithinWatermark`` on the 64-bit content fingerprint
  with an event-time watermark — the production form: state for a
  fingerprint is dropped once the watermark passes it, so memory is
  bounded by (arrival-skew window x ingest rate), and a duplicate
  arriving within the window is suppressed. Duplicates farther apart
  than the watermark are the documented miss mode — batch
  ``exact_dedup`` over the accumulated output remains the periodic
  ground-truth sweep (the standard lambda pairing).
- ``dropDuplicates`` without a timestamp column — unbounded state;
  the small-scale / backfill verifier. Never run this on an infinite
  stream.

The state key is ``xxhash64(normalized_text)`` — a fixed-width long,
never the text itself, same key discipline and collision policy as
the batch path (functions/dedup.py:84-104).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, functions as F

FINGERPRINT_COL = "content_fp"


def with_content_fingerprint(df: DataFrame,
                             text_col: str = "text") -> DataFrame:
    """Append the batch-identical dedup key — delegates to
    functions/text.fingerprint64 so the formula has exactly one home
    and the streaming key can never drift from the batch key."""
    from ..functions.text import fingerprint64

    return df.withColumn(FINGERPRINT_COL, fingerprint64(F.col(text_col)))


def stream_exact_dedup(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: Optional[str] = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """First-arrival exact dedup of a streaming DataFrame.

    With ``ts_col``: watermarked ``dropDuplicatesWithinWatermark`` —
    bounded state, the form you run on an infinite ingest. Without:
    plain ``dropDuplicates`` on the fingerprint — unbounded state,
    for finite backfills and tests only."""
    fp = with_content_fingerprint(docs, text_col)
    if ts_col is not None:
        return fp.withWatermark(ts_col, watermark) \
            .dropDuplicatesWithinWatermark([FINGERPRINT_COL])
    return fp.dropDuplicates([FINGERPRINT_COL])
