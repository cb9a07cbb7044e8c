"""Stateful streaming conversation merge (applyInPandasWithState).

Streaming counterpart of operators/merge.py: as turn extractions
arrive, per-conversation state holds the current best value per field
(longest-wins, conflict flags — result_merger.py:93-120 semantics);
each micro-batch emits the updated rows for conversations it touched.

This is the "custom stateful operator" pattern: state is a single
serialized dict per conv_id, updates are Arrow-batched pandas, and the
streaming checkpoint makes it exactly-once. Batch jobs should use
operators/merge.py (one hash agg); this exists for incremental /
continuous ingestion deployments.
"""

from __future__ import annotations

import json
from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..config import CLUSTER_SEP, EMPTY_SENTINEL

OUTPUT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("field", StringType()),
        StructField("value", StringType()),
        StructField("source_turn", IntegerType()),
        StructField("conflict_detected", BooleanType()),
        StructField("n_occurrences", LongType()),
    ]
)

STATE_SCHEMA = StructType([StructField("state_json", StringType())])


def _pairs_from_text(turn_idx: int, text: str) -> Iterable[Tuple[str, str, int]]:
    for line in (text or "").split("\n"):
        for part in line.split(CLUSTER_SEP):
            if ":\t" not in part:
                continue
            field, _, value = part.partition(":\t")
            if value == EMPTY_SENTINEL or not value.strip():
                continue
            yield field, value, turn_idx


def merge_state_fn(
    key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Update per-conversation field state with longest-wins semantics;
    ties keep the earliest turn (the reference replaces only on
    strictly-greater length)."""
    conv_id = key[0]
    st: dict[str, Any] = (
        json.loads(state.get[0]) if state.exists else {}
    )
    for pdf in pdfs:
        ordered = pdf.sort_values(["turn_idx"], kind="stable")
        for turn_idx, text in zip(ordered["turn_idx"], ordered["extracted_text"]):
            for field, value, ti in _pairs_from_text(int(turn_idx), text):
                cur = st.get(field)
                if cur is None:
                    st[field] = {"v": value, "t": ti, "c": False, "n": 1}
                else:
                    cur["n"] += 1
                    cur["c"] = True
                    if len(value) > len(cur["v"]):
                        cur["v"], cur["t"] = value, ti
    state.update((json.dumps(st),))
    yield pd.DataFrame(
        {
            "conv_id": [conv_id] * len(st),
            "field": list(st.keys()),
            "value": [v["v"] for v in st.values()],
            "source_turn": pd.array([v["t"] for v in st.values()], dtype="int32"),
            "conflict_detected": [v["c"] for v in st.values()],
            "n_occurrences": pd.array([v["n"] for v in st.values()], dtype="int64"),
        }
    )


def streaming_conversation_merge(extracted_stream: DataFrame) -> DataFrame:
    """Apply the stateful merge to a STREAMING extracted-turns frame."""
    return (
        extracted_stream.select("conv_id", "turn_idx", "extracted_text")
        .groupBy("conv_id")
        .applyInPandasWithState(
            merge_state_fn,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
