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
            # match the batch operator exactly: field = before FIRST
            # separator, value = after LAST; trim ASCII spaces only
            field = part.split(":\t", 1)[0]
            value = part.rsplit(":\t", 1)[-1]
            if value == EMPTY_SENTINEL or not value.strip(" "):
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


TABLE_OUTPUT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("headers", StringType()),
        StructField("total_rows", LongType()),
        StructField("source_turns", StringType()),
        StructField("rows_by_turn", StringType()),
        StructField("spans_multiple_turns", BooleanType()),
    ]
)


def table_state_fn(
    key: Tuple[str, str], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Streaming counterpart of operators/merge.merge_conversation_tables
    (result_merger.py:122-163): per (conversation, table identity =
    headers signature), accumulate row counts by source turn."""
    conv_id, headers = key
    by_turn: dict[str, int] = (
        json.loads(state.get[0]) if state.exists else {}
    )
    for pdf in pdfs:
        for turn_idx in pdf["turn_idx"]:
            t = str(int(turn_idx))
            by_turn[t] = by_turn.get(t, 0) + 1
    state.update((json.dumps(by_turn),))
    turns_sorted = sorted(by_turn, key=int)
    yield pd.DataFrame(
        {
            "conv_id": [conv_id],
            "headers": [headers],
            "total_rows": pd.array([sum(by_turn.values())], dtype="int64"),
            "source_turns": [",".join(turns_sorted)],
            "rows_by_turn": [",".join(f"{t}:{by_turn[t]}" for t in turns_sorted)],
            "spans_multiple_turns": [len(by_turn) > 1],
        }
    )


def streaming_table_merge(tables_stream: DataFrame) -> DataFrame:
    """Apply the stateful table accumulation to a STREAMING
    extract_tables frame (one input row per table row). Batch jobs use
    operators/merge.merge_conversation_tables; outputs agree row-for-row
    once a stream is drained (pinned in tests)."""
    from pyspark.sql import functions as F

    return (
        tables_stream.select(
            "conv_id",
            F.array_join("headers", "\x1f").alias("headers"),
            "turn_idx",
        )
        .groupBy("conv_id", "headers")
        .applyInPandasWithState(
            table_state_fn,
            outputStructType=TABLE_OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
