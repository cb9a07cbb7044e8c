"""Typed anomaly records + corrections overlay (VERDICT r2 items 5/6):
semantic unit tests against hand-computed expectations, plus plan
shape (the corpus-sized side of the overlay must ride a broadcast
join, never a full shuffle)."""

import pytest
from pyspark.sql import functions as F

from pdfextraction_spark.operators.anomalies import (
    extraction_anomalies,
    field_conflict_anomalies,
    row_structure_anomalies,
)
from pdfextraction_spark.operators.corrections import (
    apply_corrections,
    fixture_corrections,
)

US = "\x1f"


@pytest.fixture()
def extracted(spark):
    """Two convs: c0 has a conflicting field (two values for Name),
    c1 is clean."""
    rows = [
        ("conv-0", 0, "Name:\tJane Q"),
        ("conv-0", 1, "Name:\tJane Quincy"),
        ("conv-0", 2, "Dept:\tR&D"),
        ("conv-1", 0, "Name:\tBob"),
    ]
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, extracted_text string"
    )


@pytest.fixture()
def tables(spark):
    """conv-0: one table across 2 turns with varying filled counts
    (anomaly); conv-1: multi-turn but consistent (clean); conv-2:
    single-turn varying (NOT flagged — reference gates on
    spans_multiple_pages)."""
    rows = [
        ("conv-0", 0, 0, ["A", "B"], 0, ["1", "2"]),
        ("conv-0", 1, 0, ["A", "B"], 0, ["3", None]),
        ("conv-1", 0, 0, ["A", "B"], 0, ["1", "2"]),
        ("conv-1", 1, 0, ["A", "B"], 0, ["3", "4"]),
        ("conv-2", 0, 0, ["A", "B"], 0, ["1", "2"]),
        ("conv-2", 0, 0, ["A", "B"], 1, ["3", None]),
    ]
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, table_idx int, "
        "headers array<string>, row_idx int, cells array<string>",
    )


def test_field_conflict_records(spark, extracted):
    out = field_conflict_anomalies(extracted).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.conv_id, r.anomaly_type, r.subject) == (
        "conv-0", "field_conflict", "Name"
    )
    assert r.issue == "Multiple different values found across turns"
    assert r.detail == "resolved to longest value; occurrences=2"


def test_row_structure_records(spark, tables):
    out = row_structure_anomalies(tables).collect()
    assert len(out) == 1
    r = out[0]
    assert r.conv_id == "conv-0"
    assert r.anomaly_type == "inconsistent_row_structure"
    assert r.subject == f"A{US}B"
    assert r.detail == "row cell counts vary: [1, 2]"


def test_union_stream(spark, extracted, tables):
    out = extraction_anomalies(extracted, tables).toPandas()
    assert sorted(out["anomaly_type"].unique()) == [
        "field_conflict", "inconsistent_row_structure"
    ]
    assert list(out.columns) == [
        "conv_id", "anomaly_type", "subject", "issue", "detail"
    ]


@pytest.fixture()
def merged(spark):
    rows = [
        ("conv-0", "Employee Name", "Jane Q", 1, True, 2),
        ("conv-0", "Dept", "R&D", 0, False, 1),
        ("conv-5", "Dept", "Ops", 0, False, 1),
    ]
    return spark.createDataFrame(
        rows,
        "conv_id string, field string, value string, source_turn int, "
        "conflict_detected boolean, n_occurrences long",
    )


def test_corrections_override_passthrough_addition(spark, merged):
    corr = spark.createDataFrame(
        [
            ("conv-0", "Employee Name", "Jane Quincy (verified)"),
            ("conv-5", "Reviewer Note", "checked"),
        ],
        "conv_id string, field string, corrected_value string",
    )
    out = {
        (r.conv_id, r.field): r
        for r in apply_corrections(merged, corr).collect()
    }
    assert len(out) == 4
    o = out[("conv-0", "Employee Name")]
    assert (o.value, o.source, o.machine_value) == (
        "Jane Quincy (verified)", "validated", "Jane Q"
    )
    assert o.source_turn == 1 and o.conflict_detected
    p = out[("conv-0", "Dept")]
    assert (p.value, p.source, p.machine_value) == ("R&D", "machine", None)
    a = out[("conv-5", "Reviewer Note")]
    assert (a.value, a.source, a.machine_value) == (
        "checked", "validated", None
    )
    assert a.source_turn is None and a.conflict_detected is False


def test_corrections_overlay_broadcasts(spark, merged):
    """The merged (corpus-sized) side of the override join must be
    broadcast-joined against the tiny corrections table — a full-outer
    formulation would sort-merge-shuffle the whole corpus."""
    corr = spark.createDataFrame(
        [("conv-0", "Dept", "x")],
        "conv_id string, field string, corrected_value string",
    )
    plan = (
        apply_corrections(merged, corr)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan


def test_fixture_corrections_deterministic(spark):
    turns = spark.createDataFrame(
        [("conv-000005", 0), ("conv-000007", 0), ("conv-000010", 1)],
        "conv_id string, turn_idx int",
    )
    got = {
        (r.conv_id, r.field): r.corrected_value
        for r in fixture_corrections(turns).collect()
    }
    assert got == {
        ("conv-000005", "Employee Name"): "Validated Name 5",
        ("conv-000010", "Employee Name"): "Validated Name 10",
        ("conv-000010", "Reviewer Note"): "reviewed-10",
    }


def test_corrections_duplicate_keys_collapse(spark, merged):
    """Duplicate (conv_id, field) rows in a hand-maintained
    corrections table must not fan out the overlay join; the winner is
    deterministic (max corrected_value, nulls lose)."""
    corr = spark.createDataFrame(
        [
            ("conv-0", "Employee Name", "Alpha"),
            ("conv-0", "Employee Name", "Zeta"),
            ("conv-0", "Employee Name", None),
        ],
        "conv_id string, field string, corrected_value string",
    )
    rows = [
        r for r in apply_corrections(merged, corr).collect()
        if (r.conv_id, r.field) == ("conv-0", "Employee Name")
    ]
    assert len(rows) == 1
    assert rows[0].value == "Zeta"
    assert rows[0].source == "validated"
