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


class TestTemplatePropagation:
    """Multipage template propagation (multipage_processor.py:72-159):
    template derived from the validated page, applied to sibling
    pages, hand-computed expectations on a planted fixture."""

    @pytest.fixture()
    def pages(self, spark):
        # c0: page 0 (validated, first field-bearing) has Name+Dept;
        # page 2 has Name only + an off-template field Extra; page 4 is
        # a layout page with NO fields at all. c1: single page.
        rows = [
            ("c0", 0, "pdf_layout", "Name:\tJane\nDept:\tR&D"),
            ("c0", 2, "pdf_layout", "Name:\tJane Quincy    Extra:\tzz"),
            ("c0", 4, "pdf_layout", "no fields here"),
            ("c0", 5, "markdown", "Name:\tIGNORED non-layout"),
            ("c1", 1, "pdf_layout", "Solo:\tv"),
        ]
        return spark.createDataFrame(
            rows,
            "conv_id string, turn_idx int, payload_kind string,"
            " extracted_text string",
        )

    def test_hand_computed(self, spark, pages):
        from pdfextraction_spark.operators.corrections import (
            fixture_validated_pages,
            template_apply,
        )

        corr = spark.createDataFrame(
            [("c0", "Reviewer Note", "ok")],
            "conv_id string, field string, corrected_value string",
        )
        out = {
            (r.conv_id, r.turn_idx, r.field): r
            for r in template_apply(
                pages, fixture_validated_pages(pages), corr
            ).collect()
        }
        # template for c0 = {Name, Dept} (validated page 0) + Reviewer
        # Note (human-added); Extra is OFF-template -> never emitted
        assert not any(k[2] == "Extra" for k in out)
        # 3 layout pages x 3 template fields + 1 page x 1 field (c1)
        assert len(out) == 10
        v = out[("c0", 0, "Name")]
        assert (v.value, v.source, v.found) == ("Jane", "machine", True)
        # human-added field materializes ON the validation page only
        rn0 = out[("c0", 0, "Reviewer Note")]
        assert (rn0.value, rn0.source) == ("ok", "validated")
        rn2 = out[("c0", 2, "Reviewer Note")]
        assert (rn2.value, rn2.source, rn2.found) == (None, "missing", False)
        # sibling page keeps ITS OWN extraction, never backfilled
        n2 = out[("c0", 2, "Name")]
        assert (n2.value, n2.source) == ("Jane Quincy", "machine")
        d2 = out[("c0", 2, "Dept")]
        assert (d2.value, d2.found) == (None, False)
        # field-less layout page still emits the full template schema
        assert out[("c0", 4, "Name")].found is False
        # non-layout turn is not a page
        assert not any(k[:2] == ("c0", 5) for k in out)
        # lineage stamp
        assert all(r.template_version == "1.0" for r in out.values())
        assert all(
            r.created_from_turn == 0 for k, r in out.items() if k[0] == "c0"
        )
        assert out[("c1", 1, "Solo")].created_from_turn == 1

    def test_validation_page_correction_overrides(self, spark, pages):
        from pdfextraction_spark.operators.corrections import (
            fixture_validated_pages,
            template_apply,
        )

        corr = spark.createDataFrame(
            [("c0", "Name", "Validated Jane")],
            "conv_id string, field string, corrected_value string",
        )
        out = {
            (r.conv_id, r.turn_idx, r.field): r
            for r in template_apply(
                pages, fixture_validated_pages(pages), corr
            ).collect()
        }
        # override on the validation page; machine value elsewhere
        assert out[("c0", 0, "Name")].value == "Validated Jane"
        assert out[("c0", 0, "Name")].source == "validated"
        assert out[("c0", 2, "Name")].value == "Jane Quincy"
        assert out[("c0", 2, "Name")].source == "machine"

    def test_no_corrections_and_loop_oracle_parity(self, spark, pages):
        from pdfextraction_spark.operators.corrections import (
            fixture_validated_pages,
            template_apply,
        )
        from pdfextraction_spark.oracle.mergeops import (
            template_apply_golden,
        )

        got = sorted(
            (r.conv_id, r.turn_idx, r.field, r.value, r.source,
             r.found, r.created_from_turn, r.template_version)
            for r in template_apply(
                pages, fixture_validated_pages(pages)
            ).collect()
        )
        rows = [(r.conv_id, r.turn_idx, r.payload_kind, r.extracted_text)
                for r in pages.collect()]
        want = sorted(
            (d["conv_id"], d["turn_idx"], d["field"], d["value"],
             d["source"], d["found"], d["created_from_turn"],
             d["template_version"])
            for d in template_apply_golden(rows, {})
        )
        assert got == want
