"""block_class (step-1 structure classification) and cross-turn table
merge — Spark results pinned against the loop-oracle golden mirrors
(oracle/mergeops.py) on the xs fixture, plus hand-pinned rule cases."""

import pandas as pd
import pytest

from fixtures.golden import ensure_golden
from pdfextraction_spark.payload import encode_pdf_envelope


@pytest.fixture(scope="module")
def golden_xs():
    return ensure_golden("xs")


def test_classify_blocks_vs_golden(spark, xs_parquet, golden_xs):
    import os

    from pdfextraction_spark.operators.classify import classify_blocks
    from pdfextraction_spark.operators.tables import extract_tables
    from pdfextraction_spark.pipeline import extract_dataframe

    turns = spark.read.parquet(xs_parquet)
    got = (
        classify_blocks(extract_dataframe(turns, num_partitions=4),
                        extract_tables(turns))
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    g_turns = pd.read_parquet(os.path.join(golden_xs, "turns.parquet"))
    g_tables = pd.read_parquet(os.path.join(golden_xs, "tables.parquet"))
    pdf = g_turns[(g_turns.payload_kind == "pdf_layout") & ~g_turns.parse_failed]
    n_fields = {
        (r.conv_id, r.turn_idx): sum(
            1 for s in r.spans.split("|") if s.startswith("fields:")
        ) if r.spans else 0
        for r in pdf.itertuples()
    }
    n_regions = (
        g_tables.groupby(["conv_id", "turn_idx"])["table_idx"].nunique().to_dict()
    )
    assert len(got) == len(pdf)
    for r in got.itertuples():
        key = (r.conv_id, r.turn_idx)
        nf, nt = n_fields[key], n_regions.get(key, 0)
        exp = ("mixed" if nf and nt else "table" if nt
               else "form" if nf else "unknown")
        assert r.block_class == exp, key
        assert r.n_field_lines == nf and r.n_table_regions == nt, key
        exp_conf = 0.0 if exp == "unknown" else round(
            0.5 + 0.1 * min(nf + 2 * nt, 4), 2
        )
        assert abs(r.confidence - exp_conf) < 1e-9, key
    # the xs fixture exercises every class
    assert {"form", "table", "mixed"} <= set(got.block_class)


def test_merge_tables_vs_golden(spark, xs_parquet, golden_xs):
    import os

    from pdfextraction_spark.operators.merge import merge_conversation_tables
    from pdfextraction_spark.operators.tables import extract_tables

    got = (
        merge_conversation_tables(extract_tables(spark.read.parquet(xs_parquet)))
        .toPandas()
        .sort_values(["conv_id", "headers"])
        .reset_index(drop=True)
    )
    exp = (
        pd.read_parquet(os.path.join(golden_xs, "table_merge.parquet"))
        .sort_values(["conv_id", "headers"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp) > 0
    for c in ["conv_id", "headers", "total_rows", "source_turns",
              "rows_by_turn", "spans_multiple_turns"]:
        assert list(got[c]) == list(exp[c]), c


def test_merge_tables_pinned_multi_turn(spark, tmp_path):
    """A table whose header repeats across turns accumulates rows with
    per-turn bookkeeping (result_merger.py:122-163 semantics)."""
    from pdfextraction_spark.operators.merge import merge_conversation_tables
    from pdfextraction_spark.operators.tables import extract_tables

    def table_turn(rows):
        words = []
        y = 72.0
        hx = [36.0, 156.0, 276.0]
        for t, x in zip(["Code", "Rate", "Total"], hx):
            words.append((t, x, y, x + len(t) * 5.0, y + 10.0))
        y += 16.0
        for row in rows:
            for t, x in zip(row, hx):
                words.append((t, x, y, x + len(t) * 5.0, y + 10.0))
            y += 16.0
        return encode_pdf_envelope(words)

    df = pd.DataFrame(
        {
            "conv_id": ["c1", "c1", "c2"],
            "turn_idx": pd.array([0, 3, 0], dtype="int32"),
            "role": ["user"] * 3,
            "text": [
                table_turn([["MED", "19.00", "57.00"], ["FITW", "12.00", "24.00"]]),
                table_turn([["W2", "10.00", "10.00"]] * 3),
                table_turn([["MED", "19.00", "57.00"], ["MED", "19.00", "57.00"]]),
            ],
            "tool": [None] * 3,
            "ts": pd.to_datetime(["2024-01-01"] * 3).astype("datetime64[us]"),
        }
    )
    p = str(tmp_path / "t.parquet")
    df.to_parquet(p, index=False)
    got = (
        merge_conversation_tables(extract_tables(spark.read.parquet(p)))
        .toPandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    assert list(got.conv_id) == ["c1", "c2"]
    c1 = got.iloc[0]
    assert c1.total_rows == 5
    assert c1.source_turns == "0,3"
    assert c1.rows_by_turn == "0:2,3:3"
    assert bool(c1.spans_multiple_turns)
    c2 = got.iloc[1]
    assert c2.total_rows == 2
    assert c2.source_turns == "0"
    assert not bool(c2.spans_multiple_turns)
