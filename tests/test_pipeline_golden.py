"""Golden per-turn equality (the primary gate, BASELINE.json metric):
the Spark pipeline's (extracted_text, spans) must exactly equal the
loop-based oracle's golden set, joined on (conv_id, turn_idx) under
stable turn ordering."""

import pandas as pd
import pytest

from fixtures.generate import gen_transcripts, golden_frame
from pdfextraction_spark.pipeline import extract_dataframe


@pytest.mark.slow
def test_spark_pipeline_matches_golden(spark, xs_parquet):
    golden = golden_frame(gen_transcripts("xs"))
    turns = spark.read.parquet(xs_parquet)
    result = (
        extract_dataframe(turns, num_partitions=4)
        .orderBy("conv_id", "turn_idx")
        .toPandas()
    )
    golden = golden.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert len(result) == len(golden)

    for i in range(len(golden)):
        g, r = golden.iloc[i], result.iloc[i]
        key = (g["conv_id"], int(g["turn_idx"]))
        assert (r["conv_id"], int(r["turn_idx"])) == key
        assert r["payload_kind"] == g["payload_kind"], key
        assert r["extracted_text"] == g["extracted_text"], key
        rspans = [(s["label"], s["start"], s["end"]) for s in r["spans"]]
        gspans = [(s["label"], s["start"], s["end"]) for s in g["spans"]]
        assert rspans == gspans, key
        assert int(r["blocks_kept"]) == int(g["blocks_kept"]), key
        assert int(r["blocks_dropped"]) == int(g["blocks_dropped"]), key
        assert bool(r["parse_failed"]) == bool(g["parse_failed"]), key
