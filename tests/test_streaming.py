"""Streaming extraction: availableNow file-source run must equal the
batch pipeline output; restart with the same checkpoint is a no-op
(exactly-once)."""

import os
import shutil

import pytest

from pdfextraction_spark.streaming import stream_extract


@pytest.mark.slow
def test_stream_matches_batch_and_is_exactly_once(spark, xs_parquet, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    shutil.copy(xs_parquet, os.path.join(src, "part-0.parquet"))
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    q = stream_extract(spark, src, out, ckpt)
    q.awaitTermination(120)

    from pdfextraction_spark.operators.extract import extract_turns

    batch = (
        extract_turns(spark.read.parquet(xs_parquet))
        .select("conv_id", "turn_idx", "extracted_text", "parse_failed")
        .orderBy("conv_id", "turn_idx")
        .toPandas()
    )
    streamed = (
        spark.read.parquet(out)
        .select("conv_id", "turn_idx", "extracted_text", "parse_failed")
        .orderBy("conv_id", "turn_idx")
        .toPandas()
    )
    assert len(streamed) == len(batch)
    assert (streamed["extracted_text"] == batch["extracted_text"]).all()

    # re-run with same checkpoint: no new rows (file already committed)
    q2 = stream_extract(spark, src, out, ckpt)
    q2.awaitTermination(120)
    again = spark.read.parquet(out).count()
    assert again == len(batch)
