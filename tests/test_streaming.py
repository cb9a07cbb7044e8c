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


@pytest.mark.slow
def test_stateful_streaming_merge_matches_batch(spark, xs_parquet, tmp_path):
    """applyInPandasWithState conversation merge: final state after the
    stream drains must equal the batch merge operator."""
    import pandas as pd
    from pyspark.sql import functions as F

    from pdfextraction_spark.operators.extract import extract_turns
    from pdfextraction_spark.operators.merge import merge_conversation_fields
    from pdfextraction_spark.schema import TRANSCRIPTS_SCHEMA
    from pdfextraction_spark.streaming.stateful import (
        streaming_conversation_merge,
    )

    src = str(tmp_path / "src")
    os.makedirs(src)
    shutil.copy(xs_parquet, os.path.join(src, "part-0.parquet"))
    out = str(tmp_path / "merged")
    ckpt = str(tmp_path / "ckpt2")

    stream = spark.readStream.schema(TRANSCRIPTS_SCHEMA).parquet(src)
    merged = streaming_conversation_merge(extract_turns(stream))
    q = (
        merged.writeStream.format("memory")
        .queryName("merged_tbl")
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    batch = (
        merge_conversation_fields(extract_turns(spark.read.parquet(xs_parquet)))
        .orderBy("conv_id", "field")
        .toPandas()
    )
    from pyspark.sql import Window

    streamed = (
        spark.table("merged_tbl")
        # update sink holds one version per micro-batch; keep the last
        .withColumn("rn", F.row_number().over(
            Window.partitionBy("conv_id", "field")
            .orderBy(F.desc("n_occurrences"))))
        .filter("rn = 1")
        .drop("rn")
        .orderBy("conv_id", "field")
        .toPandas()
    )
    assert len(streamed) == len(batch)
    for col in ("conv_id", "field", "value", "source_turn",
                "conflict_detected", "n_occurrences"):
        assert list(streamed[col]) == list(batch[col]), col


@pytest.mark.slow
def test_watermarked_windowed_metrics(spark, xs_parquet, tmp_path):
    """Event-time windowed extraction metrics with a watermark: stream
    totals must reconcile with the batch per-kind counts."""
    from pyspark.sql import functions as F

    from pdfextraction_spark.operators.extract import extract_turns
    from pdfextraction_spark.schema import TRANSCRIPTS_SCHEMA
    from pdfextraction_spark.streaming.extract import windowed_turn_metrics

    src = str(tmp_path / "src")
    os.makedirs(src)
    shutil.copy(xs_parquet, os.path.join(src, "part-0.parquet"))
    stream = spark.readStream.schema(TRANSCRIPTS_SCHEMA).parquet(src)
    metrics = windowed_turn_metrics(extract_turns(stream), window="5 minutes")
    # update mode: append would (correctly) hold back windows still
    # inside the watermark when the stream drains
    q = (
        metrics.writeStream.format("memory")
        .queryName("win_metrics")
        .option("checkpointLocation", str(tmp_path / "ckpt3"))
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = (
        spark.table("win_metrics").toPandas()
        .sort_values("n_turns")
        .drop_duplicates(["window_start", "payload_kind"], keep="last")
    )
    batch = (
        extract_turns(spark.read.parquet(xs_parquet))
        .groupBy("payload_kind").count().toPandas()
        .set_index("payload_kind")["count"]
    )
    agg = got.groupby("payload_kind")["n_turns"].sum()
    for kind, n in batch.items():
        assert agg[kind] == n, kind
    # windows are aligned 5-minute buckets
    assert ((got["window_end"] - got["window_start"]).dt.total_seconds() == 300).all()


@pytest.mark.slow
def test_stateful_streaming_table_merge_matches_batch(spark, xs_parquet, tmp_path):
    """applyInPandasWithState table accumulation: final state after the
    stream drains must equal merge_conversation_tables on the same
    input."""
    from pyspark.sql import Window, functions as F

    from pdfextraction_spark.operators.merge import merge_conversation_tables
    from pdfextraction_spark.operators.tables import extract_tables
    from pdfextraction_spark.schema import TRANSCRIPTS_SCHEMA
    from pdfextraction_spark.streaming.stateful import streaming_table_merge

    src = str(tmp_path / "src")
    os.makedirs(src)
    shutil.copy(xs_parquet, os.path.join(src, "part-0.parquet"))
    ckpt = str(tmp_path / "ckpt3")

    stream = spark.readStream.schema(TRANSCRIPTS_SCHEMA).parquet(src)
    q = (
        streaming_table_merge(extract_tables(stream))
        .writeStream.format("memory")
        .queryName("tables_tbl")
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    batch = (
        merge_conversation_tables(extract_tables(spark.read.parquet(xs_parquet)))
        .orderBy("conv_id", "headers")
        .toPandas()
    )
    streamed = (
        spark.table("tables_tbl")
        .withColumn("rn", F.row_number().over(
            Window.partitionBy("conv_id", "headers")
            .orderBy(F.desc("total_rows"))))
        .filter("rn = 1")
        .drop("rn")
        .orderBy("conv_id", "headers")
        .toPandas()
    )
    assert len(streamed) == len(batch) > 0
    for col in ("conv_id", "headers", "total_rows", "source_turns",
                "rows_by_turn", "spans_multiple_turns"):
        assert list(streamed[col]) == list(batch[col]), col


@pytest.mark.slow
def test_streaming_exact_dedup_matches_batch_set(spark, tmp_path):
    """Multi-batch streaming dedup (maxFilesPerTrigger=1 forces state
    to carry across micro-batches): the surviving fingerprint SET must
    equal batch exact_dedup's, with exactly one survivor per distinct
    normalized text, and the duplicate arriving in a LATER file must
    be suppressed by state, not by within-batch dedup."""
    import pandas as pd

    from pdfextraction_spark.streaming.dedup import (
        FINGERPRINT_COL,
        stream_exact_dedup,
        with_content_fingerprint,
    )

    src = str(tmp_path / "dsrc")
    os.makedirs(src)
    # file 1: docs 0..9; file 2: docs 10..19 where 10..14 duplicate
    # (whitespace-mangled) texts from file 1
    f1 = pd.DataFrame({
        "doc_id": range(10),
        "text": [f"doc body number {i} with words" for i in range(10)],
    })
    f2 = pd.DataFrame({
        "doc_id": range(10, 20),
        "text": [f"  DOC   body number {i}  with words " for i in range(5)]
        + [f"doc body number {i} with words" for i in range(15, 20)],
    })
    f1.to_parquet(os.path.join(src, "part-0.parquet"), index=False)
    f2.to_parquet(os.path.join(src, "part-1.parquet"), index=False)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = str(tmp_path / "dout")
    ckpt = str(tmp_path / "dckpt")
    q = (
        stream_exact_dedup(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = spark.read.parquet(out).toPandas()
    batch_all = pd.concat([f1, f2], ignore_index=True)
    batch_fps = with_content_fingerprint(
        spark.createDataFrame(batch_all)
    ).toPandas()
    # one survivor per distinct fingerprint; sets agree with batch
    assert len(got) == batch_fps[FINGERPRINT_COL].nunique() == 15
    assert set(got[FINGERPRINT_COL]) == set(batch_fps[FINGERPRINT_COL])
    # the cross-file duplicates (docs 10..14) lost to first arrival
    assert set(got.doc_id) == set(range(10)) | set(range(15, 20))


@pytest.mark.slow
def test_streaming_dedup_within_watermark_bounded_state(spark, tmp_path):
    """The production form: dropDuplicatesWithinWatermark on the
    fingerprint — a duplicate arriving within the watermark window is
    suppressed."""
    import pandas as pd

    from pdfextraction_spark.streaming.dedup import stream_exact_dedup

    src = str(tmp_path / "wsrc")
    os.makedirs(src)
    base = pd.Timestamp("2026-01-01 00:00:00")
    f1 = pd.DataFrame({
        "doc_id": [1, 2],
        "text": ["alpha beta", "gamma delta"],
        "ts": [base, base + pd.Timedelta(minutes=1)],
    })
    f2 = pd.DataFrame({
        "doc_id": [3, 4],
        "text": ["alpha beta", "epsilon zeta"],   # dup of doc 1
        "ts": [base + pd.Timedelta(minutes=2),
               base + pd.Timedelta(minutes=3)],
    })
    for df in (f1, f2):
        df["ts"] = df["ts"].astype("datetime64[us]")
    f1.to_parquet(os.path.join(src, "part-0.parquet"), index=False)
    f2.to_parquet(os.path.join(src, "part-1.parquet"), index=False)

    stream = (
        spark.readStream.schema("doc_id long, text string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = str(tmp_path / "wout")
    q = (
        stream_exact_dedup(stream, ts_col="ts", watermark="10 minutes")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "wckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out).toPandas()
    assert sorted(got.doc_id) == [1, 2, 4]


@pytest.mark.slow
def test_streaming_neardup_matches_batch_join(spark, tmp_path):
    """Streaming near-dup screening vs a static corpus must emit the
    EXACT matches the batch minhash_lsh_join finds — split the stream
    across two files (maxFilesPerTrigger=1) so the equality covers
    multiple micro-batches, each joined against the prebuilt corpus
    index."""
    import numpy as np
    import pandas as pd

    from pdfextraction_spark.functions.dedup import minhash_lsh_join
    from pdfextraction_spark.streaming.neardup import (
        stream_neardup_matches,
    )

    rng = np.random.default_rng(31)
    vocab = [f"w{i}" for i in range(150)]
    corpus_rows = []
    for i in range(30):
        corpus_rows.append((100 + i,
                            " ".join(rng.choice(vocab, size=30))))
    corpus_pdf = pd.DataFrame(corpus_rows, columns=["doc_id", "text"])
    # stream docs: 0..9, where evens are near-copies of corpus docs
    stream_rows = []
    for i in range(10):
        if i % 2 == 0:
            base = corpus_rows[i][1].split()
            base[3] = "mut"
            stream_rows.append((i, " ".join(base)))
        else:
            stream_rows.append((i, " ".join(rng.choice(vocab, size=30))))
    s_pdf = pd.DataFrame(stream_rows, columns=["doc_id", "text"])

    src = str(tmp_path / "nsrc")
    os.makedirs(src)
    s_pdf.iloc[:5].to_parquet(os.path.join(src, "part-0.parquet"),
                              index=False)
    s_pdf.iloc[5:].to_parquet(os.path.join(src, "part-1.parquet"),
                              index=False)

    corpus = spark.createDataFrame(corpus_pdf)
    collected = []

    def sink(matches, batch_id):
        collected.extend(
            (r.left_id, r.right_id, r.jaccard)
            for r in matches.collect()
        )

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_neardup_matches(stream, corpus, sink, threshold=0.5)
        .option("checkpointLocation", str(tmp_path / "nckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    batch = minhash_lsh_join(
        spark.createDataFrame(s_pdf), corpus, threshold=0.5
    ).collect()
    want = sorted((r.left_id, r.right_id, r.jaccard) for r in batch)
    assert sorted(collected) == want
    assert len(want) >= 5  # the planted near-copies are found
