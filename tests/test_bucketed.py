"""Bucketed co-located join: both sides bucketed by conv_id with the
same bucket count -> the join plans with ZERO Exchange."""

import os

import pytest
from pyspark.sql import functions as F


@pytest.mark.slow
def test_bucketed_join_no_shuffle(spark, xs_parquet, tmp_path):
    from pdfextraction_spark.operators.extract import extract_turns
    from pdfextraction_spark.sources.bucketed import bucketed_join, write_bucketed

    import shutil

    # warehouse.dir is static; tables land in ./spark-warehouse
    # (gitignored). The in-memory catalog forgets tables across
    # sessions while their directories persist -> clean both first.
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("t_turns", "t_extracted"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(os.path.join(wh, t), ignore_errors=True)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    turns = spark.read.parquet(xs_parquet)
    extracted = extract_turns(turns)
    write_bucketed(turns.select("conv_id", "turn_idx", "role"),
                   "t_turns", buckets=4)
    write_bucketed(extracted.select("conv_id", "turn_idx", "payload_kind"),
                   "t_extracted", buckets=4)

    joined = bucketed_join(spark, "t_turns", "t_extracted",
                           on=["conv_id"], how="inner")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, plan  # co-located: no shuffle either side
    assert joined.count() > 0

    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
