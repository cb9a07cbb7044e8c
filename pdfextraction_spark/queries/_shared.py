"""Shared helpers for the driver query modules: the sf-table reader
and the transcripts-fixture loader every query family uses."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _fixture_turns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic transcripts fixture sized to the sf tier."""
    from pdfextraction_spark.sources.transcripts import ensure_fixture_parquet

    tier = "xs" if sf_dir.rstrip("/").endswith("sf0.001") else "s"
    return spark.read.parquet(ensure_fixture_parquet(tier))
