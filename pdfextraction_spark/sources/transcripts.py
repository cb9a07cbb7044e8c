"""Transcripts source (BASELINE.json input_hint shape).

Reads the conversation/agent-transcript table from parquet (Iceberg
in production: swap ``spark.read.parquet`` for
``spark.read.format("iceberg").load(tbl)`` — everything downstream is
format-agnostic) and exposes deterministic fixture synthesis for
tests/bench.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..schema import TRANSCRIPTS_SCHEMA


def read_transcripts(spark: SparkSession, path: str) -> DataFrame:
    df = spark.read.parquet(path)
    missing = set(f.name for f in TRANSCRIPTS_SCHEMA.fields) - set(df.columns)
    if missing:
        raise ValueError(f"transcripts table missing columns: {sorted(missing)}")
    return df.select([f.name for f in TRANSCRIPTS_SCHEMA.fields])


def ensure_fixture_parquet(tier: str, total_turns: int | None = None,
                           cache_dir: str = "/tmp/pdfx_fixtures") -> str:
    """Deterministically synthesize (once) and cache the transcripts
    fixture for a tier; returns the parquet path. Cache keys include
    the generator version so stale caches never survive a generator
    change."""
    from fixtures.generate import FIXTURE_VERSION

    suffix = f"{tier}_{total_turns or 'default'}_v{FIXTURE_VERSION}"
    path = os.path.join(cache_dir, f"transcripts_{suffix}.parquet")
    if not os.path.exists(path):
        from fixtures.generate import write_transcripts_parquet

        os.makedirs(cache_dir, exist_ok=True)
        tmp = path + ".tmp"
        write_transcripts_parquet(tmp, tier, total_turns)
        os.replace(tmp, path)
    return path
