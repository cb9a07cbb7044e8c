"""Checkpoint-manifest source/sink — the engine's resumability story.

Replaces the reference's whole-file documents.json rewrite
(storage.py:142-145, its central scalability anti-pattern) with an
append-only manifest table keyed by (source_snapshot_id,
partition_id): a restart reads committed partition ids for the same
input snapshot and skips them (anti-join), so output appends are
exactly-once at partition granularity (north rule "resumable from
checkpoint with per-partition lineage + metrics").

Local builds use a parquet directory as the manifest table (an
Iceberg catalog is not available in this sandbox); the protocol —
append manifest rows only AFTER the chunk's output append is durable —
is identical with an Iceberg table, where the two appends can share a
transaction.
"""

from __future__ import annotations

import hashlib
import os
from typing import List, Set

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..schema import MANIFEST_SCHEMA


def snapshot_id_for_path(path: str) -> str:
    """Deterministic stand-in for an Iceberg snapshot id: hash of the
    input file listing (name, size, mtime)."""
    entries = []
    if os.path.isdir(path):
        for root, _dirs, files in os.walk(path):
            for f in sorted(files):
                fp = os.path.join(root, f)
                st = os.stat(fp)
                entries.append(f"{fp}:{st.st_size}:{int(st.st_mtime)}")
    elif os.path.exists(path):
        st = os.stat(path)
        entries.append(f"{path}:{st.st_size}:{int(st.st_mtime)}")
    digest = hashlib.sha256("\n".join(entries).encode()).hexdigest()
    return digest[:16]


def read_manifest(spark: SparkSession, manifest_path: str) -> DataFrame:
    if not os.path.exists(manifest_path):
        return spark.createDataFrame([], MANIFEST_SCHEMA)
    return spark.read.parquet(manifest_path)


def committed_partitions(
    spark: SparkSession, manifest_path: str, source_snapshot_id: str
) -> Set[int]:
    mf = read_manifest(spark, manifest_path)
    rows = (
        mf.filter(F.col("source_snapshot_id") == source_snapshot_id)
        .select("partition_id")
        .distinct()
        .collect()
    )
    return {r.partition_id for r in rows}


def append_manifest(spark: SparkSession, manifest_path: str,
                    rows: List[dict]) -> None:
    if not rows:
        return
    spark.createDataFrame(
        [tuple(r[f.name] for f in MANIFEST_SCHEMA.fields) for r in rows],
        MANIFEST_SCHEMA,
    ).coalesce(1).write.mode("append").parquet(manifest_path)
