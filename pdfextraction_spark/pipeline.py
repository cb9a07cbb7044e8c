"""End-to-end batch extraction job (SURVEY.md §7.1 design stance):

    transcripts scan
      -> anti-join committed partitions (resume)
      -> salted repartition by hash(conv_id) (+ turn-range salt)
      -> sortWithinPartitions(conv_id, turn_idx)
      -> fused mapInArrow extraction stage
      -> append output parquet (lineage columns)
      -> append per-partition manifest rows (metrics)

Chunked commits: logical partitions are processed in ``n_chunks``
groups; each group is one Spark job whose output append is followed by
its manifest append, so a killed run resumes at chunk granularity with
no duplicate rows (tests/test_resume.py).
"""

from __future__ import annotations

import uuid
from datetime import datetime
from typing import List, Optional

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, Observation, SparkSession, functions as F

from . import __version__
from .config import DEFAULT_NUM_PARTITIONS, MEGA_CONV_TURNS_PER_SALT
from .operators.extract import extract_turns
from .operators.partitioning import (
    logical_partition_id,
    prepare_for_extraction,
)
from .sources.manifest import (
    append_manifest,
    committed_partitions,
    reconcile_orphan_commits,
    snapshot_id_for_path,
    writer_lock,
)
from .sources.transcripts import read_transcripts


def extract_dataframe(
    turns: DataFrame,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
    salt_turns: int = MEGA_CONV_TURNS_PER_SALT,
    shuffle: bool | None = None,
) -> DataFrame:
    """Pure transformation: transcripts -> extracted turns (no sinks).

    Per-turn extraction is row-local (``extract_turns`` is a narrow
    map with no cross-row state), so the salted exchange contributes
    nothing to correctness here — it exists to (a) give undersplit
    inputs parallelism (a single pandas-written parquet file scans as
    ONE task) and (b) key the resumable job's chunk/manifest
    semantics (``run_extraction_job`` keeps it unconditionally).
    When the scan itself already spreads the corpus across the
    cluster, shuffling every byte before a per-row kernel doubles the
    I/O for zero gain; at warehouse scale that is a full extra pass
    over the corpus (guide §2.1: remove shuffles outright).

    ``shuffle=None`` (auto) keeps the exchange unless the input is a
    file scan with at least ``defaultParallelism`` files — the
    conservative proxy for "the scan alone saturates the cluster"
    (file count bounds split count for single-row-group files; a
    many-file corpus written by any distributed writer passes, the
    single-file test fixtures keep today's exchange). Values are
    identical on both paths (pinned by test); output ROW ORDER is not
    part of the contract either way.
    """
    if shuffle is None:
        try:
            n_files = len(turns.inputFiles())
        except Exception:
            n_files = 0
        shuffle = n_files < turns.sparkSession.sparkContext.defaultParallelism
    if not shuffle:
        return extract_turns(turns)
    return extract_turns(prepare_for_extraction(turns, num_partitions, salt_turns))


def run_extraction_job(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    manifest_path: str,
    run_id: Optional[str] = None,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
    salt_turns: int = MEGA_CONV_TURNS_PER_SALT,
    n_chunks: int = 4,
    fail_after_chunks: Optional[int] = None,
    fail_before_manifest_chunk: Optional[int] = None,
    debug_dir: Optional[str] = None,
) -> dict:
    """Resumable extraction job. Returns a summary dict.

    ``debug_dir`` is the S9 debug-response sink (reference
    openai_service.py:47-69 dumps every prompt/response to
    ``debug_responses/*.txt``): when set, every parse-FAILED turn of a
    committed chunk is appended there as parquet — raw payload (the
    "prompt"), extractor output (the "response"), and the run/commit
    lineage the reference encodes in its debug filenames. Failures
    only: at corpus scale dumping every success is a second copy of
    the corpus; the reference's all-calls dump is a single-process
    debugging aid, and failures are the rows a debugger needs. The
    dump runs after the manifest commit, so a crash in that window is
    healed at the next start: committed chunks with parse_failures > 0
    but no debug rows are backfilled (summary key
    ``debug_commits_backfilled``) — the debug dir is therefore
    complete relative to the manifest once a job finishes cleanly.

    SINGLE WRITER ONLY: at most one job at a time per
    (output_path, manifest_path) — orphan-commit reconciliation at job
    start would otherwise delete a concurrent run's in-flight commit
    (see sources/manifest.py reconcile_orphan_commits). The contract
    is ENFORCED by a writer lock on output_path: a second concurrent
    job raises WriterLockHeld instead of corrupting the first; locks
    left by hard-killed processes are reclaimed (pid-liveness / age).
    Concurrent runs against DIFFERENT outputs are fine.

    ``fail_after_chunks`` injects a crash after k committed chunks;
    ``fail_before_manifest_chunk`` injects a crash INSIDE the commit
    window of chunk k — after its output append, before its manifest
    append (resume tests only).
    """
    with writer_lock(output_path):
        return _run_locked(
            spark, input_path, output_path, manifest_path, run_id,
            num_partitions, salt_turns, n_chunks, fail_after_chunks,
            fail_before_manifest_chunk, debug_dir,
        )


def _dump_debug_rows(
    spark: SparkSession,
    output_path: str,
    turns: DataFrame,
    debug_dir: str,
    commit_id: str,
    now: datetime,
) -> None:
    """S9 debug-response sink for ONE committed chunk: parse-failed
    rows, raw payload joined back from the input scan (the extractor
    output drops the raw text by design). Failures are rare, so the
    filtered side is small; the equi-join is partition-local after the
    commit_id partition prune."""
    failed = (
        spark.read.parquet(output_path)
        .filter((F.col("commit_id") == commit_id) & F.col("parse_failed"))
        .select(
            "conv_id", "turn_idx", "payload_kind", "extracted_text",
            "run_id", "commit_id", "extractor_version",
        )
    )
    raw = turns.select(
        "conv_id", "turn_idx", F.col("text").alias("raw_payload")
    )
    (
        failed.join(raw, ["conv_id", "turn_idx"], "left")
        .withColumn("dumped_at", F.lit(now))
        .write.mode("append")
        .partitionBy("commit_id")
        .parquet(debug_dir)
    )


def _reconcile_debug_dir(
    spark: SparkSession,
    output_path: str,
    manifest_path: str,
    debug_dir: str,
    turns: DataFrame,
    snapshot: str,
) -> List[str]:
    """Backfill debug dumps a prior crash skipped. The in-loop dump
    runs AFTER append_manifest, so a crash inside that window leaves a
    committed chunk (the resume skips it) whose parse-failure rows
    never reached the debug dir — absence of debug rows would silently
    read as absence of failures. At job start, diff the manifest's
    commit_ids with parse_failures > 0 (current snapshot) against the
    debug dir's commit_id partitions and dump the missing ones.
    Bounded: both sides are distinct commit_id lists, not row scans."""
    try:
        need = {
            r["commit_id"]
            for r in spark.read.parquet(manifest_path)
            .filter(
                (F.col("source_snapshot_id") == snapshot)
                & (F.col("parse_failures") > 0)
            )
            .select("commit_id").distinct().collect()
        }
    except AnalysisException:
        return []
    if not need:
        return []
    try:
        have = {
            r["commit_id"]
            for r in spark.read.parquet(debug_dir)
            .select("commit_id").distinct().collect()
        }
    except AnalysisException:
        have = set()
    missing = sorted(need - have)
    now = datetime.now()
    for commit_id in missing:
        _dump_debug_rows(spark, output_path, turns, debug_dir,
                         commit_id, now)
    return missing


def _run_locked(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    manifest_path: str,
    run_id: Optional[str],
    num_partitions: int,
    salt_turns: int,
    n_chunks: int,
    fail_after_chunks: Optional[int],
    fail_before_manifest_chunk: Optional[int],
    debug_dir: Optional[str] = None,
) -> dict:
    run_id = run_id or uuid.uuid4().hex[:12]
    snapshot = snapshot_id_for_path(input_path)
    turns = read_transcripts(spark, input_path)
    turns = logical_partition_id(turns, num_partitions)

    # a prior crash between output append and manifest append leaves
    # rows under a commit_id the manifest never saw: drop them before
    # computing todo, or the re-extraction would duplicate them
    orphans = reconcile_orphan_commits(spark, output_path, manifest_path)
    # symmetric reconcile for the debug sink: the in-loop dump runs
    # after the manifest commit, so a crash in between leaves a chunk
    # the resume skips but whose failures were never dumped
    debug_backfilled: List[str] = []
    if debug_dir is not None:
        debug_backfilled = _reconcile_debug_dir(
            spark, output_path, manifest_path, debug_dir, turns, snapshot
        )
    done = committed_partitions(spark, manifest_path, snapshot)
    all_parts = list(range(num_partitions))
    todo = [p for p in all_parts if p not in done]
    chunks: List[List[int]] = [
        todo[i::n_chunks] for i in range(n_chunks) if todo[i::n_chunks]
    ]

    total_rows = 0
    observed = {"turns": 0, "parse_failures": 0, "blocks_dropped": 0}
    for ci, part_group in enumerate(chunks):
        chunk_df = turns.filter(F.col("partition_id").isin(part_group))
        prepared = prepare_for_extraction(
            chunk_df, max(len(part_group), 1), salt_turns
        )
        extracted = extract_turns(prepared)
        # S8 usage-log analogue (cost_tracker.py:51-69): streaming-free
        # metrics via observe, surfaced in the job summary alongside
        # the per-partition manifest rows
        obs = Observation(f"extraction_chunk_{ci}")
        extracted = extracted.observe(
            obs,
            F.count(F.lit(1)).alias("turns"),
            F.sum(F.col("parse_failed").cast("long")).alias("parse_failures"),
            F.sum("blocks_dropped").alias("blocks_dropped"),
        )
        # partition_id is a pure function of conv_id -> recompute after
        # the Arrow stage instead of shipping it through the kernel
        out = logical_partition_id(extracted, num_partitions)
        commit_id = f"{run_id}-{ci:04d}"
        out = (
            out.withColumn("run_id", F.lit(run_id))
            .withColumn("source_snapshot_id", F.lit(snapshot))
            .withColumn("extractor_version", F.lit(__version__))
            .withColumn("commit_id", F.lit(commit_id))
        )
        # single write pass (no persist — at corpus scale the chunk
        # output cannot be cached); manifest stats come from the
        # COMMITTED files: partition-pruned by commit_id, column-pruned
        # to the 4 metric columns, so the stats pass is cheap and the
        # manifest provably describes what is durable on disk
        out.write.mode("append").partitionBy("commit_id").parquet(output_path)
        if fail_before_manifest_chunk is not None and ci + 1 >= fail_before_manifest_chunk:
            raise RuntimeError(
                f"injected failure inside commit window of chunk {ci + 1}"
            )
        stats = (
            spark.read.parquet(output_path)
            .filter(F.col("commit_id") == commit_id)
            .groupBy("partition_id")
            .agg(
                F.count("*").alias("row_count"),
                F.sum("blocks_kept").alias("blocks_kept"),
                F.sum("blocks_dropped").alias("blocks_dropped"),
                F.sum(F.col("parse_failed").cast("long")).alias("parse_failures"),
            )
            .collect()
        )
        seen = {r.partition_id: r for r in stats}
        now = datetime.now()
        rows = [
            {
                "run_id": run_id,
                "commit_id": commit_id,
                "source_snapshot_id": snapshot,
                "partition_id": int(p),
                "row_count": int(seen[p].row_count) if p in seen else 0,
                "blocks_kept": int(seen[p].blocks_kept or 0) if p in seen else 0,
                "blocks_dropped": int(seen[p].blocks_dropped or 0) if p in seen else 0,
                "parse_failures": int(seen[p].parse_failures or 0) if p in seen else 0,
                "extractor_version": __version__,
                "committed_at": now,
            }
            for p in part_group
        ]
        append_manifest(spark, manifest_path, rows)
        if debug_dir is not None:
            _dump_debug_rows(spark, output_path, turns, debug_dir,
                             commit_id, now)
        total_rows += sum(r["row_count"] for r in rows)
        for k, v in (obs.get or {}).items():
            if v is not None:
                observed[k] = observed.get(k, 0) + int(v)
        if fail_after_chunks is not None and ci + 1 >= fail_after_chunks:
            raise RuntimeError(f"injected failure after {ci + 1} chunks")

    return {
        "run_id": run_id,
        "source_snapshot_id": snapshot,
        "orphan_commits_reconciled": orphans,
        "debug_commits_backfilled": debug_backfilled,
        "partitions_done_before": len(done),
        "partitions_processed": len(todo),
        "rows_written": total_rows,
        "observed_metrics": observed,
    }
