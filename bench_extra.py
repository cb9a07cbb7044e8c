"""Extra benchmarks for the optimization rounds (bench.py is FROZEN
for the driver's measurement; this file holds the noop-sink /
per-query isolation harness from the optimization guide §1.4-1.5).

Usage:
  python bench_extra.py time [query ...] [--runs N]   per-query walls
  python bench_extra.py explain [query ...] --out DIR --suffix SUF
  python bench_extra.py extract-profile                headline stages

Timing methodology matches bench.py exactly (same _force full-column
hash aggregate, one untimed warm pass per query, same session config)
so numbers here are comparable to BENCH_r{N}.json entries; the only
addition is --runs medians and plan capture.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import bench  # noqa: E402  (frozen harness: reuse fixtures + methodology)


def _session():
    from pdfextraction_spark.session import build_session

    return build_session(
        "bench-extra", master=f"local[{bench.CPUS}]",
        shuffle_partitions=bench.CPUS,
    )


def _queries():
    import __spark_entry__ as entrymod

    return {**entrymod.queries(), **bench.production_queries()}


def cmd_time(names, runs=3):
    spark = _session()
    qs = _queries()
    bench_sf = bench.ensure_parallel_sf(bench.SF_DIR, n_files=bench.CPUS)
    qs["group_stats"](spark, bench_sf).count()
    out = {}
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"warm:{name}")
        bench._force(fn(spark, bench_sf))
        walls = []
        for i in range(runs):
            spark.sparkContext.setJobDescription(f"timed:{name}:{i}")
            t0 = time.time()
            bench._force(fn(spark, bench_sf))
            walls.append(round(time.time() - t0, 3))
        out[name] = {
            "walls": walls,
            "median": sorted(walls)[len(walls) // 2],
            "min": min(walls),
        }
        print(json.dumps({name: out[name]}), flush=True)
    spark.stop()
    print(json.dumps(out))
    return out


def cmd_explain(names, out_dir, suffix):
    spark = _session()
    qs = _queries()
    bench_sf = bench.ensure_parallel_sf(bench.SF_DIR, n_files=bench.CPUS)
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = qs[name](spark, bench_sf)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()


def cmd_extract_profile(runs=3):
    """Stage-isolated timing of the headline extraction job: scan only,
    scan+exchange+sort (kernels skipped), and the full job — tells
    which part of the 600k-turn pipeline owns the wall."""
    from pyspark.sql import functions as F

    from pdfextraction_spark.operators.extract import extract_turns
    from pdfextraction_spark.operators.partitioning import (
        prepare_for_extraction,
    )

    spark = _session()
    parquet = bench.ensure_bench_fixture()
    turns = spark.read.parquet(parquet)
    n = turns.count()
    n_parts = max(bench.CPUS * 2, 32)

    def timed(label, mk):
        mk().count() if label != "noop" else None
        walls = []
        for _ in range(runs):
            t0 = time.time()
            mk().count()
            walls.append(time.time() - t0)
        med = sorted(walls)[len(walls) // 2]
        print(json.dumps({label: round(med, 3),
                          "tps": round(n / med, 1)}), flush=True)

    timed("scan_count", lambda: turns)
    timed("scan_full", lambda: turns.select(
        F.bit_xor(F.xxhash64("conv_id", "turn_idx", "role", "text"))))
    timed("prepare_only", lambda: prepare_for_extraction(turns, n_parts))
    timed("full_extract", lambda: extract_turns(
        prepare_for_extraction(turns, n_parts)))
    spark.stop()


if __name__ == "__main__":
    args = sys.argv[1:]
    if not args:
        print(__doc__)
        sys.exit(1)
    cmd = args[0]
    rest = args[1:]
    runs = 3
    if "--runs" in rest:
        i = rest.index("--runs")
        runs = int(rest[i + 1])
        rest = rest[:i] + rest[i + 2:]
    if cmd == "time":
        cmd_time(rest or bench.HEADLINE, runs=runs)
    elif cmd == "explain":
        out_dir = "plans/r07"
        suffix = "before"
        if "--out" in rest:
            i = rest.index("--out")
            out_dir = rest[i + 1]
            rest = rest[:i] + rest[i + 2:]
        if "--suffix" in rest:
            i = rest.index("--suffix")
            suffix = rest[i + 1]
            rest = rest[:i] + rest[i + 2:]
        cmd_explain(rest or bench.HEADLINE, out_dir, suffix)
    elif cmd == "extract-profile":
        cmd_extract_profile(runs=runs)
    else:
        raise SystemExit(f"unknown command {cmd}")
