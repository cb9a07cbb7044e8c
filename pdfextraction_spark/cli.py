"""spark-submit entry point.

Cluster usage (north rule packaging)::

    python -m pdfextraction_spark.cli package --out /tmp/pdfx.zip
    spark-submit --py-files /tmp/pdfx.zip \\
        --conf spark.sql.adaptive.enabled=true \\
        cli.py extract --input <transcripts> --output <table> \\
        --manifest <manifest> --num-partitions 4096 --chunks 64

Local smoke::

    python -m pdfextraction_spark.cli extract \\
        --input /tmp/pdfx_fixtures/transcripts_xs_default.parquet \\
        --output /tmp/out --manifest /tmp/mf
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import zipfile


def _cmd_extract(args: argparse.Namespace) -> int:
    from .pipeline import run_extraction_job
    from .session import build_session

    spark = build_session("pdfx-extract", master=args.master)
    try:
        summary = run_extraction_job(
            spark,
            input_path=args.input,
            output_path=args.output,
            manifest_path=args.manifest,
            run_id=args.run_id,
            num_partitions=args.num_partitions,
            salt_turns=args.salt_turns,
            n_chunks=args.chunks,
        )
        print(json.dumps(summary))
        return 0
    finally:
        spark.stop()


def _cmd_package(args: argparse.Namespace) -> int:
    """Zip the package for --py-files distribution."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with zipfile.ZipFile(args.out, "w", zipfile.ZIP_DEFLATED) as zf:
        for base in ("pdfextraction_spark", "fixtures"):
            for dirpath, _dirs, files in os.walk(os.path.join(root, base)):
                if "__pycache__" in dirpath:
                    continue
                for f in files:
                    if f.endswith(".py"):
                        full = os.path.join(dirpath, f)
                        zf.write(full, os.path.relpath(full, root))
    print(args.out)
    return 0


def _cmd_fixture(args: argparse.Namespace) -> int:
    from fixtures.generate import write_transcripts_parquet

    print(write_transcripts_parquet(args.out, args.tier, args.turns))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="pdfextraction_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    e = sub.add_parser("extract", help="run the resumable extraction job")
    e.add_argument("--input", required=True)
    e.add_argument("--output", required=True)
    e.add_argument("--manifest", required=True)
    e.add_argument("--master", default=None)
    e.add_argument("--run-id", default=None)
    e.add_argument("--num-partitions", type=int, default=32)
    e.add_argument("--salt-turns", type=int, default=256)
    e.add_argument("--chunks", type=int, default=4)
    e.set_defaults(fn=_cmd_extract)

    z = sub.add_parser("package", help="build the --py-files zip")
    z.add_argument("--out", default="/tmp/pdfextraction_spark.zip")
    z.set_defaults(fn=_cmd_package)

    f = sub.add_parser("make-fixture", help="write a transcripts fixture")
    f.add_argument("--tier", default="xs", choices=["xs", "s", "bench"])
    f.add_argument("--turns", type=int, default=None)
    f.add_argument("--out", required=True)
    f.set_defaults(fn=_cmd_fixture)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
