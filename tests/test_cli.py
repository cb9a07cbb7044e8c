"""spark-submit packaging + CLI surface: the package zip must be
importable the way --py-files ships it, and the extract subcommand
must run the resumable job end-to-end from a fresh process."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_package_zip_importable(tmp_path):
    out = str(tmp_path / "pdfx.zip")
    r = subprocess.run(
        [sys.executable, "-m", "pdfextraction_spark.cli", "package",
         "--out", out],
        cwd=REPO, capture_output=True, text=True, timeout=120,
    )
    assert r.returncode == 0, r.stderr
    assert os.path.exists(out)
    # import through the zip exactly as --py-files would expose it
    probe = (
        "import sys; sys.path.insert(0, %r); "
        "import pdfextraction_spark, pdfextraction_spark.kernels.extract, "
        "fixtures.generate; print(pdfextraction_spark.__name__)"
    ) % out
    r2 = subprocess.run(
        [sys.executable, "-c", probe],
        capture_output=True, text=True, timeout=120,
        cwd=str(tmp_path),  # NOT the repo: the zip must be self-sufficient
    )
    assert r2.returncode == 0, r2.stderr
    assert r2.stdout.strip() == "pdfextraction_spark"


@pytest.mark.slow
def test_cli_extract_end_to_end(xs_parquet, tmp_path):
    out = str(tmp_path / "out")
    mf = str(tmp_path / "mf")
    env = dict(os.environ, PYTHONPATH=REPO)
    r = subprocess.run(
        [sys.executable, "-m", "pdfextraction_spark.cli", "extract",
         "--input", xs_parquet, "--output", out, "--manifest", mf,
         "--master", "local[4]", "--num-partitions", "4", "--chunks", "2"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=420,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["partitions_processed"] == 4
    assert summary["rows_written"] > 0
    assert os.path.isdir(out) and os.path.isdir(mf)
    # a second invocation resumes to a no-op
    r2 = subprocess.run(
        [sys.executable, "-m", "pdfextraction_spark.cli", "extract",
         "--input", xs_parquet, "--output", out, "--manifest", mf,
         "--master", "local[4]", "--num-partitions", "4", "--chunks", "2"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=420,
    )
    assert r2.returncode == 0, r2.stderr[-2000:]
    summary2 = json.loads(r2.stdout.strip().splitlines()[-1])
    assert summary2["partitions_done_before"] == 4
    assert summary2["partitions_processed"] == 0
    assert summary2["rows_written"] == 0


@pytest.mark.slow
def test_cli_curate_end_to_end(tmp_path):
    """curate runs the full funnel over a documents parquet and
    reports monotone per-stage counts."""
    out = str(tmp_path / "curated")
    r = subprocess.run(
        [sys.executable, "-m", "pdfextraction_spark.cli", "curate",
         "--input", "/root/testdata/sf0.001/documents.parquet",
         "--output", out, "--master", "local[4]", "--per-lang", "5"],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    s = json.loads(r.stdout.strip().splitlines()[-1])
    assert (s["input_docs"] >= s["after_quality_lang"]
            >= s["after_exact_dedup"] >= s["after_repetition_gate"]
            >= s["selected"] > 0)
    import duckdb

    per_lang = duckdb.connect().execute(
        f"select lang, count(*) from '{out}/*.parquet' group by lang"
    ).fetchall()
    assert all(c <= 5 for _, c in per_lang)


@pytest.mark.slow
def test_cli_curate_near_dup_stage(tmp_path):
    """--near-dup inserts the minhash-LSH canonicalization stage and
    reports its count between exact dedup and the repetition gate."""
    out = str(tmp_path / "curated_nd")
    r = subprocess.run(
        [sys.executable, "-m", "pdfextraction_spark.cli", "curate",
         "--input", "/root/testdata/sf0.001/documents.parquet",
         "--output", out, "--master", "local[4]", "--per-lang", "5",
         "--near-dup", "--nd-threshold", "0.2"],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    s = json.loads(r.stdout.strip().splitlines()[-1])
    assert (s["input_docs"] >= s["after_quality_lang"]
            >= s["after_exact_dedup"] >= s["after_near_dedup"]
            >= s["after_repetition_gate"] >= s["selected"] > 0)


@pytest.mark.slow
def test_cli_ann_build_then_search(tmp_path):
    """ann-build persists the index; ann-search answers top-k from it
    — the two-process build-once/serve-many deployment shape."""
    idx = str(tmp_path / "idx")
    r = subprocess.run(
        [sys.executable, "-m", "pdfextraction_spark.cli", "ann-build",
         "--input", "/root/testdata/sf0.001/embeddings.parquet",
         "--index", idx, "--master", "local[4]",
         "--n-centroids", "8", "--lloyd-iters", "0",
         "--pq-lloyd-iters", "0"],
        capture_output=True, text=True, timeout=420,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    meta = json.loads(r.stdout.strip().splitlines()[-1])
    assert meta["n_centroids"] == 8 and meta["n_vectors"] > 0
    # ann-append: a disjoint-id batch lands in the served index with
    # the frozen quantizers and reports its staleness vs build MSE
    import duckdb as _dd

    batch = str(tmp_path / "batch.parquet")
    _dd.connect().execute(
        "COPY (SELECT vec_id + 1000000 AS vec_id, embedding FROM "
        "'/root/testdata/sf0.001/embeddings.parquet' USING SAMPLE "
        "reservoir(20 ROWS) REPEATABLE (42)) TO "
        f"'{batch}' (FORMAT PARQUET)"
    )
    r_app = subprocess.run(
        [sys.executable, "-m", "pdfextraction_spark.cli", "ann-append",
         "--index", idx, "--input", batch, "--master", "local[4]"],
        capture_output=True, text=True, timeout=420,
    )
    assert r_app.returncode == 0, r_app.stderr[-2000:]
    app = json.loads(r_app.stdout.strip().splitlines()[-1])
    assert app["n_appended"] == 20
    assert app["n_vectors"] == meta["n_vectors"] + 20
    assert app["build_quant_mse"] > 0
    assert app["batch_quant_mse"] > 0
    out = str(tmp_path / "hits")
    r2 = subprocess.run(
        [sys.executable, "-m", "pdfextraction_spark.cli", "ann-search",
         "--index", idx,
         "--queries", "/root/testdata/sf0.001/embeddings.parquet",
         "--output", out, "--master", "local[4]", "--k", "3",
         "--n-probe", "2"],
        capture_output=True, text=True, timeout=420,
    )
    assert r2.returncode == 0, r2.stderr[-2000:]
    s = json.loads(r2.stdout.strip().splitlines()[-1])
    assert s["rows"] > 0
    import duckdb

    mx = duckdb.connect().execute(
        f"select max(rank), count(distinct query_id) from '{out}/*.parquet'"
    ).fetchone()
    assert mx[0] <= 3 and mx[1] == s["queries"]


@pytest.mark.slow
def test_cli_render_end_to_end(xs_parquet, tmp_path):
    out = str(tmp_path / "pages")
    env = dict(os.environ, PYTHONPATH=REPO)
    r = subprocess.run(
        [sys.executable, "-m", "pdfextraction_spark.cli", "render",
         "--input", xs_parquet, "--output", out,
         "--dpi", "18", "--master", "local[4]"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=420,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["pages_total"] > 0 and summary["dpi"] == 18
    assert os.path.isdir(out)
