"""Deterministic hash-based sampling for training-data curation.

`df.sample()` is seed-dependent per partitioning and not reproducible
across engines or re-partitions; curation pipelines want CONTENT-
DETERMINISTIC sampling — the same row is always in or out, no matter
the cluster layout, so reruns, resumes, and audits agree. Standard
technique: map a stable key through a hash to a uniform [0,1) value
and keep rows below the target fraction.

The hash is the portable md5 family (functions/dedup.py stance):
u = int(md5(key)[:8 hex], 16) / 2^32 — bit-identical in any engine
with md5(), so the DuckDB oracle reproduces the exact sample. For
Spark-only pipelines, xxhash64 is the cheaper swap (same shape,
different family). Everything is a narrow projection + filter —
no shuffle, fully pushdown-friendly.
"""

from __future__ import annotations

from typing import Dict, Optional

from pyspark.sql import Column, DataFrame, Window, functions as F


def hash_uniform(key: Column) -> Column:
    """Deterministic uniform [0,1) from a key column: first 8 md5 hex
    chars as a 32-bit int over 2^32. DuckDB mirror:
    CAST(('0x' || substring(md5(key), 1, 8))::BIGINT... (via
    strpos/shift, see oracle/portable_sql.py)."""
    return (
        F.conv(
            F.substring(F.md5(F.encode(key.cast("string"), "UTF-8")), 1, 8),
            16, 10,
        ).cast("double")
        / F.lit(float(1 << 32))
    )


def hash_sample(df: DataFrame, fraction: float,
                key_col: str = "doc_id",
                stratum_col: Optional[str] = None,
                fractions: Optional[Dict[str, float]] = None) -> DataFrame:
    """Keep each row iff hash_uniform(key) < its fraction.

    Uniform mode: one global ``fraction``. Stratified mode: pass
    ``stratum_col`` + ``fractions`` (stratum -> fraction; missing
    strata fall back to ``fraction``) — per-stratum rates ride a
    broadcast map literal, still no shuffle."""
    u = hash_uniform(F.col(key_col))
    if stratum_col is None:
        return df.filter(u < F.lit(fraction))
    fr = F.lit(float(fraction))
    expr = fr
    for stratum, f in sorted((fractions or {}).items()):
        expr = F.when(
            F.col(stratum_col) == stratum, F.lit(float(f))
        ).otherwise(expr)
    return df.filter(u < expr)


def quota_sample(df: DataFrame, k: int, stratum_col: str,
                 key_col: str = "doc_id") -> DataFrame:
    """Exactly min(k, |stratum|) rows per stratum — quota (balanced)
    sampling, e.g. "5,000 docs per language" for a language-balanced
    training mix, where per-stratum RATES can't hit a fixed budget.

    Selection is content-deterministic: rows ranked by the portable
    md5-32 uniform on the key (ties by key), so the winners are stable
    across engines, partitionings, and reruns. Output keeps the rank
    as ``sample_rank`` (1..k) — downstream can shrink the quota
    without resampling.

    Scale shape: ONE shuffle (hash by stratum for the window). A
    stratum larger than an executor's ability to sort is the skew
    case; for pathological strata pre-filter with ``hash_sample`` at
    ~(k / |stratum|) x safety-margin first, then quota-rank the
    survivors — both stages stay content-deterministic."""
    u = hash_uniform(F.col(key_col))
    w = Window.partitionBy(stratum_col).orderBy(
        u.asc(), F.col(key_col).asc()
    )
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
    )


def dataset_split(df: DataFrame, train: float = 0.8, val: float = 0.1,
                  key_col: str = "doc_id",
                  split_col: str = "split") -> DataFrame:
    """Deterministic train/val/test assignment: the md5-32 uniform on
    the key partitions [0,1) into [0, train) -> 'train',
    [train, train+val) -> 'val', rest -> 'test'.

    Content-stable: a document keeps its split across runs,
    partitionings, engines, AND corpus growth (assignment depends only
    on its own key, never on corpus order or size) — the property that
    prevents eval-set contamination when the corpus is re-snapshotted
    or incrementally extended; a random split re-shuffles documents
    between train and eval on every rebuild. Zero shuffle — a pure
    projection Catalyst pushes past joins and under scans."""
    if not (0 < train < 1 and 0 <= val and train + val <= 1):
        raise ValueError("need 0 < train < 1, val >= 0, train+val <= 1")
    u = hash_uniform(F.col(key_col))
    split = (
        F.when(u < F.lit(float(train)), F.lit("train"))
        .when(u < F.lit(float(train + val)), F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return df.withColumn(split_col, split)


def mixture_weights(
    docs: DataFrame,
    budget_tokens: int,
    targets: Optional[Dict[str, float]] = None,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Source-mixture planning: given a token budget for a training
    run and a target mixture over sources (default: uniform across
    observed sources), compute per source the available tokens, its
    budget slice, and the resulting sampling rate / epoch count — the
    deterministic arithmetic behind data-mixing recipes (the
    published DoReMi / Pile-style weighted-source mixes; here the
    weights are an input, not learned). ``epochs`` > 1 means the mix
    oversamples that source (multiple passes), < 1 means it
    subsamples; ``sample_rate`` clamps at 1 for single-pass
    pipelines. Feed sample_rate per source into hash_sample(fractions=...)
    to execute the plan content-deterministically.

    Output: (source, n_docs, n_tokens, weight, target_tokens, epochs,
    sample_rate), one row per source. Shape: one groupBy(source)
    aggregation plus a single-row totals cross join (broadcast); the
    whitespace token count is the shared token_stats convention so the
    DuckDB oracle agrees bit-for-bit."""
    from .text import ws_token_count

    tok = ws_token_count(F.col(text_col)).cast("long")
    per = (
        docs.select(F.col(source_col).alias("source"), tok.alias("tok"))
        .groupBy("source")
        .agg(F.count("*").alias("n_docs"), F.sum("tok").alias("n_tokens"))
    )
    if targets is not None:
        # a TARGET source absent from the corpus must still get its
        # row (n_docs/n_tokens 0, its budget slice, rate 0) — silently
        # dropping it would shrink the planned mix below the budget
        # with no signal that a requested component is missing
        want = docs.sparkSession.createDataFrame(
            [(s,) for s in sorted(targets)], "source string"
        )
        per = per.join(want, "source", "full").select(
            "source",
            F.coalesce(F.col("n_docs"), F.lit(0).cast("long"))
            .alias("n_docs"),
            F.coalesce(F.col("n_tokens"), F.lit(0).cast("long"))
            .alias("n_tokens"),
        )
    if targets is None:
        tot = per.agg(F.count("*").alias("__ns"))
        per = per.crossJoin(F.broadcast(tot))
        weight = F.lit(1.0) / F.col("__ns")
    else:
        wsum = float(sum(targets.values())) or 1.0
        weight = F.lit(0.0)
        for s, w in sorted(targets.items()):
            weight = F.when(
                F.col("source") == s, F.lit(float(w) / wsum)
            ).otherwise(weight)
    target = F.floor(F.lit(float(budget_tokens)) * weight).cast("long")
    staged = per.withColumn("__t", target)
    # a source with zero available tokens can supply nothing: pin
    # epochs/sample_rate to 0.0 (Spark's non-ANSI x/0 would yield
    # NULL here while DuckDB gives +inf -> rate 1.0 — both wrong and
    # divergent; the oracle mirrors this CASE)
    epochs = F.when(
        F.col("n_tokens") > 0, F.col("__t") / F.col("n_tokens")
    ).otherwise(F.lit(0.0))
    return staged.select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(weight, 4).alias("weight"),
        F.col("__t").alias("target_tokens"),
        F.round(epochs, 4).alias("epochs"),
        F.round(F.least(F.lit(1.0), epochs), 4).alias("sample_rate"),
    )
