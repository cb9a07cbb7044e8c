"""The curation funnel — one shared implementation for the driver
query (q_curation_funnel, hash-verified against the DuckDB mirror in
__spark_entry__._curation_funnel_sql) and the `cli curate` command.
Stage order and expressions are the oracle contract: any change here
must be mirrored in the SQL.

Stages: (1) quality + language gate, (2) exact-dedup canonicalization
(md5 of whitespace-normalized lowercased text, min id wins — the
portable analogue of the xxhash64 production key), (3) repetition gate
on the top-2-gram char share, (4) language-balanced quota sample.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from . import text as X
from .repetition import ngram_repetition_stats
from .sampling import quota_sample


def curation_funnel_stages(
    docs: DataFrame,
    min_quality: float = 0.5,
    max_top2_frac: float = 0.12,
) -> dict:
    """The funnel's intermediate stages, keyed gated -> survivors ->
    final (each a DataFrame with the original doc columns)."""
    t = F.col("text")
    gated = docs.filter(
        (F.round(X.quality_score(t), 4) >= min_quality) & X.is_english(t)
    )
    norm = F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ")
    canon = (
        gated.select("doc_id", F.md5(F.encode(norm, "UTF-8")).alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    survivors = gated.join(canon, "doc_id", "semi")
    calm = (
        ngram_repetition_stats(survivors, top_ns=(2,), dup_ns=())
        .filter(F.col("top2_frac") <= max_top2_frac)
        .select("doc_id")
    )
    final = survivors.join(calm, "doc_id", "semi")
    return {"gated": gated, "survivors": survivors, "final": final}


def curation_funnel(
    docs: DataFrame,
    min_quality: float = 0.5,
    max_top2_frac: float = 0.12,
    per_lang: int = 10,
) -> DataFrame:
    """Selected training subset with per-language sample_rank."""
    stages = curation_funnel_stages(docs, min_quality, max_top2_frac)
    return quota_sample(stages["final"], k=per_lang, stratum_col="lang")
