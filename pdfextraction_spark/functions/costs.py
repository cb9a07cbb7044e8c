"""X19 cost arithmetic (reference openai_service.py:222-254
``_track_usage``): per-call cost = tokens/1000 x per-1K-token price,
with a model->price table and a flat fallback for unknown models,
``round(total, 6)``.

Spark-first shape: the pricing table is a tiny dimension DataFrame
broadcast-joined onto the usage stream (never a Python UDF, never a
driver loop), so the cost column stays inside whole-stage codegen and
the plan scales to any number of usage rows.

Exactness: the reference's per-1K dollar rates are all integral in
NANODOLLARS PER TOKEN (0.0015 $/1K tok = 1500 n$/tok), so the engine
computes ``cost_nanos`` in pure BIGINT arithmetic — exact, associative
(safe to sum in any partition order), and identical across engines;
``round(total_cost, 6)`` of the reference is exactly
``cost_nanos / 1e9`` truncated to the same 6+3 decimal digits. A
double-dollar convenience column is derived from the integer, never
accumulated.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

from pyspark.sql import DataFrame, functions as F

# reference pricing table (openai_service.py:226-232), $ per 1K tokens
PRICING: Dict[str, Tuple[float, float]] = {
    "gpt-3.5-turbo": (0.0015, 0.002),
    "gpt-4o-mini": (0.00015, 0.0006),
    "gpt-4o": (0.0025, 0.01),
    "gpt-4": (0.03, 0.06),
}
# fallback for unknown models (openai_service.py:240)
FALLBACK: Tuple[float, float] = (0.01, 0.01)


def _nanos_per_token(per_1k_dollars: float) -> int:
    """$ per 1K tokens -> nanodollars per token (exact for the table)."""
    return int(round(per_1k_dollars * 1_000_000))


def pricing_df(spark, pricing: Optional[Dict[str, Tuple[float, float]]] = None) -> DataFrame:
    """The pricing dimension as a DataFrame (model, in_nanos, out_nanos)."""
    rows = [
        (m, _nanos_per_token(i), _nanos_per_token(o))
        for m, (i, o) in (pricing or PRICING).items()
    ]
    return spark.createDataFrame(rows, "model string, in_nanos long, out_nanos long")


def estimate_costs(
    usage: DataFrame,
    pricing: Optional[Dict[str, Tuple[float, float]]] = None,
    fallback: Tuple[float, float] = FALLBACK,
    model_col: str = "model",
    in_col: str = "input_tokens",
    out_col: str = "output_tokens",
) -> DataFrame:
    """Append exact per-row cost columns to a usage DataFrame.

    Adds ``cost_nanos`` (BIGINT nanodollars, exact) and
    ``estimated_cost`` (double dollars, display only). Unknown models
    take the flat ``fallback`` rate, mirroring
    ``pricing.get(model, {'input': 0.01, 'output': 0.01})``.
    """
    spark = usage.sparkSession
    # namespace the dim columns with a reserved prefix BEFORE the join:
    # a usage stream that already carries in_nanos/out_nanos (or a
    # column literally named 'model' next to a non-default model_col)
    # would otherwise hit ambiguous-column resolution or silently read
    # the wrong side
    dim = pricing_df(spark, pricing).select(
        F.col("model").alias("__price_model"),
        F.col("in_nanos").alias("__price_in_nanos"),
        F.col("out_nanos").alias("__price_out_nanos"),
    )
    fb_in, fb_out = (_nanos_per_token(fallback[0]), _nanos_per_token(fallback[1]))
    joined = usage.join(
        F.broadcast(dim),
        F.col(model_col) == F.col("__price_model"),
        "left",
    ).drop("__price_model")
    nanos = F.col(in_col).cast("long") * F.coalesce(
        F.col("__price_in_nanos"), F.lit(fb_in)
    ) + F.col(out_col).cast("long") * F.coalesce(
        F.col("__price_out_nanos"), F.lit(fb_out)
    )
    return (
        joined.withColumn("cost_nanos", nanos)
        .withColumn("estimated_cost", F.round(F.col("cost_nanos") / F.lit(1e9), 6))
        .drop("__price_in_nanos", "__price_out_nanos")
    )


def cost_summary(
    usage_with_costs: DataFrame,
    by: str = "model",
    in_col: str = "input_tokens",
    out_col: str = "output_tokens",
) -> DataFrame:
    """A7-style session cost rollup: integer-exact totals per group.
    ``in_col``/``out_col`` mirror estimate_costs so the two halves of
    the pipeline compose under renamed usage columns; the output
    aliases stay canonical."""
    return usage_with_costs.groupBy(by).agg(
        F.count(F.lit(1)).alias("n_calls"),
        F.sum(F.col(in_col).cast("long")).alias("input_tokens"),
        F.sum(F.col(out_col).cast("long")).alias("output_tokens"),
        F.sum("cost_nanos").alias("cost_nanos"),
    )
