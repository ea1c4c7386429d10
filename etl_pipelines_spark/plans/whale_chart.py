"""Whale-count serving query (reference:
cloud_functions/dreambot_whale_chart/dreambot_whale_chart.py:370-434).

Reference shape: per-wallet cumsum -> pivot(date x wallet) -> ffill ->
pd.cut into small/medium/whale -> dummy-encode -> per-date counts.

Spark shape (SURVEY.md A10/D6): NO pivot — densify each wallet's daily
balance (sequence/explode), forward-fill, bucket with CASE WHEN, then
groupBy(date).pivot(bucket) over the 3 fixed bucket values. The
O(dates x wallets) wide matrix never materializes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_pipelines_spark.operators.densify import densify_daily
from etl_pipelines_spark.operators.windows import cumulative_window, forward_fill

BUCKETS = ("small", "medium", "whale")


def whale_counts(
    transfers: DataFrame,
    shrimp_threshold: float,
    whale_threshold: float,
    wallet_col: str = "wallet_address",
    date_col: str = "date",
    amount_col: str = "net_transfers",
) -> DataFrame:
    """Daily counts of wallets per balance bucket for one token.

    transfers: (wallet, date, daily net amount) for a single token.
    Returns (date, small, medium, whale) counts with per-wallet balances
    forward-filled across the full date range.
    """
    daily = transfers.groupBy(wallet_col, date_col).agg(F.sum(amount_col).alias("_net"))
    cum = cumulative_window([wallet_col], [date_col])
    balances = daily.withColumn("balance", F.sum("_net").over(cum)).drop("_net")
    dense = densify_daily(balances, [wallet_col], date_col)
    dense = forward_fill(dense, [wallet_col], [date_col], ["balance"])
    bucketed = dense.withColumn(
        "bucket",
        F.when(F.col("balance") < shrimp_threshold, F.lit("small"))
        .when(F.col("balance") < whale_threshold, F.lit("medium"))
        .otherwise(F.lit("whale")),
    )
    return (
        bucketed.groupBy(date_col)
        .pivot("bucket", list(BUCKETS))
        .agg(F.count(F.lit(1)))
        .na.fill(0, list(BUCKETS))
    )


def derive_whale_thresholds(
    price: float,
    fdv: float,
    whale_threshold_usd: float | None = None,
    whale_threshold_tokens: float | None = None,
) -> tuple[float, float]:
    """Threshold derivation (reference dreambot_whale_chart.py:932-952):
    whale threshold capped at 1% of FDV (microcaps need tiny numbers);
    shrimp threshold is whale/20 capped at $1000 USD. Returns
    (shrimp_threshold_tokens, whale_threshold_tokens)."""
    if whale_threshold_tokens is not None:
        whale_threshold_usd = whale_threshold_tokens * price
    if whale_threshold_usd is None:
        raise ValueError("one of whale_threshold_usd/_tokens is required")
    if whale_threshold_usd > 0.01 * fdv:
        whale_threshold_usd = 0.01 * fdv
    whale_tokens = whale_threshold_usd / price
    shrimp_usd = 1000.0 if whale_threshold_usd > 20000 else whale_threshold_usd / 20
    shrimp_tokens = shrimp_usd / whale_threshold_usd * whale_tokens
    return shrimp_tokens, whale_tokens


def whale_chart_spec(
    counts: DataFrame,
    title: str = "Wallet cohorts over time",
    date_col: str = "date",
) -> dict:
    """Serving payload for the whale chart (reference
    dreambot_whale_chart.py:786-833 builds a plotly stacked-area
    figure and uploads the rendered PNG; the engine-scope counterpart
    is the renderer-agnostic SPEC — x/series/styling — that any
    front-end can hand to plotly/vega/matplotlib; transport to
    Discord/GCS stays out of engine scope by design, VERDICT r2 §3).

    The collect here is legitimate driver-side work: `counts` is the
    already-aggregated (date, small, medium, whale) frame — one row
    per day, thousands of rows for years of history — never raw
    per-wallet data."""
    rows = counts.orderBy(date_col).collect()
    dates = [str(r[date_col]) for r in rows]
    return {
        "title": title,
        "type": "stacked_area",
        "x": {"label": "date", "values": dates},
        "series": [
            {"name": b, "values": [int(r[b]) for r in rows]} for b in BUCKETS
        ],
        "y": {"label": "wallets"},
    }
