"""Data-quality / outlier-filter subsystem (SURVEY.md §2.11 Q1-Q4).

These business rules are the reference's distinguishing cleaning
operators; thresholds and evaluation order are the spec
(core_coin_wallet_transfers.py:306-385; orchestrator:286-317;
core_coin_market_data.py:140-190).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_pipelines_spark.operators.windows import with_lag_lead

PAIR = ["coin_id", "wallet_address"]


def remove_negative_balance_wallets(
    df: DataFrame,
    neg_threshold: float = -0.1,
    max_negative_wallets_per_coin: int = 10,
) -> DataFrame:
    """Q1 (core_coin_wallet_transfers.py:306-331,359-379): drop
    (coin, wallet) pairs whose min(balance) <= -0.1 (kept iff
    lowest_balance > -0.1), and drop ALL wallets of a coin once the coin
    has >= 10 negative wallets."""
    mins = df.groupBy(*PAIR).agg(F.min("balance").alias("_lowest"))
    coin_census = mins.groupBy("coin_id").agg(
        F.count(F.when(F.col("_lowest") < neg_threshold, True)).alias("_neg_wallets")
    )
    good_pairs = mins.filter(F.col("_lowest") > neg_threshold).select(*PAIR)
    good_coins = coin_census.filter(
        F.col("_neg_wallets") < max_negative_wallets_per_coin
    ).select("coin_id")
    return df.join(good_pairs, PAIR, "left_semi").join(good_coins, "coin_id", "left_semi")


def remove_supply_overage_wallets(
    df: DataFrame,
    coins: DataFrame,
    max_overage_wallets_per_coin: int = 5,
) -> DataFrame:
    """Q2 (core_coin_wallet_transfers.py:341-357,366-385): drop
    (coin, wallet) pairs that ever held balance > total_supply (theta
    join J8), and drop whole coins with >= 5 such wallets."""
    overage_pairs = (
        df.join(F.broadcast(coins.select("coin_id", "total_supply")), "coin_id")
        .filter(F.col("balance") > F.col("total_supply"))
        .select(*PAIR)
        .distinct()
    )
    overage_coins = (
        overage_pairs.groupBy("coin_id")
        .agg(F.count("wallet_address").alias("_n"))
        .filter(F.col("_n") >= max_overage_wallets_per_coin)
        .select("coin_id")
    )
    return df.join(overage_pairs, PAIR, "left_anti").join(overage_coins, "coin_id", "left_anti")


def remove_market_cap_overage_wallets(
    profits: DataFrame,
    market_data: DataFrame,
    max_overage_wallets_per_coin: int = 20,
) -> DataFrame:
    """Q3 (core_coin_wallet_profits_orchestrator.py:286-317): drop
    (coin, wallet) pairs whose usd_balance ever exceeded market_cap —
    but only for coins with <= 20 such wallets (more implies bad market
    cap data, so the coin is left untouched)."""
    joined = profits.join(
        market_data.select("coin_id", "date", "market_cap"), ["coin_id", "date"], "left"
    )
    overage_pairs = (
        joined.filter(
            F.col("market_cap").isNotNull() & (F.col("usd_balance") > F.col("market_cap"))
        )
        .select(*PAIR)
        .distinct()
    )
    coin_counts = overage_pairs.groupBy("coin_id").agg(F.count("wallet_address").alias("_n"))
    removable = overage_pairs.join(
        coin_counts.filter(F.col("_n") <= max_overage_wallets_per_coin).select("coin_id"),
        "coin_id",
        "left_semi",
    )
    return profits.join(removable, PAIR, "left_anti")


def remove_single_day_dips(
    df: DataFrame,
    keys=("coin_id",),
    date_col: str = "date",
    price_col: str = "price",
    dip_threshold: float = 0.8,
    recovery_threshold: float = 0.9,
) -> DataFrame:
    """Q4 (core_coin_market_data.py:140-190): drop rows where
    price/prev < 0.8 AND next/prev > 0.9, or where price == 0 between
    positive neighbors that recover past 0.9."""
    df = with_lag_lead(df, list(keys), [date_col], price_col, "_prev", "_next")
    # try_divide: ANSI mode raises on x/0, but a zero prev price must
    # behave like the reference's pandas inf/NaN (comparison False ->
    # row kept); NULL ratios coalesce to keep below
    pct_dip = (F.try_divide(F.col(price_col), F.col("_prev")) < dip_threshold) & (
        F.try_divide(F.col("_next"), F.col("_prev")) > recovery_threshold
    )
    zero_dip = (
        (F.col(price_col) == 0)
        & (F.col("_prev") > 0)
        & (F.col("_next") > 0)
        & (F.try_divide(F.col("_next"), F.col("_prev")) > recovery_threshold)
    )
    # null prev/next make the comparisons null -> coalesce to keep (same
    # as pandas NaN comparisons evaluating False in the reference mask)
    dip = F.coalesce(pct_dip | zero_dip, F.lit(False))
    return df.filter(~dip).drop("_prev", "_next")


def iqr_outliers(
    df,
    keys: list[str],
    value_col: str,
    k: float = 1.5,
):
    """Tukey IQR fences per key (beyond the reference's fixed-threshold
    rules, like the q93 z-score): flag values outside
    [q1 - k*IQR, q3 + k*IQR], with q1/q3 as exact rank-position
    quantiles (the q53 percentile_disc idiom — deterministic under
    ties and engine-portable where approx_percentile is not). Adapts
    to each key's own scale, which the fixed rules cannot.

    Returns df + (q1, q3, is_outlier). The per-key quantile table is
    keys-sized -> broadcast back; the value column should be an exact
    integer rendering (milli-units) so the rank selection and the
    k*IQR arithmetic are bit-identical in every engine. Null values
    are excluded from the fences (rank_quantiles drops them before
    ranking — a null landing on the ceil-rank position would
    otherwise null the fences for the whole key) and are flagged
    is_outlier = false: a missing measurement is not evidence of an
    extreme one. A key whose values are ALL null has no fences row at
    all; the join back is LEFT so those rows survive with null q1/q3
    and is_outlier = false (an inner join would silently drop the
    whole key)."""
    from etl_pipelines_spark.operators.profiling import rank_quantiles

    qs = rank_quantiles(df, keys, value_col, {"q1": 0.25, "q3": 0.75}).drop(
        "n_values"
    )
    iqr = F.col("q3") - F.col("q1")
    lo = F.col("q1") - F.lit(k) * iqr
    hi = F.col("q3") + F.lit(k) * iqr
    flag = F.when(
        F.col(value_col).isNull() | F.col("q1").isNull(), F.lit(False)
    ).otherwise((F.col(value_col) < lo) | (F.col(value_col) > hi))
    return df.join(F.broadcast(qs), keys, "left").withColumn("is_outlier", flag)
