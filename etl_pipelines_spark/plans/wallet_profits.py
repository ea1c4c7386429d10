"""coin_wallet_profits pipeline — the reference's computational heart.

Per (coin, wallet, day): cumulative USD profitability derived from
transfers x prices. Semantics ported stage-by-stage from
cloud_functions/core_coin_wallet_profits/core_coin_wallet_profits.py
(merge :235-311, first-price :321-349, imputation :352-440,
splice :443-478, pre-inflow trim :482-523, kernel :527-634).

Spark shape (replaces the reference's whole batch orchestration,
SURVEY.md §3.2): every stage partitions on (coin_id, wallet_address) or
coin_id — Catalyst reuses the pair-key shuffle across the stacked
windows, and AQE's skew-join handling covers hot coins. No driver-side
batching, temp tables, or retry loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_pipelines_spark.operators.windows import cumulative_window, ordered_window

PAIR = ["coin_id", "wallet_address"]


def merge_prices_and_transfers(transfers: DataFrame, prices: DataFrame) -> DataFrame:
    """Left join preserving all transfer rows; price null where missing
    (reference :235-311)."""
    return transfers.join(
        prices.select("coin_id", "date", "price"), ["coin_id", "date"], "left"
    )


def first_price_info(prices: DataFrame) -> DataFrame:
    """Per coin: first_price_date = min(date), first_price = price at
    that date (reference :321-349, groupby agg {'date':'min',
    'price':'first'} on a date-sorted frame)."""
    return prices.groupBy("coin_id").agg(
        F.min("date").alias("first_price_date"),
        F.min_by("price", "date").alias("first_price"),
    )


def add_first_price_info(profits: DataFrame, prices: DataFrame) -> DataFrame:
    return profits.join(F.broadcast(first_price_info(prices)), "coin_id", "left")


def create_imputed_records(profits: DataFrame) -> DataFrame:
    """Wallets with activity before their coin's first price date get one
    synthetic row at first_price_date carrying the last pre-price balance
    as a transfer-in — skipped when real activity exists on that date
    (reference :352-440)."""
    pre = profits.filter(F.col("date") < F.col("first_price_date"))
    has_pre = pre.select(*PAIR).distinct()
    active_on_first = (
        profits.filter(F.col("date") == F.col("first_price_date")).select(*PAIR).distinct()
    )
    needs = has_pre.join(active_on_first, PAIR, "left_anti")
    pre_balances = pre.groupBy(*PAIR).agg(F.max_by("balance", "date").alias("balance"))
    coin_first = profits.select("coin_id", "first_price_date", "first_price").distinct()
    return (
        needs.join(pre_balances, PAIR)
        .join(coin_first, "coin_id")
        .select(
            "coin_id",
            "wallet_address",
            F.col("first_price_date").alias("date"),
            F.col("balance").alias("net_transfers"),
            "balance",
            F.col("first_price").alias("price"),
            "first_price_date",
            "first_price",
        )
    )


def splice_imputed_records(profits: DataFrame, imputed: DataFrame) -> DataFrame:
    """Drop priceless rows, add imputed rows, then rewrite each pair's
    earliest surviving row to show its full balance as transfer-in
    (reference :443-478). Imputed rows never collide with kept rows on
    date (imputation is skipped when activity exists on first_price_date),
    so row_number order is well-defined."""
    kept = profits.filter(F.col("price").isNotNull())
    combined = kept.select(*imputed.columns).unionByName(imputed)
    w = ordered_window(PAIR, ["date"])
    return (
        combined.withColumn("_rn", F.row_number().over(w))
        .withColumn(
            "net_transfers",
            F.when(F.col("_rn") == 1, F.col("balance")).otherwise(F.col("net_transfers")),
        )
        .drop("_rn")
    )


def filter_pre_inflow_records(profits: DataFrame) -> DataFrame:
    """Drop rows before each pair's first positive cumulative token
    inflow and drop the helper columns (reference :482-523)."""
    cum = cumulative_window(PAIR, ["date"])
    inflows = F.greatest(F.col("net_transfers"), F.lit(0.0))
    return (
        profits.withColumn("_cum_inflows", F.sum(inflows).over(cum))
        .filter(F.col("_cum_inflows") > 0)
        .drop("_cum_inflows", "first_price_date", "first_price")
    )


def calculate_wallet_profitability(
    profits: DataFrame, quantize: float | None = None
) -> DataFrame:
    """The profitability kernel (reference :527-634):
    profits_change = (price - prev_price) * prev_balance with
    prev_price defaulting to price (first row) and prev_balance to 0;
    cumulative sums per pair; USD valuations.

    `quantize` (e.g. 1e6): accumulate the cumulative metrics as
    floor-scaled BIGINTs instead of raw double sums — exact in any
    order, so the result is bit-identical across engines/plans (the
    catalog's cross-engine float discipline; production keeps the raw
    sums)."""
    w = ordered_window(PAIR, ["date"])
    cum = cumulative_window(PAIR, ["date"])
    prev_price = F.coalesce(F.lag("price", 1).over(w), F.col("price"))
    prev_balance = F.coalesce(F.lag("balance", 1).over(w), F.lit(0.0))

    def cumsum(col: str):
        if quantize is None:
            return F.sum(col).over(cum)
        scaled = F.floor(F.col(col) * F.lit(quantize)).cast("long")
        return F.sum(scaled).over(cum).cast("double") / F.lit(quantize)

    return (
        profits.withColumn("profits_change", (F.col("price") - prev_price) * prev_balance)
        .withColumn("profits_cumulative", cumsum("profits_change"))
        .withColumn("usd_balance", F.col("balance") * F.col("price"))
        .withColumn("usd_net_transfers", F.col("net_transfers") * F.col("price"))
        .withColumn(
            "usd_inflows",
            F.when(F.col("usd_net_transfers") > 0, F.col("usd_net_transfers")).otherwise(
                F.lit(0.0)
            ),
        )
        .withColumn("usd_inflows_cumulative", cumsum("usd_inflows"))
        .select(
            "coin_id",
            "wallet_address",
            "date",
            "profits_change",
            "profits_cumulative",
            "usd_balance",
            "usd_net_transfers",
            "usd_inflows",
            "usd_inflows_cumulative",
        )
    )


def build_wallet_profits(
    transfers: DataFrame,
    prices: DataFrame,
    quantize: float | None = None,
    persist: bool = True,
) -> DataFrame:
    """Full five-stage pipeline: merge -> first-price -> impute ->
    splice -> trim -> kernel.

    The merged+first-price frame is consumed by FIVE branches
    (pre-price rows, first-day activity, pre-balances, per-coin first
    prices, the kept rows) — without a persist each branch re-executes
    the transfers-x-prices join and its upstream aggregations
    (measured ~5x the work; exchange reuse does not cover the join +
    window subtrees). This is the "persist when consumers genuinely
    need rows" case of SCALE.md's restructure-over-persist rule: the
    branches need different row subsets, not one collapsible
    aggregate.

    Cache lifecycle is the CALLER's: the returned frame reads the
    cached intermediate lazily, so this function cannot release it.
    One-shot jobs and the catalog harnesses clear the cache after
    materializing; a long-running service invoking the pipeline
    repeatedly should call spark.catalog.clearCache() between builds
    (or pass persist=False and pay the ~5x recompute)."""
    merged = merge_prices_and_transfers(transfers, prices)
    with_first = add_first_price_info(merged, prices)
    if persist:
        with_first = with_first.persist()
    imputed = create_imputed_records(with_first)
    spliced = splice_imputed_records(with_first, imputed)
    trimmed = filter_pre_inflow_records(spliced)
    return calculate_wallet_profitability(trimmed, quantize=quantize)


def recomputation_audit(
    profits: DataFrame,
    transfers: DataFrame,
    prices: DataFrame,
    n_coins: int = 300,
    seed: str = "seed42",
    abs_tol: float = 1.0,
    rel_tol: float = 0.01,
) -> DataFrame:
    """The reference's flagship data-quality audit
    (dbt test_cCoinWalletProfits_transfers_and_profits_math.sql:1-125):
    deterministically sample coins, independently re-derive
    profits_change and usd_balance from transfers x prices with lag
    windows, and flag rows off by more than $1 AND more than 1%.

    Sampling uses xxhash64('seed42'||coin_id) standing in for BigQuery
    farm_fingerprint (same determinism role, different sampled set —
    SURVEY.md §7.3). Returns the violations frame (empty = audit green).
    """
    sampled = (
        profits.select("coin_id")
        .distinct()
        .orderBy(F.xxhash64(F.concat(F.lit(seed), F.col("coin_id").cast("string"))))
        .limit(n_coins)
    )
    p = profits.join(F.broadcast(sampled), "coin_id", "left_semi")

    joined = (
        p.join(
            transfers.select("coin_id", "wallet_address", "date", "balance"),
            ["coin_id", "wallet_address", "date"],
            "left",
        )
        .join(prices.select("coin_id", "date", "price"), ["coin_id", "date"], "left")
        # imputed rows have no transfer row; reconstruct their balance
        # from the USD valuation so lag chains stay intact
        .withColumn(
            "_bal", F.coalesce(F.col("balance"), F.try_divide("usd_balance", "price"))
        )
    )
    w = ordered_window(PAIR, ["date"])
    prev_price = F.coalesce(F.lag("price").over(w), F.col("price"))
    prev_balance = F.coalesce(F.lag("_bal").over(w), F.lit(0.0))
    checked = (
        joined.withColumn("_expected_change", (F.col("price") - prev_price) * prev_balance)
        .withColumn("_expected_usd_balance", F.col("_bal") * F.col("price"))
    )

    def mismatch(actual: str, expected: str):
        diff = F.abs(F.col(actual) - F.col(expected))
        return (diff > abs_tol) & (
            F.try_divide(diff, F.abs(F.col(expected))) > rel_tol
        )

    return checked.filter(
        mismatch("profits_change", "_expected_change")
        | mismatch("usd_balance", "_expected_usd_balance")
    ).select(
        "coin_id",
        "wallet_address",
        "date",
        "profits_change",
        "_expected_change",
        "usd_balance",
        "_expected_usd_balance",
    )
