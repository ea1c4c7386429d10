"""core.coin_wallet_transfers pipeline (reference:
cloud_functions/core_coin_wallet_transfers/core_coin_wallet_transfers.py:173-405).

Stages:
1. join staging transfers to the coins dim (J1), conditional-lowercase
   wallet addresses on case-insensitive chains (P3, reference :228-231)
2. burn/mint sentinel removal (P8, :212-215)
3. running balance + transfer_sequence windows (W1/W2, :186-203)
4. exclusion stack: wallet lists, contract addresses, coin exclusion
   tables, 0x000000000% prefix rule (Q5/J4, :224-302)
5. outlier rules Q1 (negative balances) and Q2 (supply overage)
   (:306-385 — see operators.outliers)

Scale: the coins/chains/exclusion dims broadcast; the only big shuffle
is the (token, wallet) window sort, which doubles as the partitioning
for Q1's groupBy.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_pipelines_spark.operators.outliers import (
    remove_negative_balance_wallets,
    remove_supply_overage_wallets,
)
from etl_pipelines_spark.operators.windows import with_running_count, with_running_sum

BURN_MINT_SENTINELS = ("None", "0x0000000000000000000000000000000000000000", "<nil>")

KEYS = ["coin_id", "token_address", "wallet_address"]


def normalize_addresses(
    df: DataFrame, chains: DataFrame, address_cols: Sequence[str] = ("wallet_address",)
) -> DataFrame:
    """lower() addresses on case-insensitive chains only (reference
    :228-231; core_coins.py:101-104)."""
    df = df.join(F.broadcast(chains.select("chain_id", "is_case_sensitive")), "chain_id", "left")
    for c in address_cols:
        df = df.withColumn(
            c,
            F.when(F.col("is_case_sensitive") == False, F.lower(F.col(c))).otherwise(  # noqa: E712
                F.col(c)
            ),
        )
    return df.drop("is_case_sensitive")


def remove_burn_mint_addresses(df: DataFrame) -> DataFrame:
    return df.filter(~F.col("wallet_address").isin(*BURN_MINT_SENTINELS))


def with_balance_and_sequence(df: DataFrame) -> DataFrame:
    """Running sum -> balance, running count -> transfer_sequence per
    (token, wallet) ordered by date (reference :186-203)."""
    keys = ["coin_id", "token_address", "wallet_address"]
    df = with_running_sum(df, keys, ["date"], "net_transfers", "balance")
    return with_running_count(df, keys, ["date"], "transfer_sequence")


def apply_exclusions(
    df: DataFrame,
    wallet_exclusions: DataFrame | None = None,
    contract_addresses: DataFrame | None = None,
    coin_exclusions: DataFrame | None = None,
    zero_prefix: str = "0x000000000%",
) -> DataFrame:
    """The stacked anti-joins (Q5, reference :224-302). All exclusion
    sides are small -> broadcast anti-joins, no shuffle of the fact."""
    if wallet_exclusions is not None:
        df = df.join(
            F.broadcast(wallet_exclusions.select("wallet_address").distinct()),
            "wallet_address",
            "left_anti",
        )
    if contract_addresses is not None:
        df = df.join(
            F.broadcast(
                contract_addresses.select(F.col("address").alias("wallet_address")).distinct()
            ),
            "wallet_address",
            "left_anti",
        )
    if coin_exclusions is not None:
        df = df.join(
            F.broadcast(coin_exclusions.select("coin_id").distinct()), "coin_id", "left_anti"
        )
    # 0x000000000% prefix rule (reference :267-269)
    return df.filter(~F.col("wallet_address").like(zero_prefix))


def build_coin_wallet_transfers(
    staging: DataFrame,
    coins: DataFrame,
    chains: DataFrame | None = None,
    wallet_exclusions: DataFrame | None = None,
    contract_addresses: DataFrame | None = None,
    coin_exclusions: DataFrame | None = None,
) -> DataFrame:
    """staging: (chain_id?, token_address, wallet_address, date,
    net_transfers) daily nets; coins: dim with coin_id/address/chain_id/
    total_supply."""
    dim = coins.select(
        "coin_id", "chain_id", F.col("address").alias("token_address"), "total_supply"
    )
    df = staging.join(F.broadcast(dim), "token_address")
    if chains is not None:
        df = normalize_addresses(df, chains)
    df = remove_burn_mint_addresses(df)
    df = with_balance_and_sequence(df)
    df = apply_exclusions(
        df,
        wallet_exclusions=wallet_exclusions,
        contract_addresses=contract_addresses,
        coin_exclusions=coin_exclusions,
    )
    df = remove_negative_balance_wallets(df)
    df = remove_supply_overage_wallets(df, coins)
    return df.select(
        "coin_id",
        "chain_id",
        "token_address",
        "wallet_address",
        "date",
        "net_transfers",
        "balance",
        "transfer_sequence",
    )
