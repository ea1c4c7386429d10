"""Central schema registry — one StructType per engine table.

Mirrors the reference's explicitly declared load-boundary schemas
(reference: cloud_functions/core_coin_wallet_profits/core_coin_wallet_profits.py:669-690,
core_coin_market_data/core_coin_market_data.py:321-342) and the fixture
shapes in FIXTURES.md. Money/amount columns are DoubleType for parity
with the reference's FLOAT64 downstream math (SURVEY.md §7.3 item 3).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------- inputs

TRANSFERS = T.StructType(
    [
        T.StructField("coin_id", T.StringType()),
        T.StructField("wallet_address", T.StringType()),
        T.StructField("date", T.DateType()),
        T.StructField("net_transfers", T.DoubleType()),
        T.StructField("balance", T.DoubleType()),
    ]
)

PRICES = T.StructType(
    [
        T.StructField("coin_id", T.StringType()),
        T.StructField("date", T.DateType()),
        T.StructField("price", T.DoubleType()),
    ]
)

# blockchain-grain raw transfer events (FIXTURES.md §5; shape of
# crypto_ethereum.token_transfers as consumed at
# ethereum_transfers_updates.py:218-249)
RAW_TRANSFERS = T.StructType(
    [
        T.StructField("block_timestamp", T.TimestampType()),
        T.StructField("token_address", T.StringType()),
        T.StructField("from_address", T.StringType()),
        T.StructField("to_address", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)

MARKET_DATA_RAW = T.StructType(
    [
        T.StructField("coin_id", T.StringType()),
        T.StructField("date", T.DateType()),
        T.StructField("price", T.DoubleType()),
        T.StructField("volume", T.LongType()),
        T.StructField("market_cap", T.LongType()),
        T.StructField("fdv", T.LongType()),
        T.StructField("circulating_supply", T.DoubleType()),
        T.StructField("total_supply", T.DoubleType()),
        T.StructField("data_source", T.StringType()),
        T.StructField("updated_at", T.TimestampType()),
    ]
)

# Dune-shaped staging table (FIXTURES.md §6;
# retrieve_dune_transfer_data.py:649-658)
COIN_WALLET_NET_TRANSFERS = T.StructType(
    [
        T.StructField("date", T.TimestampType()),
        T.StructField("chain_text_source", T.StringType()),
        T.StructField("token_address", T.StringType()),
        T.StructField("decimals", T.LongType()),
        T.StructField("wallet_address", T.StringType()),
        T.StructField("daily_net_transfers", T.DoubleType()),
        T.StructField("data_source", T.StringType()),
        T.StructField("data_updated_at", T.TimestampType()),
    ]
)

# ------------------------------------------------------------ dimensions

COINS = T.StructType(
    [
        T.StructField("coin_id", T.StringType()),
        T.StructField("chain", T.StringType()),
        T.StructField("chain_id", T.LongType()),
        T.StructField("address", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("source_date", T.DateType()),
        T.StructField("symbol", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("decimals", T.LongType()),
        T.StructField("total_supply", T.DoubleType()),
        T.StructField("coingecko_id", T.StringType()),
        T.StructField("geckoterminal_id", T.StringType()),
        T.StructField("has_market_data", T.BooleanType()),
        T.StructField("has_wallet_transfer_data", T.BooleanType()),
        T.StructField("created_at", T.TimestampType()),
    ]
)

CHAINS = T.StructType(
    [
        T.StructField("chain_id", T.LongType()),
        T.StructField("chain", T.StringType()),
        T.StructField("is_case_sensitive", T.BooleanType()),
        T.StructField("is_erc20", T.BooleanType()),
        T.StructField("nickname_1", T.StringType()),
        T.StructField("nickname_2", T.StringType()),
        T.StructField("chain_text_geckoterminal", T.StringType()),
        T.StructField("chain_text_coingecko", T.StringType()),
        T.StructField("chain_text_dune", T.StringType()),
        T.StructField("chain_text_defillama", T.StringType()),
    ]
)

# --------------------------------------------------------------- outputs

COIN_WALLET_TRANSFERS = T.StructType(
    [
        T.StructField("coin_id", T.StringType()),
        T.StructField("chain_id", T.LongType()),
        T.StructField("token_address", T.StringType()),
        T.StructField("wallet_address", T.StringType()),
        T.StructField("date", T.DateType()),
        T.StructField("net_transfers", T.DoubleType()),
        T.StructField("balance", T.DoubleType()),
        T.StructField("transfer_sequence", T.LongType()),
    ]
)

COIN_WALLET_PROFITS = T.StructType(
    [
        T.StructField("coin_id", T.StringType()),
        T.StructField("wallet_address", T.StringType()),
        T.StructField("date", T.DateType()),
        T.StructField("profits_change", T.DoubleType()),
        T.StructField("profits_cumulative", T.DoubleType()),
        T.StructField("usd_balance", T.DoubleType()),
        T.StructField("usd_net_transfers", T.DoubleType()),
        T.StructField("usd_inflows", T.DoubleType()),
        T.StructField("usd_inflows_cumulative", T.DoubleType()),
    ]
)

COIN_MARKET_DATA = T.StructType(
    [
        T.StructField("coin_id", T.StringType()),
        T.StructField("date", T.DateType()),
        T.StructField("price", T.DoubleType()),
        T.StructField("volume", T.LongType()),
        T.StructField("market_cap", T.LongType()),
        T.StructField("data_source", T.StringType()),
        T.StructField("updated_at", T.TimestampType()),
        T.StructField("days_imputed", T.LongType()),
    ]
)
