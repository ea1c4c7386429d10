"""Config-table sources (SURVEY.md §2.1 S12/S13).

The reference reads operator-maintained config from Google Sheets
(exclusion lists, chain metadata: core_coin_wallet_transfers.py:59-108,
core_chains.py:29-83) and CSV files (macro_trends_upload.py:17-147).
Engine-side those become schema-checked CSV reads: small, broadcast-
friendly dimension frames. The Sheets transport itself is a driver-side
adapter out of engine scope; everything after "rows arrive" is here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

REQUIRED_EXCLUSION_COLS = ("wallet_address", "chain", "reason")


def read_config_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    header: bool = True,
) -> DataFrame:
    """Schema-checked CSV config read. Explicit schema: a silently
    re-inferred column type in an exclusion list must fail loudly, not
    drop exclusions."""
    return spark.read.schema(schema).option("header", header).csv(path)


def normalize_exclusion_list(df: DataFrame) -> DataFrame:
    """The reference lowercases and trims sheet-sourced addresses before
    anti-joining (core_coin_wallet_transfers.py:228-231 conditional
    lower; manual sheets carry stray whitespace)."""
    return df.select(
        F.lower(F.trim("wallet_address")).alias("wallet_address"),
        F.lower(F.trim("chain")).alias("chain"),
        "reason",
    ).dropna(subset=["wallet_address"]).distinct()


def apply_exclusions(
    facts: DataFrame,
    exclusions: DataFrame,
    keys: tuple[str, ...] = ("wallet_address",),
) -> DataFrame:
    """J4 anti-join removal; the exclusion side is broadcast — config
    tables never shuffle the fact table."""
    return facts.join(F.broadcast(exclusions.select(*keys).distinct()), list(keys), "left_anti")
