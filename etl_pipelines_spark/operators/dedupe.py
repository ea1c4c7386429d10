"""Dedupe operators (SURVEY.md §2.5 A5/A6, §2.2 P11).

The reference's standard streaming-dupe killer is
``row_number() over (partition by id[,date] order by updated_at) = 1``
(core_coin_market_data.py:53-57 and five other sites). Spark equivalent
keeps the same semantics; at scale this is one shuffle on the dedupe key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dedupe_keep_first(
    df: DataFrame, keys: Sequence[str], order: Sequence[str | Column]
) -> DataFrame:
    """Keep the first row per key under `order` (A6)."""
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
    )


def dedupe_keep_latest(df: DataFrame, keys: Sequence[str], ts: str) -> DataFrame:
    """Keep the newest row per key (P11 drop_duplicates keep='last' on a
    ts-sorted frame; coingecko_market_data.py:376)."""
    return dedupe_keep_first(df, keys, [F.col(ts).desc()])
