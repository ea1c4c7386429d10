"""core.coin_market_data pipeline — dedupe, source union, dip removal,
set-based gap fill (reference:
cloud_functions/core_coin_market_data/core_coin_market_data.py).

Stages:
1. per-source dedupe (A6 row_number, reference :49-57,88-92)
2. normalization: null out non-positive market caps, drop bad-data rows
   (reference :66,75-85) and source-priority union (:94-116)
3. single-day dip removal (Q4, :140-190 — see operators.outliers)
4. densify + forward fill with days_imputed lineage (D1/D2, :194-270 —
   the reference's per-coin Python loop becomes one sequence/explode)
5. hardcoded volume repairs (Q6, :287-296)
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_pipelines_spark.operators.dedupe import dedupe_keep_first
from etl_pipelines_spark.operators.densify import densify_daily, with_days_imputed
from etl_pipelines_spark.operators.outliers import remove_single_day_dips
from etl_pipelines_spark.operators.windows import forward_fill


def dedupe_streaming_inserts(raw: DataFrame, keys: Sequence[str], ts: str = "updated_at") -> DataFrame:
    """Streaming-insert dupes keep the earliest updated_at
    (reference :53-57 ``order by md.updated_at asc ... rn=1``)."""
    return dedupe_keep_first(raw, list(keys), [F.col(ts).asc()])


def normalize_market_data(raw: DataFrame) -> DataFrame:
    """CASE WHEN market_cap > 0 guard + volume > 0 filter
    (reference :66,84)."""
    return raw.withColumn(
        "market_cap", F.when(F.col("market_cap") > 0, F.col("market_cap"))
    ).filter(F.col("volume") > 0)


def union_with_source_priority(
    primary: DataFrame, secondary: DataFrame, keys: Sequence[str] = ("coin_id", "date")
) -> DataFrame:
    """UNION ALL where the secondary source only contributes keys absent
    from the primary (reference :107-116 left-join-null filter)."""
    keys = list(keys)
    secondary_only = secondary.join(primary.select(*keys), keys, "left_anti")
    return primary.unionByName(secondary_only, allowMissingColumns=True)


def fill_market_data_gaps(market_data: DataFrame) -> DataFrame:
    """Densify each coin from its min(date) through the global max(date);
    ffill price/market_cap/data_source, volume -> 0, updated_at stays
    null on imputed rows, days_imputed counts streak position
    (reference :194-270)."""
    dense = densify_daily(market_data, ["coin_id"], "date")
    dense = with_days_imputed(dense, ["coin_id"], presence_col="price", date_col="date")
    dense = forward_fill(dense, ["coin_id"], ["date"], ["price", "market_cap", "data_source"])
    return dense.withColumn("volume", F.coalesce(F.col("volume"), F.lit(0).cast("long")))


def repair_negative_volume(df: DataFrame, coin_ids: Sequence[str]) -> DataFrame:
    """abs() fix-up for specific coins (Q6, reference :287-296)."""
    return df.withColumn(
        "volume",
        F.when(F.col("coin_id").isin(list(coin_ids)), F.abs(F.col("volume"))).otherwise(
            F.col("volume")
        ),
    )


def build_coin_market_data(
    coingecko: DataFrame,
    geckoterminal: DataFrame | None = None,
    dip_threshold: float = 0.8,
    recovery_threshold: float = 0.9,
    negative_volume_repair_coins: Sequence[str] = (),
) -> DataFrame:
    primary = normalize_market_data(
        dedupe_streaming_inserts(coingecko, ["coin_id", "date"])
    )
    if geckoterminal is not None:
        secondary = dedupe_streaming_inserts(geckoterminal, ["coin_id", "date"])
        merged = union_with_source_priority(primary, secondary)
    else:
        merged = primary
    cleaned = remove_single_day_dips(
        merged,
        dip_threshold=dip_threshold,
        recovery_threshold=recovery_threshold,
    )
    filled = fill_market_data_gaps(cleaned)
    if negative_volume_repair_coins:
        filled = repair_negative_volume(filled, negative_volume_repair_coins)
    return filled
