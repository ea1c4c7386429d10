"""OHLC / VWAP time-series resampling (the market-data rollup the
reference computes implicitly when it daily-aggregates raw trades,
e.g. the weighted daily price in coingecko_market_data.py's
market-data build — generalized to any grain).

One groupBy per grain: open/close ride min_by/max_by on the timestamp
(single-pass, map-side combinable — no window, no sort), high/low are
plain min/max, VWAP accumulates price*volume and volume as exact
DECIMAL sums (the engine's cross-engine float discipline) and divides
once. At 100 TB this is the canonical pre-aggregation: the raw tick
stream collapses to one row per (key, bucket) in a single shuffle, and
coarser grains re-derive from finer ones with the same aggregate shapes
(min/max/min_by/max_by/sums are all re-aggregable — only VWAP needs
the two sum columns kept, which `reaggregate=True` preserves).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEC = "decimal(38,6)"


def resample_ohlc(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    price_col: str,
    volume_col: str | None = None,
    grain: str = "1 day",
    reaggregate: bool = False,
) -> DataFrame:
    """Per (keys, time bucket): open, high, low, close, n_trades, and
    (with a volume column) volume + VWAP. `grain` is any
    window-duration string ('1 day', '4 hours', '15 minutes').

    `reaggregate=True` keeps the raw DECIMAL sum columns (_pv, _v) so
    a coarser grain can be built FROM THIS OUTPUT with another
    resample-shaped groupBy instead of re-scanning ticks."""
    keys = list(keys)
    bucket = F.window(F.col(ts_col), grain)
    aggs = [
        F.min_by(price_col, ts_col).alias("open"),
        F.max(price_col).alias("high"),
        F.min(price_col).alias("low"),
        F.max_by(price_col, ts_col).alias("close"),
        F.count(F.lit(1)).alias("n_trades"),
    ]
    if volume_col is not None:
        pv = (F.col(price_col).cast(DEC) * F.col(volume_col).cast(DEC)).cast(DEC)
        aggs += [
            F.sum(F.col(volume_col).cast(DEC)).alias("_v"),
            F.sum(pv).alias("_pv"),
        ]
    out = (
        df.groupBy(*keys, bucket.alias("_w"))
        .agg(*aggs)
        .withColumn("bucket_start", F.col("_w.start"))
        .drop("_w")
    )
    if volume_col is not None:
        out = out.withColumn(
            "volume", F.col("_v").cast("double")
        ).withColumn(
            "vwap",
            (F.col("_pv").cast("double") / F.col("_v").cast("double")).cast("double"),
        )
        if not reaggregate:
            out = out.drop("_v", "_pv")
    cols = [*keys, "bucket_start", "open", "high", "low", "close", "n_trades"]
    if volume_col is not None:
        cols += ["volume", "vwap"]
        if reaggregate:
            cols += ["_v", "_pv"]
    return out.select(*cols)
