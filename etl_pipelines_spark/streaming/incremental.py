"""Incremental-batch bookkeeping: high-water marks + open-day exclusion.

Re-expresses the reference's freshness pattern (max(date) per key drives
what gets pulled next; rows for the still-open UTC day are excluded as
partial) as engine-side operators. Reference: freshness query at
cloud_functions/dune_transfers_updates/retrieve_dune_transfer_data.py:127-147,
open-day drop at coingecko_market_data.py:433-435.

The watermark state itself is a tiny keyed table persisted as Parquet —
at scale it is broadcast against the incoming stream, so incremental
filtering never shuffles the big side.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def high_water_marks(df: DataFrame, keys: list[str], ts_col: str) -> DataFrame:
    """max(ts) per key — the freshness state of an already-loaded table."""
    return df.groupBy(*keys).agg(F.max(ts_col).alias("hwm"))


def newer_than_hwm(
    incoming: DataFrame, hwm: DataFrame, keys: list[str], ts_col: str
) -> DataFrame:
    """Rows strictly newer than their key's high-water mark; keys never
    seen before pass entirely. The hwm side is broadcast: incremental
    filtering must not shuffle the (huge) incoming side."""
    joined = incoming.join(F.broadcast(hwm), on=keys, how="left")
    return joined.filter(
        F.col("hwm").isNull() | (F.col(ts_col) > F.col("hwm"))
    ).drop("hwm")


def drop_open_day(df: DataFrame, ts_col: str, now_col=None) -> DataFrame:
    """Exclude rows belonging to the still-open (partial) UTC day.
    `now_col` defaults to current_timestamp; inject a literal for
    deterministic tests/oracles."""
    now = now_col if now_col is not None else F.current_timestamp()
    return df.filter(F.to_date(F.col(ts_col)) < F.to_date(now))


def load_watermark_state(spark: SparkSession, path: str) -> DataFrame | None:
    """Load persisted watermark state; None on first run."""
    if not os.path.exists(path):
        return None
    return spark.read.parquet(path)


def save_watermark_state(hwm: DataFrame, path: str) -> None:
    """Persist watermark state (tiny keyed table; coalesced to 1 file)."""
    hwm.coalesce(1).write.mode("overwrite").parquet(path)


def incremental_pull(
    incoming: DataFrame,
    spark: SparkSession,
    state_path: str,
    keys: list[str],
    ts_col: str,
) -> DataFrame:
    """One incremental-batch round: filter to rows newer than the saved
    marks (everything on first run). Callers process the result, then
    `save_watermark_state(high_water_marks(processed, ...), state_path)`
    to advance — state advances only after a successful write, so a
    failed round replays instead of dropping data (at-least-once, with
    the A6 dedupe-on-read pattern making downstream exactly-once)."""
    state = load_watermark_state(spark, state_path)
    if state is None:
        return incoming
    return newer_than_hwm(incoming, state, keys, ts_col)
