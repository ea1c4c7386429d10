"""Window-function operators (SURVEY.md §2.6).

All running windows use explicit rowsBetween frames on per-day-unique
keys — semantics identical to BigQuery's default RANGE frame here
because keys are unique per day (SURVEY.md W1 note), and ROWS frames
avoid the range-computation overhead.

Scale note: every helper shares one partitioning (the group keys), so
stacked window columns over the same keys compile to a single shuffle +
sort in the physical plan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F


def ordered_window(keys: Sequence[str], order: Sequence[str | Column]) -> WindowSpec:
    return Window.partitionBy(*keys).orderBy(*order)


def cumulative_window(keys: Sequence[str], order: Sequence[str | Column]) -> WindowSpec:
    return ordered_window(keys, order).rowsBetween(Window.unboundedPreceding, Window.currentRow)


def with_running_sum(
    df: DataFrame, keys: Sequence[str], order: Sequence[str], value: str, out: str
) -> DataFrame:
    """Running per-group sum — the balance kernel (W1/W9; reference:
    core_coin_wallet_transfers.py:186-188 ``sum(amount) over (partition
    by token,wallet order by date)``)."""
    return df.withColumn(out, F.sum(value).over(cumulative_window(keys, order)))


def with_running_count(
    df: DataFrame, keys: Sequence[str], order: Sequence[str], out: str
) -> DataFrame:
    """Running per-group count — transfer_sequence (W2; reference:
    core_coin_wallet_transfers.py:187-188)."""
    return df.withColumn(out, F.row_number().over(ordered_window(keys, order)).cast("long"))


def with_lag_lead(
    df: DataFrame,
    keys: Sequence[str],
    order: Sequence[str],
    col: str,
    lag_out: str | None = None,
    lead_out: str | None = None,
) -> DataFrame:
    """prev/next columns (W6/W7; reference shift(1)/shift(-1) at
    core_coin_market_data.py:157-158)."""
    w = ordered_window(keys, order)
    if lag_out:
        df = df.withColumn(lag_out, F.lag(col, 1).over(w))
    if lead_out:
        df = df.withColumn(lead_out, F.lead(col, 1).over(w))
    return df


def forward_fill(
    df: DataFrame, keys: Sequence[str], order: Sequence[str], cols: Sequence[str]
) -> DataFrame:
    """Per-group ffill (W12; reference: core_coin_market_data.py:259-262)
    via last(ignorenulls) over an unbounded-preceding frame."""
    w = cumulative_window(keys, order)
    for c in cols:
        df = df.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return df


def global_running_sum(
    df: DataFrame,
    order: Sequence[str],
    value: Column,
    out: str = "running_total",
) -> DataFrame:
    """Running sum over a GLOBAL total order without the single-
    partition window (W3; reference: batch sizing
    retrieve_dune_transfer_data.py:194,241) — the distributed two-pass
    prefix sum:

    1. range-partition on the order columns, so partition p holds a
       contiguous slice of the total order;
    2. partition-local cumulative sum (one window, no cross-partition
       data movement);
    3. per-partition totals -> exclusive prefix offsets (one tiny
       frame, one row per partition) broadcast back and added.

    EXACT only for order-independent sums — DECIMAL and integer
    values, which is why the caller keeps the decimal cast on the
    value column. Float sums would drift with the fold regrouping;
    keep those on the single-partition form and bound the input.
    Both consumers of the range exchange reuse it (ReusedExchange),
    so the input shuffles once. `order` must be a total order
    (include a tiebreak key) or rows that compare equal could land
    in either partition with an ambiguous running value."""
    ranged = df.repartitionByRange(*[F.col(c) for c in order]).withColumn(
        "_pid", F.spark_partition_id()
    )
    w_local = Window.partitionBy("_pid").orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    local = ranged.withColumn("_local", F.sum(value).over(w_local))
    sizes = ranged.groupBy("_pid").agg(F.sum(value).alias("_tot"))
    w_prefix = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    prefixes = sizes.select(
        "_pid", F.coalesce(F.sum("_tot").over(w_prefix), F.lit(0)).alias("_before")
    )
    return (
        local.join(F.broadcast(prefixes), "_pid")
        .withColumn(out, F.col("_local") + F.col("_before"))
        .drop("_pid", "_local", "_before")
    )


def global_row_number(df: DataFrame, order: Sequence[str | Column], out: str) -> DataFrame:
    """Global-order row_number (W4; reference: orchestrator batch
    assignment core_coin_wallet_profits_orchestrator.py:189-220).

    WARNING: single-partition shuffle — acceptable only on small/compacted
    inputs (ID issuance over *new* keys, batch maps). For large inputs use
    :func:`dense_global_ids` in operators.ids which computes
    partition-local row_numbers + partition-offset cumsum.
    """
    return df.withColumn(out, F.row_number().over(Window.orderBy(*order)).cast("long"))
