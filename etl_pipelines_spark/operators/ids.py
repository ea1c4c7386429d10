"""Stable integer-ID issuance (SURVEY.md §2.10 M1).

Reference (core_coin_wallet_transfers.py:412-481): unseen wallet
addresses get ``row_number() over (order by wallet_address) +
coalesce(max(existing_id), 0)``, append-only; (wallet, coin) pair ids
are offset from 3,000,000,000.

Scale design (SURVEY.md §7.3 item 1): a global row_number is a
single-partition sort. For large new-key batches we compute
partition-local row_numbers plus an exclusive prefix-sum of partition
counts — dense, deterministic (ordered by key), and fully parallel.
`monotonically_increasing_id` is deliberately NOT used (non-dense,
partition-layout-dependent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dense_global_ids(
    new_keys: DataFrame,
    key_col: str,
    out: str,
    offset: int = 0,
    offset_df: DataFrame | None = None,
) -> DataFrame:
    """Assign 1-based dense ids ordered by `key_col`, + offset.

    Uses range-partitioned sort (repartitionByRange) so each partition
    holds a contiguous key range, then partition-local row_number +
    cumulative partition-count offsets — no single-partition shuffle.

    `offset_df`: a 1-row frame whose `_offset` column supplies the
    base offset as part of the PLAN (broadcast cross join) — keeps
    derived offsets (e.g. max existing id) fully lazy instead of a
    driver-side collect.
    """
    parts = (
        new_keys.select(key_col)
        .distinct()
        .repartitionByRange(F.col(key_col))
        .withColumn("_pid", F.spark_partition_id())
    )
    w_local = Window.partitionBy("_pid").orderBy(key_col)
    local = parts.withColumn("_local_rn", F.row_number().over(w_local))
    # partition sizes -> exclusive prefix sum (tiny: one row per partition)
    sizes = local.groupBy("_pid").agg(F.max("_local_rn").alias("_n"))
    w_prefix = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    prefixes = sizes.withColumn("_before", F.coalesce(F.sum("_n").over(w_prefix), F.lit(0)))
    joined = local.join(F.broadcast(prefixes.select("_pid", "_before")), "_pid")
    base = F.lit(offset)
    if offset_df is not None:
        joined = joined.crossJoin(F.broadcast(offset_df))
        base = F.col("_offset")
    return (
        joined.withColumn(
            out, (F.col("_local_rn") + F.col("_before") + base).cast("long")
        )
        .select(key_col, out)
    )


def issue_new_ids(
    existing: DataFrame,
    candidates: DataFrame,
    key_col: str,
    id_col: str,
    base_offset: int = 0,
) -> DataFrame:
    """INSERT-if-absent id issuance (M1): anti-join unseen keys, number
    them after max(existing id), return ONLY the new (key, id) rows to
    append. Deterministic given the same inputs.

    Fully lazy: max(existing id) rides as a broadcast 1-row cross join
    rather than a driver-side collect, so issuance composes into larger
    plans (and the driver never blocks on an action here)."""
    new_keys = candidates.select(key_col).distinct().join(existing, key_col, "left_anti")
    offset_df = existing.agg(
        F.coalesce(F.max(id_col), F.lit(base_offset)).cast("long").alias("_offset")
    )
    return dense_global_ids(new_keys, key_col, id_col, offset_df=offset_df)
