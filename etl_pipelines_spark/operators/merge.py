"""MERGE / upsert (SURVEY.md §2.10 M-series).

The reference's update pattern is temp-table choreography: stage the
new rows, DELETE matching keys from the target, INSERT the stage
(core_coin_wallet_transfers.py's batch rebuild, and the M1
insert-if-absent id flow). The engine-side equivalent is one plan —
anti-join the target against the update keys, union the updates — plus
a crash-safe table rewrite for the write path (same staging + two-step
rename discipline as sources.registry.compact_partitions).

Scale: the anti-join shuffles on the merge keys exactly like the
DELETE would; when `updates` is small it broadcasts and the target
never shuffles at all. The write path rewrites the whole table —
right for the reference's daily batch grain; partition-restricted
rewrites (only partitions containing updated keys) are the next rung
and follow the same plan with a partition predicate pushed into the
target scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipelines_spark.operators.dedupe import dedupe_keep_first


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    keys: list[str],
    order_col: str | None = None,
) -> DataFrame:
    """MERGE semantics as a lazy plan: every target row whose key
    appears in `updates` is replaced by the update row; unmatched
    update rows insert. Pass `order_col` when `updates` may carry
    several rows per key — keep-latest by that column (the streaming
    dupe discipline, A6); without it duplicate update keys are an
    error the caller owns."""
    if order_col is not None:
        updates = dedupe_keep_first(updates, keys, [F.col(order_col).desc()])
    kept = target.join(updates.select(*keys).distinct(), keys, "left_anti")
    return kept.unionByName(updates.select(*target.columns))


def upsert_partitions(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    keys: list[str],
    partition_col: str = "date",
    fmt: str = "parquet",
) -> None:
    """Partition-restricted MERGE — the next rung past `upsert_table`'s
    whole-table rewrite: only the partitions PRESENT in `updates` are
    rewritten (Spark dynamic partition overwrite); every other
    partition's files are untouched on disk. Within a touched
    partition, target rows matching an update key are replaced and the
    rest carry over — so the caller's contract is just "every row that
    may change is in `updates`", and cost is O(touched partitions),
    not O(table).

    The merged frame is localCheckpointed before the write: the plan
    reads the same path it overwrites, and materializing first both
    breaks that cycle and bounds the rewrite's input to
    touched-partition data. Crash safety is weaker than
    staged_table_swap (partition dirs commit independently); callers
    in the incremental-refresh path rely on at-least-once replay +
    idempotent merge + post-write reconciliation instead.

    The touched-partition set is collected driver-side (it is by
    definition the set being rewritten — churn-sized) and applied as a
    LITERAL isin filter: a static filter on the partition column
    prunes at plan time on any engine, where the previous broadcast
    semi-join depended on dynamic partition pruning firing — when it
    didn't, every increment paid a full-table scan to keep rows it was
    never going to touch. Callers should hand in a materialized
    `updates` (the refresh driver localCheckpoints it) so the collect
    doesn't re-run the recompute plan."""
    touched = [
        r[0] for r in updates.select(partition_col).distinct().collect()
    ]
    target = spark.read.format(fmt).load(path).filter(
        F.col(partition_col).isin(touched)
    )
    kept = target.join(updates.select(*keys).distinct(), keys, "left_anti")
    merged = kept.unionByName(updates.select(*target.columns)).localCheckpoint(
        eager=True
    )
    (
        # repartition ON the partition column first — the same
        # small-files discipline as sources.registry.write_partitioned
        # (without it, tasks x partitions files per write murder every
        # downstream scan and the dynamic commit's file moves)
        merged.repartition(partition_col)
        .write.mode("overwrite")
        .format(fmt)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .save(path)
    )


def upsert_table(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    keys: list[str],
    order_col: str | None = None,
    fmt: str = "parquet",
    partition_cols: tuple[str, ...] = (),
) -> int:
    """Apply merge_upsert to an on-disk table and rewrite it crash-safe
    via the shared staged-swap discipline (sources.registry.
    staged_table_swap — one implementation for compaction AND merge).
    Returns the post-merge row count.

    Pass `partition_cols` matching the table's layout: the rewrite must
    PRESERVE the on-disk partitioning (a flat rewrite of a
    date-partitioned table would silently destroy partition pruning for
    every later reader). Spark cannot overwrite a path it is lazily
    reading, which is why the staging dir exists at all."""
    from etl_pipelines_spark.sources.registry import staged_table_swap

    target = spark.read.format(fmt).load(path)
    merged = merge_upsert(target, updates, keys, order_col)
    cols = [c for c in partition_cols if c in merged.columns]

    def rewrite(staged: str) -> None:
        writer = merged.write.mode("overwrite").format(fmt)
        if cols:
            writer = writer.partitionBy(*cols)
        writer.save(staged)

    staged_table_swap(path, rewrite, staged_suffix="__merging")
    return spark.read.format(fmt).load(path).count()
