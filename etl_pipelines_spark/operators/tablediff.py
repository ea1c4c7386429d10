"""Cross-engine table digests and snapshot diffs.

Migration validation at warehouse scale: after copying / re-deriving a
100 TB table you need "is it the same data?" without sorting either
side. An ORDER-INDEPENDENT digest answers it in one scan per side —
sum a per-row hash, compare two numbers. The same row hash then powers
a key-level snapshot diff (added / removed / changed) for auditing
incremental loads against a rebuild (the reference's nightly
rebuild-vs-increment reconciliation concern, e.g. the
core_coin_wallet_profits full-refresh pattern).

Portable tier (gated q97/q98): the row hash is the KMV md5 idiom —
48-bit integer from the first 12 hex chars of md5 over a
sentinel-delimited column rendering — and the table digest accumulates
it into DECIMAL(38,0) (exact in any order and any partitioning in both
Spark and DuckDB; BIGINT sums would overflow Spark's ANSI long while
DuckDB silently widens to HUGEINT — the one cross-engine trap here).
Production twin: xxhash64 + spark's sum over unsafe longs when
portability doesn't matter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_pipelines_spark.operators.sketches import kmv_hash, kmv_hash_sql

# a null must hash differently from the string 'None'/'' and from a
# null in a DIFFERENT column position; the sentinel + positional
# concat_ws order gives both properties. U+2400 (SYMBOL FOR NULL) is
# printable — raw NUL bytes cannot ride inside the oracle's SQL
# string literal — and never occurs in real column data
NULL_SENTINEL = "␀null␀"


def row_digest(cols: list[str]) -> F.Column:
    """48-bit order-sensitive-in-columns, order-free-in-rows digest of
    the listed columns. Each value is LENGTH-PREFIXED ('<n>:<value>')
    before joining, so a delimiter character inside the data cannot
    shift column boundaries — ('a|b', 'c') and ('a', 'b|c') render
    differently ('3:a|b|1:c' vs '1:a|3:b|c'). Nulls are distinguished
    from empty strings and from the literal sentinel text via the
    unprefixed sentinel."""
    rendered = [
        F.coalesce(
            F.concat(
                F.length(F.col(c).cast("string")).cast("string"),
                F.lit(":"),
                F.col(c).cast("string"),
            ),
            F.lit(NULL_SENTINEL),
        )
        for c in cols
    ]
    return kmv_hash(F.concat_ws("|", *rendered))


def row_digest_sql(cols: list[str]) -> str:
    """DuckDB twin of `row_digest` (same bytes into md5, same 48-bit
    fold — including the length prefix)."""
    rendered = ", ".join(
        f"coalesce(CAST(length(CAST({c} AS VARCHAR)) AS VARCHAR)"
        f" || ':' || CAST({c} AS VARCHAR), '{NULL_SENTINEL}')"
        for c in cols
    )
    return kmv_hash_sql(f"concat_ws('|', {rendered})")


def table_digest(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """One row: (n_rows, digest) where digest = sum of row digests as
    DECIMAL(38,0) — identical no matter how the table is partitioned,
    ordered, or which engine computes it. Two tables with equal
    (n_rows, digest) are the same multiset of rows up to 48-bit
    collisions (compare per-partition digests to localize a mismatch
    at scale)."""
    cols = cols or df.columns
    return df.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(row_digest(cols).cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("digest"),
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Key-level diff of two snapshots: one row per key that is
    'added' (new only), 'removed' (old only), or 'changed' (both
    sides, different non-key digest). Unchanged keys drop out — at
    scale the output is proportional to the churn, not the table.

    One full-outer hash join on the keys; each side carries only its
    keys plus ONE long digest column, so the shuffle is narrow no
    matter how wide the table is. Assumes keys are unique per side
    (pre-aggregate first otherwise)."""
    if compare_cols is None:
        compare_cols = [c for c in new.columns if c not in keys]
    o = old.select(*keys, row_digest(compare_cols).alias("_od"))
    n = new.select(*keys, row_digest(compare_cols).alias("_nd"))
    joined = o.join(n, keys, "full_outer")
    status = (
        F.when(F.col("_od").isNull(), F.lit("added"))
        .when(F.col("_nd").isNull(), F.lit("removed"))
        .when(F.col("_od") != F.col("_nd"), F.lit("changed"))
    )
    return (
        joined.withColumn("status", status)
        .filter(F.col("status").isNotNull())
        .select(*keys, "status")
    )


def table_digest_delta(
    digest: DataFrame,
    added: DataFrame | None = None,
    removed: DataFrame | None = None,
    cols: list[str] | None = None,
) -> DataFrame:
    """Maintain a `table_digest` under churn WITHOUT rescanning the
    table: because the digest is a plain sum of row hashes, the new
    checksum is old + digest(added) - digest(removed). An incremental
    load can carry its expected post-load checksum computed from the
    delta alone, and a full recompute (or the warehouse twin's digest)
    confirms it — rescan cost moves from O(table) to O(churn).
    `cols` must match the original digest's column list. Rows in
    `removed` must actually exist in the table (sums don't know; the
    q97 snapshot diff is the existence check)."""
    sel = digest.select(
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("digest").cast("decimal(38,0)").alias("digest"),
    )
    for frame, sign in ((added, 1), (removed, -1)):
        if frame is None:
            continue
        d = table_digest(frame, cols).select(
            (F.lit(sign) * F.col("n_rows")).cast("long").alias("n_rows"),
            (F.lit(sign) * F.col("digest")).cast("decimal(38,0)").alias("digest"),
        )
        sel = sel.unionByName(d)
    return sel.agg(
        F.sum("n_rows").cast("long").alias("n_rows"),
        F.sum("digest").cast("decimal(38,0)").alias("digest"),
    )


def cdc_extract(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Produce a change log from two snapshots: one row per changed
    key with op ('insert' | 'update' | 'delete') and the NEW side's
    payload (null payload for deletes — the tombstone convention
    operators/scd2.py:scd2_from_change_log consumes, closing the CDC
    loop: extract here, replay there). The key-matching pass is the
    same narrow digest join as `snapshot_diff`; payload columns are
    then fetched for changed keys only, so the wide second join
    touches churn-many rows, not the table."""
    if compare_cols is None:
        compare_cols = [c for c in new.columns if c not in keys]
    status = snapshot_diff(old, new, keys, compare_cols)
    op = (
        F.when(F.col("status") == "added", F.lit("insert"))
        .when(F.col("status") == "changed", F.lit("update"))
        .otherwise(F.lit("delete"))
    )
    changed = status.select(*keys, op.alias("op"))
    payload = new.select(*keys, *compare_cols)
    return changed.join(payload, keys, "left").select(
        *keys, "op", *compare_cols
    )


def bucketed_digest(
    df: DataFrame,
    keys: list[str],
    cols: list[str] | None = None,
    n_buckets: int = 256,
) -> DataFrame:
    """Per-bucket digests (bucket, n_rows, digest): rows bucketed by
    the md5 hash of their KEY columns, so the same row lands in the
    same bucket on any engine or copy. When two whole-table checksums
    disagree, comparing the two bucket tables localizes the damage to
    the mismatching buckets — 1/n_buckets of the data per probe,
    recursively narrowable — instead of diffing 100 TB row by row.
    The bucket function deliberately reuses the row-identity rank
    idiom (KMV md5), so it needs no engine-specific hash."""
    cols = cols or df.columns
    bucket = (row_digest(keys) % F.lit(n_buckets)).alias("bucket")
    return (
        df.select(bucket, row_digest(cols).cast("decimal(38,0)").alias("_d"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("_d").cast("decimal(38,0)").alias("digest"),
        )
    )
