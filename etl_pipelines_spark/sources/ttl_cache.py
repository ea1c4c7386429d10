"""Cross-job TTL result cache (SURVEY.md §4 "result caching with TTL").

The reference caches query results as CSV blobs in GCS and reruns the
query when the blob is older than `freshness` hours
(community_calls_processing.py:115-162, `bigquery_cache_sql`). Spark
mapping per SURVEY §4: intra-job reuse is `df.cache()`; the cross-job
24h cache becomes a small layer over a cache *table* — parquet, not
CSV, so a cache hit is a columnar scan that keeps predicate pushdown
and column pruning for whatever reads it next (a CSV hit would
re-parse every row of every column).

Determinism discipline (SURVEY §7.3.6): the clock is injected — callers
pass `now` instead of the layer reading the wall clock, so tests and
replays are reproducible.

The manifest is itself a one-row parquet written through Spark, which
keeps the layer filesystem-agnostic (local disk in tests, any
HDFS-compatible store in production) instead of assuming a local
filesystem or an object-store metadata API like the reference's
`blob.updated`.
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MANIFEST = "_cache_manifest"
_DATA = "data"


@dataclass
class CacheResult:
    df: DataFrame
    refreshed: bool  # True = builder ran; False = served from cache


def _paths(cache_dir: str, name: str) -> tuple[str, str]:
    base = f"{cache_dir.rstrip('/')}/query_{name}"
    return f"{base}/{_DATA}", f"{base}/{_MANIFEST}"


def _exists(spark: SparkSession, path: str) -> bool:
    # Hadoop FS probe keeps the layer filesystem-agnostic and avoids
    # paying (and logging) an AnalysisException on first use
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs.exists(hpath)


def _written_at(spark: SparkSession, manifest_path: str) -> dt.datetime | None:
    if not _exists(spark, manifest_path):
        return None
    row = spark.read.parquet(manifest_path).select("written_at").first()
    if row is None:
        return None
    ts: dt.datetime = row["written_at"]
    if ts.tzinfo is None:
        # session is pinned to UTC, so naive timestamps read back as UTC
        ts = ts.replace(tzinfo=dt.timezone.utc)
    return ts


def cached_query(
    spark: SparkSession,
    cache_dir: str,
    name: str,
    builder: Callable[[SparkSession], DataFrame],
    now: dt.datetime,
    freshness_hours: float = 24.0,
) -> CacheResult:
    """Serve `builder`'s result from the cache table unless stale.

    Stale = no manifest, or (now - written_at) > freshness_hours —
    the same rule as the reference's `cache_stale` check. On refresh
    the result is materialized to parquet and the returned frame reads
    *from the cache*, so hit and miss paths hand downstream consumers
    the identical scan-backed plan.
    """
    data_path, manifest_path = _paths(cache_dir, name)
    written = _written_at(spark, manifest_path)
    if now.tzinfo is None:
        now = now.replace(tzinfo=dt.timezone.utc)
    age_h = None if written is None else (now - written).total_seconds() / 3600.0
    stale = age_h is None or age_h > freshness_hours

    if stale:
        builder(spark).write.mode("overwrite").parquet(data_path)
        spark.createDataFrame(
            [(name, now)], "name string, written_at timestamp"
        ).coalesce(1).write.mode("overwrite").parquet(manifest_path)
    return CacheResult(df=spark.read.parquet(data_path), refreshed=stale)


def invalidate(spark: SparkSession, cache_dir: str, name: str) -> None:
    """Force the next cached_query to rebuild by backdating the manifest
    to the epoch (a data-free operation — the parquet stays in place
    until the rebuild overwrites it)."""
    _, manifest_path = _paths(cache_dir, name)
    epoch = dt.datetime(1970, 1, 1, tzinfo=dt.timezone.utc)
    spark.createDataFrame(
        [(name, epoch)], "name string, written_at timestamp"
    ).coalesce(1).write.mode("overwrite").parquet(manifest_path)


def cache_status(
    spark: SparkSession, cache_dir: str, name: str, now: dt.datetime
) -> DataFrame:
    """One-row frame describing a cache entry (name, written_at,
    age_hours) — the operational view the reference gets from blob
    metadata."""
    _, manifest_path = _paths(cache_dir, name)
    written = _written_at(spark, manifest_path)
    if now.tzinfo is None:
        now = now.replace(tzinfo=dt.timezone.utc)
    rows = (
        []
        if written is None
        else [(name, written, (now - written).total_seconds() / 3600.0)]
    )
    return spark.createDataFrame(
        rows, "name string, written_at timestamp, age_hours double"
    ).withColumn("age_hours", F.round("age_hours", 6))
