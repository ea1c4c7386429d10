"""Generic external-warehouse federation (SURVEY.md §2.1 S7/S8/S9).

The reference reads two remote systems — a cloud warehouse scan with an
inline filter (cloud_functions/ethereum_transfers_updates/
ethereum_transfers_updates.py:220-222) and a federated query service
(core_coin_wallet_transfers/retrieve_dune_transfer_data.py:504-536) —
and pushes freshness state back out (S9). The engine-side shape of all
three is the same: a NAMED source that yields a point-in-time snapshot
DataFrame, scanned with column projection and a pushed predicate, plus
an overwrite writer for outbound state.

This module is that boundary, kept deliberately thin:

- `register_external_source(name, reader)` — a reader is any
  `SparkSession -> DataFrame` factory: a JDBC/BigQuery/Delta reader on
  a real deployment, a parquet snapshot locally. The engine never
  depends on which.
- `external_scan(spark, name, columns=, predicate=)` — projection and
  predicate apply IMMEDIATELY above the reader's root, so whatever
  pushdown the underlying connector supports engages (for parquet
  snapshots, PushedFilters/ReadSchema — pinned in test_plan_audits;
  JDBC-style readers receive them through the same DataFrame plan).
- `push_snapshot(df, path)` — S9 outbound state as an atomic-ish
  overwrite parquet write (the same truncate+rebuild discipline as the
  M2 writes).

Query logic over federated data stays native (e.g. q05 re-implements
the Dune aggregation); federation is ONLY transport, which is why the
registry holds reader factories, not SQL strings.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

Reader = Callable[[SparkSession], DataFrame]

_SOURCES: dict[str, Reader] = {}


def register_external_source(name: str, reader: Reader) -> None:
    """Bind `name` to a snapshot-reader factory. Re-registering a name
    replaces it (sources are environment config, not data)."""
    _SOURCES[name] = reader


def registered_sources() -> list[str]:
    return sorted(_SOURCES)


def parquet_snapshot_source(path: str) -> Reader:
    """The local stand-in for a warehouse connector: a parquet path
    read as a snapshot. Real deployments register spark.read.format
    ('jdbc'/'bigquery'/...) factories with the same signature."""

    def reader(spark: SparkSession) -> DataFrame:
        return spark.read.parquet(path)

    return reader


def external_scan(
    spark: SparkSession,
    name: str,
    columns: list[str] | None = None,
    predicate: str | None = None,
) -> DataFrame:
    """Scan a registered source with projection + predicate applied
    directly above the reader so connector pushdown engages — the
    reference's `WHERE block_timestamp > ...` warehouse scan shape."""
    if name not in _SOURCES:
        raise KeyError(
            f"unknown external source {name!r}; registered: {registered_sources()}"
        )
    df = _SOURCES[name](spark)
    if predicate is not None:
        df = df.filter(predicate)
    if columns is not None:
        df = df.select(*[F.col(c) for c in columns])
    return df


def push_snapshot(df: DataFrame, path: str) -> None:
    """S9: publish engine state to an external location as a full
    overwrite snapshot (truncate+rebuild, M2)."""
    df.write.mode("overwrite").parquet(path)
