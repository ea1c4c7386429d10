"""Partition-width hygiene for Python-heavy operators.

A small parquet arrives as one or two input splits (split count follows
file/row-group layout, not cluster width), which silently serializes
every Arrow-batched UDF downstream of the scan onto one or two cores —
the cluster is idle while one task decodes/parses/scores everything.
Measured on the 10x bench corpus: 3-5x wall-clock on the codec and
k-means assignment paths.

`spread_narrow` widens ONLY when the frame is narrower than the
cluster's parallelism. Wide inputs pass through untouched: at real
scale the scan already carries enough splits and a blind repartition
would add a full shuffle for nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_narrow(df: DataFrame) -> DataFrame:
    """Round-robin `df` across the cluster's default parallelism when
    it arrives with fewer partitions; identity otherwise."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
