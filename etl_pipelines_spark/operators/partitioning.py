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
    it reads from fewer files than that; identity otherwise.

    The probe is `inputFiles()` (~1 ms of driver work), NOT
    `rdd.getNumPartitions()`: materializing the RDD lineage costs
    ~0.5-1 s of plan translation per fresh DataFrame, which re-taxed
    every query invocation at any scale (measured as a 2x regression
    on the multimodal suite at sf0.1). File count under-estimates
    splits for huge single files, but in that direction the repartition
    it triggers is cheap relative to the work such inputs carry."""
    target = df.sparkSession.sparkContext.defaultParallelism
    files = df.inputFiles()
    # No file source (createDataFrame, cached/shuffle-derived frames):
    # inputFiles() == [] is AMBIGUOUS, not "narrow" — such frames are
    # either tiny local fixtures or already carry the parallelism of
    # the shuffle that produced them, and a forced round-robin here
    # would add a full shuffle for nothing. Pass through.
    if not files:
        return df
    if len(files) >= target:
        return df
    return df.repartition(target)
