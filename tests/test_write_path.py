"""Curated-table write path (SURVEY.md §2.1 S2/S5): partitioned Parquet
layout mirroring the reference's PARTITION BY DATE(date) CLUSTER BY
(coin_id, wallet_address), and proof that reads prune partitions."""

import datetime as dt

from pyspark.sql import functions as F

from etl_pipelines_spark.sources.registry import write_partitioned

D = dt.date


def _table(spark):
    rows = [
        ("c1", "w1", D(2024, 1, d), float(d)) for d in range(1, 6)
    ] + [("c2", "w2", D(2024, 1, d), float(d * 10)) for d in range(1, 6)]
    return spark.createDataFrame(
        rows, "coin_id string, wallet_address string, date date, v double"
    )


def test_partitioned_write_round_trip(spark, tmp_path):
    path = str(tmp_path / "curated")
    write_partitioned(_table(spark), path)
    back = spark.read.parquet(path)
    assert back.count() == 10
    # physical layout: one directory per date
    import os

    parts = [p for p in os.listdir(path) if p.startswith("date=")]
    assert len(parts) == 5


def test_partition_pruning_on_date_filter(spark, tmp_path):
    path = str(tmp_path / "curated")
    write_partitioned(_table(spark), path)
    q = spark.read.parquet(path).filter(F.col("date") == D(2024, 1, 3))
    plan = q._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    # the date predicate must land in PartitionFilters (directory
    # pruning), not as a post-scan filter over all partitions
    assert "PartitionFilters" in plan
    pf_line = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "date" in pf_line
    assert q.count() == 2


def test_overwrite_mode_replaces(spark, tmp_path):
    path = str(tmp_path / "curated")
    write_partitioned(_table(spark), path)
    smaller = _table(spark).filter(F.col("coin_id") == "c1")
    write_partitioned(smaller, path, mode="overwrite")
    assert spark.read.parquet(path).count() == 5
