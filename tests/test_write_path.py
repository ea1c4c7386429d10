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


def test_bucketed_join_needs_no_exchange(spark):
    """Two tables bucketed on the same key must join without shuffling
    either side — the co-located-join layout write_bucketed exists for."""
    import contextlib
    import io
    import re

    from etl_pipelines_spark.sources.registry import write_bucketed

    left = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v1")
    )
    right = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v2")
    )
    write_bucketed(left, "bkt_left", ["k"], n_buckets=4)
    write_bucketed(right, "bkt_right", ["k"], n_buckets=4)
    try:
        joined = spark.table("bkt_left").join(spark.table("bkt_right"), "k")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert not re.findall(r"^\(\d+\) Exchange$", plan, flags=re.M), plan
        assert joined.count() == 1000
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_left")
        spark.sql("DROP TABLE IF EXISTS bkt_right")


def test_orc_write_round_trip_with_pruning(spark, tmp_path):
    """The same partitioned layout must work under ORC: round trip,
    per-date directories, and the date predicate still lands in
    PartitionFilters with pushed column filters at the ORC scan."""
    path = str(tmp_path / "curated_orc")
    write_partitioned(_table(spark), path, fmt="orc")
    back = spark.read.orc(path)
    assert back.count() == 10
    import os

    assert len([p for p in os.listdir(path) if p.startswith("date=")]) == 5
    q = back.filter(F.col("date") == D(2024, 1, 3))
    plan = q._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    pf_line = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "date" in pf_line
    assert q.count() == 2


def test_compaction_collapses_small_files(spark, tmp_path):
    """Ten appends -> >=10 files per partition; compaction must leave
    one right-sized file per partition with identical data, and the
    original dir must be swapped (no staging leftovers)."""
    import os

    from etl_pipelines_spark.sources.registry import compact_partitions

    path = str(tmp_path / "landed")
    for _ in range(10):
        write_partitioned(_table(spark), path, mode="append")
    before_rows = sorted(
        tuple(r) for r in spark.read.parquet(path).collect()
    )
    before, after = compact_partitions(spark, path)
    assert before >= 50  # 10 appends x 5 date partitions
    assert after == 5  # one file per date partition
    spark.catalog.clearCache()
    got = sorted(tuple(r) for r in spark.read.parquet(path).collect())
    assert got == before_rows
    assert not os.path.exists(path + "__compacting")
    assert not os.path.exists(path + "__retired")
