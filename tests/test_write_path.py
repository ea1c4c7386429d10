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


def test_zorder_layout_prunes_better_than_single_sort(spark, tmp_path):
    """A 2-D box probe over a Z-ordered layout must touch fewer
    candidate files (per-file min/max pruning) than the same data laid
    out sorted by one column — and the layout must not change the
    data."""
    from etl_pipelines_spark.sources.registry import (
        file_pruning_candidates,
        write_zordered,
    )

    # 64x64 grid: x and y are independent, the worst case for 1-D sort
    grid = spark.range(4096).select(
        (F.col("id") % 64).alias("x"),
        (F.col("id") / 64).cast("long").alias("y"),
        F.col("id").alias("payload"),
    )
    linear = str(tmp_path / "linear")
    zord = str(tmp_path / "zorder")
    # 1-D layout: range-partition + sort on x only (16 files each)
    (
        grid.repartitionByRange(16, "x")
        .sortWithinPartitions("x")
        .write.parquet(linear)
    )
    write_zordered(grid, zord, ["x", "y"], n_files=16)

    # the 1-D sort is optimal for x-probes and useless for y-probes
    # (y spans everything in every file); the curve gives BOTH columns
    # partial locality, so across one probe per dimension it must
    # touch fewer files in total
    x_probe = {"x": (10, 17)}
    y_probe = {"y": (10, 17)}
    lin_x, lin_total = file_pruning_candidates(spark, linear, x_probe)
    lin_y, _ = file_pruning_candidates(spark, linear, y_probe)
    z_x, z_total = file_pruning_candidates(spark, zord, x_probe)
    z_y, _ = file_pruning_candidates(spark, zord, y_probe)
    assert lin_total == z_total == 16
    assert lin_y == 16  # the 1-D layout cannot skip on y at all
    assert z_y < 16  # the curve can
    assert z_x + z_y < lin_x + lin_y, (z_x, z_y, lin_x, lin_y)
    # and a 2-D box lands in few curve segments
    z_box, _ = file_pruning_candidates(
        spark, zord, {"x": (10, 17), "y": (10, 17)}
    )
    assert z_box <= 4, z_box
    # layout change only — same rows
    assert spark.read.parquet(zord).exceptAll(grid).count() == 0
    assert grid.exceptAll(spark.read.parquet(zord)).count() == 0


def test_zorder_degenerate_constant_column(spark, tmp_path):
    """A constant column must contribute zero bits (no divide-by-zero)
    and the write must still succeed."""
    from etl_pipelines_spark.sources.registry import write_zordered

    df = spark.range(100).select(
        F.lit(7).alias("c"), F.col("id").alias("x"), F.col("id").alias("p")
    )
    path = str(tmp_path / "zconst")
    write_zordered(df, path, ["c", "x"], n_files=4)
    assert spark.read.parquet(path).count() == 100
