"""MERGE/upsert operator (M-series) and the idempotent streaming sink."""

import pytest
from pyspark.sql import functions as F

from etl_pipelines_spark.operators.merge import merge_upsert, upsert_table


def _target(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "id long, name string, v double",
    )


class TestMergeUpsert:
    def test_replaces_matched_inserts_unmatched(self, spark):
        updates = spark.createDataFrame(
            [(2, "B", 22.0), (4, "d", 40.0)], "id long, name string, v double"
        )
        out = {r["id"]: (r["name"], r["v"])
               for r in merge_upsert(_target(spark), updates, ["id"]).collect()}
        assert out == {1: ("a", 10.0), 2: ("B", 22.0), 3: ("c", 30.0), 4: ("d", 40.0)}

    def test_order_col_keeps_latest_duplicate_update(self, spark):
        updates = spark.createDataFrame(
            [(2, "old", 21.0), (2, "new", 22.0)], "id long, name string, v double"
        )
        out = merge_upsert(_target(spark), updates, ["id"], order_col="v").collect()
        row = next(r for r in out if r["id"] == 2)
        assert (row["name"], row["v"]) == ("new", 22.0)
        assert len(out) == 3

    def test_empty_updates_is_identity(self, spark):
        updates = spark.createDataFrame([], "id long, name string, v double")
        out = merge_upsert(_target(spark), updates, ["id"]).collect()
        assert sorted(r["id"] for r in out) == [1, 2, 3]


class TestUpsertTable:
    def test_on_disk_roundtrip(self, spark, tmp_path):
        path = str(tmp_path / "tbl")
        _target(spark).write.parquet(path)
        updates = spark.createDataFrame(
            [(3, "C", 33.0), (5, "e", 50.0)], "id long, name string, v double"
        )
        n = upsert_table(spark, path, updates, ["id"])
        assert n == 4
        back = {r["id"]: r["v"] for r in spark.read.parquet(path).collect()}
        assert back == {1: 10.0, 2: 20.0, 3: 33.0, 5: 50.0}

    def test_stale_retired_dir_fails_fast(self, spark, tmp_path):
        path = str(tmp_path / "tbl")
        _target(spark).write.parquet(path)
        (tmp_path / "tbl__retired").mkdir()
        updates = spark.createDataFrame([(9, "z", 9.0)], "id long, name string, v double")
        with pytest.raises(RuntimeError, match="stale"):
            upsert_table(spark, path, updates, ["id"])


class TestIdempotentSink:
    def test_replayed_batch_does_not_duplicate(self, spark, tmp_path):
        from etl_pipelines_spark.streaming.jobs import idempotent_append_sink

        out = str(tmp_path / "sink")
        sink = idempotent_append_sink(out, ["k"], "ts")
        b0 = spark.createDataFrame([(1, 10), (2, 20)], "k long, ts long")
        b1 = spark.createDataFrame([(3, 30)], "k long, ts long")
        sink(b0, 0)
        sink(b1, 1)
        # crash-replay of batch 1: same id, same (or re-deduped) content
        sink(b1, 1)
        got = spark.read.parquet(out)
        assert got.count() == 3
        assert sorted(r["k"] for r in got.collect()) == [1, 2, 3]
        # batch_id is a readable partition column = free high-water mark
        assert got.agg(F.max("batch_id")).first()[0] == 1

    def test_within_batch_dupes_keep_latest(self, spark, tmp_path):
        from etl_pipelines_spark.streaming.jobs import idempotent_append_sink

        out = str(tmp_path / "sink")
        sink = idempotent_append_sink(out, ["k"], "ts")
        sink(spark.createDataFrame([(1, 10), (1, 99)], "k long, ts long"), 0)
        rows = spark.read.parquet(out).collect()
        assert len(rows) == 1 and rows[0]["ts"] == 99


class TestUpsertPreservesPartitioning:
    def test_partition_layout_survives_merge(self, spark, tmp_path):
        import os

        path = str(tmp_path / "parts")
        spark.createDataFrame(
            [(1, "2024-01-01", 1.0), (2, "2024-01-02", 2.0)],
            "id long, date string, v double",
        ).write.partitionBy("date").parquet(path)
        assert any(d.startswith("date=") for d in os.listdir(path))
        updates = spark.createDataFrame(
            [(2, "2024-01-02", 22.0), (3, "2024-01-03", 3.0)],
            "id long, date string, v double",
        )
        from etl_pipelines_spark.operators.merge import upsert_table

        n = upsert_table(spark, path, updates, ["id"], partition_cols=("date",))
        assert n == 3
        # the on-disk layout must still be date-partitioned: a flat
        # rewrite would silently destroy partition pruning downstream
        dirs = sorted(d for d in os.listdir(path) if d.startswith("date="))
        assert dirs == ["date=2024-01-01", "date=2024-01-02", "date=2024-01-03"]
        got = {r["id"]: r["v"] for r in spark.read.parquet(path).collect()}
        assert got == {1: 1.0, 2: 22.0, 3: 3.0}


class TestTableDiff:
    def test_table_digest_order_and_partition_independent(self, spark):
        from etl_pipelines_spark.operators.tablediff import table_digest

        df = spark.range(500).selectExpr(
            "id", "CAST(id % 7 AS STRING) AS s", "id * 2 AS v"
        )
        base = table_digest(df).first()
        shuffled = table_digest(df.orderBy(F.rand(seed=3)).repartition(7)).first()
        assert (base["n_rows"], base["digest"]) == (
            shuffled["n_rows"],
            shuffled["digest"],
        )
        # any single-row change moves the digest
        mutated = table_digest(
            df.withColumn("v", F.when(F.col("id") == 123, 999).otherwise(F.col("v")))
        ).first()
        assert mutated["digest"] != base["digest"]
        assert mutated["n_rows"] == base["n_rows"]

    def test_digest_distinguishes_null_from_sentinel_lookalikes(self, spark):
        from etl_pipelines_spark.operators.tablediff import table_digest

        a = spark.createDataFrame([(1, None)], "id long, s string")
        b = spark.createDataFrame([(1, "")], "id long, s string")
        c = spark.createDataFrame([(1, "None")], "id long, s string")
        digs = {table_digest(x).first()["digest"] for x in (a, b, c)}
        assert len(digs) == 3

    def test_snapshot_diff_three_arms_and_quiet_on_identical(self, spark):
        from etl_pipelines_spark.operators.tablediff import snapshot_diff

        old = spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "id long, s string, v long"
        )
        new = spark.createDataFrame(
            [(1, "a", 10), (2, "b", 99), (4, "d", 40)], "id long, s string, v long"
        )
        got = {r["id"]: r["status"] for r in snapshot_diff(old, new, ["id"]).collect()}
        assert got == {2: "changed", 3: "removed", 4: "added"}
        assert snapshot_diff(old, old, ["id"]).count() == 0


class TestTableDigestDelta:
    def test_delta_matches_full_recompute(self, spark):
        from etl_pipelines_spark.operators.tablediff import (
            table_digest,
            table_digest_delta,
        )

        base = spark.range(300).selectExpr("id", "CAST(id % 9 AS STRING) AS s")
        added = spark.range(300, 340).selectExpr("id", "CAST(id % 9 AS STRING) AS s")
        removed = base.filter("id % 50 = 0")
        after = base.exceptAll(removed).unionByName(added)

        maintained = table_digest_delta(
            table_digest(base), added=added, removed=removed
        ).first()
        recomputed = table_digest(after).first()
        assert (maintained["n_rows"], maintained["digest"]) == (
            recomputed["n_rows"],
            recomputed["digest"],
        )

    def test_delta_with_only_adds(self, spark):
        from etl_pipelines_spark.operators.tablediff import (
            table_digest,
            table_digest_delta,
        )

        base = spark.range(10).selectExpr("id", "'x' AS s")
        add = spark.range(10, 12).selectExpr("id", "'x' AS s")
        got = table_digest_delta(table_digest(base), added=add).first()
        want = table_digest(base.unionByName(add)).first()
        assert (got["n_rows"], got["digest"]) == (want["n_rows"], want["digest"])


class TestCdcExtract:
    def test_roundtrip_through_scd2_change_log(self, spark):
        """extract(old, new) replayed over old must reconstruct new —
        the CDC loop closes."""
        from etl_pipelines_spark.operators.tablediff import cdc_extract

        old = spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
            "id long, s string, v double",
        )
        new = spark.createDataFrame(
            [(1, "a", 10.0), (2, "B", 20.0), (4, "d", 40.0)],
            "id long, s string, v double",
        )
        log = cdc_extract(old, new, ["id"])
        got = {r["id"]: (r["op"], r["s"], r["v"]) for r in log.collect()}
        assert got == {
            2: ("update", "B", 20.0),
            3: ("delete", None, None),
            4: ("insert", "d", 40.0),
        }
        # replay: drop every logged key from old, re-add the non-delete
        # payloads -> must equal new
        upserts = log.filter("op <> 'delete'").select("id", "s", "v")
        replayed = (
            old.join(log.select("id"), "id", "left_anti").unionByName(upserts)
        )
        assert replayed.exceptAll(new).count() == 0
        assert new.exceptAll(replayed).count() == 0

    def test_identical_snapshots_empty_log(self, spark):
        from etl_pipelines_spark.operators.tablediff import cdc_extract

        df = spark.createDataFrame([(1, "x")], "id long, s string")
        assert cdc_extract(df, df, ["id"]).count() == 0


class TestBucketedDigest:
    def test_localizes_a_single_row_change(self, spark):
        from etl_pipelines_spark.operators.tablediff import bucketed_digest

        base = spark.range(2000).selectExpr("id", "CAST(id % 13 AS STRING) AS s")
        mutated = base.withColumn(
            "s", F.when(F.col("id") == 777, "CHANGED").otherwise(F.col("s"))
        )
        a = {r["bucket"]: (r["n_rows"], r["digest"])
             for r in bucketed_digest(base, ["id"], n_buckets=64).collect()}
        b = {r["bucket"]: (r["n_rows"], r["digest"])
             for r in bucketed_digest(mutated, ["id"], n_buckets=64).collect()}
        diff = [k for k in set(a) | set(b) if a.get(k) != b.get(k)]
        assert len(diff) == 1  # exactly one bucket flags
        # and the row counts in that bucket agree (a change, not churn)
        assert a[diff[0]][0] == b[diff[0]][0]

    def test_bucket_sums_reconstruct_table_digest(self, spark):
        from etl_pipelines_spark.operators.tablediff import (
            bucketed_digest,
            table_digest,
        )

        df = spark.range(500).selectExpr("id", "CAST(id % 7 AS STRING) AS s")
        whole = table_digest(df).first()
        parts = bucketed_digest(df, ["id"]).agg(
            F.sum("n_rows").cast("long").alias("n_rows"),
            F.sum("digest").cast("decimal(38,0)").alias("digest"),
        ).first()
        assert (whole["n_rows"], whole["digest"]) == (
            parts["n_rows"],
            parts["digest"],
        )
