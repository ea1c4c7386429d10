"""External-source federation boundary (SURVEY.md §2.1 S7/S8/S9):
registration, scan semantics, outbound snapshot push."""

import os

import pytest

from etl_pipelines_spark.sources.federation import (
    external_scan,
    parquet_snapshot_source,
    push_snapshot,
    register_external_source,
    registered_sources,
)

SF = "/root/testdata/sf0.001"


class TestFederation:
    def test_unknown_source_raises_with_inventory(self, spark):
        register_external_source(
            "wh.known", parquet_snapshot_source(os.path.join(SF, "region.parquet"))
        )
        with pytest.raises(KeyError, match="wh.known"):
            external_scan(spark, "wh.missing")

    def test_reregistering_replaces(self, spark):
        register_external_source(
            "wh.swap", parquet_snapshot_source(os.path.join(SF, "region.parquet"))
        )
        assert external_scan(spark, "wh.swap").count() == 5
        register_external_source(
            "wh.swap", parquet_snapshot_source(os.path.join(SF, "nation.parquet"))
        )
        assert external_scan(spark, "wh.swap").count() == 25
        assert "wh.swap" in registered_sources()

    def test_scan_applies_predicate_then_projection(self, spark):
        # predicate may reference columns the projection drops — the
        # reference's warehouse pulls filter on block_timestamp while
        # selecting transfer columns
        register_external_source(
            "wh.nation", parquet_snapshot_source(os.path.join(SF, "nation.parquet"))
        )
        df = external_scan(
            spark, "wh.nation", columns=["n_name"], predicate="n_regionkey = 0"
        )
        assert df.columns == ["n_name"]
        assert df.count() == 5

    def test_push_snapshot_roundtrip_overwrites(self, spark, tmp_path):
        register_external_source(
            "wh.rt", parquet_snapshot_source(os.path.join(SF, "region.parquet"))
        )
        out = str(tmp_path / "state")
        full = external_scan(spark, "wh.rt")
        push_snapshot(full, out)
        assert spark.read.parquet(out).count() == 5
        # truncate+rebuild semantics: a second push fully replaces
        push_snapshot(full.limit(2), out)
        assert spark.read.parquet(out).count() == 2
