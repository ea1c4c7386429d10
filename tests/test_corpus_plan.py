"""End-to-end test of the corpus-preparation driver program."""

import os

import pytest

from etl_pipelines_spark.plans.corpus import prepare_corpus

SF = "/root/testdata/sf0.001"


class TestPrepareCorpus:
    @pytest.fixture(scope="class")
    def run(self, spark, tmp_path_factory):
        out = str(tmp_path_factory.mktemp("corpus") / "clean")
        report = prepare_corpus(spark, SF, out)
        return report, out

    def test_stages_only_shrink(self, run):
        report, _ = run
        assert list(report.stage_counts) == [
            "raw", "quality_gate", "exact_dedup", "near_dup_canonical",
            "boilerplate_removed", "sampled",
        ]
        assert report.monotone
        assert report.stage_counts["raw"] > 0
        assert report.out_rows > 0

    def test_output_partitioned_by_lang_no_dup_ids(self, run, spark):
        report, out = run
        assert any(d.startswith("lang=") for d in os.listdir(out))
        df = spark.read.parquet(out)
        assert df.count() == df.select("doc_id").distinct().count() == report.out_rows
        # every surviving text was reassembled from kept chunks only
        assert df.filter("n_kept > n_chunks").count() == 0

    def test_deterministic_rerun(self, run, spark, tmp_path_factory):
        report, _ = run
        out2 = str(tmp_path_factory.mktemp("corpus") / "clean2")
        report2 = prepare_corpus(spark, SF, out2)
        assert report2.stage_counts == report.stage_counts
