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


def test_incremental_exact_dedup_matches_full_rebuild(spark):
    """Two id-ordered batches through exact_dedup_incremental must keep
    exactly the docs the one-shot exact_dedup keeps."""
    from etl_pipelines_spark.llm.dedup import exact_dedup, exact_dedup_incremental
    from etl_pipelines_spark.sources.registry import load_table

    from pyspark.sql import functions as F

    docs = load_table(spark, SF, "documents")
    full = {r["doc_id"] for r in exact_dedup(docs).select("doc_id").collect()}

    b1 = docs.filter(F.col("doc_id") < 250)
    b2 = docs.filter(F.col("doc_id") >= 250)
    s1, state = exact_dedup_incremental(b1, None)
    s2, state = exact_dedup_incremental(b2, state)
    inc = {
        r["doc_id"]
        for batch in (s1, s2)
        for r in batch.select("doc_id").collect()
    }
    assert inc == full
    assert state.count() == len(full)
