"""Unit tests for the round-2 text/dedup additions: repetition stats,
corpus-level chunk dedup, temperature mixture sampling."""

import hashlib

from pyspark.sql import functions as F

from etl_pipelines_spark.llm.dedup import chunk_dedup, doc_chunks
from etl_pipelines_spark.llm.mixing import temperature_sample
from etl_pipelines_spark.llm.text import repetition_stats


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestRepetitionStats:
    def test_counts_without_dedupe(self, spark):
        # 9 tokens -> 7 trigrams; "a b c" occurs 3x of 7
        out = repetition_stats(_docs(spark, [(1, "a b c a b c a b c")])).collect()[0]
        assert out.n_trigrams == 7
        assert out.top_trigram == "a b c"
        assert abs(out.top_trigram_share - 3 / 7) < 1e-12

    def test_tie_breaks_on_gram_desc(self, spark):
        # 4 tokens -> 2 distinct trigrams, 1 occurrence each; max gram wins
        out = repetition_stats(_docs(spark, [(1, "a b c d")])).collect()[0]
        assert out.n_trigrams == 2
        assert out.top_trigram == "b c d"

    def test_short_doc_single_gram(self, spark):
        out = repetition_stats(_docs(spark, [(1, "x y")])).collect()[0]
        assert out.n_trigrams == 1 and out.top_trigram == "x y"


CHUNK_A = "a1 a2 a3 a4 a5 a6 a7 a8"  # shared across docs 1 and 2
CHUNK_B = "b1 b2 b3 b4 b5 b6 b7 b8"
CHUNK_C = "c1 c2 c3 c4 c5 c6 c7 c8"
CHUNK_D = "d1 d2 d3 d4 d5 d6 d7 d8"


class TestChunkDedup:
    def test_cross_doc_chunks_dropped_in_order(self, spark):
        docs = _docs(
            spark,
            [
                (1, f"{CHUNK_B} {CHUNK_A}"),
                (2, f"{CHUNK_A} {CHUNK_C}"),
                (3, CHUNK_A),  # everything boilerplate
                (4, f"{CHUNK_D} {CHUNK_D}"),  # within-doc repeat survives
            ],
        )
        rows = {r.doc_id: r for r in chunk_dedup(docs).collect()}
        assert rows[1].n_chunks == 2 and rows[1].n_kept == 1
        assert rows[1].clean_text == CHUNK_B
        assert rows[2].clean_text == CHUNK_C
        assert rows[3].n_kept == 0 and rows[3].clean_text == ""
        assert rows[4].n_kept == 2 and rows[4].clean_text == f"{CHUNK_D} {CHUNK_D}"

    def test_partial_tail_chunk_and_ordinals(self, spark):
        ch = doc_chunks(_docs(spark, [(1, f"{CHUNK_B} tail1 tail2")])).collect()
        by_ord = {r.ord: r.chunk for r in ch}
        assert by_ord == {0: CHUNK_B, 1: "tail1 tail2"}


class TestTemperatureSample:
    def test_rates_and_deterministic_keep(self, spark):
        rows = [(i, "big") for i in range(4)] + [(100, "small")]
        df = spark.createDataFrame(rows, "doc_id long, lang string")
        out = {r.doc_id: r for r in temperature_sample(df, ["lang"]).collect()}
        # masses: floor(sqrt(4)*1e6)=2e6, floor(sqrt(1)*1e6)=1e6; budget
        # 0.5*5 docs; rates: big 2.5*(2/3)/4, small 2.5*(1/3)/1
        assert abs(out[0].sample_rate - 2.5 * (2 / 3) / 4) < 1e-12
        assert abs(out[100].sample_rate - 2.5 * (1 / 3) / 1) < 1e-12
        for doc_id, r in out.items():
            h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:12], 16)
            assert r.keep == (h / float(1 << 48) < r.sample_rate)

    def test_small_strata_cap_at_one(self, spark):
        # one giant stratum, one singleton: the singleton's allocation
        # exceeds its natural count -> rate capped at 1.0, always kept
        rows = [(i, "big") for i in range(100)] + [(1000, "rare")]
        df = spark.createDataFrame(rows, "doc_id long, lang string")
        out = {r.doc_id: r for r in temperature_sample(df, ["lang"]).collect()}
        assert out[1000].sample_rate == 1.0 and out[1000].keep
