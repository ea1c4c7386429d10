#!/usr/bin/env python
"""One-off A/B for the q52 term-mining suite's shared words frame:
lazy vs lazy-persist vs eager-persist, one session, noop sink.

    SPARK_GRAFT_SF_DIR=testdata_scaled/sf1 python tools/profile_q52.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_DRIVER_MEMORY", "12g")

from etl_pipelines_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = 2

spark = get_spark("profile_q52")
spark.sparkContext.setLogLevel("ERROR")

from pyspark.sql import functions as F  # noqa: E402

from etl_pipelines_spark.queries.llmops import (  # noqa: E402
    _bigram_collocations,
    _bm25_retrieval,
    _tfidf_top_terms,
)
from etl_pipelines_spark.sources.registry import load_table  # noqa: E402

spark.range(1000).selectExpr("sum(id)").collect()


def build(mode):
    docs = load_table(spark, SF, "documents")
    words = docs.repartition("doc_id").select(
        "doc_id", "lang", F.split("text", " ").alias("_w")
    )
    if mode in ("persist", "eager"):
        words = words.persist()
        if mode == "eager":
            words.count()
    parts = [
        _tfidf_top_terms(None, words=words).select(
            F.lit("tfidf").alias("part"), "doc_id"
        ),
        _bigram_collocations(None, words=words).select(
            F.lit("colloc").alias("part"), F.lit(None).cast("bigint").alias("doc_id")
        ),
        _bm25_retrieval(None, words=words).select(
            F.lit("bm25").alias("part"), "doc_id"
        ),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


for mode in ("lazy", "persist", "eager", "lazy", "eager"):
    best = float("inf")
    for _ in range(RUNS):
        spark.catalog.clearCache()
        t0 = time.time()
        build(mode).write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    print(f"q52 suite words={mode:8s} {best:7.2f}s", flush=True)
