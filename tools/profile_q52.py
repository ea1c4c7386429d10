#!/usr/bin/env python
"""One-off A/B for the q52 term-mining suite's sharing shape at a
given corpus, one session, noop sink:

- words-shared (the round-10 shape): eager-persisted words frame,
  each member re-explodes + re-aggregates it.
- tf-shared (round 11): ONE (doc, token, tf) aggregate built off the
  words frame, eager-persisted, feeding tfidf AND bm25; colloc keeps
  the words frame.

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
RUNS = 3

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


def words_frame():
    docs = load_table(spark, SF, "documents")
    return docs.repartition("doc_id").select(
        "doc_id", "lang", F.split("text", " ").alias("_w")
    )


def union3(parts):
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def build_words_shared():
    words = words_frame().persist()
    words.count()
    return union3([
        _tfidf_top_terms(None, words=words).select(
            F.lit("tfidf").alias("part"), "doc_id"
        ),
        _bigram_collocations(None, words=words).select(
            F.lit("colloc").alias("part"), F.lit(None).cast("bigint").alias("doc_id")
        ),
        _bm25_retrieval(None, words=words).select(
            F.lit("bm25").alias("part"), "doc_id"
        ),
    ])


def build_tf_shared(words_eager=True):
    words = words_frame().persist()
    if words_eager:
        words.count()
    tf = (
        words.select("doc_id", F.explode("_w").alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
        .persist()
    )
    tf.count()
    n_docs = words.agg(F.count(F.lit(1)).alias("n_docs"))
    return union3([
        _tfidf_top_terms(None, tf=tf, n_docs=n_docs).select(
            F.lit("tfidf").alias("part"), "doc_id"
        ),
        _bigram_collocations(None, words=words).select(
            F.lit("colloc").alias("part"), F.lit(None).cast("bigint").alias("doc_id")
        ),
        _bm25_retrieval(None, tf=tf).select(
            F.lit("bm25").alias("part"), "doc_id"
        ),
    ])


def build_tf_only():
    """No words cache at all: colloc re-derives from the scan; tf
    eager-persisted off the raw scan."""
    docs = load_table(spark, SF, "documents")
    words = docs.repartition("doc_id").select(
        "doc_id", "lang", F.split("text", " ").alias("_w")
    )
    tf = (
        words.select("doc_id", F.explode("_w").alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
        .persist()
    )
    tf.count()
    n_docs = words.agg(F.count(F.lit(1)).alias("n_docs"))
    return union3([
        _tfidf_top_terms(None, tf=tf, n_docs=n_docs).select(
            F.lit("tfidf").alias("part"), "doc_id"
        ),
        _bigram_collocations(None, words=words).select(
            F.lit("colloc").alias("part"), F.lit(None).cast("bigint").alias("doc_id")
        ),
        _bm25_retrieval(None, tf=tf).select(
            F.lit("bm25").alias("part"), "doc_id"
        ),
    ])


def build_tf_exchange():
    """Round-11 candidate: ONE lazy tf subtree ending in an explicit
    (doc_id, token) repartition — the three members reference the same
    DataFrame, so the physical plan carries ONE Exchange and two
    ReusedExchange nodes (no persist barrier, no lazy-cache race).
    colloc derives its unigram counts and total from tf (sum of tf ==
    token count, identically); only the bigram pass still reads the
    words cache."""
    words = words_frame().persist()
    words.count()
    toks = words.select("doc_id", F.explode("_w").alias("token"))
    tf = (
        toks.groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
        .repartition("doc_id")
    )
    n_docs = words.agg(F.count(F.lit(1)).alias("n_docs"))

    # colloc with tf-derived unigrams, inline (library takes tf= only
    # if this measures well)
    from etl_pipelines_spark.queries.llmops import COLLOC_FLOOR

    w2 = words.select("doc_id", F.col("_w").alias("w"))
    bigram = F.expr(
        "transform(sequence(0, size(w) - 2),"
        " i -> concat(get(w, i), ' ', get(w, i + 1)))"
    )
    bi = (
        w2.filter(F.size("w") >= 2)
        .select(F.explode(bigram).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("c_xy"))
        .filter(F.col("c_xy") >= COLLOC_FLOOR)
    )
    uni = tf.groupBy("token").agg(F.sum("tf").alias("c"))
    tot = tf.agg(F.sum("tf").alias("n"))
    parts = F.split("bigram", " ")
    bi = bi.withColumn("_x", parts[0]).withColumn("_y", parts[1])
    ua = uni.select(F.col("token").alias("_x"), F.col("c").alias("c_x"))
    ub = uni.select(F.col("token").alias("_y"), F.col("c").alias("c_y"))
    colloc = (
        bi.join(F.broadcast(ua), "_x")
        .join(F.broadcast(ub), "_y")
        .crossJoin(F.broadcast(tot))
        .select(
            "bigram", "c_xy", "c_x", "c_y",
            (
                (F.col("n") * F.col("c_xy")).cast("double")
                / (F.col("c_x") * F.col("c_y")).cast("double")
            ).alias("lift"),
        )
    )
    return union3([
        _tfidf_top_terms(None, tf=tf, n_docs=n_docs).select(
            F.lit("tfidf").alias("part"), "doc_id"
        ),
        colloc.select(
            F.lit("colloc").alias("part"), F.lit(None).cast("bigint").alias("doc_id")
        ),
        _bm25_retrieval(None, tf=tf).select(
            F.lit("bm25").alias("part"), "doc_id"
        ),
    ])


def build_words_shared_dfreq():
    """Round-11 shape: words-shared plus (a) ONE dfreq subtree passed
    to both tfidf and bm25 (vocab-sized broadcast, ReusedExchange) and
    (b) bm25's global rank window replaced by an order-identical
    orderBy().limit(10) (TakeOrdered instead of an exchange-to-one-
    partition of every scored doc)."""
    words = words_frame().persist()
    words.count()
    dfreq = (
        words.select(F.explode(F.array_distinct("_w")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    return union3([
        _tfidf_top_terms(None, words=words, dfreq=dfreq).select(
            F.lit("tfidf").alias("part"), "doc_id"
        ),
        _bigram_collocations(None, words=words).select(
            F.lit("colloc").alias("part"), F.lit(None).cast("bigint").alias("doc_id")
        ),
        _bm25_retrieval(None, words=words, dfreq=dfreq).select(
            F.lit("bm25").alias("part"), "doc_id"
        ),
    ])


VARIANTS = [
    ("words-shared (r10 shape)", build_words_shared),
    ("words-shared+dfreq+limit (r11)", build_words_shared_dfreq),
]

for label, build in VARIANTS * 2:
    best = float("inf")
    for _ in range(RUNS):
        spark.catalog.clearCache()
        t0 = time.time()
        build().write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    print(f"q52 suite {label:28s} {best:7.2f}s", flush=True)
