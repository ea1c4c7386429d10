#!/usr/bin/env python
"""Interleaved A/B: q82/q83/q84 encode->decode as TWO mapInPandas
stages (round-11 shape: payload crosses Python->JVM->Python between
them) vs ONE chained stage (round-12 `synthetic_media_features`).

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/ab_multimodal.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_DRIVER_MEMORY", "12g")

from etl_pipelines_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROUNDS = int(os.environ.get("AB_ROUNDS", "3"))

spark = get_spark("ab_multimodal")
spark.sparkContext.setLogLevel("ERROR")

from etl_pipelines_spark.llm.multimodal import (  # noqa: E402
    extract_audio_features,
    extract_image_features,
    extract_video_features,
    synthetic_media_features,
    synthetic_media_payloads,
)
from etl_pipelines_spark.queries.catalog import t  # noqa: E402

spark.range(1000).selectExpr("sum(id)").collect()
# pandas-UDF worker warmup
import pandas as pd  # noqa: F401, E402
from pyspark.sql.functions import pandas_udf  # noqa: E402


@pandas_udf("long")
def _warm(s):
    return s


spark.range(10000).repartition(32).select(_warm("id")).write.format("noop").mode(
    "overwrite"
).save()


def two_stage(kind):
    docs = t(spark, SF, "documents")
    payloads = synthetic_media_payloads(docs, kind)
    if kind == "image":
        return extract_image_features(payloads)
    if kind == "audio":
        return extract_audio_features(payloads)
    return extract_video_features(payloads, n_samples=2)


def one_stage(kind):
    return synthetic_media_features(
        t(spark, SF, "documents"), kind, n_samples=2
    )


VARIANTS = [("two-stage (r11)", two_stage), ("one-stage (r12)", one_stage)]
best: dict[tuple[str, str], float] = {}
for rnd in range(ROUNDS):
    for label, build in VARIANTS:
        for kind in ("image", "audio", "video"):
            spark.sparkContext.setJobDescription(f"{label}: {kind}")
            t0 = time.time()
            build(kind).write.format("noop").mode("overwrite").save()
            sec = time.time() - t0
            spark.catalog.clearCache()
            key = (label, kind)
            best[key] = min(best.get(key, float("inf")), sec)
            print(f"round {rnd} {label:18s} {kind:6s} {sec:6.2f}s", flush=True)

print("---- min over rounds ----")
for label, _ in VARIANTS:
    tot = sum(best[(label, k)] for k in ("image", "audio", "video"))
    print(
        f"{label:18s} total={tot:5.2f}s  "
        + "  ".join(f"{k}={best[(label, k)]:.2f}" for k in ("image", "audio", "video")),
        flush=True,
    )
