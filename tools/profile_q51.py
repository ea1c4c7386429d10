#!/usr/bin/env python
"""One-off member-level profiler for the q51 sketch suite at a given
corpus: times each member frame (noop sink) under several sharing /
salting configurations in ONE session, so the choices in
queries/combos.py `_q51_direct_grain` are measured, not guessed.

    SPARK_GRAFT_SF_DIR=testdata_scaled/sf1 python tools/profile_q51.py
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


def sink(df):
    df.write.format("noop").mode("overwrite").save()


def timed(label, build):
    best = float("inf")
    for _ in range(RUNS):
        from etl_pipelines_spark.queries import combos

        for slot, cached in list(combos._SUITE_CACHE.items()):
            cached.unpersist()
            combos._SUITE_CACHE.pop(slot, None)
        spark.catalog.clearCache()
        t0 = time.time()
        sink(build())
        best = min(best, time.time() - t0)
    print(f"{label:55s} {best:7.2f}s", flush=True)
    return best


spark = get_spark("profile_q51")
spark.sparkContext.setLogLevel("ERROR")

from pyspark.sql import functions as F  # noqa: E402

from etl_pipelines_spark.operators.sketches import (  # noqa: E402
    kmv_distinct,
    md5_distinct_stream,
    portable_hll_estimate,
    portable_hll_registers,
    quantile_sketch_build,
    quantile_sketch_estimate,
)
from etl_pipelines_spark.queries.catalog import t  # noqa: E402
from etl_pipelines_spark.queries.timeseries import _KMV_K, transfers_from  # noqa: E402

spark.range(1000).selectExpr("sum(id)").collect()


def x_frame():
    return transfers_from(
        t(spark, SF, "lineitem"), t(spark, SF, "orders"), shuffle_on=None
    )


# --- member-level, everything lazy (no sharing) ---------------------
timed("x alone (daily-net feed)", x_frame)
timed(
    "kmv alone, cascadeless (salt 0)",
    lambda: kmv_distinct(x_frame(), ["coin_id"], "wallet_address", k=_KMV_K),
)
timed(
    "kmv alone, prefilter G=32",
    lambda: kmv_distinct(
        x_frame(), ["coin_id"], "wallet_address", k=_KMV_K, salt_groups=32
    ),
)
timed(
    "hll alone",
    lambda: portable_hll_estimate(
        portable_hll_registers(x_frame(), ["coin_id"], "wallet_address"),
        ["coin_id"],
    ),
)
timed(
    "qsk alone, salt 0",
    lambda: quantile_sketch_estimate(
        quantile_sketch_build(
            x_frame(), ["coin_id"], "net_transfers",
            ["coin_id", "wallet_address", "date"],
        ),
        ["coin_id"], qs=(0.25, 0.5, 0.9),
    ),
)
timed(
    "qsk alone, prefilter G=64",
    lambda: quantile_sketch_estimate(
        quantile_sketch_build(
            x_frame(), ["coin_id"], "net_transfers",
            ["coin_id", "wallet_address", "date"], salt_groups=64,
        ),
        ["coin_id"], qs=(0.25, 0.5, 0.9),
    ),
)


# --- suite variants --------------------------------------------------
def suite(persist_x, eager, kmv_salt, qsk_salt, dh_persist=True, dh_eager=False):
    def build():
        x = x_frame()
        if persist_x:
            x = x.persist()
            if eager:
                x.count()
        dh = md5_distinct_stream(x, ["coin_id"], "wallet_address")
        if dh_persist:
            dh = dh.persist()
            if dh_eager:
                dh.count()
        parts = [
            kmv_distinct(
                x, ["coin_id"], "wallet_address", k=_KMV_K,
                salt_groups=kmv_salt, md5_stream=dh,
            ).select(F.lit("kmv").alias("part"), "coin_id"),
            portable_hll_estimate(
                portable_hll_registers(
                    x, ["coin_id"], "wallet_address", md5_stream=dh
                ),
                ["coin_id"],
            ).select(F.lit("hll").alias("part"), "coin_id"),
            quantile_sketch_estimate(
                quantile_sketch_build(
                    x, ["coin_id"], "net_transfers",
                    ["coin_id", "wallet_address", "date"],
                    salt_groups=qsk_salt,
                ),
                ["coin_id"], qs=(0.25, 0.5, 0.9),
            ).select(F.lit("qsk").alias("part"), "coin_id"),
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    return build


timed("3-frame r9 shape: x lazy, dh lazy-persist, casc16/16",
      suite(False, False, 16, 16))
timed("3-frame: x lazy, dh lazy-persist, prefilter 32/64",
      suite(False, False, 32, 64))
timed("3-frame: x eager-persist, dh lazy-persist, pre 32/64",
      suite(True, True, 32, 64))
timed("3-frame: x lazy-persist, dh lazy-persist, pre 32/64",
      suite(True, False, 32, 64))
timed("3-frame: x lazy, dh EAGER-persist, pre 32/64",
      suite(False, False, 32, 64, dh_eager=True))
timed("3-frame: x lazy, dh lazy-persist, pre32 / qsk salt0",
      suite(False, False, 32, 0))
timed("3-frame: x lazy, dh lazy-persist, casc16 / qsk pre64",
      suite(False, False, 16, 64))
