#!/usr/bin/env python
"""Member-level + variant A/B profiler for the q51 sketch suite.

Round-11 form: the full FIVE-member suite (kmv, hll, qsk over the
transfers feed; bloom over customers; cmin over events) built exactly
like queries/combos.py `_q51_direct_grain`, parameterized by cache
discipline, with variants INTERLEAVED across rounds so co-tenant
drift (the round-7/10 2-7x weather) cannot poison a comparison the
way back-to-back variant blocks can.

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
ROUNDS = 3

spark = get_spark("profile_q51")
spark.sparkContext.setLogLevel("ERROR")

from pyspark.sql import functions as F  # noqa: E402

from etl_pipelines_spark.operators.sketches import (  # noqa: E402
    fused_kmv_hll_state,
    kmv_distinct,
    kmv_from_fused_state,
    md5_distinct_stream,
    portable_hll_estimate,
    portable_hll_registers,
    quantile_sketch_build,
    quantile_sketch_estimate,
)
from etl_pipelines_spark.queries.catalog import QUERIES, t  # noqa: E402
from etl_pipelines_spark.queries.timeseries import _KMV_K, transfers_from  # noqa: E402

spark.range(1000).selectExpr("sum(id)").collect()


def x_frame():
    return transfers_from(
        t(spark, SF, "lineitem"), t(spark, SF, "orders"), shuffle_on=None
    )


def suite(x_mode, dh_mode, kmv_salt=32, qsk_salt=16, qsk_mode="cascade"):
    """Full 5-member suite; x_mode/dh_mode in {lazy, persist, eager}.
    dh_mode in {persist, eager} caches the round-11 md5 stream;
    "fused"/"fused_eager" cache the round-12 fused kmv+hll state."""

    def build():
        x = x_frame()
        if x_mode != "lazy":
            x = x.persist()
            if x_mode == "eager":
                x.count()
        if dh_mode.startswith("fused"):
            state = fused_kmv_hll_state(
                md5_distinct_stream(x, ["coin_id"], "wallet_address"),
                ["coin_id"], k=_KMV_K,
            )
            if dh_mode != "fused_noper":
                state = state.persist()
            if dh_mode == "fused_eager":
                state.count()
            elif dh_mode == "fused_onebarrier":
                # x persisted LAZY; the single state.count() barrier
                # fills BOTH caches (state reads x through its persist)
                state.count()
            kmv_part = kmv_from_fused_state(state, ["coin_id"], k=_KMV_K)
            hll_part = portable_hll_estimate(
                state.select("coin_id", "reg", "rho"), ["coin_id"]
            )
        else:
            dh = md5_distinct_stream(x, ["coin_id"], "wallet_address")
            if dh_mode != "lazy":
                dh = dh.persist()
                if dh_mode == "eager":
                    dh.count()
            kmv_part = kmv_distinct(
                x, ["coin_id"], "wallet_address", k=_KMV_K,
                salt_groups=kmv_salt, md5_stream=dh,
            )
            hll_part = portable_hll_estimate(
                portable_hll_registers(
                    x, ["coin_id"], "wallet_address", md5_stream=dh
                ),
                ["coin_id"],
            )
        parts = [
            kmv_part.select(F.lit("kmv").alias("part"), "coin_id"),
            hll_part.select(F.lit("hll").alias("part"), "coin_id"),
            quantile_sketch_estimate(
                quantile_sketch_build(
                    x, ["coin_id"], "net_transfers",
                    ["coin_id", "wallet_address", "date"],
                    salt_groups=qsk_salt, salt_mode=qsk_mode,
                ),
                ["coin_id"], qs=(0.25, 0.5, 0.9),
            ).select(F.lit("qsk").alias("part"), "coin_id"),
            QUERIES["q85_bloom_filter"].spark_fn(spark, SF).select(
                F.lit("bloom").alias("part"), F.col("cust_id").alias("coin_id")
            ),
            QUERIES["q90_countmin_frequency"].spark_fn(spark, SF).select(
                F.lit("cmin").alias("part"), F.lit(0).cast("long").alias("coin_id")
            ),
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    return build


VARIANTS = [
    ("V0 r11: x eager, dh lazy-persist", suite("eager", "persist")),
    ("V1 r12: x eager, fused state lazy-persist", suite("eager", "fused")),
    ("V2 r12: x eager, fused state eager", suite("eager", "fused_eager")),
    ("V3 r12: x lazy, fused state eager (one barrier)",
     suite("persist", "fused_onebarrier")),
    ("V4 r12: x eager, fused state UNPERSISTED (exchange reuse)",
     suite("eager", "fused_noper")),
]

best = {label: float("inf") for label, _ in VARIANTS}
for rnd in range(ROUNDS):
    for label, build in VARIANTS:
        spark.catalog.clearCache()
        t0 = time.time()
        build().write.format("noop").mode("overwrite").save()
        sec = time.time() - t0
        best[label] = min(best[label], sec)
        print(f"round {rnd} {label:45s} {sec:7.2f}s", flush=True)

print("---- min over rounds ----")
for label, _ in VARIANTS:
    print(f"{label:45s} {best[label]:7.2f}s", flush=True)
