#!/usr/bin/env python
"""Interleaved A/B of AQE small-partition coalescing settings over a
query subset (round-12 verdict item 4: the 32-core anti-scaling tail).

The hypothesis under test: sub-second entries pay a task floor on
tiny post-shuffle stages because AQE's parallelismFirst coalescing
only shrinks partitions below `minPartitionSize` (default 1m), so a
40 MB shuffle still fans out 32 tiny tasks on local[32]. Raising
minPartitionSize (a cluster-legitimate floor — partitions should
never be single-digit-MB at any scale, guide §2.2) collapses tiny
stages regardless of core count while leaving real data volumes at
full parallelism: target = max(total/parallelism, minPartitionSize).

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/ab_aqe.py q72 q73 q56
    SPARK_GRAFT_CPUS=8 python tools/ab_aqe.py ...

Variants interleave across rounds so co-tenant weather cannot poison
the comparison (the round-10/11 lesson).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_DRIVER_MEMORY", "12g")

from etl_pipelines_spark.queries import DRIVER_QUERIES  # noqa: E402
from etl_pipelines_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROUNDS = int(os.environ.get("AB_ROUNDS", "3"))

MPS = "spark.sql.adaptive.coalescePartitions.minPartitionSize"
PF = "spark.sql.adaptive.coalescePartitions.parallelismFirst"
ADV = "spark.sql.adaptive.advisoryPartitionSizeInBytes"

VARIANTS = [
    ("base (mps=1m, pF=true)", {MPS: "1m", PF: "true"}),
    ("mps=4m", {MPS: "4m", PF: "true"}),
    ("mps=8m", {MPS: "8m", PF: "true"}),
    ("pF=false adv=64m", {MPS: "1m", PF: "false", ADV: "64m"}),
]

prefixes = sys.argv[1:] or ["q72", "q73", "q56", "q63", "q64", "q35"]
names = [
    n for n in sorted(DRIVER_QUERIES)
    if any(n.startswith(p) for p in prefixes)
]

spark = get_spark("ab_aqe")
spark.sparkContext.setLogLevel("ERROR")
spark.range(1000).selectExpr("sum(id)").collect()

best: dict[tuple[str, str], float] = {}
for rnd in range(ROUNDS):
    for label, conf in VARIANTS:
        for k, v in conf.items():
            spark.conf.set(k, v)
        for name in names:
            spark.sparkContext.setJobDescription(f"{label}: {name}")
            t0 = time.time()
            DRIVER_QUERIES[name].spark_fn(spark, SF).write.format("noop").mode(
                "overwrite"
            ).save()
            sec = time.time() - t0
            spark.catalog.clearCache()
            key = (label, name)
            best[key] = min(best.get(key, float("inf")), sec)
            print(f"round {rnd} {label:24s} {name:28s} {sec:6.2f}s", flush=True)
        # restore defaults between variants
        spark.conf.set(MPS, "1m")
        spark.conf.set(PF, "true")
        spark.conf.set(ADV, "64m")

print("---- min over rounds ----")
for label, _ in VARIANTS:
    tot = sum(best[(label, n)] for n in names)
    row = "  ".join(f"{n.split('_')[0]}={best[(label, n)]:.2f}" for n in names)
    print(f"{label:24s} total={tot:6.2f}s  {row}", flush=True)
