#!/usr/bin/env python
"""Decompose a driver combo entry's wall time into:

  fn      — spark_fn() call (plan construction + any eager persists)
  analyze — df.queryExecution analyzed+optimized+physical plan (driver)
  exec    — the noop-sink write (the measured action)

Usage:
    python tools/profile_suite.py q33 q51 [--rounds 3]

Interleaved across rounds so co-tenant weather can't poison a
comparison (the round-7/10 lesson).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_DRIVER_MEMORY", "12g")

from etl_pipelines_spark.queries import DRIVER_QUERIES  # noqa: E402
from etl_pipelines_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("prefixes", nargs="+")
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    spark = get_spark("profile_suite")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    import pandas as pd  # noqa: F401
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _warm(s):
        return s

    spark.range(10000).repartition(32).select(_warm("id")).write.format(
        "noop"
    ).mode("overwrite").save()

    names = [
        n
        for n in sorted(DRIVER_QUERIES)
        if any(n.startswith(p) for p in args.prefixes)
    ]
    for r in range(args.rounds):
        for name in names:
            spec = DRIVER_QUERIES[name]
            t0 = time.time()
            df = spec.spark_fn(spark, SF)
            t1 = time.time()
            # force full driver-side planning without execution
            _ = df._jdf.queryExecution().executedPlan()
            t2 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t3 = time.time()
            spark.catalog.clearCache()
            print(
                f"round{r} {name.split('_')[0]}: fn={t1-t0:6.2f} "
                f"analyze={t2-t1:6.2f} exec={t3-t2:6.2f} total={t3-t0:6.2f}",
                flush=True,
            )


if __name__ == "__main__":
    main()
