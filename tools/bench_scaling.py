#!/usr/bin/env python
"""Scaling-curve measurement: flagship queries across sf0.001 / 0.01 /
0.1 (100x data range). Near-linear growth (slope ~= data ratio on the
data-dominated end) is the evidence that plans are shuffle- and
scan-bounded rather than floor- or skew-bounded; a super-linear jump
flags a plan that won't survive the next 100x.

    python tools/bench_scaling.py [q22 q75 ...]

Prints one line per (query, sf): wall seconds, min of 2 runs.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# scale harness opts into the big-host heap (library default is 8g)
os.environ.setdefault("SPARK_DRIVER_MEMORY", "12g")

from etl_pipelines_spark.queries import DRIVER_QUERIES  # noqa: E402
from etl_pipelines_spark.session import get_spark  # noqa: E402

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]
# the generated 10x corpus (tools/gen_scaled.py) extends the range to
# 1000x when present
_SF1 = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "testdata_scaled", "sf1")
if os.path.isdir(_SF1):
    SFS = SFS + [_SF1]
DEFAULT = ["q22", "q29", "q33", "q64", "q75"]


def main() -> None:
    prefixes = sys.argv[1:] or DEFAULT
    spark = get_spark("bench-scaling")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    for name, spec in sorted(DRIVER_QUERIES.items()):
        if not any(name.startswith(p) for p in prefixes):
            continue
        times = []
        for sf in SFS:
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                spec.spark_fn(spark, sf).write.format("noop").mode("overwrite").save()
                best = min(best, time.time() - t0)
                spark.catalog.clearCache()
            times.append(best)
            print(f"{name} {os.path.basename(sf)}: {best:.2f}s", flush=True)
        # growth factors across each 10x step
        steps = ", ".join(
            f"{times[i + 1] / max(times[i], 1e-9):.1f}x"
            for i in range(len(times) - 1)
        )
        print(f"{name} growth per 10x step: {steps}", flush=True)


if __name__ == "__main__":
    main()
