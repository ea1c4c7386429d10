#!/usr/bin/env python
"""Dump `.explain("formatted")` for catalog queries into plans/<round>/.

    python tools/dump_plans.py r11 before q33 q51      # -> plans/r11/q33_before.txt ...
    python tools/dump_plans.py r11 after q33

Captures the judge-checkable plan evidence for optimization rounds:
one file per query prefix, the formatted physical plan exactly as
Spark prints it (AdaptiveSparkPlan initial plan — final AQE shapes
live in the bench UI, not in explain output). Data dir via
SPARK_GRAFT_SF_DIR (default sf0.001: plan SHAPE is what's recorded;
AQE-threshold-dependent differences are noted in OPTIMIZATION_*.md
when they matter).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_pipelines_spark.queries import QUERIES  # noqa: E402
from etl_pipelines_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    rnd, tag, *prefixes = sys.argv[1:]
    outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", rnd)
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("dump_plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name, spec in sorted(QUERIES.items()):
        if prefixes and not any(name.startswith(p) for p in prefixes):
            continue
        buf = io.StringIO()
        with redirect_stdout(buf):
            spec.spark_fn(spark, SF_DIR).explain("formatted")
        short = name.split("_")[0]
        path = os.path.join(outdir, f"{short}_{tag}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} — explain('formatted') @ {SF_DIR}\n")
            f.write(buf.getvalue())
        print(f"wrote {path}")
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
