#!/usr/bin/env python
"""Dump the formatted physical plan for catalog queries.

    python tools/explain.py q01 q22      # prefixes, like check_parity
    python tools/explain.py              # whole catalog
    SPARK_GRAFT_SF_DIR=... to change the data (plans are size-dependent
    through AQE thresholds; default sf0.001 keeps this fast)

The plan-shape invariants worth protecting live in
tests/test_plan_audits.py; this tool is for eyeballing a query while
working on it.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_pipelines_spark.queries import QUERIES  # noqa: E402
from etl_pipelines_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    prefixes = sys.argv[1:]
    spark = get_spark("explain")
    spark.sparkContext.setLogLevel("ERROR")
    for name, spec in sorted(QUERIES.items()):
        if prefixes and not any(name.startswith(p) for p in prefixes):
            continue
        print(f"\n{'=' * 70}\n{name}\n{'=' * 70}")
        spec.spark_fn(spark, SF_DIR).explain("formatted")


if __name__ == "__main__":
    main()
