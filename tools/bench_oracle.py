#!/usr/bin/env python
"""Time the DuckDB-oracle side of the catalog — the denominator of the
BASELINE 2x gate (BENCH within 2x of the oracle runtime at the same
scale factor).

    python tools/bench_oracle.py                       # @ $SPARK_GRAFT_SF_DIR
    python tools/bench_oracle.py /path/to/bench.json   # also print per-query
                                                       # spark/oracle ratios

Prints one JSON line shaped like bench.py's. Do not run concurrently
with bench.py — they compete for the same cores and contaminate both.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from etl_pipelines_spark.queries import QUERIES  # noqa: E402
from etl_pipelines_spark.sources.registry import TABLES  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_RUNS = 2


def main() -> None:
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.environ.get('SPARK_GRAFT_CPUS', '32')}")
    for tbl in TABLES:
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM '{SF_DIR}/{tbl}.parquet'"
        )
    timings: dict[str, float] = {}
    for name, spec in sorted(QUERIES.items()):
        if not spec.oracle:
            continue
        best = float("inf")
        for _ in range(N_RUNS):
            t0 = time.time()
            con.execute(spec.oracle).fetchall()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "oracle_total_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
            }
        )
    )
    if len(sys.argv) > 1:
        spark_q = json.loads(open(sys.argv[1]).read())["queries"]
        ratios = sorted(
            (
                (round(spark_q[k] / max(v, 1e-9), 2), k, spark_q[k], v)
                for k, v in timings.items()
                if k in spark_q
            ),
            reverse=True,
        )
        for r, k, s, d in ratios:
            flag = "  <-- over 2x" if r > 2 and s > 0.5 else ""
            print(f"{k:38s} spark={s:7.3f} oracle={d:7.3f} ratio={r:6.1f}{flag}", file=sys.stderr)


if __name__ == "__main__":
    main()
