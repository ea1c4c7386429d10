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

# scale harness opts into the big-host heap (library default is 8g)
os.environ.setdefault("SPARK_DRIVER_MEMORY", "12g")

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
        print(
            "per-entry ratios: python tools/ratio_table.py "
            f"{sys.argv[1]} <this output> (combo entries are charged "
            "the SUM of their members' oracle timings)",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
