#!/usr/bin/env python
"""Interleaved Spark-vs-oracle ratio measurement — the noise-robust
form of the BASELINE 2x gate.

The host shows severe cross-session co-tenant variance (round-7
verdict: 2x swings between sessions minutes apart; round-8 measured a
7x swing on one entry). Running bench.py and bench_oracle.py as two
separate sessions therefore compares two different weather systems.
This tool alternates Spark and DuckDB runs PER ENTRY inside one
session, so both sides of every ratio see the same co-tenant weather:

    python tools/bench_ratio.py                     # @ $SPARK_GRAFT_SF_DIR
    python tools/bench_ratio.py --out RATIO_sf0.1.json

Protocol per driver entry: alternate (spark, oracle) pairs; keep
pairing while EITHER side improved >20% on its best (each side pays
its own codegen/JIT warmup), min 2 / max 6 pairs; report min of each
side and the per-entry ratio. The oracle side runs the entry's
committed combo oracle (the UNION ALL of its members — identical work
to the member-sum denominator tools/ratio_table.py charges).

The catalog-level headline is sum(spark mins) / sum(oracle mins) —
the same definition as BENCH/ORACLE artifact division, but with both
numerator and denominator sampled from interleaved instants.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_DRIVER_MEMORY", "12g")

import duckdb  # noqa: E402

from etl_pipelines_spark.queries import DRIVER_QUERIES  # noqa: E402
from etl_pipelines_spark.session import get_spark  # noqa: E402
from etl_pipelines_spark.sources.registry import TABLES  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
MIN_PAIRS, MAX_PAIRS = 2, 6


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None, help="also write the JSON record here")
    ap.add_argument("entries", nargs="*", help="entry-name prefixes (default: all)")
    args = ap.parse_args()

    spark = get_spark("bench_ratio")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.environ.get('SPARK_GRAFT_CPUS', '32')}")
    for tbl in TABLES:
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM '{SF_DIR}/{tbl}.parquet'"
        )

    # warm both engines (JVM codegen + python workers; duckdb IO cache)
    spark.range(1000).selectExpr("sum(id)").collect()
    import pandas as pd  # noqa: F401
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _warm(s):
        return s

    spark.range(10000).repartition(
        int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ).select(_warm("id")).write.format("noop").mode("overwrite").save()
    con.execute("SELECT count(*) FROM lineitem").fetchall()

    rows: dict[str, dict] = {}
    names = sorted(DRIVER_QUERIES)
    if args.entries:
        names = [n for n in names if any(n.startswith(p) for p in args.entries)]
    for name in names:
        spec = DRIVER_QUERIES[name]
        if not spec.oracle:
            continue
        s_runs: list[float] = []
        o_runs: list[float] = []
        while len(s_runs) < MAX_PAIRS:
            t0 = time.time()
            spec.spark_fn(spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            s_runs.append(time.time() - t0)
            spark.catalog.clearCache()
            t0 = time.time()
            con.execute(spec.oracle).fetchall()
            o_runs.append(time.time() - t0)
            if len(s_runs) < MIN_PAIRS:
                continue
            s_warm = s_runs[-1] < 0.8 * min(s_runs[:-1])
            o_warm = o_runs[-1] < 0.8 * min(o_runs[:-1])
            if not (s_warm or o_warm):
                break
        key = name.split("_")[0]
        # ratio from the ROUNDED stored fields so every number in the
        # record is recomputable from the record itself (round-8
        # advice: unrounded-numerator ratios were irreproducible on
        # millisecond oracles)
        s_min, o_min = round(min(s_runs), 3), round(min(o_runs), 3)
        rows[key] = {
            "spark_sec": s_min,
            "oracle_sec": o_min,
            "ratio": round(s_min / max(o_min, 1e-9), 2),
            "spark_runs": [round(r, 2) for r in s_runs],
            "oracle_runs": [round(r, 2) for r in o_runs],
        }
        print(
            f"{key}: spark {rows[key]['spark_sec']} vs oracle "
            f"{rows[key]['oracle_sec']} = {rows[key]['ratio']}x",
            file=sys.stderr,
        )

    spark_total = round(sum(r["spark_sec"] for r in rows.values()), 3)
    oracle_total = round(sum(r["oracle_sec"] for r in rows.values()), 3)
    n_total = sum(1 for n in sorted(DRIVER_QUERIES) if DRIVER_QUERIES[n].oracle)
    # a filtered run is a DIFFERENT metric: a subset sum is not a
    # catalog ratio (round-8 advice — RATIO_sf1skew.json's 7-entry
    # filtered run was indistinguishable from a full-catalog record)
    subset = bool(args.entries) and len(rows) < n_total
    record = {
        "metric": (
            "subset_vs_oracle_interleaved"
            if subset
            else "catalog_vs_oracle_interleaved"
        ),
        "value": round(spark_total / max(oracle_total, 1e-9), 3),
        "unit": "ratio",
        "spark_total_sec": spark_total,
        "oracle_total_sec": oracle_total,
        "entry_filter": sorted(args.entries) if args.entries else None,
        "n_entries": len(rows),
        "n_catalog_entries": n_total,
        "entries": rows,
        "corpus": os.path.basename(SF_DIR.rstrip("/")),
        "protocol": (
            "per-entry interleaved spark/duckdb pairs, adaptive 2-6, min "
            "each side; oracle side runs the entry's combo oracle (UNION "
            "ALL of members)"
        ),
    }
    line = json.dumps(record)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
