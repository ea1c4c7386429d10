#!/usr/bin/env python
"""Diagnostic: run the one-day incremental refresh shape (bootstrap a
standing warehouse through the penultimate ship day, then land the
final day) at a given corpus and print the stage_sec decomposition +
Spark job count — the evidence for cutting the increment's fixed
per-run action floor.

    python tools/probe_refresh_stages.py --sf testdata_scaled/sf1
    python tools/probe_refresh_stages.py --sf testdata_scaled/sf1 --unscoped
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_DRIVER_MEMORY", "12g")

from etl_pipelines_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="testdata_scaled/sf1")
    ap.add_argument("--unscoped", action="store_true",
                    help="no since bound (standing history back to 1992)")
    ap.add_argument("--rebuild", action="store_true",
                    help="also time the full rebuild for the vs_rebuild ratio")
    args = ap.parse_args()
    spark = get_spark("probe-refresh")
    spark.sparkContext.setLogLevel("ERROR")

    from etl_pipelines_spark.plans.refresh import (
        refresh_warehouse,
        refresh_warehouse_incremental,
    )

    since = None if args.unscoped else "1998-01-01"
    out = tempfile.mkdtemp(prefix="probe_out_")
    state = tempfile.mkdtemp(prefix="probe_state_")

    t0 = time.time()
    boot = refresh_warehouse_incremental(
        spark, args.sf, out, state, since=since, until="1998-11-30"
    )
    boot_sec = round(time.time() - t0, 2)

    t0 = time.time()
    rep = refresh_warehouse_incremental(
        spark, args.sf, out, state, since=since, until="1998-12-01"
    )
    inc_sec = round(time.time() - t0, 2)

    row = {
        "corpus": args.sf,
        "scoped": not args.unscoped,
        "bootstrap_sec": boot_sec,
        "incremental_day_sec": inc_sec,
        "affected_coins": rep.affected_coins,
        "ok": rep.passed,
        "guard_mode": rep.guard_mode,
        "stage_sec": rep.stage_sec,
    }
    # interim print: a rebuild-phase crash must not lose the increment
    print(json.dumps(row), flush=True)
    if args.rebuild:
        rb_out = tempfile.mkdtemp(prefix="probe_rb_")
        t0 = time.time()
        refresh_warehouse(spark, args.sf, rb_out, since=since, until="1998-12-01")
        row["rebuild_sec"] = round(time.time() - t0, 2)
        row["vs_rebuild"] = round(row["rebuild_sec"] / inc_sec, 2)
        shutil.rmtree(rb_out, ignore_errors=True)
    shutil.rmtree(out, ignore_errors=True)
    shutil.rmtree(state, ignore_errors=True)
    print(json.dumps(row))


if __name__ == "__main__":
    main()
