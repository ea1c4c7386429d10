#!/usr/bin/env python
"""Benchmark harness: runs the query catalog at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric", "value", "unit", "queries", "sf"}.

Each query is forced through a noop sink so the full plan executes
(count() would let Catalyst prune every computed column).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# the bench harness opts into the big-host heap; the library default
# stays 8g for small hosts (session.py)
os.environ.setdefault("SPARK_DRIVER_MEMORY", "12g")

from etl_pipelines_spark.queries import DRIVER_QUERIES as QUERIES  # noqa: E402
from etl_pipelines_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def sf_label(path: str):
    """Numeric scale factor when the dir name is sfN.N; otherwise the
    basename itself (e.g. "sf1skew") — a -1.0 sentinel misled JSON
    consumers about the artifact's provenance. The `corpus` field in
    the output always carries the basename verbatim."""
    base = os.path.basename(path.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return base


def main() -> None:
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # JVM/codegen warmup on a trivial action (not counted)
    spark.range(1000).selectExpr("sum(id)").collect()
    # Python-worker/Arrow warmup so no single query pays the spawn of
    # local[N] pandas-UDF workers inside its measurement
    import pandas as pd  # noqa: F401
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _warm(s):
        return s

    spark.range(10000).repartition(int(os.environ.get("SPARK_GRAFT_CPUS", "32"))).select(
        _warm("id")
    ).write.format("noop").mode("overwrite").save()

    # min over adaptive runs: early runs pay per-query codegen + JVM
    # JIT compilation, which a long-running cluster amortizes to zero —
    # the min measures steady-state engine throughput and damps
    # co-tenant noise. Most queries converge in 2 runs; big fused plans
    # (q75) keep improving 2-4x for a couple more, so keep re-running
    # while the latest run still beats the best so far by >20%,
    # bounded at 6 runs (was 4: q75's fused five-stage plan was still
    # descending when the old cap stopped it — the cap should bind on
    # pathology, not before steady state; converged queries still stop
    # at 2).
    MIN_RUNS, MAX_RUNS = 2, 6
    timings: dict[str, float] = {}
    # per-run arrays recorded alongside the min: cross-round drift can
    # then be attributed to variance (wide spread within a round) vs a
    # real regression (tight spread at a new level) without re-running
    run_arrays: dict[str, list[float]] = {}
    for name, spec in sorted(QUERIES.items()):
        runs: list[float] = []
        while len(runs) < MAX_RUNS:
            t0 = time.time()
            spec.spark_fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            t_run = time.time() - t0
            # LSH queries persist signature/bucket tables (read from
            # multiple join branches); free them between runs
            spark.catalog.clearCache()
            still_warming = runs and t_run < 0.8 * min(runs)
            runs.append(t_run)
            if len(runs) >= MIN_RUNS and not still_warming:
                break
        timings[name] = round(min(runs), 3)
        run_arrays[name.split("_")[0]] = [round(r, 2) for r in runs]

    # opt-in member-level timing for combo entries (the round-10 q20
    # driver-vs-interleaved divergence: a suite number alone cannot
    # say WHICH member moved). SPARK_GRAFT_MEMBER_TIMINGS names entry
    # prefixes (comma-separated, or "all"); each named combo's members
    # run standalone under the same adaptive-min protocol and land in
    # the JSON under "members". Off by default: it roughly doubles the
    # named entries' cost and the driver's contract is the plain line.
    member_timings: dict[str, dict[str, float]] = {}
    member_env = os.environ.get("SPARK_GRAFT_MEMBER_TIMINGS", "")
    if member_env:
        from etl_pipelines_spark.queries import QUERIES as ALL_QUERIES
        from etl_pipelines_spark.queries.combos import COMBO_MEMBERS

        prefixes = [p.strip() for p in member_env.split(",") if p.strip()]
        for name in sorted(QUERIES):
            if name not in COMBO_MEMBERS:
                continue
            if "all" not in prefixes and not any(
                name.startswith(p) for p in prefixes
            ):
                continue
            per: dict[str, float] = {}
            for member in COMBO_MEMBERS[name]:
                m_runs: list[float] = []
                while len(m_runs) < MAX_RUNS:
                    t0 = time.time()
                    ALL_QUERIES[member].spark_fn(spark, SF_DIR).write.format(
                        "noop"
                    ).mode("overwrite").save()
                    t_run = time.time() - t0
                    spark.catalog.clearCache()
                    still_warming = m_runs and t_run < 0.8 * min(m_runs)
                    m_runs.append(t_run)
                    if len(m_runs) >= MIN_RUNS and not still_warming:
                        break
                per[member] = round(min(m_runs), 3)
            member_timings[name.split("_")[0]] = per

    total = round(sum(timings.values()), 3)

    # whole-workload row: the §3.1 warehouse refresh end-to-end (all
    # six curated tables, date-partitioned writes, 15 declared audits)
    # at a bounded scope — full coin universe, one calendar year, so
    # the 365-partition layout cost is real but the local-FS dir count
    # stays sane. Oracle denominator: tools/bench_refresh_oracle.py
    # (same rebuild + audits in DuckDB). Same adaptive min-of-N
    # protocol as the catalog — a single shot was up to 40% co-tenant
    # noise (round-5 drift finding).
    import shutil
    import tempfile

    from etl_pipelines_spark.plans.refresh import (
        refresh_warehouse,
        refresh_warehouse_incremental,
    )

    refresh_runs: list[float] = []
    refresh_report = None
    while len(refresh_runs) < MAX_RUNS:
        refresh_out = tempfile.mkdtemp(prefix="bench_refresh_")
        t0 = time.time()
        refresh_report = refresh_warehouse(
            spark, SF_DIR, refresh_out, since="1998-01-01", until="1998-12-31"
        )
        t_run = time.time() - t0
        shutil.rmtree(refresh_out, ignore_errors=True)
        still_warming = refresh_runs and t_run < 0.8 * min(refresh_runs)
        refresh_runs.append(t_run)
        if len(refresh_runs) >= MIN_RUNS and not still_warming:
            break
    refresh_row = {
        "sec": round(min(refresh_runs), 3),
        "runs": len(refresh_runs),
        "rows": sum(refresh_report.tables.values()),
        "audits_pass": refresh_report.passed,
        "scope": "1998 year slice, full coin universe",
    }

    # steady-state row: the INCREMENTAL refresh (pull -> merge ->
    # audit -> reconcile) landing Nov-Dec 1998 on top of a standing
    # Jan-Oct warehouse — the reference's daily mode at a monthly
    # grain (TPC-H ship dates end 1998-12-01, so this is the last
    # ~30 days of real arrivals; roughly a third of coins carry new
    # rows, the sparse-churn shape incremental exists for). Measured
    # as min over bootstrap+increment pairs (state makes a lone
    # re-run a no-op).
    inc_runs: list[float] = []
    inc_report = None
    while len(inc_runs) < MIN_RUNS:
        inc_out = tempfile.mkdtemp(prefix="bench_inc_")
        inc_state = tempfile.mkdtemp(prefix="bench_incstate_")
        refresh_warehouse_incremental(
            spark, SF_DIR, inc_out, inc_state,
            since="1998-01-01", until="1998-10-31",
        )
        t0 = time.time()
        inc_report = refresh_warehouse_incremental(
            spark, SF_DIR, inc_out, inc_state,
            since="1998-01-01", until="1998-12-31",
        )
        inc_runs.append(time.time() - t0)
        shutil.rmtree(inc_out, ignore_errors=True)
        shutil.rmtree(inc_state, ignore_errors=True)
    refresh_row["incremental_sec"] = round(min(inc_runs), 3)
    refresh_row["incremental_affected_coins"] = inc_report.affected_coins
    refresh_row["incremental_ok"] = inc_report.passed
    refresh_row["incremental_scope"] = (
        "Nov-Dec 1998 increment onto a standing Jan-Oct warehouse "
        "(pull+merge+audit+reconcile, delta rows past each coin's "
        "high-water mark, dynamic-partition merge)"
    )

    # SPARSE-CHURN row: ONE day of arrivals (the final TPC-H ship day)
    # onto a standing full-year warehouse — the reference's actual
    # daily shape (workflows/core_tables_all.yaml re-run after one
    # day's pulls, retrieve_dune_transfer_data.py:127-147), where a
    # couple percent of coins carry new rows. This is the shape the
    # O(churn) merge exists for; the dense two-month row above is the
    # honest worst case (a third of coins, recompute ~ rebuild).
    day_runs: list[float] = []
    day_report = None
    while len(day_runs) < MIN_RUNS:
        day_out = tempfile.mkdtemp(prefix="bench_day_")
        day_state = tempfile.mkdtemp(prefix="bench_daystate_")
        refresh_warehouse_incremental(
            spark, SF_DIR, day_out, day_state,
            since="1998-01-01", until="1998-11-30",
        )
        t0 = time.time()
        day_report = refresh_warehouse_incremental(
            spark, SF_DIR, day_out, day_state,
            since="1998-01-01", until="1998-12-01",
        )
        day_runs.append(time.time() - t0)
        shutil.rmtree(day_out, ignore_errors=True)
        shutil.rmtree(day_state, ignore_errors=True)
    refresh_row["incremental_day_sec"] = round(min(day_runs), 3)
    refresh_row["incremental_day_affected_coins"] = day_report.affected_coins
    refresh_row["incremental_day_ok"] = day_report.passed
    refresh_row["incremental_day_vs_rebuild"] = round(
        min(refresh_runs) / max(min(day_runs), 1e-9), 2
    )
    refresh_row["incremental_day_scope"] = (
        "one day of arrivals (1998-12-01, the last ship day) onto a "
        "standing Jan-Nov warehouse — the reference's steady-state "
        "daily shape; _vs_rebuild = full-rebuild sec / this"
    )

    # The driver captures only a bounded TAIL of stdout (round-7
    # post-mortem: the single giant line with runs_sec got its FRONT
    # truncated away, so q01-q28 and the total were lost and the line
    # never parsed). Emit TWO lines: the full verbose record first
    # (for humans and the committed artifact), then a compact headline
    # line LAST so the tail capture always ends with one complete,
    # parseable JSON object carrying the min-map and the total.
    short = {name.split("_")[0]: round(t_, 3) for name, t_ in timings.items()}
    # prefix keys must stay unique or two entries silently collapse
    assert len(short) == len(timings), "duplicate qNN prefix in catalog names"
    # 'value' is DERIVED from the recorded per-query fields, so every
    # number in the artifact is recomputable from the artifact itself
    # (round-8 advice: value from unrounded internals vs 2dp queries
    # made the headline irreproducible from the committed record)
    total = round(sum(short.values()), 3)
    corpus = os.path.basename(SF_DIR.rstrip("/"))
    full = {
        "metric": "catalog_total_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": short,
        "runs_sec": run_arrays,
        **({"members": member_timings} if member_timings else {}),
        "refresh": refresh_row,
        "sf": sf_label(SF_DIR),
        "corpus": corpus,
        # q42/q68 run REAL Structured Streaming micro-batch
        # pipelines: their wall time is dominated by a fixed
        # ~1-3 s trigger/startup floor per run, not per-row
        # work (state is watermark-bounded; stream==batch is
        # bit-exact via their oracles). Ratios vs a 30 ms
        # batch-SQL oracle measure that floor, not throughput.
        "notes": (
            "all rows are min-of-adaptive-runs under THIS "
            "protocol; SCALE.md cites these recorded values "
            "verbatim (no side-channel figures). refresh row: "
            "whole SURVEY-3.1 warehouse rebuild (6 tables, "
            "date-partitioned writes, 15 declared audits); "
            "oracle denominator tools/bench_refresh_oracle.py. "
            "incremental_sec: the steady-state H2 increment on "
            "a standing H1 warehouse. q42,q68 include the "
            "streaming micro-batch startup floor (~1-3 s per "
            "trigger, not per-row work). Catalog-vs-oracle "
            "ratios: tools/bench_oracle.py + tools/"
            "ratio_table.py on the same corpus — Spark's "
            "per-query stage floor dominates small corpora "
            "and amortizes at 10x (SCALE.md scaling table)"
        ),
    }
    # committed artifact: the full record always lands next to bench.py
    # (BENCH_<corpus>.json), independent of the driver's stdout capture
    artifact = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), f"BENCH_{corpus}.json"
    )
    with open(artifact, "w") as fh:
        json.dump(full, fh, indent=1)
        fh.write("\n")
    print(json.dumps(full, separators=(",", ":")))
    compact = {
        "metric": "catalog_total_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": short,
        "refresh": {
            k: refresh_row[k]
            for k in (
                "sec", "audits_pass", "incremental_sec",
                "incremental_day_sec", "incremental_day_vs_rebuild",
            )
        },
        "sf": sf_label(SF_DIR),
        "corpus": corpus,
        "full_record": f"BENCH_{corpus}.json",
    }
    line = json.dumps(compact, separators=(",", ":"))
    # the tail capture is ~2 KB; the headline line must fit in it whole
    assert len(line) < 1900, f"compact bench line too long ({len(line)} B)"
    print(line)


if __name__ == "__main__":
    main()
