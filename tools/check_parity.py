#!/usr/bin/env python
"""Local replica of the driver's t2 correctness gate.

Runs every query in the catalog on Spark AND its DuckDB oracle at
sf0.01, compares row count, column names, and values (exact for
ints/strings/dates; bitwise for floats with a fallback report of max
ulp-ish deviation). Usage:

    python tools/check_parity.py            # driver-facing catalog (what the gate sees)
    python tools/check_parity.py q01 q22    # prefixes ok
    python tools/check_parity.py --internal        # full internal registry
    python tools/check_parity.py --internal q69    # internal member query
    SPARK_GRAFT_PARITY_SF=/root/testdata/sf0.001 python tools/check_parity.py

Scaled-corpus parity artifacts (machine-readable, same shape as the
driver's CORRECTNESS gate — rows/schema/hash booleans per entry):

    SPARK_GRAFT_PARITY_SF=testdata_scaled/sf1 \
        python tools/check_parity.py --emit-json CORRECTNESS_sf1.json
    SPARK_GRAFT_PARITY_SF=testdata_scaled/sf1skew \
        python tools/check_parity.py --emit-json CORRECTNESS_sf1skew.json
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# scale harness opts into the big-host heap (library default is 8g)
os.environ.setdefault("SPARK_DRIVER_MEMORY", "12g")

from etl_pipelines_spark.queries import DRIVER_QUERIES, QUERIES  # noqa: E402
from etl_pipelines_spark.session import get_spark  # noqa: E402
from etl_pipelines_spark.sources.registry import TABLES  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_PARITY_SF", "/root/testdata/sf0.01")


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
        elif df[c].dtype == object:
            # date objects -> datetime for stable compare. Probe the
            # first values before the full map: the all-rows
            # hasattr lambda was minutes per string column on the
            # 17M-row sf1 suites, and a non-date first value already
            # decides the (conjunctive) condition. Semantics are
            # unchanged — the full map still confirms before any
            # conversion.
            try:
                probe = df[c].iloc[:100]
                looks_datey = (
                    len(df) > 0
                    and len(probe) > 0
                    and probe.map(lambda v: hasattr(v, "year")).all()
                )
                if looks_datey and df[c].map(lambda v: hasattr(v, "year")).all():
                    df[c] = pd.to_datetime(df[c])
            except (TypeError, ValueError):
                pass
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(name: str, spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> list[str]:
    problems = []
    if list(sorted(spark_df.columns)) != list(sorted(oracle_df.columns)):
        problems.append(
            f"columns differ: spark={sorted(spark_df.columns)} oracle={sorted(oracle_df.columns)}"
        )
        return problems
    if len(spark_df) != len(oracle_df):
        problems.append(f"row count differ: spark={len(spark_df)} oracle={len(oracle_df)}")
        return problems
    s = normalize(spark_df)
    o = normalize(oracle_df)
    for c in s.columns:
        sv, ov = s[c], o[c]
        if pd.api.types.is_float_dtype(sv) or pd.api.types.is_float_dtype(ov):
            sv = sv.astype("float64").to_numpy()
            ov = ov.astype("float64").to_numpy()
            both_nan = np.isnan(sv) & np.isnan(ov)
            eq = (sv == ov) | both_nan
            if not eq.all():
                bad = ~eq
                with np.errstate(divide="ignore", invalid="ignore"):
                    rel = np.abs(sv[bad] - ov[bad]) / np.maximum(np.abs(ov[bad]), 1e-300)
                problems.append(
                    f"col {c}: {bad.sum()}/{len(sv)} float mismatches, "
                    f"max abs={np.nanmax(np.abs(sv[bad]-ov[bad])):.3e} "
                    f"max rel={np.nanmax(rel):.3e}"
                )
        else:
            eq = (sv == ov) | (sv.isna() & ov.isna())
            if not eq.all():
                idx = (~eq).idxmax()
                problems.append(
                    f"col {c}: {(~eq).sum()}/{len(sv)} mismatches, "
                    f"first: spark={sv[idx]!r} oracle={ov[idx]!r}"
                )
    return problems


def main() -> int:
    args = sys.argv[1:]
    internal = "--internal" in args
    emit_path = None
    if "--emit-json" in args:
        i = args.index("--emit-json")
        emit_path = args[i + 1]
        args = args[:i] + args[i + 2 :]
    # --exclude PREFIX[,PREFIX...]: run everything BUT the named
    # entries, and record the exclusion in the emitted JSON — for
    # scale corpora where a specific oracle is cost-prohibitive
    # (q33's pair-suite oracle is ~7 min at sf1 and >1 h at sf10);
    # a disclosed gap beats an artifact that silently ran a subset.
    excluded: list[str] = []
    if "--exclude" in args:
        i = args.index("--exclude")
        excluded = [p.strip() for p in args[i + 1].split(",") if p.strip()]
        args = args[:i] + args[i + 2 :]
    sample_over = None
    if "--sample-over" in args:
        i = args.index("--sample-over")
        sample_over = int(args[i + 1])
        args = args[:i] + args[i + 2 :]
    prefixes = [a for a in args if a != "--internal"]
    registry = QUERIES if internal else DRIVER_QUERIES
    selected = {
        n: q
        for n, q in registry.items()
        if (not prefixes or any(n.startswith(p) for p in prefixes))
        and not any(n.startswith(p) for p in excluded)
    }
    con = duckdb.connect()
    for tbl in TABLES:
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM '{SF_DIR}/{tbl}.parquet'"
        )
    # verification collects FULL results driver-side by design; at the
    # sf1 scale corpus some entries return millions of rows, past the
    # 1g default result cap (a harness limit, not a query property)
    # 8 shuffle partitions keep the sf0.01 gate fast (less scheduling
    # than work); the sf1-scale corpora need real parallelism — set
    # SPARK_GRAFT_PARITY_SHUFFLE=32 there or the pair suite's joins
    # serialize onto a handful of cores
    spark = get_spark(
        "parity-check",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_PARITY_SHUFFLE", "8")),
        extra_conf={"spark.driver.maxResultSize": "6g"},
    )
    failures = []
    # --sample-over N (rows): entries whose FULL result exceeds N rows
    # on the scale corpora are verified by (a) EXACT full row counts
    # computed in each engine plus (b) an EXACT value compare of a
    # deterministic 1/101 hash sample that BOTH engines select with
    # the identical portable md5 predicate (operators/tablediff
    # row_digest over the integer/string/date/bool columns — the
    # types whose string rendering is bit-identical across engines;
    # float columns still ride the sampled rows and are compared
    # bitwise in pandas as usual). Full collection of a 170M-row
    # result into two pandas frames is a harness limit, not a query
    # property; the sampling protocol is disclosed per entry in the
    # emitted JSON ("sampled", "sample_rows").
    SAMPLE_MOD = 101
    _PORTABLE = {"bigint", "int", "smallint", "tinyint", "string", "date", "boolean"}

    def _sample_cols(sdf_schema) -> list[str]:
        return [
            f.name
            for f in sdf_schema.fields
            if f.dataType.simpleString() in _PORTABLE
        ]

    # driver-gate-shaped record per entry (CORRECTNESS_r{N}.json keys)
    records: dict[str, dict] = {}
    for name, spec in sorted(selected.items()):
        t0 = time.time()
        rec = {
            "rows_match": False,
            "schema_match": False,
            "hash_match": False,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        records[name] = rec
        sampled = False
        try:
            sframe = spec.spark_fn(spark, SF_DIR)
            if sample_over is not None and spec.oracle is not None:
                n_full = sframe.count()
                if n_full > sample_over:
                    sampled = True
                    cols = _sample_cols(sframe.schema)
                    if not cols:
                        raise RuntimeError(
                            "no portable columns to hash-sample on"
                        )
                    from pyspark.sql import functions as F

                    from etl_pipelines_spark.operators.tablediff import (
                        row_digest,
                    )

                    sdf = sframe.filter(
                        F.pmod(row_digest(cols), F.lit(SAMPLE_MOD)) == 0
                    ).toPandas()
                    rec["spark_rows"] = n_full
                else:
                    sdf = sframe.toPandas()
                    rec["spark_rows"] = len(sdf)
            else:
                sdf = sframe.toPandas()
                rec["spark_rows"] = len(sdf)
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            rec["err"] = f"spark error: {e}"
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if spec.oracle is None:
            rec.update(rows_match=True, schema_match=None, hash_match=None,
                       mode="rows_only")
            print(f"ok    {name}: {len(sdf)} rows [ROWS-ONLY] ({time.time()-t0:.1f}s)")
            continue
        try:
            if sampled:
                from etl_pipelines_spark.operators.tablediff import (
                    row_digest_sql,
                )

                o_full = con.execute(
                    f"SELECT COUNT(*) FROM ({spec.oracle})"
                ).fetchone()[0]
                odf = con.execute(
                    f"SELECT * FROM ({spec.oracle}) WHERE "
                    f"({row_digest_sql(cols)}) % {SAMPLE_MOD} = 0"
                ).df()
                rec["oracle_rows"] = int(o_full)
                rec["sampled"] = True
                rec["sample_rows"] = len(sdf)
                if rec["spark_rows"] != rec["oracle_rows"]:
                    failures.append(name)
                    rec["err"] = (
                        f"row count differ: spark={rec['spark_rows']} "
                        f"oracle={rec['oracle_rows']}"
                    )
                    print(f"FAIL  {name}: {rec['err']}")
                    continue
            else:
                odf = con.execute(spec.oracle).df()
                rec["oracle_rows"] = len(odf)
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            rec["err"] = f"oracle error: {e}"
            print(f"FAIL  {name}: oracle error: {e}")
            continue
        problems = compare(name, sdf, odf)
        rec["schema_match"] = not any(p.startswith("columns differ") for p in problems)
        rec["rows_match"] = rec["schema_match"] and not any(
            p.startswith("row count differ") for p in problems
        )
        rec["hash_match"] = not problems
        if problems:
            failures.append(name)
            rec["err"] = "; ".join(problems)[:500]
            print(f"FAIL  {name}: ({time.time()-t0:.1f}s)")
            for p in problems:
                print(f"      {p}")
        elif sampled:
            print(
                f"ok    {name}: {rec['spark_rows']} rows, counts + "
                f"{len(sdf)}-row hash sample match [SAMPLED] "
                f"({time.time()-t0:.1f}s)"
            )
        else:
            print(f"ok    {name}: {len(sdf)} rows match ({time.time()-t0:.1f}s)")
        if emit_path and sample_over is not None:
            # scale passes run hours: checkpoint after every entry so
            # an interruption keeps the completed evidence
            _emit(emit_path, SF_DIR, failures, selected, registry, excluded, records)
    print(f"\n{len(selected) - len(failures)}/{len(selected)} queries match")
    if emit_path:
        _emit(emit_path, SF_DIR, failures, selected, registry, excluded, records)
    return 1 if failures else 0


def _emit(emit_path, sf_dir, failures, selected, registry, excluded, records):
    """Atomic JSON write; called after EVERY entry on scale corpora so
    an interrupted multi-hour pass still leaves the completed entries'
    evidence on disk (n_total always reports the full selection, so a
    partial artifact self-describes via len(entries) < n_total)."""
    import json

    payload = {
        "corpus": os.path.basename(sf_dir.rstrip("/")),
        "sf_dir": sf_dir,
        "n_match": len(records)
        - len([n for n in records if records[n].get("err")]),
        "n_total": len(selected),
        "n_catalog_entries": len(registry),
        **({"excluded": excluded} if excluded else {}),
        "entries": records,
    }
    tmp = emit_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=1)
    os.replace(tmp, emit_path)
    print(f"wrote {emit_path}")


if __name__ == "__main__":
    raise SystemExit(main())
