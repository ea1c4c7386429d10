"""Declarative expectations: the dbt-schema.yml authoring surface over
the quality.py expectation library (SURVEY.md §5.3).

The reference declares constraints in dbt_dreamsdata/models/schema.yml
and lets the framework expand them into tests; quality.py mirrored the
CHECKS but authorship stayed in code. This module closes the last gap:
a table -> rules YAML (expectations.yml next to this file is the
warehouse default) drives the same ExpectationResult suite, so adding
a constraint is a config edit, not a code change.

Rule vocabulary (validated at load time — a typo'd rule name fails the
load, not silently skips):

  columns:                         # column-level, dbt data_tests shape
    <col>: [not_null, unique, lowercase, non_negative]
  checks:                          # table-level
    - unique: {keys: [...]}
    - not_null: {cols: [...]}
    - no_date_gaps: {keys: [...], date: date}
    - non_negative: {col: ..., tolerance: 0.0}
    - monotone: {keys: [...], order: ..., col: ...}
    - dense_sequence: {keys: [...], order: ..., col: ...}
    - lowercase: {col: ...}
    - referential: {keys: [...], to: <parent table name>}

`referential` resolves its parent through the `refs` mapping of
already-built frames, so the declared dependency order must follow the
build order — the same constraint dbt's ref() imposes.
"""

from __future__ import annotations

import os
from collections.abc import Mapping

from pyspark.sql import DataFrame

from etl_pipelines_spark import quality as Q

DEFAULT_PATH = os.path.join(os.path.dirname(__file__), "expectations.yml")

_COLUMN_RULES = {"not_null", "unique", "lowercase", "non_negative"}
_CHECK_RULES = {
    "unique",
    "not_null",
    "no_date_gaps",
    "non_negative",
    "monotone",
    "dense_sequence",
    "lowercase",
    "referential",
}


def load_expectations(path: str | None = None) -> dict[str, dict]:
    """Parse + validate the expectations file -> {table: spec}."""
    import yaml

    with open(path or DEFAULT_PATH) as fh:
        doc = yaml.safe_load(fh)
    if not isinstance(doc, Mapping) or "tables" not in doc:
        raise ValueError("expectations config must carry a 'tables' mapping")
    tables = doc["tables"]
    for table, spec in tables.items():
        spec = spec or {}
        for col, rules in (spec.get("columns") or {}).items():
            bad = set(rules) - _COLUMN_RULES
            if bad:
                raise ValueError(
                    f"{table}.{col}: unknown column rule(s) {sorted(bad)}; "
                    f"known: {sorted(_COLUMN_RULES)}"
                )
        for check in spec.get("checks") or []:
            if not isinstance(check, Mapping) or len(check) != 1:
                raise ValueError(
                    f"{table}: each check must be a single-rule mapping, got {check}"
                )
            (rule,) = check
            if rule not in _CHECK_RULES:
                raise ValueError(
                    f"{table}: unknown check rule '{rule}'; "
                    f"known: {sorted(_CHECK_RULES)}"
                )
    return dict(tables)


def _violation_frames(
    df: DataFrame,
    table: str,
    spec: Mapping,
    refs: Mapping[str, DataFrame],
) -> list[tuple[str, DataFrame]]:
    """Expand a table spec into (expectation name, violations frame)
    pairs — column rules first (not_null batched into one scan,
    matching the hand-written suites), then checks in declaration
    order."""
    out: list[tuple[str, DataFrame]] = []

    columns = spec.get("columns") or {}
    nn = [c for c, rules in columns.items() if "not_null" in rules]
    if nn:
        out.append((f"not_null({', '.join(nn)})", Q.not_null_violations(df, nn)))
    for col, rules in columns.items():
        if "unique" in rules:
            out.append((f"unique({col})", Q.unique_violations(df, [col])))
        if "lowercase" in rules:
            out.append((f"lowercase({col})", Q.lowercase_violations(df, col)))
        if "non_negative" in rules:
            out.append(
                (f"non_negative({col}, tol=0.0)", Q.negative_violations(df, col))
            )

    for check in spec.get("checks") or []:
        (rule,) = check
        arg = check[rule] or {}
        if rule == "unique":
            keys = list(arg["keys"])
            out.append(
                (f"unique({', '.join(keys)})", Q.unique_violations(df, keys))
            )
        elif rule == "not_null":
            cols = list(arg["cols"])
            out.append(
                (f"not_null({', '.join(cols)})", Q.not_null_violations(df, cols))
            )
        elif rule == "no_date_gaps":
            out.append(
                (
                    "no_date_gaps",
                    Q.date_gap_violations(
                        df, list(arg["keys"]), arg.get("date", "date")
                    ),
                )
            )
        elif rule == "non_negative":
            tol = float(arg.get("tolerance", 0.0))
            out.append(
                (
                    f"non_negative({arg['col']}, tol={tol})",
                    Q.negative_violations(df, arg["col"], tol),
                )
            )
        elif rule == "monotone":
            out.append(
                (
                    f"monotone({arg['col']})",
                    Q.monotone_violations(
                        df, list(arg["keys"]), arg["order"], arg["col"]
                    ),
                )
            )
        elif rule == "dense_sequence":
            out.append(
                (
                    f"dense_sequence({arg['col']})",
                    Q.dense_sequence_violations(
                        df, list(arg["keys"]), arg["order"], arg["col"]
                    ),
                )
            )
        elif rule == "lowercase":
            out.append(
                (f"lowercase({arg['col']})", Q.lowercase_violations(df, arg["col"]))
            )
        elif rule == "referential":
            parent = refs.get(arg["to"])
            if parent is None:
                raise ValueError(
                    f"{table}: referential check targets '{arg['to']}', which "
                    "is not among the built tables — declare parents before "
                    "children (the dbt ref() ordering constraint)"
                )
            keys = list(arg["keys"])
            out.append(
                (
                    f"referential({', '.join(keys)})",
                    Q.referential_violations(df, parent, keys),
                )
            )
    return out


def run_expectations(
    df: DataFrame,
    table: str,
    config: dict[str, dict],
    refs: Mapping[str, DataFrame] | None = None,
    count_rows_of: DataFrame | None = None,
) -> list[Q.ExpectationResult] | tuple[list[Q.ExpectationResult], int]:
    """Run `table`'s declared suite against `df` as ONE Spark action:
    the per-rule violation counts union into a single counts frame
    (quality.violation_counts), so a 6-table refresh pays 6 audit
    jobs instead of one per expectation — the per-action floor is the
    dominant audit cost on a green warehouse. Violation samples (the
    triage payload) are fetched only for the rules that failed.

    `count_rows_of` rides a table row count on the SAME action (a
    "_rows" branch in the counts union — the frame counted may differ
    from `df`, e.g. the full table while `df` is a churn slice);
    the return becomes (results, n_rows)."""
    spec = config.get(table) or {}
    frames = _violation_frames(df, table, spec, refs or {})
    if count_rows_of is not None:
        frames.append(("_rows", count_rows_of))
    if not frames:
        return ([], 0) if count_rows_of is not None else []
    # names must be unique inside the counts union — suffix dupes
    seen: dict[str, int] = {}
    named: list[tuple[str, DataFrame]] = []
    for name, vdf in frames:
        if name in seen:
            seen[name] += 1
            name = f"{name}#{seen[name]}"
        else:
            seen[name] = 0
        named.append((name, vdf))
    counts = {
        r["rule"]: r["n_violations"]
        for r in Q.violation_counts(dict(named)).collect()
    }
    n_rows = counts.pop("_rows", None)
    out = []
    for name, vdf in named:
        if name == "_rows":
            continue
        n = counts[name]
        sample = vdf.limit(5).collect() if n else []
        out.append(Q.ExpectationResult(name, n == 0, n, sample))
    return (out, int(n_rows)) if count_rows_of is not None else out
