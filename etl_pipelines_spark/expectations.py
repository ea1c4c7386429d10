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


def run_expectations(
    df: DataFrame,
    table: str,
    config: dict[str, dict],
    refs: Mapping[str, DataFrame] | None = None,
) -> list[Q.ExpectationResult]:
    """Run `table`'s declared suite against `df`. Column rules expand
    first (not_null batched into one scan, matching the hand-written
    suites), then table checks in declaration order."""
    spec = config.get(table) or {}
    refs = refs or {}
    out: list[Q.ExpectationResult] = []

    columns = spec.get("columns") or {}
    nn = [c for c, rules in columns.items() if "not_null" in rules]
    if nn:
        out.append(Q.expect_not_null(df, nn))
    for col, rules in columns.items():
        if "unique" in rules:
            out.append(Q.expect_unique(df, [col]))
        if "lowercase" in rules:
            out.append(Q.expect_lowercase(df, col))
        if "non_negative" in rules:
            out.append(Q.expect_non_negative(df, col))

    for check in spec.get("checks") or []:
        (rule,) = check
        arg = check[rule] or {}
        if rule == "unique":
            out.append(Q.expect_unique(df, list(arg["keys"])))
        elif rule == "not_null":
            out.append(Q.expect_not_null(df, list(arg["cols"])))
        elif rule == "no_date_gaps":
            out.append(
                Q.expect_no_date_gaps(
                    df, list(arg["keys"]), arg.get("date", "date")
                )
            )
        elif rule == "non_negative":
            out.append(
                Q.expect_non_negative(
                    df, arg["col"], float(arg.get("tolerance", 0.0))
                )
            )
        elif rule == "monotone":
            out.append(
                Q.expect_monotone(df, list(arg["keys"]), arg["order"], arg["col"])
            )
        elif rule == "dense_sequence":
            out.append(
                Q.expect_dense_sequence(
                    df, list(arg["keys"]), arg["order"], arg["col"]
                )
            )
        elif rule == "lowercase":
            out.append(Q.expect_lowercase(df, arg["col"]))
        elif rule == "referential":
            parent = refs.get(arg["to"])
            if parent is None:
                raise ValueError(
                    f"{table}: referential check targets '{arg['to']}', which "
                    "is not among the built tables — declare parents before "
                    "children (the dbt ref() ordering constraint)"
                )
            out.append(
                Q.expect_referential_integrity(df, parent, list(arg["keys"]))
            )
    return out
