"""Data-quality expectations (SURVEY.md §5.3): the reference's dbt test
suite re-expressed as post-write DataFrame assertions.

Each expectation returns an ExpectationResult carrying a violations
frame (limited sample) instead of raising, so a table build can run the
whole suite and report every failure at once — `assert_all` converts to
a hard failure for tests/CI. All checks are single-pass aggregations or
anti-joins; nothing collects the table to the driver.

dbt sources mirrored (dbt_dreamsdata/):
- unique/not_null schema tests        -> expect_unique / expect_not_null
- test_cCoinMarketData_no_date_gaps   -> expect_no_date_gaps
- *_is_negative tolerance tests       -> expect_non_negative
- usd_inflows_increasing              -> expect_monotone
- transfer_sequence                   -> expect_dense_sequence
- cCoins_address_lower_case           -> expect_lowercase
- cCoinMarketData_coin_ids            -> expect_referential_integrity
- transfers_and_profits_math audit    -> recomputation_audit (plans/
  wallet_profits.audit; the seeded-sample re-derivation)
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


@dataclass
class ExpectationResult:
    name: str
    passed: bool
    n_violations: int
    sample: list

    def __bool__(self) -> bool:
        return self.passed


def _result(name: str, violations: DataFrame, sample_n: int = 5) -> ExpectationResult:
    n = violations.count()
    sample = violations.limit(sample_n).collect() if n else []
    return ExpectationResult(name, n == 0, n, sample)


def unique_violations(df: DataFrame, keys: list[str]) -> DataFrame:
    return df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n")).filter(F.col("n") > 1)


def expect_unique(df: DataFrame, keys: list[str]) -> ExpectationResult:
    return _result(f"unique({', '.join(keys)})", unique_violations(df, keys))


def not_null_violations(df: DataFrame, cols: list[str]) -> DataFrame:
    cond = None
    for c in cols:
        cc = F.col(c).isNull()
        cond = cc if cond is None else (cond | cc)
    return df.filter(cond)


def expect_not_null(df: DataFrame, cols: list[str]) -> ExpectationResult:
    return _result(f"not_null({', '.join(cols)})", not_null_violations(df, cols))


def expect_no_date_gaps(
    df: DataFrame, keys: list[str], date_col: str = "date"
) -> ExpectationResult:
    """Per key: row count must equal datediff(max,min)+1 (dbt
    test_cCoinMarketData_no_date_gaps.sql:12-16)."""
    return _result("no_date_gaps", date_gap_violations(df, keys, date_col))


def date_gap_violations(
    df: DataFrame, keys: list[str], date_col: str = "date"
) -> DataFrame:
    stats = df.groupBy(*keys).agg(
        F.countDistinct(date_col).alias("_n"),
        (F.datediff(F.max(date_col), F.min(date_col)) + 1).alias("_span"),
    )
    return stats.filter(F.col("_n") != F.col("_span"))


def expect_non_negative(
    df: DataFrame, col: str, tolerance: float = 0.0
) -> ExpectationResult:
    """Values >= -tolerance (the reference's float-tolerance discipline,
    e.g. balance >= -0.1 in test_cCoinWalletTransfers_balance_is_negative)."""
    return _result(
        f"non_negative({col}, tol={tolerance})",
        negative_violations(df, col, tolerance),
    )


def negative_violations(
    df: DataFrame, col: str, tolerance: float = 0.0
) -> DataFrame:
    return df.filter(F.col(col) < -tolerance)


def expect_monotone(
    df: DataFrame, keys: list[str], order_col: str, col: str
) -> ExpectationResult:
    """col never decreases along order_col within each key (dbt
    usd_inflows_increasing: lag-compare)."""
    return _result(f"monotone({col})", monotone_violations(df, keys, order_col, col))


def monotone_violations(
    df: DataFrame, keys: list[str], order_col: str, col: str
) -> DataFrame:
    w = Window.partitionBy(*keys).orderBy(order_col)
    lagged = df.withColumn("_prev", F.lag(col).over(w))
    return lagged.filter(F.col("_prev").isNotNull() & (F.col(col) < F.col("_prev")))


def expect_dense_sequence(
    df: DataFrame, keys: list[str], order_col: str, col: str
) -> ExpectationResult:
    """col increments by exactly 1 along order_col within each key (dbt
    transfer_sequence test: lag + 1 comparison)."""
    return _result(
        f"dense_sequence({col})", dense_sequence_violations(df, keys, order_col, col)
    )


def dense_sequence_violations(
    df: DataFrame, keys: list[str], order_col: str, col: str
) -> DataFrame:
    w = Window.partitionBy(*keys).orderBy(order_col)
    lagged = df.withColumn("_prev", F.lag(col).over(w))
    return lagged.filter(F.col("_prev").isNotNull() & (F.col(col) != F.col("_prev") + 1))


def expect_lowercase(df: DataFrame, col: str) -> ExpectationResult:
    return _result(f"lowercase({col})", lowercase_violations(df, col))


def lowercase_violations(df: DataFrame, col: str) -> DataFrame:
    return df.filter(F.col(col) != F.lower(F.col(col)))


def expect_referential_integrity(
    child: DataFrame, parent: DataFrame, keys: list[str]
) -> ExpectationResult:
    """Every child key exists in parent (dbt relationships /
    test_cCoinMarketData_coin_ids NOT IN form, as a left-anti join)."""
    return _result(
        f"referential({', '.join(keys)})",
        referential_violations(child, parent, keys),
    )


def referential_violations(
    child: DataFrame, parent: DataFrame, keys: list[str]
) -> DataFrame:
    return child.select(*keys).distinct().join(
        parent.select(*keys).distinct(), keys, "left_anti"
    )


def fused_balance_audit(
    df: DataFrame,
    keys: list[str],
    date_col: str = "date",
    balance_col: str = "balance",
    tolerance: float = 0.1,
    labels: tuple[str, str, str, str] = (
        "negative_balance",
        "no_date_gaps",
        "unique",
        "not_null",
    ),
) -> DataFrame:
    """All four standard audit rules over a keyed daily-balance frame in
    ONE aggregation cascade — the materialize-then-query shape (persist
    the frame, run four independent rule scans, union four 1-row aggs)
    restructured into a single plan ("restructure > persist", SCALE.md).

    Every rule is derivable from one (keys, date)-level partial:
    negative-balance row counts and duplicate-triple counts fall out of
    the triple groupBy; date-gap pairs and null-key row counts fall out
    of the keys-level rollup of that partial. Because the balance frame
    arrives hash-partitioned on `keys` (its cumulative window demands
    it), BOTH groupBys are partition-local — the only exchange after
    the window shuffle is the final 1-row global aggregate, and the
    input is scanned once with no persist to pin executor storage.

    Null semantics match the per-rule builders exactly: distinct dates
    exclude NULL (a NULL-date group doesn't count toward the span
    check), a NULL span (no non-null dates) is not a gap violation, and
    null-key rows count once per ROW (not per group) via the
    group-count weight.
    """
    any_null = F.col(date_col).isNull()
    for c in keys:
        any_null = any_null | F.col(c).isNull()
    triple = df.groupBy(*keys, date_col).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(
            F.when(F.col(balance_col) < -tolerance, F.lit(1)).otherwise(F.lit(0))
        ).alias("_neg"),
        F.max(any_null.cast("int")).alias("_has_null"),
    )
    per_key = triple.groupBy(*keys).agg(
        F.sum(F.when(F.col(date_col).isNotNull(), 1).otherwise(0)).alias("_n_dates"),
        (F.datediff(F.max(date_col), F.min(date_col)) + 1).alias("_span"),
        F.sum(F.when(F.col("_n") > 1, 1).otherwise(0)).alias("_dups"),
        F.sum("_neg").alias("_negs"),
        F.sum(F.col("_has_null") * F.col("_n")).alias("_nulls"),
    )
    totals = per_key.agg(
        F.sum("_negs").cast("long").alias("_r_neg"),
        F.sum(
            F.when(F.col("_n_dates") != F.col("_span"), 1).otherwise(0)
        ).cast("long").alias("_r_gap"),
        F.sum("_dups").cast("long").alias("_r_dup"),
        F.sum("_nulls").cast("long").alias("_r_null"),
    )
    quoted = [label.replace("'", "\\'") for label in labels]
    stack = (
        f"stack(4, '{quoted[0]}', _r_neg, '{quoted[1]}', _r_gap,"
        f" '{quoted[2]}', _r_dup, '{quoted[3]}', _r_null)"
        " as (rule, n_violations)"
    )
    return totals.select(F.expr(stack))


def violation_counts(named: dict[str, DataFrame]) -> DataFrame:
    """Union per-rule violation counts into one (rule, n_violations)
    frame — the dbt-style audit result materialized as a table, so the
    quality suite itself can ride the oracle correctness gate (q72).
    Each count is a 1-row full aggregation (map-side combined); the
    union is rule-count rows."""
    from functools import reduce

    counts = [
        df.agg(F.count(F.lit(1)).cast("long").alias("n_violations")).select(
            F.lit(name).alias("rule"), "n_violations"
        )
        for name, df in named.items()
    ]
    return reduce(DataFrame.unionByName, counts)


def assert_all(*results: ExpectationResult) -> None:
    failed = [r for r in results if not r.passed]
    if failed:
        lines = [
            f"{r.name}: {r.n_violations} violations, sample {r.sample}" for r in failed
        ]
        raise AssertionError("expectations failed:\n" + "\n".join(lines))
