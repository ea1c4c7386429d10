"""Numeric-relationship profiling: exact Pearson correlation matrix.

The column-profile family (q53 quantiles, q54 null/distinct/extrema)
stops at per-column facts; the next question a dataset audit asks is
"which columns move together" (feature redundancy, leakage screens,
sanity checks like price ~ quantity). At 100 TB that must be ONE
partial-aggregable pass — never a per-pair re-scan.

Design: every moment the formula needs (n, sum x, sum x^2, sum x*y
for each pair) accumulates in a single groupBy-less aggregate.
Inputs are rendered as exact integers first (fixed-point via a
DECIMAL cast, not floor(double*scale) — 0.29 * 100 is 28.999... in
IEEE), sums ride DECIMAL(38,0) (exact in any partitioning; plain
BIGINT sums would overflow Spark's ANSI long), and the final
correlation is one pinned IEEE sequence over those exact integers —
double(n*Sxy - Sx*Sy) / (sqrt(double(n*Sxx - Sx^2)) *
sqrt(double(n*Syy - Sy^2))) — so Spark and the DuckDB oracle agree
bit-for-bit (gated q100).
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEC = "decimal(38,0)"


def _scaled(col: str, decimals: int) -> F.Column:
    """Exact fixed-point integer rendering of a numeric column."""
    return (
        (F.col(col).cast(f"decimal(18,{decimals})") * F.lit(10**decimals))
        .cast("long")
    )


def correlation_matrix(
    df: DataFrame, cols: list[str], decimals: int = 2
) -> DataFrame:
    """(col_a, col_b, n, corr) for every unordered column pair, from
    one aggregation pass. `decimals` is the fixed-point precision used
    to make inputs exact integers (2 covers currency-style columns;
    integer columns are unaffected). Null rows are excluded globally
    (listwise) so every pair sees the same n and the matrix is
    consistent.

    Magnitude bound: the exact intermediates n*Sxy and Sx*Sy are
    DECIMAL(38,0), so they must stay under 10^38 — with scaled values
    |v| <= V and n rows, both are bounded by (n*V)^2, i.e. the method
    is exact while n * V < 10^19 (e.g. 10^12 rows of values scaled to
    10^6 ~ 10^18: fine; 10^12 rows at 10^8: overflow). Past the bound
    the decimal product would NULL silently with ANSI off, so the
    final projection traps it: a NULL corr with n > 0 cannot occur
    legitimately (zero variance yields NaN via double division, not
    NULL) and raises instead of being returned. For larger corpora,
    lower `decimals` or pre-aggregate; a mean-centered double pass
    trades exactness for range and is deliberately not the default
    (the q100 gate pins the exact IEEE sequence cross-engine)."""
    clean = df.dropna(subset=cols)
    # widen BEFORE multiplying: a long*long per-row product overflows
    # at scaled |v| >= ~3e9 (ANSI error, or silent garbage with ANSI
    # off) — the DECIMAL cast must wrap the operands, not the product
    s = {c: _scaled(c, decimals).cast(DEC) for c in cols}
    aggs = [F.count(F.lit(1)).cast(DEC).alias("_n")]
    for c in cols:
        aggs.append(F.sum(s[c]).alias(f"_s_{c}"))
        aggs.append(F.sum(s[c] * s[c]).alias(f"_ss_{c}"))
    for a, b in combinations(cols, 2):
        aggs.append(F.sum(s[a] * s[b]).alias(f"_sp_{a}_{b}"))
    moments = clean.agg(*aggs)

    def corr(a: str, b: str) -> F.Column:
        n = F.col("_n")
        covn = (n * F.col(f"_sp_{a}_{b}") - F.col(f"_s_{a}") * F.col(f"_s_{b}")).cast(
            "double"
        )
        varn_a = (n * F.col(f"_ss_{a}") - F.col(f"_s_{a}") * F.col(f"_s_{a}")).cast(
            "double"
        )
        varn_b = (n * F.col(f"_ss_{b}") - F.col(f"_s_{b}") * F.col(f"_s_{b}")).cast(
            "double"
        )
        return covn / (F.sqrt(varn_a) * F.sqrt(varn_b))

    def checked(a: str, b: str) -> F.Column:
        # decimal overflow (> 38 digits) NULLs the product with ANSI
        # off; with non-null inputs guaranteed by dropna, a NULL corr
        # at n > 0 has no other cause -> fail loud, never silently
        c = corr(a, b)
        return F.when(F.col("_n") == 0, F.lit(None).cast("double")).otherwise(
            F.coalesce(
                c,
                F.raise_error(
                    F.lit(
                        f"correlation_matrix: DECIMAL(38,0) overflow on "
                        f"({a}, {b}) — n * 10^decimals * max|v| exceeds "
                        f"10^19; lower `decimals` or pre-aggregate"
                    )
                ).cast("double"),
            )
        )

    pairs = [
        F.struct(
            F.lit(a).alias("col_a"),
            F.lit(b).alias("col_b"),
            checked(a, b).alias("corr"),
        )
        for a, b in combinations(cols, 2)
    ]
    return moments.select(
        F.col("_n").cast("long").alias("n"), F.explode(F.array(*pairs)).alias("_p")
    ).select("_p.col_a", "_p.col_b", "n", F.col("_p.corr").alias("corr"))


def rank_quantiles(
    df: DataFrame, keys: list[str], value_col: str, qs: dict[str, float]
) -> DataFrame:
    """Per-key exact rank-position quantiles (percentile_disc: the
    value at rank ceil(q*n) of the value-sorted NON-NULL rows) — the
    one shared implementation of the idiom q53 and the IQR fences
    both use. Returns (keys..., n_values, <name per q>). Null values
    are excluded from both the ranking and n (a null at the ceil-rank
    position would otherwise null the quantile for the whole key);
    deterministic under ties and engine-portable where
    approx_percentile sketches are not."""
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(value_col)
    cw = Window.partitionBy(*keys)
    ranked = df.filter(F.col(value_col).isNotNull()).select(
        *keys,
        value_col,
        F.row_number().over(w).alias("_rn"),
        F.count(F.lit(1)).over(cw).alias("_n"),
    )
    return ranked.groupBy(*keys).agg(
        F.max("_n").cast("long").alias("n_values"),
        *[
            F.max(
                F.when(
                    F.col("_rn") == F.ceil(F.lit(q) * F.col("_n")),
                    F.col(value_col),
                )
            ).alias(name)
            for name, q in qs.items()
        ],
    )
