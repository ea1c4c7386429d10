"""As-of (backward) join — the time-series operator Spark lacks.

The reference sidesteps it with densify+ffill (SURVEY.md §2.4 J13,
core_coin_market_data.py:194-299); that works when the right side can
be densified to daily grain, but at 100 TB materializing a dense daily
matrix just to look up "most recent price on or before t" wastes a full
scaffold build. This operator does the lookup directly with the
union-and-fill technique:

1. tag left (probe) and right (quote) rows, union them;
2. one window sorted by (keys, time, tag) forward-fills the quote
   columns — quotes sort before probes at equal timestamps so
   "on or before" includes same-instant quotes;
3. keep only probe rows.

Cost: ONE shuffle of left+right on the join keys — same order as the
equi-join Spark would do anyway, with no scaffold explosion and no
range-join quadratic blowup. Skewed keys fall under AQE like any
window.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    on: str,
    value_cols: Sequence[str],
    tolerance=None,
) -> DataFrame:
    """For each left row: attach the right row's value_cols from the
    greatest right.`on` <= left.`on` within the same `keys` (null when
    no prior quote exists). Ties among right rows at the same instant
    resolve to the last under the window order (deterministic given
    unique (keys, on) on the right — dedupe first otherwise).

    `tolerance`: max allowed left.on - quote.on gap (same units as
    `on`); a staler match nulls out — pandas merge_asof's tolerance,
    the guard that stops a week-old price valuing today's balance.
    Implemented by forward-filling the quote TIMESTAMP alongside the
    values (one extra column through the same window, no extra
    shuffle)."""
    keys = list(keys)
    tagged_r = right.select(
        *keys, on, *[F.col(c).alias(f"_q_{c}") for c in value_cols]
    ).withColumn("_probe", F.lit(0))
    tagged_l = left.withColumn("_probe", F.lit(1))
    for c in value_cols:
        tagged_l = tagged_l.withColumn(f"_q_{c}", F.lit(None).cast(dict(tagged_r.dtypes)[f"_q_{c}"]))
    unioned = tagged_l.unionByName(tagged_r, allowMissingColumns=True)
    # Collision-proof internal name: a value column literally named
    # "ts" must not alias the quote-timestamp tracker.
    unioned = unioned.withColumn(
        "__asof_q_ts", F.when(F.col("_probe") == 0, F.col(on))
    )

    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(on).asc(), F.col("_probe").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for c in value_cols:
        unioned = unioned.withColumn(
            f"_q_{c}", F.last(f"_q_{c}", ignorenulls=True).over(w)
        )
    unioned = unioned.withColumn(
        "__asof_q_ts", F.last("__asof_q_ts", ignorenulls=True).over(w)
    )
    out = unioned.filter(F.col("_probe") == 1).drop("_probe")
    if tolerance is not None:
        stale = (F.col(on) - F.col("__asof_q_ts")) > F.lit(tolerance)
        for c in value_cols:
            out = out.withColumn(
                f"_q_{c}", F.when(stale, F.lit(None)).otherwise(F.col(f"_q_{c}"))
            )
    out = out.drop("__asof_q_ts")
    for c in value_cols:
        out = out.withColumnRenamed(f"_q_{c}", c)
    return out


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    on: str,
    value_cols: Sequence[str],
    tolerance=None,
) -> DataFrame:
    """Mirror of asof_join_backward: smallest right.`on` >= left.`on`
    (the "next quote" lookup). Same one-shuffle union-and-fill plan
    with the window frame reversed."""
    keys = list(keys)
    tagged_r = right.select(
        *keys, on, *[F.col(c).alias(f"_q_{c}") for c in value_cols]
    ).withColumn("_probe", F.lit(0))
    tagged_l = left.withColumn("_probe", F.lit(1))
    for c in value_cols:
        tagged_l = tagged_l.withColumn(f"_q_{c}", F.lit(None).cast(dict(tagged_r.dtypes)[f"_q_{c}"]))
    unioned = tagged_l.unionByName(tagged_r, allowMissingColumns=True)
    unioned = unioned.withColumn(
        "__asof_q_ts", F.when(F.col("_probe") == 0, F.col(on))
    )

    # quotes sort AFTER probes at equal timestamps under descending
    # probe order... simpler: ascending time, probe DESC puts the
    # quote after the probe at ties; a forward-looking frame with
    # first(ignorenulls) picks the next quote INCLUDING same-instant.
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(on).asc(), F.col("_probe").desc())
        .rowsBetween(0, Window.unboundedFollowing)
    )
    for c in value_cols:
        unioned = unioned.withColumn(
            f"_q_{c}", F.first(f"_q_{c}", ignorenulls=True).over(w)
        )
    unioned = unioned.withColumn(
        "__asof_q_ts", F.first("__asof_q_ts", ignorenulls=True).over(w)
    )
    out = unioned.filter(F.col("_probe") == 1).drop("_probe")
    if tolerance is not None:
        stale = (F.col("__asof_q_ts") - F.col(on)) > F.lit(tolerance)
        for c in value_cols:
            out = out.withColumn(
                f"_q_{c}", F.when(stale, F.lit(None)).otherwise(F.col(f"_q_{c}"))
            )
    out = out.drop("__asof_q_ts")
    for c in value_cols:
        out = out.withColumnRenamed(f"_q_{c}", c)
    return out
