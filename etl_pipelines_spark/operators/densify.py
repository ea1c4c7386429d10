"""Time-series densification / gap-fill operators (SURVEY.md §2.7).

The reference densifies with a *Python loop over coins* + pandas
reindex (core_coin_market_data.py:213-270). Here it's set-based:
``sequence(min_date, global_max, interval 1 day)`` exploded per key,
left-joined back to facts — no driver loop, fully distributed, and the
explode is bounded per key exactly like the reference (fill from each
key's min(date) through the *global* max, core_coin_market_data.py:213-215).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etl_pipelines_spark.operators.windows import cumulative_window, ordered_window


def date_scaffold(
    df: DataFrame, keys: Sequence[str], date_col: str = "date", end_date=None
) -> DataFrame:
    """One row per key per day, from the key's min(date) through the
    global max(date) (D1). `end_date` overrides the global max."""
    keys = list(keys)
    mins = df.groupBy(*keys).agg(F.min(date_col).alias("_min_d"))
    if end_date is None:
        # cheap global scalar: aggregate then broadcast-cross-join (1 row)
        global_max = df.agg(F.max(date_col).alias("_max_d"))
        mins = mins.crossJoin(F.broadcast(global_max))
    else:
        mins = mins.withColumn("_max_d", F.lit(end_date).cast("date"))
    return (
        mins.withColumn(
            date_col,
            F.explode(F.sequence(F.col("_min_d"), F.col("_max_d"), F.expr("interval 1 day"))),
        )
        .drop("_min_d", "_max_d")
    )


def densify_daily(
    df: DataFrame, keys: Sequence[str], date_col: str = "date", end_date=None
) -> DataFrame:
    """Left-join the daily scaffold to the facts: rows appear for missing
    days with null metrics (D1)."""
    scaffold = date_scaffold(df, keys, date_col, end_date)
    return scaffold.join(df, [*keys, date_col], "left")


def with_days_imputed(
    df: DataFrame,
    keys: Sequence[str],
    presence_col: str,
    date_col: str = "date",
    out: str = "days_imputed",
) -> DataFrame:
    """Gaps-and-islands streak counter (W10/W11; reference:
    core_coin_market_data.py:241-250): ``days_imputed`` = 1,2,... within
    each null-streak of `presence_col`, null on real rows.

    The group id increments on every real row and on the first null of a
    streak — same boolean-cumsum trick as the reference, expressed with
    lag + running sum.
    """
    w = ordered_window(keys, [date_col])
    cum = cumulative_window(keys, [date_col])
    present = F.col(presence_col).isNotNull()
    prev_present = F.lag(F.col(presence_col), 1).over(w).isNotNull()
    new_group = (present | (~present & prev_present)).cast("long")
    df = df.withColumn("_grp", F.sum(new_group).over(cum))
    streak_w = Window.partitionBy(*keys, "_grp").orderBy(date_col)
    df = df.withColumn(
        out,
        F.when(~present, F.row_number().over(streak_w).cast("long")),
    )
    return df.drop("_grp")
