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


def fill_gaps_applyinpandas(
    df: DataFrame,
    keys: Sequence[str],
    date_col: str = "date",
    ffill_cols: Sequence[str] = ("price",),
    end_date=None,
) -> DataFrame:
    """Literal applyInPandas port of the reference's per-coin loop
    (core_coin_market_data.py:224-270): pandas reindex to a daily range
    + ffill + imputation-streak counter, one pandas group per key.

    Kept alongside the set-based densify (the preferred path) to
    demonstrate the custom-operator escape hatch and to cross-check the
    two implementations against each other. The set-based path wins at
    scale: no Python boundary, no per-group pandas materialization, and
    groups larger than memory can't OOM an executor.
    """
    import pandas as pd

    keys = list(keys)
    if end_date is None:
        end_date = df.agg(F.max(date_col)).first()[0]

    out_fields = [f"{k} string" for k in keys]
    out_fields += [f"{date_col} date"] + [f"{c} double" for c in ffill_cols]
    out_fields += ["days_imputed bigint"]
    schema = ", ".join(out_fields)

    def fill(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(date_col)
        key_vals = {k: pdf[k].iloc[0] for k in keys}
        full = pd.date_range(pdf[date_col].min(), end_date, freq="D").date
        idx = pdf.set_index(date_col).reindex(full)
        imputed = idx[ffill_cols[0]].isna()
        idx[list(ffill_cols)] = idx[list(ffill_cols)].ffill()
        # gaps-and-islands streak counter (reference :241-250)
        grp = (~imputed).cumsum()
        days = imputed.groupby(grp).cumsum()
        out = idx.reset_index(names=date_col)
        for k, v in key_vals.items():
            out[k] = v
        out["days_imputed"] = pd.array(
            [int(d) if m else None for d, m in zip(days, imputed)], dtype="Int64"
        )
        return out[keys + [date_col] + list(ffill_cols) + ["days_imputed"]]

    return df.groupBy(*keys).applyInPandas(fill, schema=schema)
