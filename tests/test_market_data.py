"""Market-data pipeline tests mirroring the reference's scenarios
(tests/test_core_coin_market_data.py:39-433): gap-fill with no/small/
large/non-consecutive gaps, and single-day dip removal."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from etl_pipelines_spark.operators.outliers import remove_single_day_dips
from etl_pipelines_spark.plans.market_data import (
    fill_market_data_gaps,
    normalize_market_data,
    union_with_source_priority,
)

D = dt.date


def make_md(spark, rows):
    return spark.createDataFrame(
        rows,
        "coin_id string, date date, price double, volume long, "
        "market_cap double, data_source string, updated_at timestamp",
    )


def row(coin, date, price, volume=100, cap=1000.0, src="a"):
    return (coin, date, price, volume, cap, src, dt.datetime(2024, 1, 1))


class TestGapFill:
    def collect_filled(self, spark, rows):
        out = fill_market_data_gaps(make_md(spark, rows))
        return {
            (r["coin_id"], r["date"]): r for r in out.collect()
        }

    def test_no_gaps_unchanged(self, spark):
        rows = [row("a", D(2024, 1, d), float(d)) for d in (1, 2, 3)]
        got = self.collect_filled(spark, rows)
        assert len(got) == 3
        assert all(g["days_imputed"] is None for g in got.values())

    def test_small_gap_ffill(self, spark):
        rows = [row("a", D(2024, 1, 1), 10.0), row("a", D(2024, 1, 3), 30.0)]
        got = self.collect_filled(spark, rows)
        filled = got[("a", D(2024, 1, 2))]
        assert filled["price"] == 10.0  # ffill from day 1
        assert filled["volume"] == 0
        assert filled["updated_at"] is None
        assert filled["days_imputed"] == 1

    def test_large_gap_counts_streak(self, spark):
        rows = [row("a", D(2024, 1, 1), 10.0), row("a", D(2024, 1, 5), 50.0)]
        got = self.collect_filled(spark, rows)
        assert [got[("a", D(2024, 1, d))]["days_imputed"] for d in (2, 3, 4)] == [1, 2, 3]
        assert all(got[("a", D(2024, 1, d))]["price"] == 10.0 for d in (2, 3, 4))
        assert got[("a", D(2024, 1, 5))]["days_imputed"] is None

    def test_non_consecutive_gaps_reset(self, spark):
        rows = [
            row("a", D(2024, 1, 1), 10.0),
            row("a", D(2024, 1, 3), 30.0),
            row("a", D(2024, 1, 6), 60.0),
        ]
        got = self.collect_filled(spark, rows)
        assert got[("a", D(2024, 1, 2))]["days_imputed"] == 1
        assert got[("a", D(2024, 1, 4))]["days_imputed"] == 1  # streak resets
        assert got[("a", D(2024, 1, 5))]["days_imputed"] == 2
        assert got[("a", D(2024, 1, 5))]["price"] == 30.0

    def test_fills_through_global_max(self, spark):
        # coin b ends Jan 2 but coin a runs to Jan 4: b is filled to Jan 4
        # (reference fills through the GLOBAL max, core_coin_market_data.py:213-215)
        rows = [
            row("a", D(2024, 1, 1), 1.0),
            row("a", D(2024, 1, 4), 4.0),
            row("b", D(2024, 1, 1), 9.0),
            row("b", D(2024, 1, 2), 8.0),
        ]
        got = self.collect_filled(spark, rows)
        assert got[("b", D(2024, 1, 4))]["price"] == 8.0
        assert got[("b", D(2024, 1, 4))]["days_imputed"] == 2


class TestDipRemoval:
    def prices(self, spark, seq):
        rows = [("a", D(2024, 1, i + 1), float(p)) for i, p in enumerate(seq)]
        return spark.createDataFrame(rows, "coin_id string, date date, price double")

    def surviving_days(self, spark, seq, **kw):
        out = remove_single_day_dips(self.prices(spark, seq), **kw)
        return sorted(r["date"].day for r in out.collect())

    def test_single_day_dip_removed(self, spark):
        # 100 -> 50 (dip: 0.5 < 0.8) -> 95 (recovery: 0.95 > 0.9)
        assert self.surviving_days(spark, [100, 50, 95]) == [1, 3]

    def test_dip_without_recovery_kept(self, spark):
        # 100 -> 50 -> 60: 0.6 < 0.9 recovery fails, genuine crash kept
        assert self.surviving_days(spark, [100, 50, 60]) == [1, 2, 3]

    def test_shallow_dip_kept(self, spark):
        # 100 -> 85: 0.85 >= 0.8 not a dip
        assert self.surviving_days(spark, [100, 85, 95]) == [1, 2, 3]

    def test_zero_price_dip_removed(self, spark):
        assert self.surviving_days(spark, [100, 0, 95]) == [1, 3]

    def test_edges_never_removed(self, spark):
        # first/last rows have null prev/next: comparisons null -> kept
        assert self.surviving_days(spark, [10, 100]) == [1, 2]


class TestNormalizeAndUnion:
    def test_non_positive_market_cap_nulled(self, spark):
        df = make_md(
            spark,
            [
                ("a", D(2024, 1, 1), 1.0, 10, -5.0, "a", dt.datetime(2024, 1, 1)),
                ("a", D(2024, 1, 2), 1.0, 10, 7.0, "a", dt.datetime(2024, 1, 1)),
            ],
        )
        caps = [r["market_cap"] for r in normalize_market_data(df).orderBy("date").collect()]
        assert caps == [None, 7.0]

    def test_zero_volume_dropped(self, spark):
        df = make_md(spark, [("a", D(2024, 1, 1), 1.0, 0, 1.0, "a", dt.datetime(2024, 1, 1))])
        assert normalize_market_data(df).count() == 0

    def test_secondary_source_fills_only_missing_keys(self, spark):
        primary = make_md(spark, [row("a", D(2024, 1, 1), 10.0, src="gecko")])
        secondary = make_md(
            spark,
            [
                row("a", D(2024, 1, 1), 99.0, src="terminal"),  # conflict: ignored
                row("a", D(2024, 1, 2), 20.0, src="terminal"),  # new key: kept
            ],
        )
        got = {
            r["date"]: (r["price"], r["data_source"])
            for r in union_with_source_priority(primary, secondary).collect()
        }
        assert got == {D(2024, 1, 1): (10.0, "gecko"), D(2024, 1, 2): (20.0, "terminal")}


class TestApplyInPandasParity:
    def test_pandas_port_matches_set_based_densify(self, spark):
        """The applyInPandas literal port (SURVEY §2.12) and the
        set-based sequence/explode densify must agree exactly."""
        from etl_pipelines_spark.operators.densify import (
            densify_daily,
            fill_gaps_applyinpandas,
            with_days_imputed,
        )
        from etl_pipelines_spark.operators.windows import forward_fill
        from etl_pipelines_spark.queries.timeseries import daily_prices

        daily = daily_prices(spark, "/root/testdata/sf0.001").filter(
            F.col("coin_id") < 15
        ).withColumn("coin_id", F.col("coin_id").cast("string"))

        set_based = forward_fill(
            with_days_imputed(
                densify_daily(daily, ["coin_id"], "date"),
                ["coin_id"],
                presence_col="price",
                date_col="date",
            ),
            ["coin_id"],
            ["date"],
            ["price"],
        ).select("coin_id", "date", "price", "days_imputed")

        pandas_port = fill_gaps_applyinpandas(
            daily, ["coin_id"], "date", ["price"]
        ).select("coin_id", "date", "price", "days_imputed")

        a = {(r["coin_id"], r["date"]): (r["price"], r["days_imputed"]) for r in set_based.collect()}
        b = {(r["coin_id"], r["date"]): (r["price"], r["days_imputed"]) for r in pandas_port.collect()}
        assert a == b
        assert len(a) > 0
