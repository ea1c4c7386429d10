"""Outlier-rule tests (SURVEY.md §2.11 Q1-Q3): thresholds, boundary
values, and the per-coin escalation rules are the spec
(core_coin_wallet_transfers.py:306-385, orchestrator:286-317)."""

import datetime as dt

from pyspark.sql import functions as F

from etl_pipelines_spark.operators.outliers import (
    remove_market_cap_overage_wallets,
    remove_negative_balance_wallets,
    remove_supply_overage_wallets,
)

D = dt.date


def balances(spark, rows):
    return spark.createDataFrame(
        rows, "coin_id string, wallet_address string, date date, balance double"
    )


def pairs_of(df):
    return {
        (r["coin_id"], r["wallet_address"])
        for r in df.select("coin_id", "wallet_address").distinct().collect()
    }


class TestNegativeBalance:
    def test_negative_wallet_dropped_boundary_kept_out(self, spark):
        df = balances(
            spark,
            [
                ("c", "ok", D(2024, 1, 1), 5.0),
                ("c", "neg", D(2024, 1, 1), -0.5),
                ("c", "boundary", D(2024, 1, 1), -0.1),  # == -0.1: dropped (kept iff > -0.1)
                ("c", "tiny_neg", D(2024, 1, 1), -0.05),  # > -0.1: kept (tolerance)
            ],
        )
        got = pairs_of(remove_negative_balance_wallets(df))
        assert got == {("c", "ok"), ("c", "tiny_neg")}

    def test_coin_with_10_negative_wallets_fully_dropped(self, spark):
        rows = [("bad", f"w{i}", D(2024, 1, 1), -1.0) for i in range(10)]
        rows += [("bad", "good_wallet", D(2024, 1, 1), 5.0)]
        rows += [("fine", "w", D(2024, 1, 1), 5.0)]
        got = pairs_of(remove_negative_balance_wallets(balances(spark, rows)))
        assert got == {("fine", "w")}  # even bad's good wallet goes

    def test_coin_with_9_negative_wallets_keeps_good_wallets(self, spark):
        rows = [("c", f"w{i}", D(2024, 1, 1), -1.0) for i in range(9)]
        rows += [("c", "good", D(2024, 1, 1), 5.0)]
        got = pairs_of(remove_negative_balance_wallets(balances(spark, rows)))
        assert got == {("c", "good")}

    def test_dip_below_then_recover_still_dropped(self, spark):
        df = balances(
            spark,
            [("c", "w", D(2024, 1, 1), -2.0), ("c", "w", D(2024, 1, 2), 10.0)],
        )
        assert pairs_of(remove_negative_balance_wallets(df)) == set()


class TestSupplyOverage:
    def coins(self, spark, supply_by_coin):
        return spark.createDataFrame(
            [(c, s) for c, s in supply_by_coin.items()],
            "coin_id string, total_supply double",
        )

    def test_overage_wallet_dropped_all_rows(self, spark):
        df = balances(
            spark,
            [
                ("c", "whale", D(2024, 1, 1), 150.0),  # > supply 100: dropped
                ("c", "whale", D(2024, 1, 2), 50.0),  # later fine, still dropped
                ("c", "ok", D(2024, 1, 1), 100.0),  # == supply: kept (strict >)
            ],
        )
        got = pairs_of(remove_supply_overage_wallets(df, self.coins(spark, {"c": 100.0})))
        assert got == {("c", "ok")}

    def test_coin_with_5_overage_wallets_fully_dropped(self, spark):
        rows = [("bad", f"w{i}", D(2024, 1, 1), 200.0) for i in range(5)]
        rows += [("bad", "ok", D(2024, 1, 1), 1.0)]
        rows += [("fine", "w", D(2024, 1, 1), 1.0)]
        got = pairs_of(
            remove_supply_overage_wallets(
                balances(spark, rows), self.coins(spark, {"bad": 100.0, "fine": 100.0})
            )
        )
        assert got == {("fine", "w")}


class TestMarketCapOverage:
    def test_overage_dropped_only_when_coin_has_few(self, spark):
        profits = spark.createDataFrame(
            [("c", "w_over", D(2024, 1, 1), 2000.0), ("c", "w_ok", D(2024, 1, 1), 10.0)]
            + [("noisy", f"w{i}", D(2024, 1, 1), 2000.0) for i in range(21)],
            "coin_id string, wallet_address string, date date, usd_balance double",
        )
        md = spark.createDataFrame(
            [("c", D(2024, 1, 1), 1000.0), ("noisy", D(2024, 1, 1), 1000.0)],
            "coin_id string, date date, market_cap double",
        )
        got = pairs_of(remove_market_cap_overage_wallets(profits, md))
        # coin c: 1 overage wallet <= 20 -> dropped; noisy: 21 > 20 ->
        # bad cap data, every wallet kept
        assert ("c", "w_over") not in got
        assert ("c", "w_ok") in got
        assert sum(1 for c, _ in got if c == "noisy") == 21

    def test_null_market_cap_never_overage(self, spark):
        profits = spark.createDataFrame(
            [("c", "w", D(2024, 1, 1), 2000.0)],
            "coin_id string, wallet_address string, date date, usd_balance double",
        )
        md = spark.createDataFrame(
            [("c", D(2024, 1, 1), None)], "coin_id string, date date, market_cap double"
        )
        assert pairs_of(remove_market_cap_overage_wallets(profits, md)) == {("c", "w")}


class TestIqrOutliers:
    def test_flags_extremes_only(self, spark):
        from etl_pipelines_spark.operators.outliers import iqr_outliers

        vals = [10, 11, 12, 13, 14, 15, 16, 17, 18, 500]
        df = spark.createDataFrame(
            [(1, i, float(v)) for i, v in enumerate(vals)], "k int, i int, v double"
        )
        got = {r["i"]: r["is_outlier"] for r in iqr_outliers(df, ["k"], "v").collect()}
        assert got[9] is True  # the 500
        assert all(not got[i] for i in range(9))

    def test_constant_series_flags_nothing(self, spark):
        from etl_pipelines_spark.operators.outliers import iqr_outliers

        df = spark.createDataFrame(
            [(1, i, 7.0) for i in range(20)], "k int, i int, v double"
        )
        assert iqr_outliers(df, ["k"], "v").filter("is_outlier").count() == 0

    def test_null_values_do_not_poison_fences(self, spark):
        from etl_pipelines_spark.operators.outliers import iqr_outliers

        vals = [None, 10.0, 11.0, 12.0, 13.0, 14.0, 15.0, 16.0, 17.0, 500.0]
        df = spark.createDataFrame(
            [(1, i, v) for i, v in enumerate(vals)], "k int, i int, v double"
        )
        got = {r["i"]: r["is_outlier"] for r in iqr_outliers(df, ["k"], "v").collect()}
        assert got[9] is True  # fences intact despite the null
        assert got[0] is False  # the null row itself is not an outlier
        assert all(got[i] is False for i in range(1, 9))
