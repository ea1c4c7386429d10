"""Expectation-suite tests + the recomputation audit run end-to-end on
the sf0.001 testdata (the dbt layer's Spark equivalent, SURVEY.md §5.3)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from etl_pipelines_spark.operators.windows import cumulative_window
from etl_pipelines_spark.plans.wallet_profits import recomputation_audit
from etl_pipelines_spark.quality import (
    assert_all,
    expect_dense_sequence,
    expect_lowercase,
    expect_monotone,
    expect_no_date_gaps,
    expect_non_negative,
    expect_not_null,
    expect_referential_integrity,
    expect_unique,
)

D = dt.date


class TestExpectations:
    def test_unique(self, spark):
        ok = spark.createDataFrame([(1, "a"), (2, "a")], "id long, v string")
        dup = spark.createDataFrame([(1, "a"), (1, "b")], "id long, v string")
        assert expect_unique(ok, ["id"]).passed
        r = expect_unique(dup, ["id"])
        assert not r.passed and r.n_violations == 1

    def test_not_null(self, spark):
        df = spark.createDataFrame([(1, "a"), (None, "b")], "id long, v string")
        assert not expect_not_null(df, ["id"]).passed
        assert expect_not_null(df, ["v"]).passed

    def test_no_date_gaps(self, spark):
        ok = spark.createDataFrame(
            [("c", D(2024, 1, 1)), ("c", D(2024, 1, 2))], "k string, date date"
        )
        gap = spark.createDataFrame(
            [("c", D(2024, 1, 1)), ("c", D(2024, 1, 3))], "k string, date date"
        )
        assert expect_no_date_gaps(ok, ["k"]).passed
        assert not expect_no_date_gaps(gap, ["k"]).passed

    def test_non_negative_with_tolerance(self, spark):
        df = spark.createDataFrame([(-0.05,), (5.0,)], "v double")
        assert expect_non_negative(df, "v", tolerance=0.1).passed
        assert not expect_non_negative(df, "v").passed

    def test_monotone(self, spark):
        ok = spark.createDataFrame(
            [("k", 1, 10.0), ("k", 2, 10.0), ("k", 3, 12.0)],
            "k string, seq int, v double",
        )
        bad = spark.createDataFrame(
            [("k", 1, 10.0), ("k", 2, 9.0)], "k string, seq int, v double"
        )
        assert expect_monotone(ok, ["k"], "seq", "v").passed
        assert not expect_monotone(bad, ["k"], "seq", "v").passed

    def test_dense_sequence(self, spark):
        ok = spark.createDataFrame(
            [("k", D(2024, 1, 1), 1), ("k", D(2024, 1, 5), 2)],
            "k string, date date, seq int",
        )
        bad = spark.createDataFrame(
            [("k", D(2024, 1, 1), 1), ("k", D(2024, 1, 5), 3)],
            "k string, date date, seq int",
        )
        assert expect_dense_sequence(ok, ["k"], "date", "seq").passed
        assert not expect_dense_sequence(bad, ["k"], "date", "seq").passed

    def test_lowercase(self, spark):
        df = spark.createDataFrame([("0xAbC",), ("0xdef",)], "addr string")
        r = expect_lowercase(df, "addr")
        assert not r.passed and r.n_violations == 1

    def test_referential_integrity(self, spark):
        child = spark.createDataFrame([("a",), ("zzz",)], "coin_id string")
        parent = spark.createDataFrame([("a",), ("b",)], "coin_id string")
        r = expect_referential_integrity(child, parent, ["coin_id"])
        assert not r.passed and r.n_violations == 1

    def test_assert_all_raises_with_details(self, spark):
        df = spark.createDataFrame([(1,), (1,)], "id long")
        with pytest.raises(AssertionError, match="unique"):
            assert_all(expect_unique(df, ["id"]), expect_not_null(df, ["id"]))


class TestPipelineInvariants:
    """Run the dbt-equivalent suite + recomputation audit against the
    engine's own kernel output on sf0.001 — the reference's test
    topology (build table, then audit it)."""

    @pytest.fixture(scope="class")
    def frames(self, spark):
        from etl_pipelines_spark.queries.timeseries import daily_prices, transfers

        sf = "/root/testdata/sf0.001"
        x = transfers(spark, sf)
        x = x.withColumn(
            "balance",
            F.sum("net_transfers")
            .over(cumulative_window(["coin_id", "wallet_address"], ["date"]))
            .cast("double"),
        )
        p = daily_prices(spark, sf)
        from etl_pipelines_spark.queries import QUERIES

        profits = QUERIES["q22_wallet_profits_kernel"].spark_fn(spark, sf)
        return profits.cache(), x.cache(), p.cache()

    def test_kernel_invariants(self, frames):
        profits, _, _ = frames
        assert_all(
            expect_unique(profits, ["coin_id", "wallet_address", "date"]),
            expect_not_null(profits, ["coin_id", "wallet_address", "date"]),
            expect_monotone(
                profits, ["coin_id", "wallet_address"], "date", "usd_inflows_cumulative"
            ),
            expect_non_negative(profits, "usd_inflows"),
        )

    def test_recomputation_audit_green(self, frames):
        profits, x, p = frames
        violations = recomputation_audit(profits, x, p, n_coins=300)
        assert violations.count() == 0

    def test_recomputation_audit_catches_corruption(self, frames):
        profits, x, p = frames
        corrupted = profits.withColumn(
            "profits_change",
            F.when(
                F.col("profits_change") != 0, F.col("profits_change") * 10 + 100
            ).otherwise(F.col("profits_change")),
        )
        assert recomputation_audit(corrupted, x, p, n_coins=300).count() > 0


class TestWhaleThresholds:
    def test_fdv_ceiling_applies(self):
        from etl_pipelines_spark.plans.whale_chart import derive_whale_thresholds

        # $50k request against a $1M-FDV microcap -> capped at $10k
        shrimp, whale = derive_whale_thresholds(
            price=2.0, fdv=1_000_000, whale_threshold_usd=50_000
        )
        assert whale == 10_000 / 2.0  # 1% FDV in tokens
        assert shrimp == (10_000 / 20) / 2.0  # whale/20 (under $20k)

    def test_shrimp_cap_at_1000_usd(self):
        from etl_pipelines_spark.plans.whale_chart import derive_whale_thresholds

        shrimp, whale = derive_whale_thresholds(
            price=1.0, fdv=100_000_000, whale_threshold_usd=100_000
        )
        assert whale == 100_000
        assert shrimp == 1000.0  # capped, not whale/20

    def test_token_input_converts_to_usd(self):
        from etl_pipelines_spark.plans.whale_chart import derive_whale_thresholds

        shrimp, whale = derive_whale_thresholds(
            price=4.0, fdv=100_000_000, whale_threshold_tokens=2500
        )
        assert whale == 2500  # 2500 tokens * $4 = $10k, under both caps
        assert shrimp == 125  # $500 / $4


class TestFusedBalanceAudit:
    """The q72 fused cascade must agree with the per-rule builders on a
    frame where EVERY rule genuinely fires (the catalog corpus violates
    only the negative-balance and date-gap rules)."""

    def _frame(self, spark):
        rows = [
            # pair (1, 'w1'): clean except one negative balance
            (1, "w1", D(2024, 1, 1), 5.0),
            (1, "w1", D(2024, 1, 2), -3.0),
            (1, "w1", D(2024, 1, 3), 2.0),
            # pair (1, 'w2'): date gap (missing Jan 2) + duplicate triple
            (1, "w2", D(2024, 1, 1), 1.0),
            (1, "w2", D(2024, 1, 3), 1.0),
            (1, "w2", D(2024, 1, 3), 4.0),
            # pair (2, None): null key rows (2 rows)
            (2, None, D(2024, 1, 1), 1.0),
            (2, None, D(2024, 1, 2), -0.05),  # inside tolerance
            # pair (2, 'w3'): null date row
            (2, "w3", None, 7.0),
        ]
        return spark.createDataFrame(
            rows, "coin_id long, wallet_address string, date date, balance double"
        )

    def test_matches_per_rule_builders(self, spark):
        from etl_pipelines_spark.quality import (
            date_gap_violations,
            fused_balance_audit,
            negative_violations,
            not_null_violations,
            unique_violations,
        )

        df = self._frame(spark)
        keys = ["coin_id", "wallet_address"]
        got = {
            r["rule"]: r["n_violations"]
            for r in fused_balance_audit(df, keys, tolerance=0.1).collect()
        }
        assert got["negative_balance"] == negative_violations(df, "balance", 0.1).count()
        assert got["no_date_gaps"] == date_gap_violations(df, keys).count()
        assert got["unique"] == unique_violations(df, [*keys, "date"]).count()
        assert got["not_null"] == not_null_violations(df, [*keys, "date"]).count()
        # and every branch fired on real rows
        assert got["negative_balance"] == 1  # -3.0 only; -0.05 inside tol
        assert got["no_date_gaps"] == 1  # pair (1, w2)
        assert got["unique"] == 1  # (1, w2, Jan 3) twice
        assert got["not_null"] == 3  # two null-wallet rows + one null date

    def test_custom_labels_flow_through(self, spark):
        from etl_pipelines_spark.quality import fused_balance_audit

        out = fused_balance_audit(
            self._frame(spark),
            ["coin_id", "wallet_address"],
            labels=("a", "b", "c", "d"),
        )
        assert sorted(r["rule"] for r in out.collect()) == ["a", "b", "c", "d"]
