"""As-of join operator tests (J13): backward lookup semantics."""

import datetime as dt

from etl_pipelines_spark.operators.asof import asof_join_backward

D = dt.date


def run(spark, probes, quotes):
    left = spark.createDataFrame(probes, "k string, date date")
    right = spark.createDataFrame(quotes, "k string, date date, price double")
    out = asof_join_backward(left, right, ["k"], "date", ["price"])
    return {(r["k"], r["date"]): r["price"] for r in out.collect()}


def test_backward_lookup_and_same_day_inclusive(spark):
    got = run(
        spark,
        [("a", D(2024, 1, 1)), ("a", D(2024, 1, 5)), ("a", D(2024, 1, 10))],
        [("a", D(2024, 1, 1), 10.0), ("a", D(2024, 1, 7), 70.0)],
    )
    assert got[("a", D(2024, 1, 1))] == 10.0  # same-day quote counts
    assert got[("a", D(2024, 1, 5))] == 10.0  # most recent prior
    assert got[("a", D(2024, 1, 10))] == 70.0


def test_null_before_first_quote(spark):
    got = run(
        spark,
        [("a", D(2024, 1, 1))],
        [("a", D(2024, 1, 5), 50.0)],
    )
    assert got[("a", D(2024, 1, 1))] is None


def test_keys_do_not_leak_across_groups(spark):
    got = run(
        spark,
        [("a", D(2024, 1, 5)), ("b", D(2024, 1, 5))],
        [("a", D(2024, 1, 1), 1.0)],
    )
    assert got[("a", D(2024, 1, 5))] == 1.0
    assert got[("b", D(2024, 1, 5))] is None


def test_all_probe_rows_preserved(spark):
    probes = [("a", D(2024, 1, d)) for d in range(1, 20)]
    got = run(spark, probes, [("a", D(2024, 1, 4), 4.0)])
    assert len(got) == 19


class TestRangeJoin:
    def test_point_in_interval_inclusive_bounds(self, spark):
        import datetime as dt

        from etl_pipelines_spark.operators.range_join import point_in_interval_join

        D = dt.date
        points = spark.createDataFrame(
            [("a", D(2024, 1, d)) for d in (1, 2, 3, 4, 5)], "k string, date date"
        )
        intervals = spark.createDataFrame(
            [("a", D(2024, 1, 2), D(2024, 1, 4), "x")],
            "k string, lo date, hi date, tag string",
        )
        got = sorted(
            r["date"].day
            for r in point_in_interval_join(
                points, intervals, ["k"], "date", "lo", "hi"
            ).collect()
        )
        assert got == [2, 3, 4]  # inclusive both ends

    def test_rejects_name_collision(self, spark):
        import datetime as dt

        import pytest as _pytest

        from etl_pipelines_spark.operators.range_join import point_in_interval_join

        df = spark.createDataFrame(
            [("a", dt.date(2024, 1, 1), dt.date(2024, 1, 2), dt.date(2024, 1, 1))],
            "k string, lo date, hi date, date date",
        )
        with _pytest.raises(ValueError, match="date"):
            point_in_interval_join(df, df, ["k"], "date", "lo", "hi")
