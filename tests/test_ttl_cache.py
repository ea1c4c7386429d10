"""TTL cache-table tests: miss builds, hit serves without rebuilding,
expiry rebuilds, invalidate forces a rebuild (the reference's
bigquery_cache_sql lifecycle with an injected clock)."""

import datetime as dt

from etl_pipelines_spark.sources.ttl_cache import (
    cache_status,
    cached_query,
    invalidate,
)

T0 = dt.datetime(2024, 6, 1, 12, 0, tzinfo=dt.timezone.utc)


def _builder_counting(calls, rows):
    def build(spark):
        calls.append(1)
        return spark.createDataFrame(rows, "k string, v long")

    return build


def test_miss_builds_and_returns(spark, tmp_path):
    calls = []
    res = cached_query(
        spark, str(tmp_path), "a", _builder_counting(calls, [("x", 1)]), now=T0
    )
    assert res.refreshed and len(calls) == 1
    assert res.df.collect()[0]["k"] == "x"


def test_hit_within_ttl_skips_builder(spark, tmp_path):
    calls = []
    build = _builder_counting(calls, [("x", 1)])
    cached_query(spark, str(tmp_path), "a", build, now=T0)
    res = cached_query(
        spark, str(tmp_path), "a", build, now=T0 + dt.timedelta(hours=23)
    )
    assert not res.refreshed and len(calls) == 1
    assert [r["v"] for r in res.df.collect()] == [1]


def test_expiry_rebuilds_with_fresh_data(spark, tmp_path):
    calls = []
    cached_query(
        spark, str(tmp_path), "a", _builder_counting(calls, [("x", 1)]), now=T0
    )
    res = cached_query(
        spark,
        str(tmp_path),
        "a",
        _builder_counting(calls, [("x", 2)]),
        now=T0 + dt.timedelta(hours=25),
    )
    assert res.refreshed and len(calls) == 2
    assert [r["v"] for r in res.df.collect()] == [2]


def test_entries_are_independent(spark, tmp_path):
    calls = []
    cached_query(
        spark, str(tmp_path), "a", _builder_counting(calls, [("x", 1)]), now=T0
    )
    res_b = cached_query(
        spark, str(tmp_path), "b", _builder_counting(calls, [("y", 9)]), now=T0
    )
    assert res_b.refreshed and len(calls) == 2


def test_invalidate_forces_rebuild(spark, tmp_path):
    calls = []
    build = _builder_counting(calls, [("x", 1)])
    cached_query(spark, str(tmp_path), "a", build, now=T0)
    invalidate(spark, str(tmp_path), "a")
    res = cached_query(
        spark, str(tmp_path), "a", build, now=T0 + dt.timedelta(minutes=1)
    )
    assert res.refreshed and len(calls) == 2


def test_cache_status_reports_age(spark, tmp_path):
    calls = []
    cached_query(
        spark, str(tmp_path), "a", _builder_counting(calls, [("x", 1)]), now=T0
    )
    row = cache_status(
        spark, str(tmp_path), "a", now=T0 + dt.timedelta(hours=6)
    ).collect()[0]
    assert row["name"] == "a" and abs(row["age_hours"] - 6.0) < 1e-6
    assert cache_status(spark, str(tmp_path), "missing", now=T0).count() == 0
