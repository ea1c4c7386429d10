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


# ------------------------------------------------------------------
# FingerprintCache: the train-once driver caches (q38 codebook, q64
# source domain, q89 merge list) must refresh when the table mutates
# under a cached sf path — never serve stale training artifacts.


def test_fingerprint_cache_refreshes_on_table_mutation(spark, tmp_path):
    import os

    from etl_pipelines_spark.sources.registry import FingerprintCache

    sf = str(tmp_path)
    path = os.path.join(sf, "documents.parquet")
    spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "doc_id long, source string"
    ).toPandas().to_parquet(path)

    cache = FingerprintCache("documents")
    builds = []

    def probe():
        builds.append(1)
        return sorted(
            r[0]
            for r in spark.read.parquet(path).select("source").distinct().collect()
        )

    assert cache.get_or_build(sf, probe) == ["alpha", "beta"]
    # unchanged table: served from cache, no rebuild
    assert cache.get_or_build(sf, probe) == ["alpha", "beta"]
    assert len(builds) == 1

    # mutate the table under the same path (same row count, new domain)
    spark.createDataFrame(
        [(1, "alpha"), (2, "gamma")], "doc_id long, source string"
    ).toPandas().to_parquet(path)
    os.utime(path, ns=(1, os.stat(path).st_mtime_ns + 1))
    assert cache.get_or_build(sf, probe) == ["alpha", "gamma"]
    assert len(builds) == 2

    # clear() empties the store entirely
    cache.clear()
    cache.get_or_build(sf, probe)
    assert len(builds) == 3


def test_fingerprint_cache_is_per_sf_path(spark, tmp_path):
    import os

    from etl_pipelines_spark.sources.registry import FingerprintCache

    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    for d, src in ((a, "one"), (b, "two")):
        os.makedirs(d)
        spark.createDataFrame(
            [(1, src)], "doc_id long, source string"
        ).toPandas().to_parquet(os.path.join(d, "documents.parquet"))
    cache = FingerprintCache("documents")
    build_a = lambda: "A"  # noqa: E731
    build_b = lambda: "B"  # noqa: E731
    assert cache.get_or_build(a, build_a) == "A"
    assert cache.get_or_build(b, build_b) == "B"
    assert cache.get_or_build(a, lambda: "STALE?") == "A"
