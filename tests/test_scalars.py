"""Scalar-function tests (F6/F7 ports)."""

import datetime as dt

from pyspark.sql import functions as F

from etl_pipelines_spark.functions import (
    deterministic_id,
    fit_numeric_38,
    human_format,
    unix_to_timestamp,
)


def one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def test_deterministic_id_stable_and_uuid_shaped(spark):
    df = spark.createDataFrame([("eth", "0xabc")], "chain string, address string")
    a = df.select(deterministic_id("chain", "address").alias("id")).collect()[0]["id"]
    b = df.select(deterministic_id("chain", "address").alias("id")).collect()[0]["id"]
    assert a == b
    parts = a.split("-")
    assert [len(p) for p in parts] == [8, 4, 4, 4, 12]
    other = df.select(deterministic_id("address", "chain").alias("id")).collect()[0]["id"]
    assert other != a  # key order matters


def test_fit_numeric_38_zero_floor(spark):
    df = spark.createDataFrame([(1e-40,), (1e-10,), (2.5,)], "p double")
    got = [
        float(r["v"]) for r in df.select(fit_numeric_38("p").alias("v")).collect()
    ]
    assert got[0] == 0.0
    assert got[1] != 0.0
    assert got[2] == 2.5


def test_human_format_buckets(spark):
    cases = {
        7437283.0: "7.44m",
        1234.0: "1.23k",
        12.0: "12",
        0.0678: "0.0678",
        2_500_000_000.0: "2.5B",
    }
    df = spark.createDataFrame([(k,) for k in cases], "n double")
    got = {
        r["n"]: r["h"]
        for r in df.select("n", human_format("n").alias("h")).collect()
    }
    for n, expected in cases.items():
        assert got[n] == expected, (n, got[n])


def test_unix_to_timestamp_autodetects_ms(spark):
    df = spark.createDataFrame([(1704067200,), (1704067200123,)], "e long")
    got = [r["t"] for r in df.select(unix_to_timestamp("e").alias("t")).collect()]
    assert got[0] == dt.datetime(2024, 1, 1, 0, 0, 0)
    assert got[1] == dt.datetime(2024, 1, 1, 0, 0, 0, 123000)
