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


def test_url_component_family(spark):
    from etl_pipelines_spark.functions.scalars import (
        parse_call_url,
        url_clean,
        url_host,
        url_path,
        url_query_param,
        url_segment_near,
    )

    rows = [
        (1, "  check this https://dexscreener.com/solana/0xpool?utm_source=tg "),
        (2, "https://www.geckoterminal.com/eth/pools/0xabc"),
        (3, "geckoterminal.com/bsc/pools/0xfeed?ref=tw"),
        (4, "https://www.coingecko.com/en/coins/hathor"),
        (5, "https://www.coingecko.com/id/koin_koin/hathor"),
        (6, "no link here"),
        (7, "https://www.dextools.io/app/en/ether/pair-explorer/0xdt1"),
    ]
    df = spark.createDataFrame(rows, "i long, raw string")
    got = {
        r["i"]: r
        for r in df.select(
            "i",
            url_clean("raw").alias("clean"),
            url_host(url_clean("raw")).alias("host"),
            url_path(url_clean("raw")).alias("path"),
            url_query_param("raw", "utm_source").alias("utm"),
            url_query_param("raw", "ref").alias("ref"),
            parse_call_url("raw").alias("p"),
        ).collect()
    }
    # clean: last whitespace token, query stripped
    assert got[1]["clean"] == "https://dexscreener.com/solana/0xpool"
    assert got[3]["clean"] == "geckoterminal.com/bsc/pools/0xfeed"
    # host with and without scheme
    assert got[1]["host"] == "dexscreener.com"
    assert got[3]["host"] == "geckoterminal.com"
    assert got[6]["host"] == "here"  # last token of junk text
    # path excludes query/fragment; '' when absent
    assert got[1]["path"] == "/solana/0xpool"
    assert got[6]["path"] == ""
    # query params read from the RAW url before cleaning
    assert got[1]["utm"] == "tg"
    assert got[3]["ref"] == "tw"
    assert got[2]["utm"] == ""
    # parse_call_url: branch classification + extraction
    p = {i: got[i]["p"].asDict() for i in got}
    assert p[1] == {"url": got[1]["clean"], "source": "dexscreener",
                    "chain": "solana", "token_ref": "0xpool"}
    assert p[2]["chain"] == "eth" and p[2]["token_ref"] == "0xabc"
    assert p[3]["chain"] == "bsc" and p[3]["token_ref"] == "0xfeed"
    assert p[4]["source"] == "coingecko" and p[4]["token_ref"] == "hathor"
    # the reference's www-anchored fallback for locale-prefixed urls
    assert p[5]["token_ref"] == "koin_koin" and p[5]["chain"] is None
    assert p[6] == {"url": "here", "source": "other",
                    "chain": None, "token_ref": None}
    assert p[7]["source"] == "dextools" and p[7]["chain"] == "ether"
    # marker-relative indexing never wraps to the end of the list
    probe = spark.createDataFrame([("pools/x",)], "u string")
    assert probe.select(
        url_segment_near("u", "pools", -1).alias("s")
    ).collect()[0]["s"] is None
