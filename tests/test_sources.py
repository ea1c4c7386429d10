"""Source-layer tests: JSON lake round-trip with per-row error capture,
JSON-string column parse with error side-channel, CSV config tables."""

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from etl_pipelines_spark.sources.config_tables import (
    apply_exclusions,
    normalize_exclusion_list,
    read_config_csv,
)
from etl_pipelines_spark.sources.json_lake import (
    parse_json_column,
    read_json_lake,
    write_json_lake,
)

SCHEMA = StructType(
    [StructField("id", LongType()), StructField("name", StringType())]
)


def test_json_lake_round_trip(spark, tmp_path):
    path = str(tmp_path / "lake")
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string")
    write_json_lake(df, path)
    good, errors = read_json_lake(spark, path, SCHEMA)
    assert {(r["id"], r["name"]) for r in good.collect()} == {(1, "a"), (2, "b")}
    assert errors.count() == 0


def test_json_lake_corrupt_rows_diverted(spark, tmp_path):
    path = str(tmp_path / "lake")
    (tmp_path / "lake").mkdir()
    (tmp_path / "lake" / "part-0.json").write_text(
        '{"id": 1, "name": "ok"}\n'
        "this is not json\n"
        '{"id": "not_a_number", "name": "bad_type"}\n'
    )
    good, errors = read_json_lake(spark, path, SCHEMA)
    assert [r["id"] for r in good.collect()] == [1]
    raw = {r["raw_record"] for r in errors.collect()}
    assert len(raw) == 2
    assert any("not json" in r for r in raw)


def test_parse_json_column_side_channel(spark):
    df = spark.createDataFrame(
        [(1, '{"k": 5, "v": "x"}'), (2, "garbage{"), (3, '{"k": 7, "v": "y"}')],
        "row_id long, payload string",
    )
    good, errors = parse_json_column(df, "payload", "k long, v string")
    assert {(r["row_id"], r["k"], r["v"]) for r in good.collect()} == {
        (1, 5, "x"),
        (3, 7, "y"),
    }
    assert [r["raw_record"] for r in errors.collect()] == ["garbage{"]


def test_config_csv_and_exclusions(spark, tmp_path):
    csv = tmp_path / "exclusions.csv"
    csv.write_text(
        "wallet_address,chain,reason\n"
        "  0xAbC  ,Ethereum,cex\n"
        "0xabc,ethereum,cex\n"  # dupe after normalization
        "0xdef,solana,burn\n"
        ",,empty_row\n"
    )
    raw = read_config_csv(
        spark, str(csv), "wallet_address string, chain string, reason string"
    )
    excl = normalize_exclusion_list(raw)
    got = {(r["wallet_address"], r["chain"]) for r in excl.collect()}
    assert got == {("0xabc", "ethereum"), ("0xdef", "solana")}

    facts = spark.createDataFrame(
        [("0xabc", 1.0), ("0x999", 2.0)], "wallet_address string, v double"
    )
    kept = apply_exclusions(facts, excl)
    assert [r["wallet_address"] for r in kept.collect()] == ["0x999"]


class TestSchemaDrift:
    def test_no_drift_on_matching_schema(self, spark):
        from pyspark.sql.types import LongType, StringType, StructField, StructType

        from etl_pipelines_spark.sources.registry import assert_no_drift, schema_drift

        df = spark.createDataFrame([(1, "a")], "id long, name string")
        expected = StructType(
            [StructField("id", LongType()), StructField("name", StringType())]
        )
        assert schema_drift(df, expected) == {"added": [], "missing": [], "retyped": []}
        assert_no_drift(df, expected)  # no raise

    def test_detects_added_missing_retyped(self, spark):
        import pytest as _pytest
        from pyspark.sql.types import (
            DoubleType,
            LongType,
            StringType,
            StructField,
            StructType,
        )

        from etl_pipelines_spark.sources.registry import assert_no_drift, schema_drift

        df = spark.createDataFrame([(1, "a", 2.0)], "id long, name string, extra double")
        expected = StructType(
            [
                StructField("id", LongType()),
                StructField("name", DoubleType()),  # retyped
                StructField("gone", StringType()),  # missing
            ]
        )
        drift = schema_drift(df, expected)
        assert drift["added"] == ["extra"]
        assert drift["missing"] == ["gone"]
        assert drift["retyped"] == ["name: expected double, got string"]
        with _pytest.raises(ValueError, match="schema drift in orders"):
            assert_no_drift(df, expected, table="orders")
