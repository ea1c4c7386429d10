"""JSON data-lake source/sink (SURVEY.md §2.1 S11/S14).

The reference persists raw API JSON to a GCS lake before parsing
(coingecko_market_data.py:409-412) and re-reads it with per-row error
capture (coingecko_parse_json.py:69-114; Dune row parse
retrieve_dune_transfer_data.py:540-569 keeps a parse-error side
channel). Spark equivalents:

- lake write/read = df.write.json / spark.read.json with an explicit
  schema (schema inference over a 100 TB lake would scan twice).
- per-row error capture = PERMISSIVE mode + columnNameOfCorruptRecord
  for file reads, and from_json's null-on-failure for string columns —
  bad rows land in an errors frame instead of failing the job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType, StringType

CORRUPT_COL = "_corrupt_record"


def write_json_lake(df: DataFrame, path: str, mode: str = "append") -> None:
    """Land raw records as JSON lines (the lake keeps the pre-parse
    artifact exactly like the reference's GCS dumps)."""
    df.write.mode(mode).json(path)


def read_json_lake(
    spark: SparkSession, path: str, schema: StructType
) -> tuple[DataFrame, DataFrame]:
    """Read a JSON-lines lake prefix with an explicit schema.

    Returns (good, errors): unparseable lines arrive with all schema
    fields null and the raw text in _corrupt_record — the reference's
    per-row error capture as a DataFrame split instead of a Python
    try/except loop.
    """
    read_schema = StructType(
        [*schema.fields, StructField(CORRUPT_COL, StringType(), True)]
    )
    raw = (
        spark.read.schema(read_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
    # json reader requires the corrupt column to be materialized via a
    # select/cache boundary before filtering on it
    raw = raw.cache()
    good = raw.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    errors = raw.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_record")
    )
    return good, errors


def parse_json_column(
    df: DataFrame, json_col: str, schema: StructType | str
) -> tuple[DataFrame, DataFrame]:
    """Parse a JSON-string column (Dune's one-object-per-row pattern,
    retrieve_dune_transfer_data.py:372-380,540-569).

    Returns (parsed, errors): rows whose JSON fails the schema get a
    null struct from from_json and are diverted to the errors frame
    with the offending payload.
    """
    if isinstance(schema, str):
        schema = StructType.fromDDL(schema)
    # from_json never yields a null struct in PERMISSIVE mode — bad rows
    # come back all-null. The reliable error signal is the corrupt-
    # record column declared INSIDE the struct schema.
    read_schema = StructType(
        [*schema.fields, StructField(CORRUPT_COL, StringType(), True)]
    )
    parsed = df.withColumn(
        "_parsed",
        F.from_json(
            F.col(json_col), read_schema, {"columnNameOfCorruptRecord": CORRUPT_COL}
        ),
    )
    bad = F.col(f"_parsed.{CORRUPT_COL}").isNotNull()
    good = (
        parsed.filter(~bad)
        .select("*", "_parsed.*")
        .drop("_parsed", json_col, CORRUPT_COL)
    )
    errors = parsed.filter(bad).select(F.col(json_col).alias("raw_record"))
    return good, errors
