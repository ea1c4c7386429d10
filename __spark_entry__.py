"""Driver contract for the spark-graft builder (PySpark target).

entry(spark): flagship wallet-profits kernel on sf0.001.
queries(): 50 driver-facing entries — exactly at the gate's 50-entry
  cap, no headroom — covering the 105-query internal registry: the
  SURVEY.md §2 operator inventory (scans, filters,
  scalar fns, every join type incl. as-of and range, aggs, windows
  incl. RANGE frames and rollup, densify/impute, set ops,
  incremental/streaming, outlier rules, the materialized quality
  audit, external federation, the FULL five-stage wallet-profits
  pipeline) + the LLM-data operators (exact/MinHash-LSH/SimHash/
  cosine/substring-span dedup + star-path canonical clustering, ANN, quantization,
  text quality, scrubbing, water-fill mixing, collocations, RAG
  chunking, multimodal features). Related internal queries are
  consolidated into tagged union combos (queries/combos.py) so every
  operator lands inside the correctness gate's 50-entry capture;
  members remain individually runnable via the internal registry.
oracle_sql(): DuckDB-runnable ANSI SQL twins for ALL entries —
  including the Structured Streaming rollup and the stream-stream
  attribution join, both verified against their batch oracles, and
  each combo's UNION ALL over its members' oracles.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from etl_pipelines_spark.queries import DRIVER_QUERIES
from etl_pipelines_spark.session import configure_runtime


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    configure_runtime(spark)
    return DRIVER_QUERIES["q22_wallet_profits_kernel"].spark_fn(
        spark, "/root/testdata/sf0.001"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            configure_runtime(spark)
            # Some entries persist shared signature/shingle frames
            # (their multi-branch plans need the cache; see SCALE.md).
            # Release the previous entry's frames here so a sequential
            # harness never accumulates executor storage across the
            # catalog.
            spark.catalog.clearCache()
            return fn(spark, sf_dir)

        return run

    return {name: wrap(spec.spark_fn) for name, spec in DRIVER_QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in DRIVER_QUERIES.items()
        if spec.oracle is not None
    }
