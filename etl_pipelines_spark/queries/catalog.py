"""Registry + cross-engine determinism helpers.

Cross-engine float discipline: a SUM over doubles is order-dependent,
and Spark/DuckDB aggregate in different orders (and DuckDB's windowed
sums use segment trees). Every *unordered* aggregation over a float
column therefore routes through DECIMAL (exact, order-independent) and
casts the final result back to double — both engines then produce
bit-identical values. Columns that are integral-valued doubles (e.g.
l_quantity) are summed directly: integer double sums are exact.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipelines_spark.sources.registry import load_table


@dataclass
class QuerySpec:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None -> rows-only check
    description: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


QUERIES: dict[str, QuerySpec] = {}


def register(
    name: str, oracle: str | None, description: str = "", tags: tuple[str, ...] = ()
):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = QuerySpec(name, fn, oracle, description, tags)
        return fn

    return deco


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------- helpers
#
# Determinism rules (validated empirically against DuckDB):
# 1. DECIMAL sums are exact and order-independent, BUT the final
#    decimal->double conversion differs across engines once the scaled
#    integer exceeds 2^53 (DuckDB converts int128->double then divides;
#    Spark rounds the exact decimal once). Keep scale low (4) so sums
#    stay far below 2^53.
# 2. double->DECIMAL casts of *arbitrary* doubles are hazardous (DuckDB
#    scales-then-rounds in float). Only cast doubles that carry <= `scale`
#    true decimal digits (money columns). For arbitrary doubles use the
#    floor-scaled-BIGINT route: FLOOR(x * S) is bit-identical on
#    identical doubles, integer sums are exact in any order.

DEC = "decimal(38,4)"


def dsum(col: Column | str, scale: str = DEC) -> Column:
    """Order-independent exact sum of a low-decimal float column -> double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(scale)).cast("double")


def davg(col: Column | str, scale: str = DEC) -> Column:
    """avg as exact-sum / count -> double (deterministic division)."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(c.cast(scale)).cast("double") / F.count(c)).cast("double")


def o_dsum(expr: str, scale: str = "DECIMAL(38,4)") -> str:
    return f"CAST(SUM(CAST({expr} AS {scale})) AS DOUBLE)"


def o_davg(expr: str, scale: str = "DECIMAL(38,4)") -> str:
    return f"CAST(CAST(SUM(CAST({expr} AS {scale})) AS DOUBLE) / COUNT({expr}) AS DOUBLE)"
