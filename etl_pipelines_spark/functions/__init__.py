"""Scalar-function library (SURVEY.md §2.3 F1-F7).

The reference's row-wise Python functions re-expressed as JVM-side
column expressions — no UDFs in any hot path.
"""

from etl_pipelines_spark.functions.scalars import (
    deterministic_id,
    fit_numeric_38,
    human_format,
    unix_to_timestamp,
)

__all__ = ["deterministic_id", "fit_numeric_38", "human_format", "unix_to_timestamp"]
