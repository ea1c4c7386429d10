"""Point-in-interval range join via interval bucketization.

Spark executes `point BETWEEN lo AND hi` joins as broadcast-nested-loop
unless an equi key carries the join — and even then, wide intervals
make the probe re-scan interval state. The scale-proof rewrite when
interval lengths are bounded (shipping windows, sessions, validity
ranges): explode each interval into its covered day buckets, then
equi-join points on (keys, bucket). Cost is O(rows x interval_days) on
the interval side — bounded and predictable — and the join itself is a
plain hash/sort-merge join with AQE skew handling, not a nested loop.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    keys: Sequence[str],
    point_col: str,
    lo_col: str,
    hi_col: str,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row (same `keys`) whose
    [lo, hi] day range covers the point (inclusive bounds).

    `point_col` must not already exist on the interval side — the
    exploded bucket takes that name so the join is a plain multi-column
    equi join on (*keys, point_col).
    """
    keys = list(keys)
    if point_col in intervals.columns:
        raise ValueError(f"intervals side already has a column named {point_col!r}")
    exploded = intervals.withColumn(
        point_col,
        F.explode(F.sequence(F.col(lo_col), F.col(hi_col), F.expr("interval 1 day"))),
    )
    return points.join(exploded, [*keys, point_col], how)
