"""Scalar functions ported from the reference's row-wise Python (F6/F7)
into pure column expressions.

- deterministic_id replaces GENERATE_UUID() (core_coins.py:93,167,249):
  nondeterministic ids can never be hash-compared against an oracle
  (SURVEY.md §7.3.6), so ids derive from the natural key.
- fit_numeric_38 ports adjust_for_bigquery_numeric
  (coingecko_market_data.py:447-467): micro-cap prices below 1e-37
  floor to zero, everything else fits NUMERIC(38).
- human_format ports community_calls_processing.py:24-48 (7437283 ->
  '7.4m') for the serving layer.
- unix_to_timestamp ports the epoch handling at
  geckoterminal_market_data.py:358-372, including the reference's
  ms-vs-s disambiguation hack (coingecko_market_data.py:271-313 slices
  strings; here it's a magnitude test).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def deterministic_id(*key_cols: Column | str) -> Column:
    """UUID-shaped deterministic id from the natural key: md5 of the
    '|'-joined key, formatted 8-4-4-4-12. Stable across runs/engines —
    the determinism GENERATE_UUID() can't give (SURVEY.md §7.3.6)."""
    cols = [F.col(c) if isinstance(c, str) else c for c in key_cols]
    h = F.md5(F.concat_ws("|", *cols))
    return F.concat_ws(
        "-",
        F.substring(h, 1, 8),
        F.substring(h, 9, 4),
        F.substring(h, 13, 4),
        F.substring(h, 17, 4),
        F.substring(h, 21, 12),
    )


def fit_numeric_38(col: Column | str, scale: int = 18) -> Column:
    """Fit a double into DECIMAL(38, scale) with the reference's
    truncate-to-zero rule for values whose magnitude is below what the
    38-digit budget can represent (< 1e-37). Note: unlike the
    reference's per-value string reformatting, a Spark decimal column
    has ONE scale — values between 1e-37 and 10^-scale round to zero by
    ordinary decimal semantics. Per SURVEY.md §7.3.3 the engine keeps
    doubles for math and uses this only at ingest-fidelity boundaries."""
    c = F.col(col) if isinstance(col, str) else col
    floored = F.when(F.abs(c) < 1e-37, F.lit(0.0)).otherwise(c)
    return floored.cast(f"decimal(38,{scale})")


_SUFFIXES = ["", "k", "m", "B", "T"]


def human_format(col: Column | str) -> Column:
    """Scaled human-readable number: 7437283 -> '7.44m'. Magnitude
    buckets match the reference's suffix table; 3-significant-digit
    formatting via format_number."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.when(F.abs(c) < 1, F.format_number(c, 4))
    for i, suffix in enumerate(_SUFFIXES):
        lo, hi = 1000.0**i, 1000.0 ** (i + 1)
        scaled = F.format_number(c / F.lit(lo), 2)
        branch = F.concat(F.regexp_replace(scaled, r"\.?0+$", ""), F.lit(suffix))
        cond = (F.abs(c) >= lo) & (F.abs(c) < hi) if i < len(_SUFFIXES) - 1 else (
            F.abs(c) >= lo
        )
        out = out.when(cond, branch)
    return out


def unix_to_timestamp(col: Column | str) -> Column:
    """Epoch int -> timestamp, auto-detecting second vs millisecond
    resolution by magnitude (epochs past year 33658 can only be ms)."""
    c = (F.col(col) if isinstance(col, str) else col).cast("long")
    return F.when(
        c > 1_000_000_000_000, F.timestamp_millis(c)
    ).otherwise(F.timestamp_seconds(c))
