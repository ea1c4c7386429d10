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


# ------------------------------------------------------------------ URLs
#
# URL-parsing family, porting the user-submitted-link triage of
# community_calls_processing.py:679-743: take the LAST whitespace
# token of the raw text (users paste "check this <url>"), strip the
# query string, then classify the source site and pull out the chain /
# pool-contract / coin-id by POSITION relative to marker path segments
# — including the reference's www-anchored fallback for coingecko URLs
# whose locale prefix breaks 'coins' indexing. All pure column
# expressions (no UDFs); every helper has a 1:1 ANSI-SQL rendering so
# the q103 member value-checks against the DuckDB oracle.


def url_clean(col: Column | str) -> Column:
    """Last whitespace-separated token, query string removed — the
    reference's two clean-up steps on nonstandardized user input."""
    c = F.col(col) if isinstance(col, str) else col
    last = F.regexp_extract(F.trim(c), r"(\S+)$", 1)
    return F.regexp_replace(last, r"\?.*$", "")


def url_host(col: Column | str) -> Column:
    """Authority component; scheme optional (users paste bare hosts)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract(c, r"^(?:[a-zA-Z][a-zA-Z0-9+.-]*://)?([^/?#]+)", 1)


def url_path(col: Column | str) -> Column:
    """Path component ('' when absent), query/fragment excluded."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract(
        c, r"^(?:[a-zA-Z][a-zA-Z0-9+.-]*://)?[^/?#]*(/[^?#]*)", 1
    )


def url_query_param(col: Column | str, key: str) -> Column:
    """Value of ?key=... ('' when absent) from the RAW url (call it
    before url_clean, which strips the query string). Whitespace ends
    the value — raw user text may continue past the url."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract(c, r"[?&]" + key + r"=([^&#\s]*)", 1)


def url_segment_near(col: Column | str, marker: str, offset: int) -> Column:
    """The '/'-split path segment at (position of `marker`) + offset —
    the reference's parts.index(...) +/- k idiom. NULL when the marker
    is absent or the offset lands outside the segment list (guarded:
    try_element_at would count negative indexes from the END, which is
    never what a parts.index(...)-1 port means)."""
    c = F.col(col) if isinstance(col, str) else col
    parts = F.split(c, "/")
    pos = F.array_position(parts, marker)  # 1-based, 0 when absent
    at = pos + F.lit(offset)
    return F.when(
        (pos > 0) & (at >= 1) & (at <= F.size(parts)),
        F.try_element_at(parts, at.cast("int")),
    )


def parse_call_url(col: Column | str) -> Column:
    """Struct(url, source, chain, token_ref) replicating the reference
    branch order (geckoterminal -> dexscreener -> dextools ->
    coingecko, substring match on the cleaned url; anything else is
    'other'):

    - geckoterminal: chain = segment BEFORE 'pools', token_ref (pool
      contract) = segment AFTER;
    - dexscreener: chain/pool = segments +1/+2 after 'dexscreener.com';
    - dextools: chain = segment before 'pair-explorer', pool = after;
    - coingecko: token_ref (coin id) = segment after 'coins', falling
      back to 'www.coingecko.com' + 2 (the reference's fix for
      locale-prefixed urls), chain = NULL.
    """
    # Column expressions have no let-binding, so a naive tree re-inlines
    # the cleaned url (two regexes over the caller's expression) into
    # every segment lookup and the '/'-split into every array_position
    # — ~300 KB of generated code per row batch, past the JVM's JIT
    # method limit, so the whole projection runs interpreted (measured
    # ~9x on a 2M-row parse). transform() over a 1-element array IS a
    # let: the lambda variable evaluates once per row and every
    # reference is a cheap slot read, keeping codegen small and JITed.
    def seg(parts: Column, marker: str, offset: int) -> Column:
        pos = F.array_position(parts, marker)
        at = pos + F.lit(offset)
        return F.when(
            (pos > 0) & (at >= 1) & (at <= F.size(parts)),
            F.try_element_at(parts, at.cast("int")),
        )

    null_s = F.lit(None).cast("string")

    def parsed(u: Column, parts: Column) -> Column:
        def row(source: Column, chain: Column, token_ref: Column) -> Column:
            return F.struct(
                u.alias("url"),
                source.alias("source"),
                chain.alias("chain"),
                token_ref.alias("token_ref"),
            )

        return (
            F.when(u.contains("geckoterminal"), row(
                F.lit("geckoterminal"), seg(parts, "pools", -1), seg(parts, "pools", 1)))
            .when(u.contains("dexscreener"), row(
                F.lit("dexscreener"), seg(parts, "dexscreener.com", 1),
                seg(parts, "dexscreener.com", 2)))
            .when(u.contains("dextools"), row(
                F.lit("dextools"), seg(parts, "pair-explorer", -1),
                seg(parts, "pair-explorer", 1)))
            .when(u.contains("coingecko"), row(
                F.lit("coingecko"), null_s,
                F.coalesce(seg(parts, "coins", 1),
                           seg(parts, "www.coingecko.com", 2))))
            .otherwise(row(F.lit("other"), null_s, null_s))
        )

    return F.element_at(
        F.transform(
            F.array(url_clean(col)),
            lambda u: F.element_at(
                F.transform(F.array(F.split(u, "/")), lambda parts: parsed(u, parts)),
                1,
            ),
        ),
        1,
    )
