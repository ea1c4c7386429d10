"""Structured Streaming jobs mirroring the reference's ingest semantics.

- daily_event_rollup: watermarked tumbling 1-day aggregation (I4) —
  the streaming twin of the batch daily-net kernel (SURVEY.md §2.5 A2).
  Late rows inside the watermark update their day; beyond it they drop,
  which is exactly the reference's "closed day" discipline (I2).
- dedupe_upsert_sink: foreachBatch sink that dedupes at-least-once
  input on (keys, ts) before appending (I3) — the A6
  row_number-keep-latest pattern applied per micro-batch.
- running_balance_stateful: applyInPandasWithState custom operator —
  per-key running balance carried in explicit state across micro-
  batches (I6); the streaming twin of the W1 running-sum window.

All jobs take a DataFrame (batch or streaming bounds-agnostic) so unit
tests drive them with availableNow triggers over file sources.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from etl_pipelines_spark.operators.dedupe import dedupe_keep_first


def _event_time(events: DataFrame, ts_col: str) -> DataFrame:
    """withWatermark requires TIMESTAMP; parquet often lands TIMESTAMP_NTZ.
    The session pins UTC, so attaching the zone is value-identical."""
    if dict(events.dtypes).get(ts_col) == "timestamp_ntz":
        return events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return events


def daily_event_rollup(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
    watermark: str = "1 day",
) -> DataFrame:
    """Per-(day, key) event counts and exact value sums with a 1-day
    event-time watermark. DECIMAL accumulation keeps the sum order-
    independent so streaming and batch answers are bit-identical."""
    return (
        _event_time(events, ts_col)
        .withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), "1 day").alias("win"),
            F.col(key_col),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(38,4)")).cast("double").alias("total_value"),
        )
        .select(
            F.to_date(F.col("win.start")).alias("date"),
            key_col,
            "n_events",
            "total_value",
        )
    )


def hopping_event_rollup(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
    watermark: str = "1 day",
) -> DataFrame:
    """Hopping-window twin of `daily_event_rollup` (and of catalog
    q61): 24h windows sliding 12h, so every event lands in exactly two
    windows. Same decimal-exact accumulation -> streaming == batch
    bit-for-bit; state per (window, key) closes once the watermark
    passes window end, bounding the store to 2/slide windows per key."""
    return (
        _event_time(events, ts_col)
        .withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), "1 day", "12 hours").alias("win"),
            F.col(key_col),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(38,4)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            key_col,
            "n_events",
            "total_value",
        )
    )


def streaming_dedupe(
    events: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """In-stream duplicate removal with BOUNDED state: duplicates of a
    key arriving within `watermark` of each other collapse to the
    first row; state for a key is dropped once the watermark passes it,
    so the dedupe store never grows with the stream's lifetime (the
    failure mode of a naive dropDuplicates on an unbounded stream).

    This is the streaming-native half of the reference's at-least-once
    tolerance (S4/A6): the ingest stream dedupes retried inserts at
    the door, and dedupe-on-read stays as the batch-side belt for
    duplicates wider than the watermark."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def dedupe_upsert_sink(output_path: str, keys: list[str], order_col: str):
    """foreachBatch function: keep the latest row per key within the
    micro-batch, then append. At-least-once input + dedupe-on-read
    downstream (A6) = effectively-once, matching the reference's
    streaming-insert tolerance (dbt_dreamsdata/models/schema.yml:214-217).
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        deduped = dedupe_keep_first(batch_df, keys, [F.col(order_col).desc()])
        deduped.write.mode("append").parquet(output_path)

    return write_batch


def idempotent_append_sink(output_path: str, keys: list[str], order_col: str):
    """foreachBatch function with EXACTLY-ONCE output: each micro-batch
    writes (overwrite) into its own `batch_id=N` subdirectory, so a
    replayed batch — Structured Streaming re-runs the last batch after
    a crash between sink write and offset commit — overwrites its own
    previous output instead of appending duplicates. Readers scan the
    whole directory tree; batch_id rides as a partition column, which
    also gives incremental consumers a free high-water mark.

    This is the standard idempotent-sink discipline for file sinks
    (the transactional half of exactly-once that `dedupe_upsert_sink`
    instead pushes to dedupe-on-read). Per-batch dedupe still applies
    within the batch."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        deduped = dedupe_keep_first(batch_df, keys, [F.col(order_col).desc()])
        deduped.write.mode("overwrite").parquet(
            f"{output_path}/batch_id={batch_id}"
        )

    return write_batch


BALANCE_STATE_SCHEMA = "balance double"
BALANCE_OUT_SCHEMA = "user_id bigint, ts timestamp, balance double"


def _update_balance(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold each micro-batch's rows (ts-ordered) onto the carried
    balance; emit one output row per input row."""
    (balance,) = state.get if state.exists else (0.0,)
    outs = []
    for pdf in pdfs:
        pdf = pdf.sort_values("ts")
        running = pdf["value"].cumsum() + balance
        balance = float(running.iloc[-1]) if len(running) else balance
        outs.append(
            pd.DataFrame(
                {"user_id": pdf["user_id"], "ts": pdf["ts"], "balance": running}
            )
        )
    state.update((balance,))
    yield from outs


def running_balance_stateful(events: DataFrame) -> DataFrame:
    """Custom stateful operator: per-user running balance across micro-
    batches via applyInPandasWithState. State is one double per key —
    the minimal spill-proof footprint — and partitioning is by user_id,
    so scale-out is linear in keys."""
    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_balance,
            outputStructType=BALANCE_OUT_SCHEMA,
            stateStructType=BALANCE_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def attribution_interval_join(
    clicks: DataFrame,
    purchases: DataFrame,
    horizon: str = "24 hours",
    watermark: str = "2 days",
) -> DataFrame:
    """Stream-stream inner interval join: each click matched to the
    same user's purchases landing within `horizon` after it — the
    conversion-attribution shape. Both sides carry event-time
    watermarks and the join condition bounds purchase_ts to
    [click_ts, click_ts + horizon], which is exactly what lets Spark
    expire join state: a buffered click is dropped once the purchase
    watermark passes click_ts + horizon, so state is bounded by
    horizon x arrival rate per key, not by the stream's history.
    Works identically on batch frames (no watermark, plain join)."""
    c = _event_time(clicks, "ts").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("click_ts"),
    )
    p = _event_time(purchases, "ts").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("_p_user"),
        F.col("ts").alias("purchase_ts"),
    )
    if clicks.isStreaming:
        c = c.withWatermark("click_ts", watermark)
        p = p.withWatermark("purchase_ts", watermark)
    cond = (
        (F.col("user_id") == F.col("_p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"interval {horizon}"))
    )
    return c.join(p, cond, "inner").select(
        "user_id",
        "click_id",
        "purchase_id",
        "click_ts",
        "purchase_ts",
        # exact integer microsecond diff, then floor-div: two floored
        # unix_timestamp()s would disagree with the oracle on sub-second
        # components
        F.expr(
            "(unix_micros(purchase_ts) - unix_micros(click_ts)) div 1000000"
        ).alias("secs_to_purchase"),
    )


QSKETCH_STATE_SCHEMA = "n_seen bigint, hs array<bigint>, vs array<double>"
QSKETCH_OUT_SCHEMA = (
    "user_id bigint, n_seen bigint, n_kept int, hs array<bigint>, vs array<double>"
)
QSKETCH_K = 32


def _merge_bottom_k(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold each micro-batch's (hash, value) rows into the carried
    bottom-k sample. Merge closure (operators/sketches.py) is what
    makes this exact: bottom-k of (state ∪ batch) == bottom-k of
    everything seen, so the stream's final state equals the batch
    build bit-for-bit regardless of how rows were batched."""
    n_seen, hs, vs = state.get if state.exists else (0, [], [])
    h, v = list(hs), list(vs)
    for pdf in pdfs:
        n_seen += len(pdf)
        h.extend(int(x) for x in pdf["_h"])
        v.extend(float(x) for x in pdf["value"])
    order = sorted(range(len(h)), key=lambda i: (h[i], v[i]))[:QSKETCH_K]
    h, v = [h[i] for i in order], [v[i] for i in order]
    state.update((n_seen, h, v))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_seen": [n_seen],
            "n_kept": [len(h)],
            "hs": [h],
            "vs": [v],
        }
    )


def streaming_quantile_sketch(
    events: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
    id_cols: tuple[str, ...] = ("event_id",),
) -> DataFrame:
    """Streaming twin of the bottom-k quantile sketch (q95): per-key
    uniform row samples maintained across micro-batches via
    applyInPandasWithState. The rank hash is computed JVM-side with
    the SAME row_rank_hash the batch build uses, so stream state ==
    batch `quantile_sketch_build` on the union of all batches (pinned
    in test_streaming). State is <= QSKETCH_K (hash, value) pairs + one
    counter per key — fixed-size, spill-proof; each update emits the
    key's current sample, so any batch's emission answers quantile
    queries over everything seen so far. Sample size is the module
    constant QSKETCH_K (the state fold is compiled for it)."""
    from etl_pipelines_spark.operators.sketches import row_rank_hash

    rank = row_rank_hash(list(id_cols))
    hashed = events.select(
        F.col(key_col).alias("user_id"),
        rank.alias("_h"),
        F.col(value_col).cast("double").alias("value"),
    )
    return hashed.groupBy("user_id").applyInPandasWithState(
        _merge_bottom_k,
        outputStructType=QSKETCH_OUT_SCHEMA,
        stateStructType=QSKETCH_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
