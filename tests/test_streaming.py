"""Streaming & incremental layer tests (SURVEY.md §2.9).

Structured Streaming jobs are driven with availableNow triggers over a
file source built from the sf0.001 events table, then compared against
their batch twins — the engine's invariant is batch/stream equivalence.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from etl_pipelines_spark.sources.registry import load_table
from etl_pipelines_spark.streaming.incremental import (
    drop_open_day,
    high_water_marks,
    incremental_pull,
    newer_than_hwm,
    save_watermark_state,
)
from etl_pipelines_spark.streaming.jobs import (
    _update_balance,
    daily_event_rollup,
    dedupe_upsert_sink,
    hopping_event_rollup,
    running_balance_stateful,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_src(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("stream") / "events")
    load_table(spark, SF_DIR, "events").coalesce(1).write.parquet(path)
    return path


def _stream(spark, path):
    schema = spark.read.parquet(path).schema
    return spark.readStream.schema(schema).parquet(path)


def test_daily_rollup_stream_matches_batch(spark, events_src):
    out = daily_event_rollup(_stream(spark, events_src))
    q = (
        out.writeStream.format("memory")
        .queryName("rollup")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        (r["date"], r["user_id"]): (r["n_events"], r["total_value"])
        for r in spark.table("rollup").collect()
    }
    batch = {
        (r["date"], r["user_id"]): (r["n_events"], r["total_value"])
        for r in daily_event_rollup(load_table(spark, SF_DIR, "events")).collect()
    }
    assert streamed == batch
    assert len(streamed) > 0


def test_hopping_rollup_stream_matches_batch(spark, events_src):
    out = hopping_event_rollup(_stream(spark, events_src))
    q = (
        out.writeStream.format("memory")
        .queryName("hopping")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        (r["window_start"], r["user_id"]): (r["n_events"], r["total_value"])
        for r in spark.table("hopping").collect()
    }
    batch = {
        (r["window_start"], r["user_id"]): (r["n_events"], r["total_value"])
        for r in hopping_event_rollup(load_table(spark, SF_DIR, "events")).collect()
    }
    assert streamed == batch and len(streamed) > 0
    # hopping invariant: total (event, window) memberships = 2x events
    n_events = load_table(spark, SF_DIR, "events").count()
    assert sum(v[0] for v in streamed.values()) == 2 * n_events


def test_stateful_running_balance(spark, events_src):
    out = running_balance_stateful(_stream(spark, events_src))
    q = (
        out.writeStream.format("memory")
        .queryName("balances")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("balances")
    ev = load_table(spark, SF_DIR, "events")
    assert got.count() == ev.count()
    final = (
        got.groupBy("user_id")
        .agg(F.max_by("balance", "ts").alias("balance"))
        .collect()
    )
    expected = {
        r["user_id"]: r["total"]
        for r in ev.groupBy("user_id").agg(F.sum("value").alias("total")).collect()
    }
    for row in final:
        assert row["balance"] == pytest.approx(expected[row["user_id"]], abs=1e-6)


def test_stateful_state_carries_across_batches():
    class FakeState:
        exists = False

        def update(self, v):
            self.exists, self._v = True, v

        @property
        def get(self):
            return self._v

    state = FakeState()
    b1 = pd.DataFrame(
        {"user_id": [1, 1], "ts": pd.to_datetime(["2024-01-01", "2024-01-02"]), "value": [1.0, 2.0]}
    )
    out1 = pd.concat(_update_balance((1,), iter([b1]), state))
    assert list(out1["balance"]) == [1.0, 3.0]
    b2 = pd.DataFrame(
        {"user_id": [1], "ts": pd.to_datetime(["2024-01-03"]), "value": [4.0]}
    )
    out2 = pd.concat(_update_balance((1,), iter([b2]), state))
    assert list(out2["balance"]) == [7.0]  # carried 3.0 + 4.0


def test_dedupe_upsert_sink(spark, tmp_path):
    out_path = str(tmp_path / "sink")
    df = spark.createDataFrame(
        [(1, "2024-01-01", 10.0), (1, "2024-01-02", 20.0), (2, "2024-01-01", 5.0)],
        "id long, updated_at string, v double",
    )
    dedupe_upsert_sink(out_path, ["id"], "updated_at")(df, 0)
    got = {r["id"]: r["v"] for r in spark.read.parquet(out_path).collect()}
    assert got == {1: 20.0, 2: 5.0}


def test_incremental_pull_rounds(spark, tmp_path):
    state_path = str(tmp_path / "wm")
    ev = load_table(spark, SF_DIR, "events")

    first = incremental_pull(ev, spark, state_path, ["user_id"], "ts")
    assert first.count() == ev.count()  # no state yet: full pull
    save_watermark_state(high_water_marks(first, ["user_id"], "ts"), state_path)

    second = incremental_pull(ev, spark, state_path, ["user_id"], "ts")
    assert second.count() == 0  # nothing newer

    newer = ev.withColumn("ts", F.col("ts") + F.expr("interval 90 days"))
    third = incremental_pull(newer, spark, state_path, ["user_id"], "ts")
    assert third.count() == ev.count()


def test_newer_than_hwm_unseen_keys_pass(spark):
    inc = spark.createDataFrame(
        [(1, 10), (2, 5), (3, 99)], "k long, ts long"
    )
    hwm = spark.createDataFrame([(1, 7), (2, 5)], "k long, hwm long")
    got = sorted(r["k"] for r in newer_than_hwm(inc, hwm, ["k"], "ts").collect())
    assert got == [1, 3]  # 1: newer; 2: not newer; 3: unseen key passes


def test_drop_open_day(spark):
    df = spark.createDataFrame(
        [("2024-01-01 10:00:00",), ("2024-01-02 01:00:00",)], "ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    kept = drop_open_day(df, "ts", now_col=F.lit("2024-01-02 12:00:00").cast("timestamp"))
    assert [r["ts"].day for r in kept.collect()] == [1]


def test_append_mode_window_lifecycle(spark, tmp_path):
    """I2 semantics as Spark actually guarantees them: append mode
    emits a window exactly once, when the watermark passes its end;
    still-open windows are withheld. Data arriving after the watermark
    is NOT guaranteed to be dropped (Spark's documented caveat) — a
    too-late row may surface as its own immediately-finalized window,
    which the at-least-once + dedupe-on-read discipline (I3/A6)
    absorbs downstream, exactly like the reference's streaming-insert
    dupes."""
    import os
    import time

    src = tmp_path / "late_src"
    src.mkdir()
    recent = spark.createDataFrame(
        [(i, f"2024-02-{10 + d} 12:00:00", 1, 1.0) for i, d in enumerate([0, 1, 2, 3, 4])],
        "event_id long, ts string, user_id long, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    ancient = spark.createDataFrame(
        [(99, "2024-01-01 12:00:00", 1, 1.0)],
        "event_id long, ts string, user_id long, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    recent.coalesce(1).write.parquet(str(src / "f1"))
    ancient.coalesce(1).write.parquet(str(src / "f2"))
    # order micro-batches: recent first, ancient second
    now = time.time()
    for i, d in enumerate(["f1", "f2"]):
        for f in (src / d).glob("*.parquet"):
            os.utime(f, (now + i, now + i))

    schema = recent.schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    from etl_pipelines_spark.streaming.jobs import daily_event_rollup

    q = (
        daily_event_rollup(stream)
        .writeStream.format("memory")
        .queryName("late_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.table("late_test").collect()
    dates = sorted(str(r["date"]) for r in rows)
    # closed windows (watermark = 2024-02-13 12:00 after the final
    # batch) emitted exactly once; open Feb 13/14 windows withheld;
    # the too-late Jan 1 row surfaced as its own finalized window
    # (downstream dedupe territory), not merged into anything
    assert dates == ["2024-01-01", "2024-02-10", "2024-02-11", "2024-02-12"]
    assert len(dates) == len(set(dates))  # exactly-once per window
    jan = next(r for r in rows if str(r["date"]) == "2024-01-01")
    assert jan["n_events"] == 1


def test_attribution_join_stream_matches_batch(spark, events_src):
    from etl_pipelines_spark.streaming.jobs import attribution_interval_join

    def split(df):
        return (
            df.filter(F.col("event_type") == "click"),
            df.filter(F.col("event_type") == "purchase"),
        )

    out = attribution_interval_join(*split(_stream(spark, events_src)))
    q = (
        out.writeStream.format("memory")
        .queryName("attr")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        (r["click_id"], r["purchase_id"]): r["secs_to_purchase"]
        for r in spark.table("attr").collect()
    }
    batch = {
        (r["click_id"], r["purchase_id"]): r["secs_to_purchase"]
        for r in attribution_interval_join(
            *split(load_table(spark, SF_DIR, "events"))
        ).collect()
    }
    assert streamed == batch
    assert len(streamed) > 0


def test_checkpoint_restart_processes_only_new_files(spark, tmp_path):
    """Exactly-once across restarts: a checkpointed availableNow run
    consumes the source, a second run with the SAME checkpoint picks up
    only files that arrived in between, and the idempotent per-batch-id
    sink means nothing duplicates even though both runs append to the
    same output tree. This is the crash-recovery contract the
    incremental layer (I1-I4) rides on."""
    from etl_pipelines_spark.streaming.jobs import idempotent_append_sink

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    spark.createDataFrame([(1, 10), (2, 20)], "k long, ts long").write.mode(
        "append"
    ).parquet(src)

    def run_once():
        schema = spark.read.parquet(src).schema
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            stream.writeStream.foreachBatch(
                idempotent_append_sink(out, ["k"], "ts")
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    first = spark.read.parquet(out).collect()
    assert sorted(r["k"] for r in first) == [1, 2]

    # new data lands between runs; old files must NOT reprocess
    spark.createDataFrame([(3, 30)], "k long, ts long").write.mode(
        "append"
    ).parquet(src)
    run_once()

    rows = spark.read.parquet(out).collect()
    assert sorted(r["k"] for r in rows) == [1, 2, 3]  # no duplicates
    batch_ids = sorted({r["batch_id"] for r in rows})
    assert len(batch_ids) >= 2  # the restart produced a NEW batch


def test_streaming_dedupe_within_watermark(spark, tmp_path):
    """Retried inserts (same event_id, within the watermark) collapse
    to one row in-stream; distinct ids all survive. State is
    watermark-bounded by construction (dropDuplicatesWithinWatermark)."""
    from etl_pipelines_spark.streaming.jobs import streaming_dedupe

    src = str(tmp_path / "src")
    base = pd.Timestamp("2024-01-01 09:00:00")
    rows = [
        (1, base.to_pydatetime(), 10.0),
        (1, (base + pd.Timedelta(minutes=5)).to_pydatetime(), 10.0),  # retry
        (2, (base + pd.Timedelta(minutes=1)).to_pydatetime(), 20.0),
        (3, (base + pd.Timedelta(minutes=2)).to_pydatetime(), 30.0),
        (3, (base + pd.Timedelta(minutes=3)).to_pydatetime(), 30.0),  # retry
    ]
    spark.createDataFrame(rows, "event_id long, ts timestamp, value double").write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    deduped = streaming_dedupe(stream, ["event_id"], "ts", watermark="1 hour")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedupe_wm")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.table("dedupe_wm").collect()
    assert sorted(r["event_id"] for r in out) == [1, 2, 3]


def test_streaming_quantile_sketch_state_equals_batch_build(spark, tmp_path):
    """The stream's final per-key sample must equal the batch bottom-k
    build over the same rows — the merge closure, exercised across
    REAL micro-batch boundaries (one file per trigger)."""
    from etl_pipelines_spark.operators.sketches import quantile_sketch_build
    from etl_pipelines_spark.streaming.jobs import streaming_quantile_sketch

    src = str(tmp_path / "qsk_src")
    ev = load_table(spark, SF_DIR, "events").select("event_id", "user_id", "value")
    # two files -> two micro-batches under maxFilesPerTrigger=1
    ev.filter("event_id % 2 = 0").coalesce(1).write.mode("append").parquet(src)
    ev.filter("event_id % 2 = 1").coalesce(1).write.mode("append").parquet(src)

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming_quantile_sketch(stream)
        .writeStream.format("memory")
        .queryName("qsk_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = (
        spark.table("qsk_out")
        .groupBy("user_id")
        .agg(
            F.max("n_seen").alias("n_seen"),
            F.max_by("hs", "n_seen").alias("hs"),
            F.max_by("vs", "n_seen").alias("vs"),
        )
        .collect()
    )
    stream_samples = {
        r["user_id"]: sorted(zip(r["hs"], r["vs"])) for r in got
    }
    batch = quantile_sketch_build(
        spark.read.parquet(src), ["user_id"], "value", ["event_id"]
    )
    batch_samples = {}
    for r in batch.collect():
        batch_samples.setdefault(r["user_id"], []).append((r["_h"], r["value"]))
    assert set(stream_samples) == set(batch_samples)
    for uid, sample in batch_samples.items():
        assert stream_samples[uid] == sorted(sample), uid
    # and the stream saw every row
    n_rows = spark.read.parquet(src).count()
    assert sum(r["n_seen"] for r in got) == n_rows


def test_merge_bottom_k_truncates_and_carries():
    from etl_pipelines_spark.streaming.jobs import QSKETCH_K, _merge_bottom_k

    class FakeState:
        exists = False

        def update(self, v):
            self.exists, self._v = True, v

        @property
        def get(self):
            return self._v

    state = FakeState()
    b1 = pd.DataFrame({"_h": list(range(100, 0, -1)), "value": [0.0] * 100})
    out1 = pd.concat(_merge_bottom_k((7,), iter([b1]), state))
    assert out1["n_kept"].iloc[0] == QSKETCH_K
    assert out1["n_seen"].iloc[0] == 100
    assert out1["hs"].iloc[0][0] == 1  # smallest hash won
    # a later batch with smaller hashes displaces the old sample
    b2 = pd.DataFrame({"_h": [-5, -4], "value": [1.0, 2.0]})
    out2 = pd.concat(_merge_bottom_k((7,), iter([b2]), state))
    assert out2["n_seen"].iloc[0] == 102
    assert out2["hs"].iloc[0][:2] == [-5, -4]
