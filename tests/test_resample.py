"""OHLC/VWAP resampler: semantics on a hand-built tape + the
re-aggregation invariant (coarse grain from fine grain == coarse grain
from raw ticks)."""

import datetime as dt

from pyspark.sql import functions as F

from etl_pipelines_spark.operators.resample import resample_ohlc

T0 = dt.datetime(2024, 1, 1, 9, 0, 0)


def _ticks(spark):
    rows = [
        # coin 1, hour 9: open 10 @9:00, high 14, low 9, close 12 @9:59
        (1, T0 + dt.timedelta(minutes=0), 10.0, 2.0),
        (1, T0 + dt.timedelta(minutes=10), 14.0, 1.0),
        (1, T0 + dt.timedelta(minutes=30), 9.0, 4.0),
        (1, T0 + dt.timedelta(minutes=59), 12.0, 3.0),
        # coin 1, hour 10: single print
        (1, T0 + dt.timedelta(minutes=75), 11.0, 5.0),
        # coin 2, hour 9
        (2, T0 + dt.timedelta(minutes=5), 100.0, 1.0),
        (2, T0 + dt.timedelta(minutes=50), 90.0, 1.0),
    ]
    return spark.createDataFrame(
        rows, "coin long, ts timestamp, price double, vol double"
    )


class TestResampleOhlc:
    def test_hourly_bars(self, spark):
        bars = {
            (r["coin"], r["bucket_start"]): r
            for r in resample_ohlc(
                _ticks(spark), ["coin"], "ts", "price", "vol", grain="1 hour"
            ).collect()
        }
        b = bars[(1, T0)]
        assert (b["open"], b["high"], b["low"], b["close"]) == (10.0, 14.0, 9.0, 12.0)
        assert b["n_trades"] == 4 and b["volume"] == 10.0
        # vwap = (10*2 + 14*1 + 9*4 + 12*3) / 10 = 106/10
        assert abs(b["vwap"] - 10.6) < 1e-12
        single = bars[(1, T0 + dt.timedelta(hours=1))]
        assert (
            single["open"] == single["high"] == single["low"] == single["close"] == 11.0
        )
        assert bars[(2, T0)]["close"] == 90.0

    def test_without_volume_column(self, spark):
        bars = resample_ohlc(_ticks(spark), ["coin"], "ts", "price", grain="1 hour")
        assert "vwap" not in bars.columns and "volume" not in bars.columns
        assert bars.count() == 3

    def test_coarse_grain_reaggregates_from_fine(self, spark):
        """Daily bars derived from hourly bars (open=min_by bucket,
        close=max_by bucket, sums re-summed) must equal daily bars from
        raw ticks — the stored-rollup re-aggregation property."""
        ticks = _ticks(spark)
        hourly = resample_ohlc(
            ticks, ["coin"], "ts", "price", "vol", grain="1 hour", reaggregate=True
        )
        daily_from_hourly = (
            hourly.groupBy("coin", F.date_trunc("day", "bucket_start").alias("d"))
            .agg(
                F.min_by("open", "bucket_start").alias("open"),
                F.max("high").alias("high"),
                F.min("low").alias("low"),
                F.max_by("close", "bucket_start").alias("close"),
                F.sum("n_trades").alias("n_trades"),
                F.sum("_v").alias("_v"),
                F.sum("_pv").alias("_pv"),
            )
            .withColumn(
                "vwap",
                # cast BEFORE dividing, exactly as resample_ohlc does —
                # decimal/decimal division truncates to the result scale
                (F.col("_pv").cast("double") / F.col("_v").cast("double")).cast(
                    "double"
                ),
            )
        )
        daily_direct = resample_ohlc(
            ticks, ["coin"], "ts", "price", "vol", grain="1 day"
        )
        got = {
            r["coin"]: (r["open"], r["high"], r["low"], r["close"], r["n_trades"], r["vwap"])
            for r in daily_from_hourly.collect()
        }
        want = {
            r["coin"]: (r["open"], r["high"], r["low"], r["close"], r["n_trades"], r["vwap"])
            for r in daily_direct.collect()
        }
        assert got == want
