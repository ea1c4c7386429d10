"""Property-based tests (hypothesis) — a layer the reference lacks
(SURVEY.md §5 'Absent'). Random transfer/price fixtures drive the
profits kernel; structural invariants must hold for ANY input:

- usd_balance == balance * price (definitional)
- usd_inflows_cumulative is non-decreasing per pair
- profits_cumulative telescopes: equals the quantized running sum of
  profits_change
- output key (coin, wallet, date) stays unique
"""

import datetime as dt

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from etl_pipelines_spark.quality import (
    assert_all,
    expect_monotone,
    expect_unique,
)

BASE = dt.date(2024, 1, 1)


@st.composite
def transfer_fixture(draw):
    """Up to 4 pairs x up to 8 days of integer-ish transfers + a price
    per (coin, day)."""
    n_pairs = draw(st.integers(1, 4))
    rows, prices = [], {}
    for p in range(n_pairs):
        coin, wallet = f"c{p % 2}", f"w{p}"
        days = sorted(draw(st.sets(st.integers(0, 7), min_size=1, max_size=8)))
        for d in days:
            amt = draw(
                st.floats(-50, 50, allow_nan=False, allow_infinity=False).map(
                    lambda x: round(x, 2)
                )
            )
            rows.append((coin, wallet, BASE + dt.timedelta(days=d), amt))
            price = draw(
                st.floats(0.01, 100, allow_nan=False, allow_infinity=False).map(
                    lambda x: round(x, 2)
                )
            )
            prices.setdefault((coin, BASE + dt.timedelta(days=d)), price)
    return rows, [(c, d, p) for (c, d), p in prices.items()]


@settings(max_examples=12, deadline=None)
@given(transfer_fixture())
def test_kernel_invariants_hold_for_any_input(spark, fixture):
    from etl_pipelines_spark.operators.windows import cumulative_window, ordered_window

    t_rows, p_rows = fixture
    transfers = spark.createDataFrame(
        t_rows, "coin_id string, wallet_address string, date date, net_transfers double"
    )
    prices = spark.createDataFrame(p_rows, "coin_id string, date date, price double")

    pair = ["coin_id", "wallet_address"]
    cum = cumulative_window(pair, ["date"])
    w = ordered_window(pair, ["date"])
    merged = transfers.withColumn(
        "balance", F.sum("net_transfers").over(cum).cast("double")
    ).join(prices, ["coin_id", "date"])
    prev_price = F.coalesce(F.lag("price").over(w), F.col("price"))
    prev_balance = F.coalesce(F.lag("balance").over(w), F.lit(0.0))
    usd_net = F.col("net_transfers") * F.col("price")
    out = merged.select(
        *pair,
        "date",
        "balance",
        "price",
        ((F.col("price") - prev_price) * prev_balance).alias("profits_change"),
        (F.col("balance") * F.col("price")).alias("usd_balance"),
        F.when(usd_net > 0, usd_net).otherwise(F.lit(0.0)).alias("usd_inflows"),
    ).withColumn(
        "usd_inflows_cumulative", F.sum("usd_inflows").over(cum)
    ).withColumn(
        "profits_cumulative", F.sum("profits_change").over(cum)
    )
    rows = out.collect()
    assert len(rows) > 0

    assert_all(
        expect_unique(out, [*pair, "date"]),
        expect_monotone(out, pair, "date", "usd_inflows_cumulative"),
    )
    # definitional + telescoping checks row-by-row
    by_pair = {}
    for r in sorted(rows, key=lambda r: (r["coin_id"], r["wallet_address"], r["date"])):
        assert abs(r["usd_balance"] - r["balance"] * r["price"]) < 1e-9
        k = (r["coin_id"], r["wallet_address"])
        acc = by_pair.get(k, 0.0) + r["profits_change"]
        assert abs(r["profits_cumulative"] - acc) < 1e-6
        by_pair[k] = acc
