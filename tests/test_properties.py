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


# ---------------------------------------------------------------- llm ops

WORDS = ["alpha", "beta", "gamma", "delta", "eps"]


@st.composite
def corpus_fixture(draw):
    """2-6 docs of 1-40 words over a tiny vocabulary (guarantees both
    shared and unique chunks/shingles appear across runs)."""
    n = draw(st.integers(2, 6))
    docs = []
    for i in range(n):
        k = draw(st.integers(1, 40))
        docs.append((i, " ".join(draw(st.sampled_from(WORDS)) for _ in range(k))))
    return docs


@settings(max_examples=8, deadline=None)
@given(corpus_fixture())
def test_chunk_dedup_conserves_and_orders(spark, docs):
    """n_kept <= n_chunks per doc; clean_text is a subsequence of the
    original chunk stream (order preserved, nothing invented); docs
    whose chunks are all unique to them reassemble verbatim."""
    from etl_pipelines_spark.llm.dedup import chunk_dedup, doc_chunks

    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r.doc_id: r for r in chunk_dedup(df).collect()}
    chunks = {}
    for r in doc_chunks(df).collect():
        chunks.setdefault(r.doc_id, []).append((r.ord, r.chunk))
    owners = {}
    for d, cs in chunks.items():
        for _, c in cs:
            owners.setdefault(c, set()).add(d)
    for doc_id, text in docs:
        row = out[doc_id]
        ordered = [c for _, c in sorted(chunks[doc_id])]
        assert row.n_chunks == len(ordered)
        assert 0 <= row.n_kept <= row.n_chunks
        kept = [c for c in ordered if len(owners[c]) == 1]
        assert row.clean_text == " ".join(kept)
        if all(len(owners[c]) == 1 for c in ordered):
            assert row.clean_text == text


@settings(max_examples=8, deadline=None)
@given(corpus_fixture())
def test_repetition_share_bounds(spark, docs):
    """share in (0, 1]; share == 1 iff the doc has one distinct trigram;
    n_trigrams == max(len-2, 1) for a doc of len whitespace tokens."""
    from etl_pipelines_spark.llm.text import repetition_stats

    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r.doc_id: r for r in repetition_stats(df).collect()}
    for doc_id, text in docs:
        r = out[doc_id]
        n_words = len(text.split(" "))
        assert r.n_trigrams == max(n_words - 2, 1)
        assert 0 < r.top_trigram_share <= 1.0


@settings(max_examples=6, deadline=None)
@given(st.lists(st.sampled_from(["en", "de", "es"]), min_size=4, max_size=40))
def test_temperature_sample_rate_invariants(spark, langs):
    """Rates lie in (0, 1]; smaller strata never get a lower rate than
    larger ones (sqrt-temperature upweights the tail); expected kept
    volume sum(rate * n) never exceeds the budget."""
    from etl_pipelines_spark.llm.mixing import temperature_sample

    rows = [(i, lang) for i, lang in enumerate(langs)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = temperature_sample(df, ["lang"], budget_frac=0.5)
    strata = {
        (r.lang): (r.n_stratum_docs, r.sample_rate)
        for r in out.select("lang", "n_stratum_docs", "sample_rate").distinct().collect()
    }
    for n, rate in strata.values():
        assert 0 < rate <= 1.0
    sizes = sorted(strata.values())
    for (n1, r1), (n2, r2) in zip(sizes, sizes[1:]):
        if n1 < n2:
            assert r1 >= r2 - 1e-12
    expected_kept = sum(n * r for n, r in strata.values())
    assert expected_kept <= 0.5 * len(langs) + 1e-9


@st.composite
def audit_fixture(draw):
    """Random keyed balance frames that can violate every audit rule:
    duplicate (key, date) rows, date gaps, negative balances, and NULL
    keys/dates."""
    n = draw(st.integers(1, 14))
    rows = []
    for _ in range(n):
        coin = draw(st.sampled_from([1, 2, None]))
        wallet = draw(st.sampled_from(["w1", "w2", None]))
        day = draw(st.sampled_from([0, 1, 3, 6, None]))
        bal = draw(
            st.floats(-5, 5, allow_nan=False, allow_infinity=False).map(
                lambda x: round(x, 2)
            )
        )
        date = None if day is None else BASE + dt.timedelta(days=day)
        rows.append((coin, wallet, date, bal))
    return rows


@settings(max_examples=15, deadline=None)
@given(audit_fixture())
def test_fused_audit_equals_per_rule_builders_for_any_frame(spark, rows):
    """quality.fused_balance_audit is an algebraic collapse of four
    independent rule scans; the collapse must be exact for ANY frame,
    not just the shapes the catalog corpus happens to contain."""
    from etl_pipelines_spark.quality import (
        date_gap_violations,
        fused_balance_audit,
        negative_violations,
        not_null_violations,
        unique_violations,
    )

    df = spark.createDataFrame(
        rows, "coin_id long, wallet_address string, date date, balance double"
    )
    keys = ["coin_id", "wallet_address"]
    got = {
        r["rule"]: r["n_violations"]
        for r in fused_balance_audit(df, keys, tolerance=0.1).collect()
    }
    assert got["negative_balance"] == negative_violations(df, "balance", 0.1).count()
    assert got["no_date_gaps"] == date_gap_violations(df, keys).count()
    assert got["unique"] == unique_violations(df, [*keys, "date"]).count()
    assert got["not_null"] == not_null_violations(df, [*keys, "date"]).count()


@st.composite
def asof_fixture(draw):
    """Random trades (probes) and quotes per key — including keys with
    no quotes, quotes after every trade, and same-instant ties."""
    n_keys = draw(st.integers(1, 3))
    trades, quotes = [], []
    for k in range(n_keys):
        for t in sorted(draw(st.sets(st.integers(0, 20), min_size=1, max_size=6))):
            trades.append((k, t))
        for q in sorted(draw(st.sets(st.integers(0, 20), max_size=5))):
            quotes.append((k, q, float(q * 100 + k)))
    return trades, quotes


@settings(max_examples=15, deadline=None)
@given(asof_fixture())
def test_asof_join_matches_pandas_merge_asof(spark, fixture):
    """operators.asof.asof_join_backward == pandas.merge_asof
    (direction='backward') for ANY input: same keys, same 'on or
    before' semantics, NULL when no prior quote."""
    import pandas as pd

    from etl_pipelines_spark.operators.asof import asof_join_backward

    t_rows, q_rows = fixture
    left = spark.createDataFrame(t_rows, "k long, t long")
    right = spark.createDataFrame(q_rows, "k long, t long, px double")
    got = (
        asof_join_backward(left, right, ["k"], "t", ["px"])
        .orderBy("k", "t")
        .toPandas()
    )
    lp = (
        pd.DataFrame(t_rows, columns=["k", "t"])
        .astype({"k": "int64", "t": "int64"})
        .sort_values("t")
    )
    rp = (
        pd.DataFrame(q_rows, columns=["k", "t", "px"])
        .astype({"k": "int64", "t": "int64", "px": "float64"})
        .sort_values("t")
    )
    want = (
        pd.merge_asof(lp, rp, on="t", by="k", direction="backward")
        .sort_values(["k", "t"])
        .reset_index(drop=True)
    )
    assert list(got["k"]) == list(want["k"])
    assert list(got["t"]) == list(want["t"])
    g, w = got["px"].to_numpy(), want["px"].to_numpy()
    import numpy as np

    assert ((g == w) | (np.isnan(g) & np.isnan(w))).all()


@st.composite
def sparse_series_fixture(draw):
    """1-2 keys, each with a sparse set of (day, price) observations —
    random gap shapes at the head, middle, and tail."""
    n_keys = draw(st.integers(1, 2))
    rows = []
    for k in range(n_keys):
        days = sorted(draw(st.sets(st.integers(0, 12), min_size=1, max_size=6)))
        for d in days:
            px = draw(
                st.floats(0.5, 50, allow_nan=False, allow_infinity=False).map(
                    lambda x: round(x, 2)
                )
            )
            rows.append((f"c{k}", BASE + dt.timedelta(days=d), px))
    return rows


@settings(max_examples=10, deadline=None)
@given(sparse_series_fixture())
def test_set_based_densify_matches_pandas_port(spark, rows):
    """The set-based densify/ffill/days_imputed path must agree with
    fill_gaps_applyinpandas — the literal pandas port of the
    reference's per-coin loop — for ANY gap shape. (The pandas port IS
    the reference semantics; the set-based path is the scale
    implementation.)"""
    from etl_pipelines_spark.operators.densify import (
        densify_daily,
        fill_gaps_applyinpandas,
        with_days_imputed,
    )
    from etl_pipelines_spark.operators.windows import forward_fill

    df = spark.createDataFrame(rows, "coin_id string, date date, price double")
    dense = densify_daily(df, ["coin_id"])
    dense = with_days_imputed(dense, ["coin_id"], presence_col="price")
    dense = forward_fill(dense, ["coin_id"], ["date"], ["price"])
    set_based = sorted(
        (r["coin_id"], r["date"], r["price"], r["days_imputed"])
        for r in dense.select("coin_id", "date", "price", "days_imputed").collect()
    )
    port = sorted(
        (r["coin_id"], r["date"], r["price"], r["days_imputed"])
        for r in fill_gaps_applyinpandas(df, ["coin_id"]).collect()
    )
    assert set_based == port


@settings(max_examples=12, deadline=None)
@given(asof_fixture(), st.sampled_from([None, 2, 5]))
def test_asof_forward_and_tolerance_match_pandas(spark, fixture, tol):
    """asof_join_forward == merge_asof(direction='forward'), and the
    backward tolerance guard nulls stale matches exactly as pandas
    does — for ANY input and tolerance."""
    import numpy as np
    import pandas as pd

    from etl_pipelines_spark.operators.asof import (
        asof_join_backward,
        asof_join_forward,
    )

    t_rows, q_rows = fixture
    left = spark.createDataFrame(t_rows, "k long, t long")
    right = spark.createDataFrame(q_rows, "k long, t long, px double")
    lp = (
        pd.DataFrame(t_rows, columns=["k", "t"])
        .astype({"k": "int64", "t": "int64"})
        .sort_values("t")
    )
    rp = (
        pd.DataFrame(q_rows, columns=["k", "t", "px"])
        .astype({"k": "int64", "t": "int64", "px": "float64"})
        .sort_values("t")
    )

    def check(spark_df, direction):
        got = spark_df.orderBy("k", "t").toPandas()
        want = (
            pd.merge_asof(
                lp, rp, on="t", by="k", direction=direction, tolerance=tol
            )
            .sort_values(["k", "t"])
            .reset_index(drop=True)
        )
        assert list(got["k"]) == list(want["k"])
        assert list(got["t"]) == list(want["t"])
        g, w = got["px"].to_numpy(), want["px"].to_numpy()
        assert ((g == w) | (np.isnan(g) & np.isnan(w))).all()

    check(
        asof_join_forward(left, right, ["k"], "t", ["px"], tolerance=tol),
        "forward",
    )
    check(
        asof_join_backward(left, right, ["k"], "t", ["px"], tolerance=tol),
        "backward",
    )


# ---------------------------------------------------------------- r3 props


@st.composite
def doc_corpus(draw):
    """Tiny random corpora over a small word alphabet — small vocab
    makes near-duplicate token sets actually occur."""
    n_docs = draw(st.integers(2, 10))
    vocab = [f"w{i}" for i in range(8)]
    docs = []
    for i in range(n_docs):
        words = draw(st.lists(st.sampled_from(vocab), min_size=3, max_size=10))
        docs.append((i, " ".join(words)))
    return docs


@settings(max_examples=10, deadline=None)
@given(doc_corpus(), st.sampled_from([0.4, 0.5, 0.7]))
def test_prefix_filter_has_exact_recall(spark, docs, threshold):
    """PPJoin candidates (prefix + length + positional filters) must
    contain EVERY pair whose token-set Jaccard >= threshold — the
    exact-recall theorem the filters claim, for ANY corpus."""
    from etl_pipelines_spark.llm.dedup import prefix_filter_pairs

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"])
        for r in prefix_filter_pairs(df, threshold).collect()
    }
    sets = {i: set(t.split(" ")) for i, t in docs}
    for a in sets:
        for b in sets:
            if a >= b:
                continue
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if union and inter / union >= threshold:
                assert (a, b) in got, (a, b, inter / union, threshold)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(st.integers(0, 500), min_size=1, max_size=200),
    st.integers(2, 4),
)
def test_portable_hll_merge_is_grouping_invariant(spark, values, n_groups):
    """Any partition of the value stream into fine groups must
    max-merge to the same register table (and so the same estimate) as
    a direct build — the associativity that makes the stored rollup
    answer any-grain questions."""
    from etl_pipelines_spark.operators.sketches import (
        merge_hll_registers,
        portable_hll_estimate,
        portable_hll_registers,
    )

    rows = [(1, i % n_groups, f"v{v}") for i, v in enumerate(values)]
    df = spark.createDataFrame(rows, "k int, g int, v string")
    direct = portable_hll_registers(df, ["k"], "v")
    merged = merge_hll_registers(
        portable_hll_registers(df, ["k", "g"], "v"), ["k"]
    ).select(*direct.columns)
    assert direct.exceptAll(merged).count() == 0
    assert merged.exceptAll(direct).count() == 0
    e1 = portable_hll_estimate(direct, ["k"]).first()["hll_estimate"]
    e2 = portable_hll_estimate(merged, ["k"]).first()["hll_estimate"]
    assert e1 == e2


@st.composite
def imputation_fixture(draw):
    """Transfers around a delayed first-price date: pre-price rows,
    first-day activity, NULL balances — every splice branch."""
    rows = []
    n_pairs = draw(st.integers(1, 4))
    for p in range(n_pairs):
        coin, wallet = f"c{p % 2}", f"w{p}"
        days = sorted(draw(st.sets(st.integers(0, 9), min_size=1, max_size=6)))
        for d in days:
            amt = float(draw(st.integers(-20, 20)))
            bal = draw(
                st.one_of(st.none(), st.integers(0, 100).map(float))
            )
            rows.append((coin, wallet, BASE + dt.timedelta(days=d), amt, bal))
    # prices start on day 4 for c0, day 5 for c1 -> days 0..4ish are pre-price
    prices = [
        (c, BASE + dt.timedelta(days=d), float(1 + d))
        for c, start in (("c0", 4), ("c1", 5))
        for d in range(start, 10)
    ]
    return rows, prices


@settings(max_examples=12, deadline=None)
@given(imputation_fixture())
def test_fused_splice_equals_staged_for_any_input(spark, fixture):
    """splice_with_imputation == create_imputed_records ->
    splice_imputed_records for ANY transfer/price shape, including
    NULL balances and pairs with no pre-price activity."""
    from etl_pipelines_spark.plans.wallet_profits import (
        add_first_price_info,
        create_imputed_records,
        merge_prices_and_transfers,
        splice_imputed_records,
        splice_with_imputation,
    )

    t_rows, p_rows = fixture
    transfers = spark.createDataFrame(
        t_rows,
        "coin_id string, wallet_address string, date date, "
        "net_transfers double, balance double",
    )
    prices = spark.createDataFrame(p_rows, "coin_id string, date date, price double")
    merged = add_first_price_info(
        merge_prices_and_transfers(transfers, prices), prices
    )
    staged = splice_imputed_records(merged, create_imputed_records(merged))
    fused = splice_with_imputation(merged).select(*staged.columns)
    assert fused.exceptAll(staged).count() == 0
    assert staged.exceptAll(fused).count() == 0


# ---------------------------------------------------------------- SCD2


def snapshot_fixture():
    """A short random sequence of snapshots over a tiny key space:
    each snapshot maps key -> (name, price), with keys appearing and
    disappearing across snapshots."""
    snap = st.dictionaries(
        st.integers(min_value=1, max_value=6),
        st.tuples(st.sampled_from(["a", "b", "c"]),
                  st.sampled_from([1.0, 2.0, 3.0])),
        min_size=1, max_size=6,
    )
    return st.lists(snap, min_size=2, max_size=4)


@settings(max_examples=8, deadline=None)
@given(snapshot_fixture(), st.booleans())
def test_scd2_invariants_hold_for_any_snapshot_sequence(spark, snaps, close_missing):
    from etl_pipelines_spark.operators.scd2 import scd2_apply, scd2_at, scd2_init

    def frame(d):
        return spark.createDataFrame(
            [(k, v[0], v[1]) for k, v in sorted(d.items())],
            "id long, name string, price double",
        )

    dates = [f"2024-0{i + 1}-01" for i in range(len(snaps))]
    dim = scd2_init(frame(snaps[0]), ["id"], ["name", "price"], dates[0])
    for d, s in zip(dates[1:], snaps[1:]):
        dim = scd2_apply(
            dim, frame(s), ["id"], ["name", "price"], d,
            close_missing=close_missing,
        )
    rows = dim.collect()
    spans = {}
    for r in rows:
        spans.setdefault(r["id"], []).append((r["valid_from"], r["valid_to"]))
    for key, ss in spans.items():
        opens = [s for s in ss if s[1] is None]
        # at most one open version per key, intervals never overlap
        assert len(opens) <= 1
        closed = sorted(s for s in ss if s[1] is not None)
        seq = closed + opens
        for (f1, t1), (f2, _) in zip(seq, seq[1:]):
            assert t1 is not None and t1 <= f2
    # the point-in-time view at the last date equals the last snapshot
    # exactly when deletions close (close_missing)
    if close_missing:
        live = {
            r["id"]: (r["name"], r["price"])
            for r in scd2_at(dim, dates[-1]).collect()
        }
        assert live == snaps[-1]


# ------------------------------------------------- bottom-k quantile sketch


@st.composite
def sketch_rows_fixture(draw):
    """(key, slice, value) rows with duplicates in value space and an
    arbitrary slice assignment — the shapes that break naive merges."""
    n = draw(st.integers(1, 60))
    rows = []
    for i in range(n):
        rows.append(
            (
                draw(st.integers(0, 2)),
                draw(st.integers(0, 3)),
                str(i),  # unique row identity
                float(draw(st.integers(-5, 5))),
            )
        )
    return rows


@settings(max_examples=10, deadline=None)
@given(sketch_rows_fixture())
def test_quantile_sketch_merge_closed_any_slicing(spark, rows):
    """merge(per-slice builds) == direct build, for ANY key/slice
    layout and k — the closure that makes stored per-grain samples
    trustworthy."""
    from etl_pipelines_spark.operators.sketches import (
        quantile_sketch_build,
        quantile_sketch_merge,
    )

    df = spark.createDataFrame(rows, "k int, g int, rid string, v double")
    for k in (1, 4, 16):
        direct = quantile_sketch_build(df, ["k"], "v", ["rid"], k=k)
        merged = quantile_sketch_merge(
            quantile_sketch_build(df, ["k", "g"], "v", ["rid"], k=k), ["k"], k=k
        ).select(*direct.columns)
        assert direct.exceptAll(merged).count() == 0
        assert merged.exceptAll(direct).count() == 0


@settings(max_examples=10, deadline=None)
@given(sketch_rows_fixture())
def test_table_digest_invariant_under_order_and_partitioning(spark, rows):
    from etl_pipelines_spark.operators.tablediff import table_digest

    df = spark.createDataFrame(rows, "k int, g int, rid string, v double")
    a = table_digest(df, ["k", "g", "rid"]).first()
    b = table_digest(
        df.orderBy(F.rand(seed=1)).repartition(5), ["k", "g", "rid"]
    ).first()
    assert (a["n_rows"], a["digest"]) == (b["n_rows"], b["digest"])


@st.composite
def tricky_string_rows(draw):
    """Row tuples whose values are drawn from an alphabet that
    includes the digest's join delimiter, the length-prefix colon,
    digits, empty strings, and nulls — the inputs that break naive
    concat hashing."""
    alphabet = ["", "|", ":", "a", "a|b", "1:", "||", "None", None, "3:a"]
    n = draw(st.integers(1, 12))
    return [
        (i, draw(st.sampled_from(alphabet)), draw(st.sampled_from(alphabet)))
        for i in range(n)
    ]


@settings(max_examples=15, deadline=None)
@given(tricky_string_rows(), tricky_string_rows())
def test_row_digest_separates_distinct_multisets(spark, rows_a, rows_b):
    """Two tables get equal (n_rows, digest) iff they are the same
    multiset of rows — including delimiter-bearing strings, empties,
    and nulls (the length-prefix rendering makes boundary-shifting
    collisions impossible; only 48-bit hash collisions remain, which
    this alphabet cannot manufacture)."""
    from etl_pipelines_spark.operators.tablediff import table_digest

    schema = "id long, x string, y string"
    a, b = spark.createDataFrame(rows_a, schema), spark.createDataFrame(rows_b, schema)
    da, db = table_digest(a).first(), table_digest(b).first()
    same = sorted(map(tuple, rows_a), key=str) == sorted(map(tuple, rows_b), key=str)
    got_same = (da["n_rows"], da["digest"]) == (db["n_rows"], db["digest"])
    assert got_same == same


@st.composite
def snapshot_pair(draw):
    """Random old/new snapshots over a small key space with nulls and
    delimiter-bearing strings — churn of every kind."""
    alphabet = ["a", "b", "a|b", "", None, "1:", "x"]
    keys = draw(st.lists(st.integers(0, 9), min_size=0, max_size=8, unique=True))
    new_keys = draw(st.lists(st.integers(0, 9), min_size=0, max_size=8, unique=True))

    def rows(ks):
        return [
            (k, draw(st.sampled_from(alphabet)), draw(st.integers(0, 3)))
            for k in ks
        ]

    return rows(keys), rows(new_keys)


@settings(max_examples=20, deadline=None)
@given(snapshot_pair())
def test_snapshot_diff_matches_naive(spark, pair):
    """snapshot_diff == the naive per-key comparison for ANY pair of
    snapshots (adds, drops, value changes, null flips, unchanged keys
    absent from the output)."""
    from etl_pipelines_spark.operators.tablediff import snapshot_diff

    rows_a, rows_b = pair
    schema = "id long, s string, v long"
    old = spark.createDataFrame(rows_a, schema)
    new = spark.createDataFrame(rows_b, schema)
    got = {r["id"]: r["status"] for r in snapshot_diff(old, new, ["id"]).collect()}
    a = {k: (s, v) for k, s, v in rows_a}
    b = {k: (s, v) for k, s, v in rows_b}
    want = {}
    for k in set(a) | set(b):
        if k not in a:
            want[k] = "added"
        elif k not in b:
            want[k] = "removed"
        elif a[k] != b[k]:
            want[k] = "changed"
    assert got == want
