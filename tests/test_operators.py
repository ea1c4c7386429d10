"""Unit tests for operator building blocks with only indirect catalog
coverage: salted pair enumeration, the daily-net kernel, dedupe,
window helpers — including empty/edge inputs."""

import datetime as dt

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_pipelines_spark.llm.dedup import (
    connected_components,
    connected_components_star,
    salted_self_pairs,
)
from etl_pipelines_spark.operators.daily_net import daily_net_transfers
from etl_pipelines_spark.operators.dedupe import dedupe_keep_first, dedupe_keep_latest
from etl_pipelines_spark.operators.densify import densify_daily
from etl_pipelines_spark.operators.windows import forward_fill, with_lag_lead

D = dt.date


class TestSaltedSelfPairs:
    def _naive(self, rows):
        out = set()
        for i, (id_a, k_a) in enumerate(rows):
            for id_b, k_b in rows:
                if k_a == k_b and id_a < id_b:
                    out.add((id_a, id_b))
        return out

    def test_matches_naive_self_join_all_group_counts(self, spark):
        # 40 ids over 5 keys, deliberately skewed (key 'hot' gets 25)
        rows = [(i, "hot") for i in range(25)] + [
            (100 + i, f"k{i % 4}") for i in range(15)
        ]
        df = spark.createDataFrame(rows, "id long, bucket string")
        for groups in (1, 2, 16, 64):
            got = {
                (r["doc_a"], r["doc_b"])
                for r in salted_self_pairs(df, ["bucket"], "id", groups=groups).collect()
            }
            assert got == self._naive(rows), f"groups={groups}"

    def test_pairs_generated_once_per_key(self, spark):
        df = spark.createDataFrame([(1, "a"), (2, "a"), (3, "a")], "id long, bucket string")
        got = [
            (r["doc_a"], r["doc_b"])
            for r in salted_self_pairs(df, ["bucket"], "id").collect()
        ]
        assert sorted(got) == [(1, 2), (1, 3), (2, 3)]
        assert len(got) == len(set(got))  # no duplicates, no distinct needed

    def test_empty_input(self, spark):
        df = spark.createDataFrame([], "id long, bucket string")
        assert salted_self_pairs(df, ["bucket"], "id").count() == 0


class TestConnectedComponents:
    def _labels(self, spark, pairs):
        df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
        return {r["node"]: r["label"] for r in connected_components(df).collect()}

    def test_chain_needs_multiple_rounds(self, spark):
        # path 1-2-3-4-5: label 1 must propagate 4 hops
        got = self._labels(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
        assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}

    def test_two_components_and_clique(self, spark):
        got = self._labels(spark, [(1, 2), (2, 3), (1, 3), (10, 11)])
        assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}

    def test_label_flows_uphill_through_reversed_edges(self, spark):
        # edge given high->low: undirectedness must still pull 9 down to 1
        got = self._labels(spark, [(9, 1), (5, 9)])
        assert got == {1: 1, 9: 1, 5: 1}

    def test_empty_pairs(self, spark):
        assert self._labels(spark, []) == {}


class TestConnectedComponentsStar:
    """The O(log n)-round large-star/small-star variant must agree with
    min-label propagation on every graph shape."""

    def _both(self, spark, pairs):
        df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
        # driver_finish=0 forces the DISTRIBUTED rounds — the driver
        # union-find tier has its own equivalence test below
        star = {
            r["node"]: r["label"]
            for r in connected_components_star(df, driver_finish=0).collect()
        }
        plain = {r["node"]: r["label"] for r in connected_components(df).collect()}
        return star, plain

    def test_driver_finish_tier_matches_distributed(self, spark):
        """The union-find finish (edge count <= driver_finish) must
        label identically to the distributed star rounds on chains,
        cliques, and reversed edges."""
        for pairs in (
            [(i, i + 1) for i in range(1, 30)],
            [(1, 2), (2, 3), (1, 3), (10, 11), (9, 4), (4, 20)],
            [(9, 1), (5, 9)],
        ):
            df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
            fast = {
                r["node"]: r["label"]
                for r in connected_components_star(df).collect()
            }
            dist = {
                r["node"]: r["label"]
                for r in connected_components_star(df, driver_finish=0).collect()
            }
            assert fast == dist

    def test_long_chain(self, spark):
        star, plain = self._both(spark, [(i, i + 1) for i in range(1, 30)])
        assert star == plain == {i: 1 for i in range(1, 31)}

    def test_clique_plus_island_plus_reversed(self, spark):
        pairs = [(1, 2), (2, 3), (1, 3), (10, 11), (9, 4), (4, 20)]
        star, plain = self._both(spark, pairs)
        assert star == plain
        assert star[20] == 4 and star[9] == 4

    def test_random_graph_agrees(self, spark):
        import random

        rng = random.Random(7)
        pairs = [(rng.randrange(40), rng.randrange(40)) for _ in range(60)]
        pairs = [(a, b) for a, b in pairs if a != b]
        star, plain = self._both(spark, pairs)
        assert star == plain

    def test_empty(self, spark):
        star, plain = self._both(spark, [])
        assert star == plain == {}


class TestDailyNet:
    def test_explode_sign_and_zero_net_drop(self, spark):
        raw = spark.createDataFrame(
            [
                # wallet A sends 10 to B, then B sends 10 back same day:
                # both net to zero and must drop (HAVING SUM <> 0)
                (dt.datetime(2024, 1, 1, 5), "tok", "A", "B", 10.0),
                (dt.datetime(2024, 1, 1, 9), "tok", "B", "A", 10.0),
                # C receives 7 on day 2
                (dt.datetime(2024, 1, 2, 1), "tok", "A", "C", 7.0),
            ],
            "block_timestamp timestamp, token_address string, "
            "from_address string, to_address string, value double",
        )
        got = {
            (r["date"], r["wallet_address"]): r["amount"]
            for r in daily_net_transfers(raw).collect()
        }
        assert got == {
            (D(2024, 1, 2), "C"): 7.0,
            (D(2024, 1, 2), "A"): -7.0,
        }


class TestKmvDistinct:
    def test_exact_branch_below_k(self, spark):
        from etl_pipelines_spark.operators.sketches import kmv_distinct

        df = spark.createDataFrame(
            [("g", f"v{i % 5}") for i in range(50)], "grp string, val string"
        )
        row = kmv_distinct(df, ["grp"], "val", k=16).collect()[0]
        assert row["n_min"] == 5
        assert row["kmv_estimate"] == 5.0

    def test_estimator_branch_tracks_cardinality(self, spark):
        from etl_pipelines_spark.operators.sketches import kmv_distinct

        df = spark.createDataFrame(
            [("g", f"v{i}") for i in range(1000)], "grp string, val string"
        )
        row = kmv_distinct(df, ["grp"], "val", k=64).collect()[0]
        assert row["n_min"] == 64
        # KMV relative error ~ 1/sqrt(k-2) ~ 13%; allow 3 sigma
        assert 600 < row["kmv_estimate"] < 1400

    def test_hash_matches_sql_polynomial(self, spark):
        from etl_pipelines_spark.operators.sketches import kmv_hash, kmv_hash_sql

        df = spark.createDataFrame([(str(i),) for i in range(100)], "s string")
        got = df.select(
            kmv_hash(F.col("s")).alias("a"), F.expr(kmv_hash_sql("s")).alias("b")
        ).filter("a <> b")
        assert got.count() == 0

    def test_salted_cascade_matches_direct(self, spark):
        """The threshold pre-filter (the Zipf-hot-key defence) keeps
        exactly the same k smallest hashes as the direct single
        aggregation, for every group — including a forced G > 16 on a
        skewed input (one key owning most rows) and the degenerate
        G < k case where the threshold can never fire (round-9 verdict
        'salted==direct at a forced G>16' done-criterion)."""
        from etl_pipelines_spark.operators.sketches import kmv_distinct

        rows = [(f"g{i % 3}", f"v{i % 400}") for i in range(2000)]
        # skew: one hot key with 5000 distinct values on top
        rows += [("hot", f"h{i}") for i in range(5000)]
        df = spark.createDataFrame(rows, "grp string, val string")
        direct = {
            r["grp"]: (r["n_min"], r["kmv_estimate"])
            for r in kmv_distinct(df, ["grp"], "val", k=16).collect()
        }
        for g in (8, 32, 128):
            for mode in ("cascade", "prefilter"):
                salted = {
                    r["grp"]: (r["n_min"], r["kmv_estimate"])
                    for r in kmv_distinct(
                        df, ["grp"], "val", k=16, salt_groups=g, salt_mode=mode
                    ).collect()
                }
                assert direct == salted, f"salt_groups={g} mode={mode}"

    def test_fused_state_matches_direct_kmv_and_hll(self, spark):
        """The fused (kmv level-1 + HLL register) aggregation is
        value-identical to the separate builds, for every group —
        including a Zipf-hot key, NULL group keys, and NULL values
        (whose md5 is NULL: dropped by the kmv collect_list, kept as
        the NULL-register row by the HLL grouping, in both paths)."""
        from etl_pipelines_spark.operators.sketches import (
            fused_kmv_hll_state,
            kmv_distinct,
            kmv_from_fused_state,
            md5_distinct_stream,
            portable_hll_estimate,
            portable_hll_registers,
        )

        rows = [(f"g{i % 3}", f"v{i % 400}") for i in range(2000)]
        rows += [("hot", f"h{i}") for i in range(5000)]
        rows += [(None, f"n{i}") for i in range(100)]
        rows += [("g0", None), (None, None)]
        df = spark.createDataFrame(rows, "grp string, val string")
        stream = md5_distinct_stream(df, ["grp"], "val")
        state = fused_kmv_hll_state(stream, ["grp"], k=16)

        kmv_direct = {
            r["grp"]: (r["n_min"], r["kmv_estimate"])
            for r in kmv_distinct(df, ["grp"], "val", k=16).collect()
        }
        kmv_fused = {
            r["grp"]: (r["n_min"], r["kmv_estimate"])
            for r in kmv_from_fused_state(state, ["grp"], k=16).collect()
        }
        assert "hot" in kmv_direct and None in kmv_direct
        assert kmv_direct == kmv_fused

        hll_direct = portable_hll_estimate(
            portable_hll_registers(df, ["grp"], "val"), ["grp"]
        )
        hll_fused = portable_hll_estimate(
            state.select("grp", "reg", "rho"), ["grp"]
        )
        assert hll_direct.exceptAll(hll_fused).count() == 0
        assert hll_fused.exceptAll(hll_direct).count() == 0

    def test_prefilter_preserves_null_group_keys(self, spark):
        """NULL-keyed groups survive the salted path: the threshold
        rejoin is null-safe, so salt_groups > 0 matches salt_groups=0
        on a frame whose group key contains NULLs (the round-10
        advice found a plain equi-join silently dropping them)."""
        from etl_pipelines_spark.operators.sketches import (
            kmv_distinct,
            quantile_sketch_build,
        )

        rows = [("g1", f"v{i}") for i in range(500)]
        rows += [(None, f"n{i}") for i in range(500)]
        df = spark.createDataFrame(rows, "grp string, val string")
        direct = {
            r["grp"]: (r["n_min"], r["kmv_estimate"])
            for r in kmv_distinct(df, ["grp"], "val", k=16).collect()
        }
        salted = {
            r["grp"]: (r["n_min"], r["kmv_estimate"])
            for r in kmv_distinct(
                df, ["grp"], "val", k=16, salt_groups=32
            ).collect()
        }
        assert None in direct and direct == salted

        qdf = spark.createDataFrame(
            [(None if i % 2 else "k", float(i), str(i)) for i in range(400)],
            "k string, v double, rid string",
        )
        qd = quantile_sketch_build(qdf, ["k"], "v", ["rid"], k=16)
        qs = quantile_sketch_build(
            qdf, ["k"], "v", ["rid"], k=16, salt_groups=32,
            salt_mode="prefilter",
        )
        assert qd.exceptAll(qs).count() == 0
        assert qs.exceptAll(qd).count() == 0


class TestDedupe:
    def test_keep_first_and_latest(self, spark):
        df = spark.createDataFrame(
            [("k", 1, "old"), ("k", 2, "new"), ("j", 5, "only")],
            "id string, updated_at long, v string",
        )
        first = {r["id"]: r["v"] for r in dedupe_keep_first(df, ["id"], [F.col("updated_at").asc()]).collect()}
        latest = {r["id"]: r["v"] for r in dedupe_keep_latest(df, ["id"], "updated_at").collect()}
        assert first == {"k": "old", "j": "only"}
        assert latest == {"k": "new", "j": "only"}


class TestGlobalRunningSum:
    def test_matches_single_window_reference_with_boundary_ties(self, spark):
        from decimal import Decimal

        from etl_pipelines_spark.operators.windows import global_running_sum

        # many duplicated leading values: quantile boundaries land ON
        # ties, exercising the ties-share-a-bucket contiguity argument;
        # the tiebreak id makes the order total
        rows = [(i, Decimal(f"{(i * 7) % 13}.50")) for i in range(500)]
        df = spark.createDataFrame(rows, "id long, v decimal(18,2)")
        got = {
            r["id"]: r["rt"]
            for r in global_running_sum(
                df, order=["v", "id"], value=F.col("v"), out="rt"
            ).collect()
        }
        w = Window.orderBy("v", "id").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        want = {
            r["id"]: r["rt"]
            for r in df.withColumn("rt", F.sum("v").over(w)).collect()
        }
        assert got == want


class TestDuplicateSpans:
    def test_shared_phrase_internal_repeat_and_island_merge(self, spark):
        from etl_pipelines_spark.llm.dedup import duplicate_spans

        # docs 1 and 2 share words 1-4 exactly; doc 3 repeats its own
        # 4-gram at positions 1 and 5 (adjacent islands must merge into
        # one 1-8 span); doc 4 shares nothing; doc 5 is too short for
        # any 4-gram and must contribute zero rows
        df = spark.createDataFrame(
            [
                (1, "a b c d x y z w"),
                (2, "q r a b c d s t"),
                (3, "m n o p m n o p"),
                (4, "unique words only here today friend"),
                (5, "t u v"),
            ],
            "doc_id long, text string",
        )
        got = sorted(
            (r["doc_id"], r["span_start"], r["span_end"], r["n_grams"])
            for r in duplicate_spans(df, min_len=4).collect()
        )
        assert got == [(1, 1, 4, 1), (2, 3, 6, 1), (3, 1, 8, 2)]

    def test_duplication_rate_coverage_and_zero_docs(self, spark):
        from etl_pipelines_spark.llm.dedup import duplication_rate

        # docs 1/2 share their full 4 words (coverage 4/8 = 0.5 for
        # doc 1, 4/4 = 1.0 for... both are 8 and 4 words); doc 3 has
        # no duplicated 4-gram and must report 0.0, not drop out
        df = spark.createDataFrame(
            [
                (1, "a b c d x y z w"),
                (2, "a b c d"),
                (3, "totally different words here now"),
            ],
            "doc_id long, text string",
        )
        got = {
            r["doc_id"]: (r["n_words"], r["dup_words"], r["dup_fraction"])
            for r in duplication_rate(df, min_len=4).collect()
        }
        assert got == {1: (8, 4, 0.5), 2: (4, 4, 1.0), 3: (5, 0, 0.0)}

    def test_repeated_calls_hold_at_most_one_gram_cache(self, spark):
        """The corpus-sized gram-array cache is single-slot: each call
        releases the previous call's copy, so a long-lived session
        invoking duplicate_spans N times holds one cached frame, not N
        (accumulation was a measured OOM/spill pressure risk)."""
        from etl_pipelines_spark.llm.dedup import (
            duplicate_spans,
            release_gram_cache,
        )

        df = spark.createDataFrame(
            [(1, "a b c d x y z w"), (2, "q r a b c d s t")],
            "doc_id long, text string",
        )
        release_gram_cache()
        before = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
        for _ in range(3):
            duplicate_spans(df, min_len=4).collect()
        after = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
        assert after - before <= 1
        release_gram_cache()
        assert (
            spark.sparkContext._jsc.sc().getPersistentRDDs().size() <= before
        )

    def test_gap_splits_islands(self, spark):
        from etl_pipelines_spark.llm.dedup import duplicate_spans

        # the duplicated 3-grams sit at positions 1 and 8 of doc 1
        # (ends 3 and 10): a gap wider than the span length yields TWO
        # spans, not one bridged region
        df = spark.createDataFrame(
            [
                (1, "a b c x1 x2 x3 x4 d e f"),
                (2, "a b c y1 y2 y3 y4 d e f"),
            ],
            "doc_id long, text string",
        )
        got = sorted(
            (r["doc_id"], r["span_start"], r["span_end"])
            for r in duplicate_spans(df, min_len=3).collect()
        )
        assert got == [(1, 1, 3), (1, 8, 10), (2, 1, 3), (2, 8, 10)]


class TestWindowHelpers:
    def test_forward_fill_multiple_columns(self, spark):
        df = spark.createDataFrame(
            [("k", 1, 10.0, "a"), ("k", 2, None, None), ("k", 3, 30.0, None)],
            "k string, seq int, x double, s string",
        )
        got = sorted(
            (r["seq"], r["x"], r["s"])
            for r in forward_fill(df, ["k"], ["seq"], ["x", "s"]).collect()
        )
        assert got == [(1, 10.0, "a"), (2, 10.0, "a"), (3, 30.0, "a")]

    def test_lag_lead_edges_null(self, spark):
        df = spark.createDataFrame(
            [("k", 1, 1.0), ("k", 2, 2.0)], "k string, seq int, v double"
        )
        rows = {
            r["seq"]: (r["_prev"], r["_next"])
            for r in with_lag_lead(df, ["k"], ["seq"], "v", "_prev", "_next").collect()
        }
        assert rows == {1: (None, 2.0), 2: (1.0, None)}

    def test_densify_single_row_key(self, spark):
        df = spark.createDataFrame(
            [("a", D(2024, 1, 5), 1.0), ("b", D(2024, 1, 7), 2.0)],
            "k string, date date, v double",
        )
        got = densify_daily(df, ["k"], "date").collect()
        # a: Jan 5..7 (global max), b: Jan 7 only
        assert sorted((r["k"], r["date"].day) for r in got) == [
            ("a", 5), ("a", 6), ("a", 7), ("b", 7),
        ]


class TestWhaleCensusDeltaEvents:
    """q23's round-11 delta-events rewrite == the dense
    cumsum -> densify -> ffill -> bucket-count reference on a frame
    exercising every edge: late joiners, bucket oscillation across
    both boundaries, multi-day gaps, a null-net prefix (user counted
    in NO bucket until the balance turns non-null), and no-change
    event days (a delta must NOT be emitted)."""

    def _dense_reference(self, events):
        # pure-Python replay of the pre-round-11 plan
        from collections import defaultdict
        from decimal import Decimal

        daily = defaultdict(lambda: None)  # (user, date) -> net (None = all-null)
        for u, d, v in events:
            if v is not None:
                cur = daily[(u, d)]
                daily[(u, d)] = (cur or Decimal(0)) + Decimal(str(v))
            else:
                daily.setdefault((u, d), None)
        users = sorted({u for u, _, _ in events})
        gmax = max(d for _, d, _ in events)
        counts = {}
        for u in users:
            ds = sorted(d for (uu, d) in daily if uu == u)
            bal = None
            cum = None
            by_day = {}
            for d in ds:
                net = daily[(u, d)]
                if net is not None:
                    cum = (cum or Decimal(0)) + net
                by_day[d] = float(cum) if cum is not None else None
            day = ds[0]
            while day <= gmax:
                if day in by_day:
                    bal = by_day[day]
                b = (
                    None
                    if bal is None
                    else (0 if bal < 100 else (1 if bal < 500 else 2))
                )
                if b is not None:
                    key = (day, b)
                    counts[key] = counts.get(key, 0) + 1
                counts.setdefault((day, None), 0)  # date must appear
                day += dt.timedelta(days=1)
        out = {}
        all_dates = sorted({d for d, _ in counts})
        for d in all_dates:
            out[d] = tuple(counts.get((d, b), 0) for b in (0, 1, 2))
        return out

    def test_footer_bounds_match_scan(self, spark, tmp_path):
        """The calendar-bounds shortcut (parquet footer min/max ts ->
        dates, round 12) returns exactly the scan's min/max dates on
        driver testdata, and falls back (None) when the column lacks
        usable stats — here: a non-timestamp ts."""
        import datetime as dtm

        from etl_pipelines_spark.queries.timeseries import (
            _parquet_ts_date_bounds,
        )

        sf = "/root/testdata/sf0.001"
        got = _parquet_ts_date_bounds(sf, "events")
        ev = spark.read.parquet(sf + "/events.parquet")
        ts = ev["ts"]
        if dict(ev.dtypes)["ts"] == "bigint":
            ts = F.timestamp_micros(F.expr("ts div 1000"))
        want = ev.agg(
            F.min(F.to_date(ts)), F.max(F.to_date(ts))
        ).collect()[0]
        assert got == (want[0], want[1])
        assert isinstance(got[0], dtm.date)

        spark.createDataFrame([("x",)], "ts string").write.parquet(
            str(tmp_path / "weird.parquet")
        )
        assert _parquet_ts_date_bounds(str(tmp_path), "weird") is None

    def test_matches_dense_reference(self, spark, tmp_path):
        import datetime as dtm

        from etl_pipelines_spark.queries.timeseries import q23

        T = dtm.datetime
        events = [
            # user 1: starts small, jumps to whale, falls to medium, gap days
            (1, D(2024, 1, 1), 50.0),
            (1, D(2024, 1, 3), 600.0),     # -> whale (650)
            (1, D(2024, 1, 7), -400.0),    # -> medium (250)
            # user 2: late joiner straight into medium, then a no-change day
            (2, D(2024, 1, 4), 200.0),
            (2, D(2024, 1, 5), 10.0),      # still medium — no delta day
            # user 3: null-net prefix (counts nowhere), then small
            (3, D(2024, 1, 2), None),
            (3, D(2024, 1, 6), 99.99),     # boundary: < 100 -> small
            # user 4: exact boundary values
            (4, D(2024, 1, 2), 100.0),     # == 100 -> medium
            (4, D(2024, 1, 5), 400.0),     # == 500 -> whale
        ]
        rows = [(u, T(d.year, d.month, d.day, 12, 0), v) for u, d, v in events]
        df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
        path = str(tmp_path / "events.parquet")
        df.write.parquet(path)
        got = {
            r["date"]: (r["small"], r["medium"], r["whale"])
            for r in q23(spark, str(tmp_path)).collect()
        }
        assert got == self._dense_reference(events)


class TestPrefixFilterRecall:
    def test_prefix_filter_is_superset_of_lsh_recall(self, spark):
        """Prefix filtering guarantees recall at the threshold; LSH is
        probabilistic. Every verified pair q34 finds must therefore
        also be found by q74 — and both verify with the same exact
        Jaccard, so q74 ⊇ q34 on (doc_a, doc_b)."""
        from etl_pipelines_spark.queries import QUERIES

        sf = "/root/testdata/sf0.001"
        exact = {
            (r["doc_a"], r["doc_b"])
            for r in QUERIES["q74_prefix_filter_pairs"]
            .spark_fn(spark, sf)
            .collect()
        }
        # q34 *reports* every LSH candidate with its exact Jaccard;
        # recall only binds at the threshold
        lsh = {
            (r["doc_a"], r["doc_b"])
            for r in QUERIES["q34_lsh_jaccard_pairs"].spark_fn(spark, sf).collect()
            if r["jaccard"] >= 0.5
        }
        assert lsh <= exact
        assert exact  # non-vacuous: the corpus does contain near-dups

    def test_broadcast_off_is_value_identical(self, spark):
        """`broadcast_df=False` (the >100k-doc scale mode, where the
        shingle-grain dfreq outgrows the driver — round 12) changes
        only the join strategy, never the candidate set."""
        from etl_pipelines_spark.llm.dedup import prefix_filter_pairs
        from etl_pipelines_spark.sources.registry import load_table

        docs = load_table(spark, "/root/testdata/sf0.001", "documents")
        on = {
            (r["doc_a"], r["doc_b"])
            for r in prefix_filter_pairs(docs, 0.5).collect()
        }
        off = {
            (r["doc_a"], r["doc_b"])
            for r in prefix_filter_pairs(docs, 0.5, broadcast_df=False).collect()
        }
        assert on and on == off


class TestClusterLabelsDispatch:
    def _edges(self, spark, pairs):
        return spark.createDataFrame(pairs, "doc_a long, doc_b long")

    def test_explicit_algorithms_agree(self, spark):
        from etl_pipelines_spark.llm.dedup import cluster_labels

        df = self._edges(spark, [(1, 2), (2, 3), (10, 11), (11, 12), (12, 10)])
        star = {r["node"]: r["label"] for r in cluster_labels(df, algorithm="star").collect()}
        prop = {
            r["node"]: r["label"]
            for r in cluster_labels(df, algorithm="propagation").collect()
        }
        assert star == prop == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10}

    def test_auto_threshold_picks_both_paths(self, spark):
        from etl_pipelines_spark.llm.dedup import cluster_labels

        chain = self._edges(spark, [(i, i + 1) for i in range(1, 40)])
        # 39 edges: above a threshold of 10 -> star; below 1000 -> propagation.
        lo = {r["node"]: r["label"]
              for r in cluster_labels(chain, algorithm="auto", star_threshold=10).collect()}
        hi = {r["node"]: r["label"]
              for r in cluster_labels(chain, algorithm="auto", star_threshold=1000).collect()}
        assert lo == hi == {i: 1 for i in range(1, 41)}

    def test_unknown_algorithm_raises(self, spark):
        import pytest as _pytest

        from etl_pipelines_spark.llm.dedup import cluster_labels

        with _pytest.raises(ValueError, match="unknown clustering algorithm"):
            cluster_labels(self._edges(spark, [(1, 2)]), algorithm="bogus")


class TestArrayJaccardVerify:
    def test_agrees_with_token_stream_verify(self, spark):
        from etl_pipelines_spark.llm.dedup import (
            array_jaccard_verify,
            doc_shingle_arrays,
            doc_shingles,
            token_jaccard,
        )

        docs = spark.createDataFrame(
            [
                (1, "the quick brown fox jumps over the lazy dog"),
                (2, "the quick brown fox jumps over the lazy cat"),
                (3, "a completely different document about spark plans"),
                (4, "the quick brown fox jumps over the lazy dog"),
            ],
            "doc_id long, text string",
        )
        pairs = spark.createDataFrame(
            [(1, 2), (1, 3), (1, 4), (2, 4)], "doc_a long, doc_b long"
        )
        via_arrays = {
            (r["doc_a"], r["doc_b"]): (r["n_intersect"], r["jaccard"])
            for r in array_jaccard_verify(
                pairs, arrays=doc_shingle_arrays(docs)
            ).collect()
        }
        via_stream = {
            (r["doc_a"], r["doc_b"]): (r["n_intersect"], r["jaccard"])
            for r in token_jaccard(docs, pairs).collect()
        }
        assert via_arrays == via_stream
        # identical docs: jaccard exactly 1.0; disjoint docs: 0.0
        assert via_arrays[(1, 4)][1] == 1.0
        assert via_arrays[(1, 3)] == (0, 0.0)

    def test_shingles_stream_fallback_matches_arrays_path(self, spark):
        from etl_pipelines_spark.llm.dedup import (
            array_jaccard_verify,
            doc_shingle_arrays,
            doc_shingles,
        )

        docs = spark.createDataFrame(
            [(1, "alpha beta gamma delta"), (2, "alpha beta gamma epsilon")],
            "doc_id long, text string",
        )
        pairs = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
        a = array_jaccard_verify(pairs, arrays=doc_shingle_arrays(docs)).collect()
        b = array_jaccard_verify(pairs, shingles=doc_shingles(docs)).collect()
        assert a == b


class TestHllSketchRollups:
    """Mergeable-state rollups: per-grain sketches stored once, coarser
    grains answered by unioning sketches — the 100 TB distinct-count
    pattern. Estimates must track exact counts and the union must equal
    a direct coarse-grain sketch."""

    def test_union_of_fine_grain_equals_direct_coarse_sketch(self, spark):
        from etl_pipelines_spark.operators.sketches import (
            merge_sketch_rollups,
            sketch_estimate,
            sketch_rollup,
        )

        rows = [
            (c, d, w)
            for c in (1, 2)
            for d in range(5)
            for w in range(c * 40)  # coin 1: 40 wallets, coin 2: 80
        ]
        df = spark.createDataFrame(rows, "coin long, day long, wallet long")
        daily = sketch_rollup(df, ["coin", "day"], "wallet")
        assert daily.count() == 10  # one sketch row per (coin, day)
        merged = merge_sketch_rollups(daily, ["coin"]).select(
            "coin", sketch_estimate()
        )
        direct = sketch_rollup(df, ["coin"], "wallet").select(
            "coin", sketch_estimate()
        )
        m = {r["coin"]: r["n_distinct_est"] for r in merged.collect()}
        d = {r["coin"]: r["n_distinct_est"] for r in direct.collect()}
        assert m == d  # union of daily sketches == sketch of the union
        exact = {1: 40, 2: 80}
        for coin, est in m.items():
            assert abs(est - exact[coin]) / exact[coin] < 0.05

    def test_estimates_track_exact_counts_across_scales(self, spark):
        from etl_pipelines_spark.operators.sketches import (
            sketch_estimate,
            sketch_rollup,
        )

        for n in (10, 500, 5000):
            df = spark.range(n).select(
                F.lit(1).alias("g"), F.col("id").alias("v")
            )
            est = (
                sketch_rollup(df, ["g"], "v")
                .select(sketch_estimate())
                .first()["n_distinct_est"]
            )
            assert abs(est - n) / n < 0.05, (n, est)


class TestIvfMultiProbe:
    def _emb(self, spark):
        import random

        rng = random.Random(11)
        rows = [
            (i, [rng.uniform(-1, 1) for _ in range(6)]) for i in range(40)
        ]
        return spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def test_full_probe_equals_brute_force(self, spark):
        """nprobe = k probes every cell, so IVF must return EXACTLY the
        brute-force ranking (same cosines, same tie-break)."""
        from etl_pipelines_spark.llm.similarity import (
            brute_force_topk,
            ivf_topk,
            kmeans_centroids,
        )

        emb = self._emb(spark)
        cents = kmeans_centroids(emb, k=3, n_iter=2)
        ivf = ivf_topk(emb, cents, k=4, n_queries=5, nprobe=3).collect()
        brute = brute_force_topk(
            emb, emb.filter("vec_id < 5"), k=4
        ).collect()
        key = lambda r: (r["query_id"], r["rank"], r["neighbor_id"], r["cosine"])
        assert sorted(map(key, ivf)) == sorted(map(key, brute))

    def test_more_probes_never_degrade(self, spark):
        """At equal rank, nprobe=2's neighbor is at least as close as
        nprobe=1's — the recall dial only adds candidates."""
        from etl_pipelines_spark.llm.similarity import ivf_topk, kmeans_centroids

        emb = self._emb(spark)
        cents = kmeans_centroids(emb, k=4, n_iter=2)
        one = {
            (r["query_id"], r["rank"]): r["cosine"]
            for r in ivf_topk(emb, cents, k=3, n_queries=5, nprobe=1).collect()
        }
        two = {
            (r["query_id"], r["rank"]): r["cosine"]
            for r in ivf_topk(emb, cents, k=3, n_queries=5, nprobe=2).collect()
        }
        for key_, cos1 in one.items():
            assert two[key_] >= cos1


class TestPortableHll:
    def test_merge_of_fine_equals_direct(self, spark):
        """Register tables built per (k, g) then max-merged to k must
        equal registers built directly per k — the associativity that
        makes the stored rollup answer any-grain questions."""
        from etl_pipelines_spark.operators.sketches import (
            merge_hll_registers,
            portable_hll_registers,
        )

        rows = [(i % 5, f"g{i % 3}", f"v{(i * 7) % 400}") for i in range(1000)]
        df = spark.createDataFrame(rows, "k int, g string, v string")
        direct = portable_hll_registers(df, ["k"], "v")
        merged = merge_hll_registers(
            portable_hll_registers(df, ["k", "g"], "v"), ["k"]
        ).select(*direct.columns)
        assert direct.exceptAll(merged).count() == 0
        assert merged.exceptAll(direct).count() == 0

    def test_estimate_accuracy_and_duplicate_insensitivity(self, spark):
        from etl_pipelines_spark.operators.sketches import (
            portable_hll_estimate,
            portable_hll_registers,
        )

        n = 5000
        rows = [(1, f"val{i}") for i in range(n)]
        df = spark.createDataFrame(rows, "k int, v string")
        est = portable_hll_estimate(
            portable_hll_registers(df, ["k"], "v"), ["k"]
        ).first()["hll_estimate"]
        # m=256 -> ~6.5% relative standard error; allow 3 sigma
        assert abs(est - n) / n < 0.2
        dup = df.unionByName(df)
        est2 = portable_hll_estimate(
            portable_hll_registers(dup, ["k"], "v"), ["k"]
        ).first()["hll_estimate"]
        assert est2 == est


class TestKmeansCoarseQuantizer:
    def test_recovers_separated_clusters(self, spark):
        from etl_pipelines_spark.llm.similarity import (
            assign_clusters,
            kmeans_centroids,
        )

        # two tight, well-separated blobs in 3-D
        rows = []
        for i in range(30):
            rows.append((i, [10.0 + (i % 3) * 0.1, 10.0, 10.0]))
        for i in range(30, 60):
            rows.append((i, [-10.0, -10.0 - (i % 3) * 0.1, -10.0]))
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        cents = kmeans_centroids(df, k=2, n_iter=4)
        # one centroid per blob, near the blob means
        signs = sorted(c[0] > 0 for c in cents)
        assert signs == [False, True]
        for c in cents:
            assert all(abs(abs(x) - 10.0) < 0.5 for x in c)
        assigned = assign_clusters(df, cents)
        by_cluster = {}
        for r in assigned.collect():
            by_cluster.setdefault(r["cluster"], set()).add(r["vec_id"] < 30)
        # each cluster is pure: all first-blob or all second-blob
        assert all(len(v) == 1 for v in by_cluster.values())

    def test_deterministic_across_runs(self, spark):
        from etl_pipelines_spark.llm.similarity import kmeans_centroids

        rows = [(i, [float(i % 7), float(i % 5), float(i % 3)]) for i in range(40)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        a = kmeans_centroids(df, k=3, n_iter=3)
        b = kmeans_centroids(df, k=3, n_iter=3)
        assert a == b


class TestCodebookTransports:
    """The three codebook transports (closure / TorrentBroadcast /
    grouped centroid-table join) must assign bit-identically — the
    round-4 `weak` was the closure-only transport; the fix is only a
    fix if the scale tiers reproduce the exact same assignment,
    including argmin ties (lowest cluster index wins)."""

    def _fixture(self, spark, n=150, dim=5):
        rows = [
            (
                i,
                [
                    float(((i * 7 + d * 13) % 29) - 14) / 3.0
                    for d in range(dim)
                ],
            )
            for i in range(n)
        ]
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )

    def _centroids(self, k, dim=5):
        cents = [
            [float(((c * 11 + d * 3) % 17) - 8) / 2.0 for d in range(dim)]
            for c in range(k)
        ]
        # exact duplicate centroid: forces distance ties, so the
        # lowest-index tie-break is actually exercised
        cents[-1] = list(cents[0])
        return cents

    def test_assign_bit_identical_across_transports(self, spark):
        from etl_pipelines_spark.llm.similarity import assign_clusters

        df = self._fixture(spark)
        cents = self._centroids(9)
        ref = {
            r["vec_id"]: r["cluster"]
            for r in assign_clusters(df, cents, transport="closure").collect()
        }
        # the duplicate centroid (index 8 == index 0) must never win
        assert 8 not in set(ref.values())
        for transport in ("broadcast", "table"):
            got = {
                r["vec_id"]: r["cluster"]
                for r in assign_clusters(
                    df, cents, transport=transport
                ).collect()
            }
            assert got == ref, transport

    def test_nearest_probes_bit_identical_across_transports(self, spark):
        from etl_pipelines_spark.llm.similarity import nearest_clusters

        df = self._fixture(spark, n=80)
        cents = self._centroids(10)
        ref = {
            r["vec_id"]: list(r["probes"])
            for r in nearest_clusters(
                df, cents, 4, transport="closure"
            ).collect()
        }
        for transport in ("broadcast", "table"):
            got = {
                r["vec_id"]: list(r["probes"])
                for r in nearest_clusters(
                    df, cents, 4, transport=transport
                ).collect()
            }
            assert got == ref, transport

    def test_table_transport_spans_multiple_groups(self, spark):
        """k beyond one group row: the per-group partial + merge must
        still find the global argmin (this is the distributivity the
        table tier relies on)."""
        from etl_pipelines_spark.llm import similarity
        from etl_pipelines_spark.llm.similarity import assign_clusters

        df = self._fixture(spark, n=60)
        cents = self._centroids(2 * similarity.KM_TABLE_GROUP + 5)
        ref = assign_clusters(df, cents, transport="closure")
        got = assign_clusters(df, cents, transport="table")
        assert {tuple(r) for r in ref.select("vec_id", "cluster").collect()} == {
            tuple(r) for r in got.select("vec_id", "cluster").collect()
        }

    def test_table_transport_never_broadcasts_codebook(self, spark):
        """The table tier exists for codebooks past executor memory:
        the plan must pair vectors with group PARTITIONS (a pinned
        CartesianProduct), never ship the whole group table to every
        node (BroadcastNestedLoop / BroadcastExchange would re-create
        the ceiling the tier removes)."""
        from etl_pipelines_spark.llm.similarity import _table_probes

        df = self._fixture(spark, n=40)
        probes = _table_probes(
            df, self._centroids(9), 1, "embedding", "vec_id", group=4
        )
        plan = probes._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" in plan
        assert "BroadcastNestedLoop" not in plan
        assert "BroadcastExchange" not in plan

    def test_matmul_distance_agrees_with_exact(self, spark):
        """The float32 GEMM kernel (the production assignment path
        past ~10^7 vectors) must agree with the exact int64 kernel on
        every non-degenerate point: the fixture's coordinates are
        multiples of 1/3 and 1/2 with squared-distance gaps far above
        float32 rounding, so agreement here is exact — only true ties
        (the duplicated centroid) may legitimately differ, and those
        also break toward the lowest index (np.argmin first-hit)."""
        from etl_pipelines_spark.llm.similarity import (
            assign_clusters,
            nearest_clusters,
        )

        df = self._fixture(spark, n=200)
        cents = self._centroids(9)
        exact = {
            r["vec_id"]: r["cluster"]
            for r in assign_clusters(df, cents, distance="exact").collect()
        }
        fast = {
            r["vec_id"]: r["cluster"]
            for r in assign_clusters(df, cents, distance="matmul").collect()
        }
        assert fast == exact
        e4 = {
            r["vec_id"]: list(r["probes"])
            for r in nearest_clusters(df, cents, 4, distance="exact").collect()
        }
        m4 = {
            r["vec_id"]: list(r["probes"])
            for r in nearest_clusters(df, cents, 4, distance="matmul").collect()
        }
        assert m4 == e4

    def test_matmul_rejects_table_transport_and_bad_kernel(self, spark):
        import pytest as _pytest

        from etl_pipelines_spark.llm.similarity import assign_clusters

        df = self._fixture(spark, n=10)
        with _pytest.raises(ValueError, match="exact-only"):
            assign_clusters(
                df, self._centroids(9), transport="table", distance="matmul"
            )
        with _pytest.raises(ValueError, match="distance kernel"):
            assign_clusters(df, self._centroids(9), distance="cosine")

    def test_auto_switches_past_closure_threshold(self, spark):
        from etl_pipelines_spark.llm import similarity

        assert similarity._resolve_transport("auto", 8) == "closure"
        assert (
            similarity._resolve_transport(
                "auto", similarity.KM_CLOSURE_MAX_K + 1
            )
            == "broadcast"
        )
        import pytest as _pytest

        with _pytest.raises(ValueError):
            similarity._resolve_transport("bogus", 8)


class TestTwoLevelQuantizer:
    """Coarse+fine quantizer — the escape from the flat-codebook
    ceiling at 10^9 vectors (SCALE.md): per-row assignment cost
    O((k1+k2)*dim) instead of O(k1*k2*dim), fine codebook on the
    existing TorrentBroadcast transport tier."""

    def test_assignment_matches_numpy_reference(self, spark):
        """cell = offset[coarse_argmin] + within-cell fine argmin, with
        the same floor-scaled int64 distances and lowest-index
        tie-breaks as the flat kernel — pinned against a pure-numpy
        replay of the full two-hop rule."""
        import numpy as np

        from etl_pipelines_spark.llm.similarity import (
            SCALE,
            two_level_assign,
            two_level_centroids,
        )

        rows = [
            (i, [float(((i * 7 + d * 13) % 29) - 14) / 3.0 for d in range(4)])
            for i in range(120)
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        coarse, fine = two_level_centroids(df, k1=4, k2=3, n_iter=2, fine_iter=1)
        assert len(coarse) == 4 and all(1 <= len(b) <= 3 for b in fine)

        got = {
            r["vec_id"]: (r["_c1"], r["cell"])
            for r in two_level_assign(df, coarse, fine).collect()
        }

        def d2(a, C):
            A = np.asarray(a, dtype="float64")
            Cm = np.asarray(C, dtype="float64")
            return (
                np.floor((A[None, :] - Cm) ** 2 * SCALE).astype("int64").sum(axis=1)
            )

        offsets, acc = [], 0
        for b in fine:
            offsets.append(acc)
            acc += max(1, len(b))
        for i, vec in rows:
            c1 = int(np.argmin(d2(vec, coarse)))
            f = int(np.argmin(d2(vec, fine[c1]))) if len(fine[c1]) > 1 else 0
            assert got[i] == (c1, offsets[c1] + f), f"vec {i}"

    def test_occupancy_at_64k_effective_cells(self, spark):
        """The SCALE.md measurement: at k_eff >= 64k (k1 = k2 = 256)
        over a 300k-vector synthetic corpus, the two-level quantizer
        must actually POPULATE its cell space — a majority of cells
        nonempty, max occupancy within sane skew bounds — and per-row
        assignment cost stays O((k1+k2)*dim). This is the test the
        10^9-vector paragraph cites (a flat codebook at the same
        k_eff would be a 64k-wide argmin per row)."""
        from pyspark.sql import functions as F

        from etl_pipelines_spark.llm.similarity import (
            two_level_assign,
            two_level_centroids,
        )

        n, dim = 300_000, 8
        comps = F.expr(
            f"transform(sequence(0, {dim - 1}), d -> "
            "cast(pmod(xxhash64(id, d), 100000) as double) / 50000.0 - 1.0)"
        )
        emb = (
            spark.range(n)
            .repartition(16)
            .select(F.col("id").alias("vec_id"), comps.alias("embedding"))
            .persist()
        )
        emb.count()
        coarse, fine = two_level_centroids(
            emb, k1=256, k2=256, n_iter=1, fine_iter=1
        )
        k_eff = sum(max(1, len(b)) for b in fine)
        assert k_eff >= 64_000, f"k_eff {k_eff}"

        occ = (
            two_level_assign(emb, coarse, fine)
            .groupBy("cell")
            .agg(F.count(F.lit(1)).alias("c"))
            .agg(
                F.count(F.lit(1)).alias("nonempty"),
                F.max("c").alias("mx"),
                F.sum("c").alias("total"),
            )
            .first()
        )
        emb.unpersist()
        assert occ["total"] == n
        # majority of the 64k cells carry vectors (mean occupancy ~4.6;
        # every fine centroid is initialized AT a member vector, so an
        # empty cell means Lloyd moved it off its own seed)
        assert occ["nonempty"] >= k_eff // 2, occ
        # skew bound: no cell collapses a meaningful corpus fraction
        mean = n / occ["nonempty"]
        assert occ["mx"] <= 200 * mean, occ


    def test_two_level_topk_recall_vs_brute_force(self, spark):
        """The composed end-to-end ANN path: coarse+fine assignment
        feeding a multi-probe (nprobe1 x nprobe2 cells) exact-rerank
        top-k. With generous probes over a small corpus the ANN result
        must recover nearly all of the exact brute-force top-10 —
        and the rows it does return must carry identical cosines."""
        from pyspark.sql import functions as F

        from etl_pipelines_spark.llm.similarity import (
            brute_force_topk,
            two_level_centroids,
            two_level_topk,
        )

        n, dim = 4000, 6
        comps = F.expr(
            f"transform(sequence(0, {dim - 1}), d -> "
            "cast(pmod(xxhash64(id, d), 100000) as double) / 50000.0 - 1.0)"
        )
        emb = (
            spark.range(n)
            .select(F.col("id").alias("vec_id"), comps.alias("embedding"))
            .persist()
        )
        emb.count()
        coarse, fine = two_level_centroids(emb, k1=8, k2=8, n_iter=2, fine_iter=1)
        ann = two_level_topk(
            emb, coarse, fine, k=10, n_queries=5, nprobe1=6, nprobe2=6
        ).collect()
        exact = brute_force_topk(
            emb, emb.filter(F.col("vec_id") < 5), k=10
        ).collect()
        emb.unpersist()
        exact_pairs = {(r["query_id"], r["neighbor_id"]): r["cosine"] for r in exact}
        ann_pairs = {(r["query_id"], r["neighbor_id"]): r["cosine"] for r in ann}
        hits = set(ann_pairs) & set(exact_pairs)
        recall = len(hits) / len(exact_pairs)
        assert recall >= 0.9, f"recall@10 {recall}"
        for p in hits:  # same exact-cosine kernel on both sides
            assert abs(ann_pairs[p] - exact_pairs[p]) < 1e-12

    def test_fine_codebook_broadcast_is_single_slot(self, spark):
        """Repeated two_level_assign calls must not accumulate fine-
        codebook TorrentBroadcasts: shipping a new codebook frees the
        previous one, and release_fine_codebook() frees the last."""
        from etl_pipelines_spark.llm import similarity as sim

        rows = [(i, [float(i % 7), float(i % 3)]) for i in range(40)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        coarse, fine = sim.two_level_centroids(df, k1=2, k2=2, n_iter=1, fine_iter=1)
        # training released its own round broadcasts; slot starts empty
        assert sim._LAST_FINE_BC is None
        a1 = sim.two_level_assign(df, coarse, fine)
        a1.collect()
        bc1 = sim._LAST_FINE_BC
        assert bc1 is not None
        a2 = sim.two_level_assign(df, coarse, fine)
        a2.collect()
        assert sim._LAST_FINE_BC is not bc1  # old broadcast was freed
        sim.release_fine_codebook()
        assert sim._LAST_FINE_BC is None


class TestBloomFilter:
    """Portable Bloom filter: build/probe/merge contracts."""

    def test_no_false_negatives_and_low_fpp(self, spark):
        from etl_pipelines_spark.operators.sketches import bloom_build, bloom_probe

        members = spark.range(0, 300).withColumnRenamed("id", "v")
        bf = bloom_build(members, "v")
        row = bf.collect()[0]
        assert len(row["words"]) == 4096 // 64
        out = bloom_probe(
            spark.range(0, 3000).withColumnRenamed("id", "v"), "v", bf
        ).collect()
        assert all(r["in_bloom"] for r in out if r["v"] < 300)  # no FNs, ever
        fp = sum(1 for r in out if r["v"] >= 300 and r["in_bloom"])
        # m=4096, k=4, n=300 -> fpp ~ (1 - e^(-1200/4096))^4 ~ 0.4%
        assert fp <= 2700 * 0.02

    def test_merge_equals_one_shot_build(self, spark):
        from etl_pipelines_spark.operators.sketches import bloom_build, bloom_merge

        members = spark.range(0, 250).withColumnRenamed("id", "v")
        whole = bloom_build(members, "v").collect()[0]
        parts = bloom_merge(
            bloom_build(members.filter("v % 3 = 0"), "v")
            .unionByName(bloom_build(members.filter("v % 3 = 1"), "v"))
            .unionByName(bloom_build(members.filter("v % 3 = 2"), "v"))
        ).collect()[0]
        assert parts["words"] == whole["words"]
        assert (parts["m_bits"], parts["k"]) == (4096, 4)

    def test_empty_build_rejects_everything(self, spark):
        from etl_pipelines_spark.operators.sketches import bloom_build, bloom_probe

        bf = bloom_build(
            spark.range(0, 100).filter("id < 0").withColumnRenamed("id", "v"), "v"
        )
        assert bf.collect()[0]["words"] == [0] * 64
        out = bloom_probe(
            spark.range(0, 50).withColumnRenamed("id", "v"), "v", bf
        ).collect()
        assert not any(r["in_bloom"] for r in out)


class TestCountMinSketch:
    """Portable count-min: never-undercount, merge linearity."""

    def test_estimate_never_undercounts_and_bounds_overcount(self, spark):
        from etl_pipelines_spark.operators.sketches import (
            countmin_build,
            countmin_estimate,
        )
        from pyspark.sql import functions as F

        # zipf-ish stream: value v repeated (300 - v) times
        stream = spark.range(0, 300).selectExpr(
            "explode(sequence(1, 300 - id)) AS rep", "id AS v"
        )
        sketch = countmin_build(stream, "v")
        exact = stream.groupBy("v").agg(F.count("*").alias("n"))
        probes = stream.select("v").distinct()
        est = countmin_estimate(probes, "v", sketch)
        rows = est.join(exact, "v").collect()
        assert all(r["cm_estimate"] >= r["n"] for r in rows)
        # d=4, w=256, N=45150: overshoot bounded in practice well
        # under e*N/w ~ 480 per the classic analysis
        assert max(r["cm_estimate"] - r["n"] for r in rows) < 1000
        # with 300 items over 4x256 buckets most items collide with
        # nothing in at least one row -> the typical estimate is exact
        exact_hits = sum(1 for r in rows if r["cm_estimate"] == r["n"])
        assert exact_hits > len(rows) * 0.6

    def test_merge_equals_one_shot_and_weighted_build(self, spark):
        from etl_pipelines_spark.operators.sketches import (
            countmin_build,
            countmin_merge,
        )

        stream = spark.range(0, 500).selectExpr("id % 37 AS v")
        whole = {
            (r["row"], r["bucket"]): r["cnt"]
            for r in countmin_build(stream, "v").collect()
        }
        halves = countmin_merge(
            countmin_build(stream.filter("id < 250"), "v").unionByName(
                countmin_build(stream.filter("id >= 250"), "v")
            )
        )
        assert {
            (r["row"], r["bucket"]): r["cnt"] for r in halves.collect()
        } == whole
        # a pre-counted (value, weight) vocabulary builds the same matrix
        vocab = stream.groupBy("v").count()
        weighted = {
            (r["row"], r["bucket"]): r["cnt"]
            for r in countmin_build(vocab, "v", weight_col="count").collect()
        }
        assert weighted == whole


class TestQuantileSketch:
    def _rows(self, spark, n=2000, keys=4):
        # deterministic skewed values: value = (i * i) % 1000
        return spark.range(n).selectExpr(
            "id % {} AS k".format(keys),
            "CAST(id AS STRING) AS rid",
            "CAST((id * id) % 1000 AS DOUBLE) AS v",
        )

    def test_merge_of_fine_equals_direct(self, spark):
        """bottom-k over unioned per-slice bottom-k states == bottom-k
        built straight from the raw rows — the closure that makes the
        stored per-grain sample answer any-grain questions."""
        from etl_pipelines_spark.operators.sketches import (
            quantile_sketch_build,
            quantile_sketch_merge,
        )

        df = self._rows(spark).withColumn("g", F.expr("CAST(rid AS BIGINT) % 7"))
        direct = quantile_sketch_build(df, ["k"], "v", ["rid"], k=16)
        merged = quantile_sketch_merge(
            quantile_sketch_build(df, ["k", "g"], "v", ["rid"], k=16),
            ["k"],
            k=16,
        ).select(*direct.columns)
        assert direct.exceptAll(merged).count() == 0
        assert merged.exceptAll(direct).count() == 0
        # both salt modes (scale paths for pathological keys) keep the
        # same multiset: the one-pass cascade at any G, and the
        # threshold pre-filter at a firing G (>= k, here 2k) and at a
        # degenerate G < k where the threshold stays NULL
        for g, mode in (
            (4, "cascade"), (32, "cascade"), (4, "prefilter"), (32, "prefilter"),
        ):
            salted = quantile_sketch_build(
                df, ["k"], "v", ["rid"], k=16, salt_groups=g, salt_mode=mode
            ).select(*direct.columns)
            assert direct.exceptAll(salted).count() == 0, f"{mode} G={g}"
            assert salted.exceptAll(direct).count() == 0, f"{mode} G={g}"

    def test_exact_below_k(self, spark):
        """A key with <= k rows keeps every row, so the estimate IS the
        exact percentile_disc quantile."""
        from etl_pipelines_spark.operators.sketches import (
            quantile_sketch_build,
            quantile_sketch_estimate,
        )

        rows = [(1, str(i), float(v)) for i, v in enumerate([5, 1, 9, 3, 7])]
        df = spark.createDataFrame(rows, "k int, rid string, v double")
        est = {
            r["q"]: (r["n_sample"], r["quantile_value"])
            for r in quantile_sketch_estimate(
                quantile_sketch_build(df, ["k"], "v", ["rid"], k=32),
                ["k"],
                qs=(0.0, 0.5, 1.0),
            ).collect()
        }
        assert est["0.00"] == (5, 1.0)
        assert est["0.50"] == (5, 5.0)
        assert est["1.00"] == (5, 9.0)

    def test_sampled_quantile_near_exact(self, spark):
        """On a 2000-row key the 64-row sample's median lands within
        ~2/sqrt(64) quantile units of the true median."""
        from etl_pipelines_spark.operators.sketches import (
            quantile_sketch_build,
            quantile_sketch_estimate,
        )

        df = self._rows(spark, n=2000, keys=1)
        est = quantile_sketch_estimate(
            quantile_sketch_build(df, ["k"], "v", ["rid"], k=64),
            ["k"],
            qs=(0.5,),
        ).first()
        exact = df.selectExpr("percentile(v, 0.5) AS m").first()["m"]
        # convert tolerance to quantile space via the exact CDF
        frac = (
            df.filter(F.col("v") <= F.lit(est["quantile_value"])).count() / 2000
        )
        assert abs(frac - 0.5) < 0.25
        assert est["n_sample"] == 64
        # sanity: the sampled median is in the value range
        assert 0.0 <= est["quantile_value"] <= 1000.0
        assert exact is not None


class TestSemanticDedup:
    def test_blob_dedup_keeps_lowest_id(self, spark):
        """Two separated blobs: near-identical vectors inside a blob
        collapse to the lowest id; the cross-blob pairing never
        compares (different cells), so distinct blobs both survive."""
        from etl_pipelines_spark.llm.similarity import (
            kmeans_centroids,
            semantic_dedup,
        )

        rows = []
        # blob A: ids 0-9, nearly identical
        for i in range(10):
            rows.append((i, [10.0 + i * 1e-4, 10.0, 10.0]))
        # blob B: ids 10-19, nearly identical to each other
        for i in range(10, 20):
            rows.append((i, [-10.0, -10.0 - (i - 10) * 1e-4, -10.0]))
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        cents = kmeans_centroids(df, k=2, n_iter=3)
        out = {r["vec_id"]: r for r in semantic_dedup(df, cents, 0.99).collect()}
        assert len(out) == 20  # one row per input vector
        # exactly the lowest id of each blob survives
        survivors = sorted(v["vec_id"] for v in out.values() if v["keep"])
        assert survivors == [0, 10]
        # the two blobs landed in different cells
        assert out[0]["cluster"] != out[10]["cluster"]

    def test_threshold_one_keeps_everything(self, spark):
        from etl_pipelines_spark.llm.similarity import (
            kmeans_centroids,
            semantic_dedup,
        )

        rows = [(i, [float(i), float(i * 2 % 7), 1.0]) for i in range(12)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        cents = kmeans_centroids(df, k=3, n_iter=2)
        out = semantic_dedup(df, cents, threshold=1.1)
        assert out.filter("NOT keep").count() == 0


class TestCorrelationMatrix:
    def test_perfect_and_anti_correlation(self, spark):
        from etl_pipelines_spark.operators.profiling import correlation_matrix

        df = spark.range(1, 101).selectExpr(
            "CAST(id AS DOUBLE) AS a",
            "CAST(id * 3 AS DOUBLE) AS b",
            "CAST(100 - id AS DOUBLE) AS c",
        )
        got = {
            (r["col_a"], r["col_b"]): r["corr"]
            for r in correlation_matrix(df, ["a", "b", "c"], decimals=0).collect()
        }
        # sqrt(x)*sqrt(y) vs sqrt(x*y) leaves ~1 ulp; determinism (not
        # tidiness) is what the oracle gate pins
        assert abs(got[("a", "b")] - 1.0) < 1e-12
        assert abs(got[("a", "c")] + 1.0) < 1e-12
        assert abs(got[("b", "c")] + 1.0) < 1e-12

    def test_independent_columns_near_zero_and_null_rows_dropped(self, spark):
        from etl_pipelines_spark.operators.profiling import correlation_matrix

        df = spark.range(200).selectExpr(
            "CAST(id % 7 AS DOUBLE) AS a",
            "CAST((id * 37) % 11 AS DOUBLE) AS b",
            "CASE WHEN id = 5 THEN NULL ELSE CAST(id AS DOUBLE) END AS c",
        )
        rows = correlation_matrix(df, ["a", "b", "c"], decimals=0).collect()
        n = {r["n"] for r in rows}
        assert n == {199}  # listwise null drop: every pair sees the same n
        got = {(r["col_a"], r["col_b"]): r["corr"] for r in rows}
        assert abs(got[("a", "b")]) < 0.2


def test_hyperplanes_are_not_mutually_aligned():
    """Regression pin for the LCG-lattice bug: stride-sampling a raw
    LCG produced hyperplanes with pairwise |cos| ~0.74 — sixteen
    nearly-parallel planes whose correlated sign bits collapsed ~20%
    of a corpus into one LSH bucket (quadratic candidate blowup that
    more bits could not split). Well-mixed planes sit near the
    1/sqrt(dim) a random basis gives."""
    import math

    from etl_pipelines_spark.llm.similarity import lcg_hyperplanes

    planes = lcg_hyperplanes(16, 64, seed=42)
    norms = [math.sqrt(sum(x * x for x in p)) for p in planes]
    worst = 0.0
    for i in range(len(planes)):
        for j in range(i + 1, len(planes)):
            dot = sum(a * b for a, b in zip(planes[i], planes[j]))
            worst = max(worst, abs(dot) / (norms[i] * norms[j]))
    assert worst < 0.5, f"planes nearly parallel: max |cos| = {worst:.3f}"


def test_adaptive_plane_bits_occupancy_law():
    from etl_pipelines_spark.queries.llmops import adaptive_plane_bits

    assert adaptive_plane_bits(0) == 4
    assert adaptive_plane_bits(2000) == 4     # sf0.01/sf0.1 corpus
    assert adaptive_plane_bits(20000) == 8    # sf1 corpus
    assert adaptive_plane_bits(10**9) == 8    # clamped at the pool
