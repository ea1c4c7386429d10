"""Physical-plan regression audits.

These tests pin the *scale* properties the engine claims, not result
values: filters reach the parquet scan, scans prune to the referenced
columns, small dimensions broadcast, explicitly-repartitioned
pipelines introduce no further shuffles, and rewrites that exist to
avoid a pathological operator (q54 vs Expand) stay avoided. A perf
regression that silently adds an exchange or un-pushes a filter fails
here long before a benchmark would catch it.
"""

import contextlib
import io
import re

import pytest

from etl_pipelines_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def plan_of(spark, name: str) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        QUERIES[name].spark_fn(spark, SF).explain("formatted")
    return buf.getvalue()


def shuffle_exchanges(plan: str) -> int:
    """Count distinct shuffle-exchange nodes (detail headers like
    '(3) Exchange'; BroadcastExchange intentionally excluded)."""
    return len(re.findall(r"^\(\d+\) Exchange$", plan, flags=re.M))


class TestScanPushdown:
    def test_q01_filter_reaches_parquet_scan(self, spark):
        plan = plan_of(spark, "q01_pricing_summary")
        pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
        assert pushed and "LessThan(l_shipdate" in pushed[0]

    def test_q01_scan_prunes_columns(self, spark):
        plan = plan_of(spark, "q01_pricing_summary")
        schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
        # 6 referenced columns, none of the other 10 lineitem columns
        assert schema.count(":") == 6 + 1  # 6 fields + the line's own colon
        assert "l_orderkey" not in schema and "l_comment" not in schema

    def test_q76_external_scan_pushes_through_federation_api(self, spark):
        # the external_scan boundary must be transparent to Catalyst:
        # the predicate and projection given to the API have to reach
        # the underlying snapshot scan as PushedFilters + a pruned
        # ReadSchema, exactly as if the user had written the plan inline
        plan = plan_of(spark, "q76_external_snapshot_scan")
        pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
        assert pushed and "EqualTo(event_type,purchase)" in pushed[0]
        assert "GreaterThan(value,10" in pushed[0]
        schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
        assert "event_id" not in schema and "ts" not in schema

    def test_q07_semi_join_prunes_to_join_key(self, spark):
        plan = plan_of(spark, "q07_semi_join_priced_coins")
        li_schemas = [
            l for l in plan.splitlines()
            if "ReadSchema" in l and "l_partkey" in l
        ]
        # the lineitem side of a semi join needs the key + filter col only
        assert li_schemas and all(s.count(":") <= 2 + 1 for s in li_schemas)


class TestJoinStrategy:
    def test_q02_dims_broadcast(self, spark):
        plan = plan_of(spark, "q02_region_customer_revenue")
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan

    def test_q06_anti_join_no_cartesian(self, spark):
        plan = plan_of(spark, "q06_anti_join_exclusions")
        assert "LeftAnti" in plan
        assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


class TestShuffleBudget:
    def test_q20_single_exchange_serves_agg_and_window(self, spark):
        # daily_prices repartitions on coin_id once; the (coin, date)
        # groupBy and the per-coin lag/lead window must both reuse it
        assert shuffle_exchanges(plan_of(spark, "q20_lag_lead_dip_removal")) == 1

    def test_q08_two_filtered_half_exchanges(self, spark):
        # Catalyst pushes each branch's returnflag predicate below the
        # shared repartition, so the branches shuffle disjoint halves
        # (2 half-size exchanges = 1 full-size, with scan-level
        # filtering); the join itself must not add a third
        plan = plan_of(spark, "q08_full_outer_coalesce")
        assert shuffle_exchanges(plan) == 2
        assert "EqualTo(l_returnflag,R)" in plan

    def test_q22_kernel_two_exchanges(self, spark):
        # one per base stream (prices by coin, transfers by coin+wallet);
        # every window and the merge join ride those two
        assert shuffle_exchanges(plan_of(spark, "q22_wallet_profits_kernel")) <= 2

    def test_q75_pipeline_three_exchanges_no_persist(self, spark):
        # fused impute+splice (plans/wallet_profits.splice_with_imputation):
        # the whole five-stage pipeline is ONE linear plan — the fact
        # stream shuffles once on (coin, wallet) and every stage's
        # windows ride it; the only other exchanges are the two daily-
        # price derivations (both then broadcast). The r2 shape (persist
        # + imputation branch re-reading the merged frame via distinct/
        # anti-join subtrees) would push this past 5.
        plan = plan_of(spark, "q75_wallet_profits_pipeline")
        assert shuffle_exchanges(plan) <= 3
        assert "InMemoryTableScan" not in plan  # no persist needed anymore

    def test_q72_fused_audit_two_exchanges(self, spark):
        # the four audit rules collapse into one aggregation cascade:
        # the kernel's coin_id repartition serves the window AND both
        # partial groupBys; the only other shuffle is the final 1-row
        # global aggregate. A regression to materialize-then-query
        # (persist + 4 rule branches) would multiply this count.
        assert shuffle_exchanges(plan_of(spark, "q72_quality_audit")) <= 2


class TestLLMPipelineShapes:
    def test_q34_jaccard_intersection_is_equi_join(self, spark):
        # token_jaccard writes the token-equality as a filter above the
        # doc_b join; Catalyst must fold it into the join condition —
        # if that ever breaks, the verify stage becomes a nested-loop
        # cross of every pair against every token
        plan = plan_of(spark, "q34_lsh_jaccard_pairs")
        assert "BroadcastNestedLoop" not in plan
        assert "CartesianProduct" not in plan

    def test_q05_explode_fused_two_exchanges(self, spark):
        # the ±explode must stay a codegen Generate (not a shuffle),
        # the orders dim broadcasts, and only the scan-spread and the
        # daily-net groupBy exchange remain
        plan = plan_of(spark, "q05_daily_net_kernel")
        assert "Generate" in plan and "BroadcastHashJoin" in plan
        assert shuffle_exchanges(plan) == 2

    def test_q62_single_pass_no_self_join(self, spark):
        # corpus token frequencies ride a window over the tf frame and
        # the corpus total a global window over the doc-level aggregate
        # — NO self-derived join (building a broadcast from the tf
        # subtree re-executes scan+split+explode once per consumer),
        # so the token stream is scanned exactly once
        plan = plan_of(spark, "q62_unigram_likelihood")
        assert "Join" not in plan
        # formatted explain prints each node twice (tree + detail)
        assert len(re.findall(r"^\(\d+\) Scan parquet", plan, flags=re.M)) == 1
        assert "Window" in plan

    def test_q63_growth_curve_aggregates_before_global_window(self, spark):
        # the single-partition running-sum window is tolerated ONLY
        # because it runs over the doc-count-sized curve; both token
        # aggregations must sit below it (partial-aggregated), and the
        # SinglePartition exchange must be the last one
        plan = plan_of(spark, "q63_vocabulary_growth")
        last_exchange = None
        for m in re.finditer(
            r"^\(\d+\) Exchange\s*$.*?Arguments: (\w+)", plan, re.M | re.S
        ):
            last_exchange = m.group(1)
        assert last_exchange == "SinglePartition"

    def test_q64_contamination_has_no_self_join(self, spark):
        # the matrix's corpus-side plan is ONE wide groupBy carrying an
        # 8-byte bit_or source mask per shingle plus one tiny mask-
        # pattern exchange — no joins anywhere (the r2 shape re-ran the
        # collect_set subtree once per consumer branch; a regression to
        # the shingle self-join would double the wide shuffle). The
        # matrix itself assembles driver-side from the result-sized
        # pattern table.
        import contextlib
        import io

        from etl_pipelines_spark.queries.llmops import _contamination_patterns
        from etl_pipelines_spark.sources.registry import load_table

        docs = load_table(spark, SF, "documents")
        from pyspark.sql import functions as F

        words = docs.repartition("doc_id").select(
            "source", F.split(F.col("text"), " ").alias("_w")
        )
        tris = F.expr(
            "transform(sequence(0, greatest(size(_w) - 3, 0)),"
            " i -> concat_ws(' ', get(_w, i), get(_w, i + 1), get(_w, i + 2)))"
        )
        srcs = sorted(r[0] for r in docs.select("source").distinct().collect())
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            _contamination_patterns(words, tris, srcs).explain("formatted")
        plan = buf.getvalue()
        assert "bit_or" in plan
        assert "Join" not in plan and "collect_set" not in plan
        assert shuffle_exchanges(plan) <= 3  # repartition, shingle agg, mask agg

    def test_q80_hll_rollup_single_exchange_no_window(self, spark):
        # the portable HLL is partial-aggregable end to end: register
        # assignment is map-side string math, bit_or/max partials ride
        # the one transfers-derivation exchange, and the estimate is a
        # plain groupBy — no Window, no sort, 8 bytes per shingle key.
        plan = plan_of(spark, "q80_portable_hll_rollup")
        assert shuffle_exchanges(plan) <= 2
        assert not re.search(r"^\(\d+\) Window", plan, flags=re.M)

    def test_q81_bm25_joins_broadcast(self, spark):
        # query-term set, vocabulary, sizes, and corpus stats all ride
        # broadcasts onto the (doc, token) stream — a shuffled join on
        # token or doc would mean a dimension stopped broadcasting
        plan = plan_of(spark, "q81_bm25_retrieval")
        assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
        assert "BroadcastHashJoin" in plan

    def test_q38_trained_ivf_python_is_arrow_only(self, spark):
        # training + assignment + probes + rerank cross to Python only
        # as Arrow batches; a BatchEvalPython node would mean a
        # row-at-a-time UDF crept into the ANN path
        plan = plan_of(spark, "q38_ivf_bucketed_ann")
        assert "ArrowEvalPython" in plan
        assert "BatchEvalPython" not in plan

    def test_q37_python_boundary_is_arrow_only(self, spark):
        # pandas UDFs surface as ArrowEvalPython; BatchEvalPython would
        # mean a row-at-a-time Python UDF crept into the hot path
        plan = plan_of(spark, "q37_cosine_near_dup")
        assert "ArrowEvalPython" in plan
        assert "BatchEvalPython" not in plan


class TestNewOpsShapes:
    def test_q65_scrub_is_shuffle_free(self, spark):
        # deny-list scrubbing is map-only regex work; any exchange here
        # means the redaction pass stopped fusing into the scan
        assert shuffle_exchanges(plan_of(spark, "q65_denylist_scrub")) == 0

    def test_q66_waterfill_single_data_pass(self, spark):
        # only the per-doc counting aggregation touches the corpus; the
        # water-fill itself runs on the languages-sized strata frame, so
        # the budget and level frames must broadcast, never sort-merge
        plan = plan_of(spark, "q66_budget_waterfill")
        assert "SortMergeJoin" not in plan

    def test_q67_dim_stats_broadcast(self, spark):
        # the n_dims-row stats frame must broadcast back onto the
        # exploded values; a sort-merge join would re-shuffle the whole
        # (vec, dim) stream on dim just to look up 64 lo/hi rows
        plan = plan_of(spark, "q67_embedding_quantization")
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan


class TestRewritesStayAvoided:
    def test_q54_profile_avoids_expand(self, spark):
        # the multi-countDistinct formulation rewrites to Expand
        # (input x N_distinct row blowup); the per-column-branch
        # formulation must never reintroduce it
        assert "Expand" not in plan_of(spark, "q54_column_profile")

    def test_q30_dedup_shuffles_digest_not_text(self, spark):
        plan = plan_of(spark, "q30_exact_dedup")
        m = re.search(r"^\(\d+\) Exchange\s*$.*?Arguments: hashpartitioning\(([^,]+)", plan, re.M | re.S)
        assert m and "_digest" in m.group(1)


@pytest.fixture(autouse=True)
def _quiet(spark):
    spark.sparkContext.setLogLevel("ERROR")
    yield


class TestAQESkewHandling:
    def test_skewed_join_triggers_aqe_skew_split(self, spark):
        """SCALE.md leans on AQE skew-join for hot coins/wallets — prove
        the session config actually fires it: a 1-hot-key join under
        tiny skew thresholds must show skew=true in the final adaptive
        plan, and AQE must not be silently disabled."""
        from pyspark.sql import functions as F

        confs = {
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
        }
        old = {k: spark.conf.get(k, None) for k in confs}
        try:
            for k, v in confs.items():
                spark.conf.set(k, v)
            left = spark.range(200_000).select(
                F.when(F.col("id") % 100 < 99, F.lit(0))
                .otherwise(F.col("id"))
                .alias("k"),
                F.col("id").alias("payload"),
            )
            right = spark.range(2_000).select(
                (F.col("id") % 500).alias("k"), F.col("id").alias("r")
            )
            joined = left.join(right, "k")
            # run THIS DataFrame's own query execution (count() would
            # plan a separate execution whose adaptive plan we can't see)
            joined._jdf.queryExecution().executedPlan().executeCollect()
            final = joined._jdf.queryExecution().executedPlan().toString()
            assert "skew=true" in final, final[:2000]
        finally:
            for k, v in old.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)


class TestBloomFilterShape:
    def test_q85_probe_is_broadcast_and_build_combines_map_side(self, spark):
        # the 1-row filter must broadcast onto the probe side (no
        # shuffle of customers to check membership), and the set-bit
        # stream must pre-aggregate map-side (partial bit_or) so the
        # build shuffle carries at most m/64 words per partition
        plan = plan_of(spark, "q85_bloom_filter")
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
        assert "partial_bit_or" in plan
        assert "SortMergeJoin" not in plan


class TestRound3Shapes:
    def test_q95_quantile_sketch_bounded_exchanges(self, spark):
        # build rides one exchange for its (coin, month) rank; merge
        # and estimate re-rank sketch-sized streams. More exchanges
        # than 5 (transfers join + agg + three rank grains) means a
        # stage stopped reusing its parent partitioning
        plan = plan_of(spark, "q95_quantile_sketch_rollup")
        assert shuffle_exchanges(plan) <= 5, plan_of(spark, "q95_quantile_sketch_rollup")

    def test_q96_semdedup_python_is_arrow_only_and_no_cartesian(self, spark):
        # assignment + pair dots cross to Python as Arrow batches only;
        # candidate generation must stay a bucketed equi-join — a
        # CartesianProduct would mean the within-cell constraint was
        # lost and the plan went corpus^2
        plan = plan_of(spark, "q96_semantic_dedup")
        assert "ArrowEvalPython" in plan
        assert "BatchEvalPython" not in plan
        assert "CartesianProduct" not in plan

    def test_q97_snapshot_diff_shuffles_digest_not_payload(self, spark):
        # each side reduces to (key, 48-bit digest) BEFORE the
        # full-outer join, so the join shuffle is narrow at any table
        # width: the compare columns must not appear in the exchange
        plan = plan_of(spark, "q97_snapshot_diff")
        m = re.search(
            r"^\(\d+\) SortMergeJoin FullOuter.*?$", plan, flags=re.M
        )
        # whatever join strategy runs, no o_orderstatus bytes may ride
        # past the digest projection into the join input exchanges
        exchanges = [
            l for l in plan.splitlines() if "Arguments: hashpartitioning" in l
        ]
        assert exchanges, plan
        assert all("o_orderstatus" not in l and " st#" not in l for l in exchanges), (
            m.group(0) if m else exchanges
        )

    def test_q98_table_digest_single_aggregation_no_shuffle_of_rows(self, spark):
        # the checksum is one partial-aggregable pass: map-side digest
        # sums combine and the agg exchange carries ONE row per
        # partition — a Window or a sort here would mean the digest
        # stopped being order-independent algebra. The second
        # exchange is the deliberate scan fan-out (single-file corpus
        # -> md5 CPU across cores; see q98)
        plan = plan_of(spark, "q98_table_digest")
        assert not re.search(r"^\(\d+\) Window", plan, flags=re.M)
        assert not re.search(r"^\(\d+\) Sort", plan, flags=re.M)
        assert shuffle_exchanges(plan) <= 2
