"""Full warehouse refresh — SURVEY.md §3.1 as one Spark driver program.

The reference sequences this through GCP Workflow YAMLs with an HTTP
hop per step (workflows/core_tables_all.yaml) and hand-rolls the
§3.2 profits rebuild through batch fan-out + temp tables. Here the
whole refresh is a single lazy DAG: each curated table is a DataFrame
stage, dependencies are plain data dependencies, Catalyst plans the
lot, and the only materialization points are the partitioned writes.
Post-write, every table runs its dbt-equivalent expectation suite —
the reference's `run_all_tests.sh` topology (build, then audit).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipelines_spark.expectations import load_expectations, run_expectations
from etl_pipelines_spark.operators.windows import cumulative_window
from etl_pipelines_spark.quality import ExpectationResult
from etl_pipelines_spark.sources.registry import write_partitioned


@dataclass
class RefreshReport:
    tables: dict[str, int] = field(default_factory=dict)  # rows written
    expectations: list[ExpectationResult] = field(default_factory=list)

    @property
    def passed(self) -> bool:
        return all(r.passed for r in self.expectations)


def refresh_warehouse(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    coin_limit: int | None = None,
    since: str | None = None,
    until: str | None = None,
    expectations_path: str | None = None,
) -> RefreshReport:
    """Rebuild the curated layer from the raw testdata star schema:
    coin_market_data (densified daily prices), coin_wallet_transfers
    (running balances), coin_wallet_profits (the §3.2 kernel) — each
    written PARTITION BY date and then audited. `coin_limit` scopes the
    coin universe (the reference's dev_core sandbox pattern,
    dev_core_tables/create_reference_dev_coins.sql).

    The post-write suites come from the DECLARATIVE expectations
    config (expectations.yml, mirroring dbt_dreamsdata/models/
    schema.yml's authoring surface) — adding a constraint to a curated
    table is a config edit; `expectations_path` points tests or
    sandboxes at an alternate ruleset."""
    from etl_pipelines_spark.operators.densify import densify_daily, with_days_imputed
    from etl_pipelines_spark.operators.windows import forward_fill
    from etl_pipelines_spark.queries.timeseries import (
        daily_prices,
        transfers,
        wallet_profits_kernel_from,
    )

    report = RefreshReport()
    rules = load_expectations(expectations_path)
    built: dict[str, DataFrame] = {}

    def land(name: str, df: DataFrame) -> DataFrame:
        path = os.path.join(out_dir, name)
        write_partitioned(df, path)
        back = spark.read.parquet(path)
        report.tables[name] = back.count()
        built[name] = back
        report.expectations.extend(run_expectations(back, name, rules, built))
        return back

    # 0. dimensions (§3.1 steps 2-4 composed): chains with alias
    # dedupe, coins intake with normalization + data-presence flags,
    # facts via full-outer metadata coalesce (J7/P10)
    from etl_pipelines_spark.functions.scalars import deterministic_id
    from etl_pipelines_spark.operators.dedupe import dedupe_keep_first
    from etl_pipelines_spark.sources.registry import load_table

    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    chains = dedupe_keep_first(
        nation.join(
            F.broadcast(region), nation.n_regionkey == region.r_regionkey
        ).select(
            F.col("n_nationkey").alias("chain_id"),
            F.lower("n_name").alias("chain"),  # P3 normalization
            F.lower("r_name").alias("chain_group"),
        ),
        ["chain"],
        [F.col("chain_id").asc()],  # A6 alias dedupe, keep-first
    )
    chains = land("chains", chains)

    part = load_table(spark, sf_dir, "part")
    li_keys = load_table(spark, sf_dir, "lineitem").select("l_partkey")
    coins = (
        part.select(
            F.col("p_partkey").alias("coin_id"),
            F.lower("p_name").alias("name"),
            F.lower("p_brand").alias("brand"),
            deterministic_id("p_partkey", "p_brand").alias("coingecko_id"),
        )
        # J6 semi-join presence flag, the has_market_data rebuild
        .join(li_keys.distinct(), F.col("coin_id") == F.col("l_partkey"), "left")
        .withColumn("has_market_data", F.col("l_partkey").isNotNull())
        .drop("l_partkey")
    )
    coins = land("coins", coins)

    # facts: source A (part attributes) ⟗ source B (lineitem-derived
    # observations) with COALESCE cascades — core_coin_facts_metadata
    src_a = part.select(
        F.col("p_partkey").alias("coin_id"),
        F.col("p_type").alias("category"),
        F.col("p_retailprice").cast("double").alias("list_price"),
    )
    src_b = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_partkey").alias("coin_id"))
        .agg(
            F.min(F.to_date("l_shipdate")).alias("first_seen"),
            F.countDistinct("l_suppkey").cast("long").alias("n_suppliers"),
        )
    )
    facts = (
        src_a.alias("a")
        .join(src_b.alias("b"), "coin_id", "full_outer")
        .select(
            "coin_id",
            F.coalesce(F.col("category"), F.lit("unknown")).alias("category"),
            F.coalesce(F.col("list_price"), F.lit(0.0)).alias("list_price"),
            "first_seen",
            F.coalesce(F.col("n_suppliers"), F.lit(0)).alias("n_suppliers"),
        )
    )
    land("coin_facts", facts)

    # 1. market data: densify + ffill (D1/D2) over daily prices
    def scope(df):
        if coin_limit is not None:
            df = df.filter(F.col("coin_id") < coin_limit)
        if since is not None:
            df = df.filter(F.col("date") >= F.lit(since).cast("date"))
        if until is not None:
            df = df.filter(F.col("date") <= F.lit(until).cast("date"))
        return df

    # shared by the dense rebuild AND the profits kernel: keys-sized
    # after the daily aggregation, so one cached copy serves both
    md = scope(daily_prices(spark, sf_dir)).persist()
    dense = forward_fill(
        with_days_imputed(
            densify_daily(md, ["coin_id"], "date"),
            ["coin_id"],
            presence_col="price",
            date_col="date",
        ),
        ["coin_id"],
        ["date"],
        ["price"],
    )
    land(
        "coin_market_data",
        dense.select("coin_id", "date", "price", "days_imputed"),
    )

    # 2. wallet transfers: daily net + running balance (W1/W2)
    x = scope(transfers(spark, sf_dir))
    balances = x.withColumn(
        "balance",
        F.sum("net_transfers")
        .over(cumulative_window(["coin_id", "wallet_address"], ["date"]))
        .cast("double"),
    )
    cwt = land("coin_wallet_transfers", balances)

    # 3. wallet profits: the flagship kernel (§3.2 in one job), fed
    # from the LANDED transfers table (the curated lineage: profits
    # derive from the transfers table users see, not a parallel
    # re-derivation of the raw scans) and the shared prices frame.
    # Scope applies to the INPUTS — cumulative metrics accumulate
    # within the refresh window, consistent with the landed balances.
    profits = wallet_profits_kernel_from(
        cwt.select(
            "coin_id", "wallet_address", "date", "net_transfers", "balance"
        ),
        md,
    )
    land("coin_wallet_profits", profits)
    md.unpersist()
    return report
