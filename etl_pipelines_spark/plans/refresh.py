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
    # incremental runs only: per-table write-path reconciliation
    # (plans/reconcile.validate_incremental_load report dicts) and the
    # coin count the increment actually touched
    reconcile: dict[str, dict] = field(default_factory=dict)
    affected_coins: int | None = None
    # affected coins caught violating the append-only arrival contract
    # (raw rows at/below their saved high-water mark that the standing
    # table never saw); healed by whole-slice replace, recorded loudly
    backdated_coins: int = 0

    @property
    def passed(self) -> bool:
        return all(r.passed for r in self.expectations) and all(
            r["clean"] for r in self.reconcile.values()
        )


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

    # 0. dimensions (§3.1 steps 2-4 composed)
    for name, df in _dim_frames(spark, sf_dir):
        land(name, df)

    # 1. market data: densify + ffill (D1/D2) over daily prices
    scope = _scope_fn(coin_limit, since, until)

    # shared by the dense rebuild AND the profits kernel: keys-sized
    # after the daily aggregation, so one cached copy serves both
    md = scope(daily_prices(spark, sf_dir)).persist()
    land("coin_market_data", _dense_market(md))

    # 2. wallet transfers: daily net + running balance (W1/W2)
    x = scope(transfers(spark, sf_dir))
    cwt = land("coin_wallet_transfers", _with_balance(x))

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


# ------------------------------------------------ shared stage builders


def _scope_fn(coin_limit, since, until):
    def scope(df: DataFrame) -> DataFrame:
        if coin_limit is not None:
            df = df.filter(F.col("coin_id") < coin_limit)
        if since is not None:
            df = df.filter(F.col("date") >= F.lit(since).cast("date"))
        if until is not None:
            df = df.filter(F.col("date") <= F.lit(until).cast("date"))
        return df

    return scope


def _dim_frames(spark: SparkSession, sf_dir: str):
    """The three dimension tables, in build order: chains with alias
    dedupe, coins intake with normalization + data-presence flags,
    facts via full-outer metadata coalesce (J7/P10). Key-grain
    dimension rebuilds — cheap at any scale, so both the full and the
    incremental refresh rebuild them whole (the reference's daily dim
    rebuild discipline)."""
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
    return [("chains", chains), ("coins", coins), ("coin_facts", facts)]


def _dense_market(md: DataFrame, end_date=None) -> DataFrame:
    """coin_market_data from a daily-prices frame: densify + ffill
    (D1/D2) with the days_imputed provenance column. `end_date`
    overrides the scaffold horizon — the incremental driver MUST pass
    the true global max date here, because its `md` frame is the
    affected-coin subset whose own max may trail the corpus max (an
    affected coin densified only to the subset max would diverge from
    a full rebuild under uneven per-coin arrival)."""
    from etl_pipelines_spark.operators.densify import densify_daily, with_days_imputed
    from etl_pipelines_spark.operators.windows import forward_fill

    dense = forward_fill(
        with_days_imputed(
            densify_daily(md, ["coin_id"], "date", end_date=end_date),
            ["coin_id"],
            presence_col="price",
            date_col="date",
        ),
        ["coin_id"],
        ["date"],
        ["price"],
    )
    return dense.select("coin_id", "date", "price", "days_imputed")


def _horizon_tails(
    standing: DataFrame, affected: DataFrame, horizon
) -> DataFrame:
    """Last standing row per UNAFFECTED coin whose dense series stops
    short of the new global `horizon` — the coins a full rebuild would
    extend (ffill to global max) but the affected-slice recompute never
    touches. Struct-max pulls the whole last row in one agg (no
    max_by-per-column null hazards)."""
    return (
        standing.join(F.broadcast(affected), "coin_id", "left_anti")
        .groupBy("coin_id")
        .agg(F.max(F.struct("date", "price", "days_imputed")).alias("_last"))
        .select(
            "coin_id",
            F.col("_last.date").alias("_maxd"),
            F.col("_last.price").alias("_price"),
            F.col("_last.days_imputed").alias("_days"),
        )
        .filter(F.col("_maxd") < F.lit(horizon))
    )


def _horizon_extension(tails: DataFrame, horizon) -> DataFrame:
    """Pure-ffill extension rows (standing_max, horizon] for the
    `_horizon_tails` coins: price carries forward, days_imputed
    continues the standing imputation streak (a real last row starts a
    fresh 1,2,... streak — exactly what the full rebuild's
    gaps-and-islands counter produces). O(trailing coins × horizon
    advance), no history recompute."""
    return (
        tails.withColumn(
            "date",
            F.explode(
                F.sequence(F.date_add("_maxd", 1), F.lit(horizon).cast("date"))
            ),
        )
        .select(
            "coin_id",
            "date",
            F.col("_price").alias("price"),
            (F.coalesce("_days", F.lit(0)) + F.datediff("date", "_maxd"))
            .cast("long")
            .alias("days_imputed"),
        )
    )


def _with_balance(x: DataFrame) -> DataFrame:
    """coin_wallet_transfers from a daily-net frame: the W1/W2 running
    balance."""
    return x.withColumn(
        "balance",
        F.sum("net_transfers")
        .over(cumulative_window(["coin_id", "wallet_address"], ["date"]))
        .cast("double"),
    )


def _backdated_coins(
    raw: DataFrame, standing: DataFrame, hwm: DataFrame, scope_coins: DataFrame
) -> DataFrame:
    """Coins whose RAW stream holds daily keys at/below their saved
    high-water mark that the STANDING table never landed — an
    append-only-contract violation (a backdated arrival). The delta
    merge's soundness argument (history at/below the mark is
    bit-identical to the recompute) collapses for such a coin: the
    full-history recompute folds the backdated row into every
    cumulative column past the mark, but `after_hwm` would silently
    drop the row's own date from the merge — an internally
    inconsistent table that neither audits nor the landed-delta
    reconcile can see.

    Detection is a per-coin COUNT compare (map-side combinable, tiny
    coin-grain shuffle — no row-level anti-join of two fact tables):
    under the contract, standing real rows at/below the mark == raw
    rows at/below the mark, exactly. Scoped to `scope_coins` (the
    affected set) so cost tracks churn; a backdated-ONLY coin (no new
    rows at all) is caught on whichever later run touches it. Blind
    spot, by design: a backdated arrival that lands on an EXISTING
    daily key mutates a value without changing counts — that is a
    mutation, not an append, and sits outside the contract this guard
    polices (value-level detection would cost a full table diff per
    increment; tablediff covers it offline)."""
    def below(df: DataFrame) -> DataFrame:
        return (
            df.select("coin_id", "date")
            .join(F.broadcast(scope_coins), "coin_id")
            .join(F.broadcast(hwm), "coin_id")
            .filter(F.col("date") <= F.col("hwm"))
            .groupBy("coin_id")
            .agg(F.count(F.lit(1)).alias("_n"))
        )

    return (
        below(raw).withColumnRenamed("_n", "_raw_n")
        .join(below(standing).withColumnRenamed("_n", "_st_n"), "coin_id", "full_outer")
        .filter(F.coalesce("_raw_n", F.lit(0)) != F.coalesce("_st_n", F.lit(0)))
        .select("coin_id")
    )


# ------------------------------------------- incremental refresh driver


def refresh_warehouse_incremental(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    state_dir: str,
    coin_limit: int | None = None,
    since: str | None = None,
    until: str | None = None,
    expectations_path: str | None = None,
) -> RefreshReport:
    """The reference's STEADY-STATE mode as one driver: pull -> merge
    -> audit -> reconcile, per table in build order. Re-running
    `workflows/core_tables_all.yaml` lands only new data — high-water-
    mark pulls (retrieve_dune_transfer_data.py:127-147), date-array
    diffs (coingecko_market_data.py:138-158) — and this composes the
    engine's pieces the same way:

    1. PULL   — `incremental_pull` filters each raw daily stream to
       rows strictly newer than the per-coin high-water marks saved by
       the previous run (everything, on the first run).
    2. MERGE  — affected coins (any coin carrying new price or
       transfer days) have their curated slices RECOMPUTED over their
       full history (the cumulative-column requirement: running
       balance and the profits cumsums at NEW dates need the whole
       past), but only the DELTA rows — date strictly past the coin's
       saved high-water mark — are merged, through `upsert_partitions`
       (dynamic partition overwrite: only touched date partitions
       rewrite, O(churn), never O(table)). The delta restriction is
       sound because `incremental_pull` admits only rows NEWER than
       each coin's mark: cumulative columns at or before the mark
       depend only on data at or before the mark, so standing history
       is bit-identical to the recompute and rewriting it would be
       pure waste (profits uses the LEAST of a coin's price/transfer
       marks — a new price at an old transfer day creates a profits
       row between the two marks). coin_market_data additionally
       honors the DENSIFY HORIZON: affected coins fill to the true
       global max date (from the full raw stream, not the affected
       subset), and unaffected coins whose standing series trail an
       advanced horizon get pure ffill extension rows — without
       either, uneven per-coin arrival (the reference's normal case:
       per-chain pulls lag days apart) silently diverges from a full
       rebuild.
    3. AUDIT  — the same declarative expectations.yml suites as the
       full rebuild, on the post-merge tables.
    4. RECONCILE — `validate_incremental_load` proves each table's
       landed affected-slice equals the recomputed slice (key diff +
       order-independent table digest), so a write-path bug fails the
       run instead of corrupting the warehouse silently.

    Watermark state advances ONLY after the table it covers has been
    written and reconciled — a failed run replays its pull
    (at-least-once; the coin-grain merge makes the replay idempotent).
    N incremental runs == one full rebuild, digest-for-digest — under
    UNEVEN per-coin arrival, including a horizon advance carried only
    by a coin subset — is pinned in test_refresh.py
    (test_incremental_refresh_equals_rebuild_uneven_arrival).

    Dimensions (chains/coins/coin_facts) rebuild whole each run —
    key-grain tables, the reference's daily dim rebuild discipline.
    """
    from etl_pipelines_spark.operators.merge import upsert_partitions
    from etl_pipelines_spark.plans.reconcile import validate_incremental_load
    from etl_pipelines_spark.queries.timeseries import (
        daily_prices,
        transfers,
        wallet_profits_kernel_from,
    )
    from etl_pipelines_spark.streaming.incremental import (
        high_water_marks,
        incremental_pull,
        load_watermark_state,
        save_watermark_state,
    )

    report = RefreshReport()
    rules = load_expectations(expectations_path)
    built: dict[str, DataFrame] = {}
    scope = _scope_fn(coin_limit, since, until)

    def audit(name: str, back: DataFrame) -> None:
        report.tables[name] = back.count()
        built[name] = back
        report.expectations.extend(run_expectations(back, name, rules, built))

    # dims: full rebuild (see docstring)
    for name, df in _dim_frames(spark, sf_dir):
        path = os.path.join(out_dir, name)
        write_partitioned(df, path)
        audit(name, spark.read.parquet(path))

    # ---- PULL: per-coin high-water-mark filters on both raw streams
    md_all = scope(daily_prices(spark, sf_dir))
    x_all = scope(transfers(spark, sf_dir))
    md_state = os.path.join(state_dir, "hwm_prices")
    x_state = os.path.join(state_dir, "hwm_transfers")
    md_delta = incremental_pull(md_all, spark, md_state, ["coin_id"], "date")
    x_delta = incremental_pull(x_all, spark, x_state, ["coin_id"], "date")

    # affected = any coin with a new price day OR a new transfer day;
    # profits depend on both inputs so the union drives all three facts
    affected = (
        md_delta.select("coin_id")
        .unionByName(x_delta.select("coin_id"))
        .distinct()
        # coin-count-sized: pin it so the three slice recomputes and
        # the reconcile probes don't re-run both delta pulls each
        .localCheckpoint(eager=True)
    )
    n_affected = affected.count()
    report.affected_coins = n_affected

    def touch(df: DataFrame) -> DataFrame:
        return df.join(F.broadcast(affected), "coin_id")

    # per-coin delta cutoffs = the PREVIOUS run's saved marks (None on
    # the first run, where the delta is the corpus). Broadcast-joined:
    # the delta restriction never shuffles the slice.
    md_hwm = load_watermark_state(spark, md_state)
    x_hwm = load_watermark_state(spark, x_state)

    # ---- APPEND-ONLY CONTRACT GUARD: an affected coin with raw rows
    # at/below its saved mark that the standing table never landed
    # (backdated arrival) invalidates the delta-merge soundness
    # argument for that coin. Heal by WHOLE-SLICE REPLACE: strip the
    # coin's marks so after_hwm passes its full recomputed slice (the
    # pre-delta merge semantics) — never merge silently.
    bad_frames = []
    cmd_path = os.path.join(out_dir, "coin_market_data")
    cwt_path = os.path.join(out_dir, "coin_wallet_transfers")
    if md_hwm is not None and os.path.exists(cmd_path) and n_affected:
        # standing REAL rows only: densify imputes every calendar day,
        # so the raw-count twin is the days_imputed-null subset
        bad_frames.append(
            _backdated_coins(
                md_all,
                spark.read.parquet(cmd_path).filter(
                    F.col("days_imputed").isNull()
                ),
                md_hwm,
                affected,
            )
        )
    if x_hwm is not None and os.path.exists(cwt_path) and n_affected:
        bad_frames.append(
            _backdated_coins(
                x_all, spark.read.parquet(cwt_path), x_hwm, affected
            )
        )
    if bad_frames:
        bad = bad_frames[0]
        for fr in bad_frames[1:]:
            bad = bad.unionByName(fr)
        bad = bad.distinct().localCheckpoint(eager=True)
        report.backdated_coins = bad.count()
        if report.backdated_coins:
            import warnings

            warnings.warn(
                f"incremental refresh: {report.backdated_coins} coin(s) "
                "violated the append-only arrival contract (raw rows "
                "at/below their saved high-water mark absent from the "
                "standing table); falling back to whole-slice replace "
                "for those coins",
                stacklevel=2,
            )
            md_hwm = md_hwm.join(F.broadcast(bad), "coin_id", "left_anti") if md_hwm is not None else None
            x_hwm = x_hwm.join(F.broadcast(bad), "coin_id", "left_anti") if x_hwm is not None else None

    def after_hwm(df: DataFrame, hwm: DataFrame | None) -> DataFrame:
        """Rows strictly past their coin's saved mark — the merge
        delta. Coins without a mark (first seen this run) pass whole."""
        if hwm is None:
            return df
        j = df.join(F.broadcast(hwm), "coin_id", "left")
        return j.filter(
            F.col("hwm").isNull() | (F.col("date") > F.col("hwm"))
        ).drop("hwm")

    def merge_and_check(
        name: str, delta_df: DataFrame, keys: list[str], probe: DataFrame
    ) -> DataFrame:
        """Merge the delta rows (dynamic partition overwrite: only the
        touched date partitions rewrite), audit the post-merge table,
        and reconcile the landed delta against the recomputation.

        On the MERGE path the delta is localCheckpointed first: the
        merge reads it three times (touched partitions, replace keys,
        the union) and the reconcile twice more (key diff, digest) —
        five evaluations of a windowed-recompute plan was the dominant
        cost of the whole increment before this (76 s -> seconds for
        the market-data delta at sf0.1). Churn-sized, so executor
        storage holds it. On the FIRST run the "delta" is the whole
        corpus — checkpointing tens of millions of rows OOMs the heap
        for zero benefit (a straight write evaluates the plan once),
        so it writes directly and only the reconcile re-reads the
        landed files."""
        path = os.path.join(out_dir, name)
        if os.path.exists(path):
            delta_df = delta_df.localCheckpoint(eager=True)
            upsert_partitions(spark, path, delta_df, keys)
        else:  # first run: the delta IS the corpus — write, don't cache
            write_partitioned(delta_df, path)
        back = spark.read.parquet(path)
        audit(name, back)
        report.reconcile[name] = validate_incremental_load(
            delta_df, probe(back), keys
        )
        return back

    if n_affected == 0:
        # nothing new anywhere: audit the standing tables and return
        for name in ("coin_market_data", "coin_wallet_transfers", "coin_wallet_profits"):
            path = os.path.join(out_dir, name)
            if os.path.exists(path):
                audit(name, spark.read.parquet(path))
        return report

    # ---- MERGE + AUDIT + RECONCILE, per table in build order.
    # Slices recompute over the affected coins' FULL history (the
    # cumulative-column requirement); md_aff is shared by the dense
    # rebuild and the profits kernel exactly like the full refresh.
    md_aff = touch(md_all).persist()

    # coin_market_data is the one densified table, so it alone has a
    # HORIZON obligation beyond the affected slice: every coin fills to
    # the global max date. Two uneven-arrival hazards a coin-sliced
    # merge misses: (a) md_aff's own max can trail the corpus max —
    # densify to the TRUE horizon from md_all, never the subset max;
    # (b) when the horizon advances, unaffected coins' standing series
    # must extend (ffill) without recomputing their history. Both are
    # pinned digest-for-digest against a full rebuild in
    # test_refresh.py (uneven-arrival lifecycle).
    horizon = md_all.agg(F.max("date").alias("_h")).first()["_h"]
    dense_aff = _dense_market(md_aff, end_date=horizon)
    dense_delta = after_hwm(dense_aff, md_hwm)
    cmd_path = os.path.join(out_dir, "coin_market_data")
    if md_hwm is not None and os.path.exists(cmd_path):
        # materialized once for the same reason merge_and_check
        # checkpoints its delta (merge + reconcile read it five
        # times); churn-sized only on the merge path — a first run's
        # corpus-sized "delta" writes straight to parquet instead
        dense_delta = dense_delta.localCheckpoint(eager=True)
    tails = None
    if os.path.exists(cmd_path):
        # checkpoint BEFORE the rewrite: the extension plan must not
        # lazily re-read files the merge is about to replace
        tails = _horizon_tails(
            spark.read.parquet(cmd_path), affected, horizon
        ).localCheckpoint(eager=True)
        ext = (
            _horizon_extension(tails, horizon) if tails.count() else None
        )
        update = (
            dense_delta.unionByName(ext) if ext is not None else dense_delta
        )
        # (coin_id, date) keys: replace-per-day. The delta covers every
        # row that can differ from standing (real new days, recomputed
        # imputed days past the mark, horizon fills), and the standing
        # imputed rows it replaces sit at the same (coin, date) keys.
        upsert_partitions(spark, cmd_path, update, ["coin_id", "date"])
    else:
        ext = None
        # first run: no marks, so the checkpointed delta IS the corpus
        write_partitioned(dense_delta, cmd_path)
    cmd_back = spark.read.parquet(cmd_path)
    audit("coin_market_data", cmd_back)
    # dense_delta == dense_aff on the first run (no marks yet), so one
    # expression serves both paths; the probe mirrors the same cutoff
    report.reconcile["coin_market_data"] = validate_incremental_load(
        dense_delta,
        after_hwm(touch(cmd_back), md_hwm),
        ["coin_id", "date"],
    )
    if ext is not None:
        ext_loaded = (
            cmd_back.join(
                F.broadcast(tails.select("coin_id", "_maxd")), "coin_id"
            )
            .filter(F.col("date") > F.col("_maxd"))
            .drop("_maxd")
        )
        report.reconcile["coin_market_data_horizon"] = (
            validate_incremental_load(ext, ext_loaded, ["coin_id", "date"])
        )
    cwt_back = merge_and_check(
        "coin_wallet_transfers",
        after_hwm(_with_balance(touch(x_all)), x_hwm),
        ["coin_id", "wallet_address", "date"],
        probe=lambda back: after_hwm(touch(back), x_hwm),
    )
    # profits can gain/change rows anywhere past the LEAST of the two
    # marks: a new price at an old transfer day mints a profits row
    # between them, and every later row's cumsums shift with it
    p_hwm = None
    if md_hwm is not None and x_hwm is not None:
        p_hwm = (
            md_hwm.withColumnRenamed("hwm", "_mh")
            .join(x_hwm.withColumnRenamed("hwm", "_xh"), "coin_id", "full_outer")
            .select(
                "coin_id",
                F.least(
                    F.coalesce("_mh", F.lit("0001-01-01").cast("date")),
                    F.coalesce("_xh", F.lit("0001-01-01").cast("date")),
                ).alias("hwm"),
            )
        )
    profits = wallet_profits_kernel_from(
        touch(cwt_back).select(
            "coin_id", "wallet_address", "date", "net_transfers", "balance"
        ),
        md_aff,
    )
    merge_and_check(
        "coin_wallet_profits",
        after_hwm(profits, p_hwm),
        ["coin_id", "wallet_address", "date"],
        probe=lambda back: after_hwm(touch(back), p_hwm),
    )
    md_aff.unpersist()

    # ---- advance watermarks LAST (state reflects only landed work)
    save_watermark_state(
        high_water_marks(md_all, ["coin_id"], "date"), md_state
    )
    save_watermark_state(
        high_water_marks(x_all, ["coin_id"], "date"), x_state
    )
    return report
