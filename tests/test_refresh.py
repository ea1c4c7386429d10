"""End-to-end warehouse refresh (§3.1): raw star schema -> three
curated partitioned tables -> expectation suites, one driver program."""

import os

import pytest

from etl_pipelines_spark.plans.refresh import (
    refresh_warehouse,
    refresh_warehouse_incremental,
)


@pytest.fixture(scope="module")
def refreshed(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("wh"))
    # scoped like the reference's dev_core sandbox: subset of coins,
    # final year only (full-span daily partitioning = thousands of tiny
    # directories on local FS; at scale the same layout is the point)
    report = refresh_warehouse(
        spark, "/root/testdata/sf0.001", out, coin_limit=40, since="1997-06-01"
    )
    return report, out


def test_refresh_warehouse_end_to_end(refreshed):
    report, _ = refreshed
    assert set(report.tables) == {
        "chains",
        "coins",
        "coin_facts",
        "coin_market_data",
        "coin_wallet_transfers",
        "coin_wallet_profits",
    }
    assert all(n > 0 for n in report.tables.values())
    # every post-write expectation green, and all six suites ran
    failed = [r.name for r in report.expectations if not r.passed]
    assert failed == []
    assert len(report.expectations) == 15
    assert report.passed


def test_refresh_tables_readable_with_pruning(spark, refreshed):
    _, out = refreshed
    md = spark.read.parquet(f"{out}/coin_market_data")
    one_day = md.filter(md["date"] == md.agg({"date": "max"}).first()[0])
    assert one_day.count() > 0


def test_whale_chart_spec_payload(spark):
    """The serving spec is a faithful, renderer-agnostic projection of
    the counts frame: one aligned series per bucket, dates ordered."""
    from etl_pipelines_spark.plans.whale_chart import whale_chart_spec

    counts = spark.createDataFrame(
        [("2024-01-02", 5, 3, 1), ("2024-01-01", 6, 2, 0)],
        "date string, small long, medium long, whale long",
    )
    spec = whale_chart_spec(counts)
    assert spec["type"] == "stacked_area"
    assert spec["x"]["values"] == ["2024-01-01", "2024-01-02"]
    by_name = {s["name"]: s["values"] for s in spec["series"]}
    assert by_name == {"small": [6, 5], "medium": [2, 3], "whale": [0, 1]}


# ------------------------------------------------------------------
# Incremental refresh lifecycle: N incremental runs == one full
# rebuild, digest-for-digest, under UNEVEN per-coin arrival — the
# reference's steady-state reality (per-chain pulls lag days apart,
# retrieve_dune_transfer_data.py:127-147).

SRC = "/root/testdata/sf0.001"
FACTS = ("coin_market_data", "coin_wallet_transfers", "coin_wallet_profits")
N_COINS = 40  # dev_core-style sandbox scope, consistent across runs


def _stage_source(spark, root: str, name: str, arrival) -> str:
    """A staged raw-source dir: `lineitem` filtered to the rows that
    have 'arrived', every other table symlinked whole. `arrival` is a
    Column predicate over lineitem."""
    from pyspark.sql import functions as F  # noqa: F401  (predicates built by caller)

    stage = os.path.join(root, name)
    os.makedirs(stage, exist_ok=True)
    for t in ("nation", "region", "part", "orders", "customer", "supplier"):
        dst = os.path.join(stage, f"{t}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(SRC, f"{t}.parquet"), dst)
    li = spark.read.parquet(os.path.join(SRC, "lineitem.parquet"))
    li.filter(arrival).write.mode("overwrite").parquet(
        os.path.join(stage, "lineitem.parquet")
    )
    return stage


def _fact_digests(spark, out_dir: str) -> dict:
    from etl_pipelines_spark.operators.tablediff import table_digest

    digests = {}
    for t in FACTS:
        df = spark.read.parquet(os.path.join(out_dir, t))
        cols = sorted(df.columns)
        r = table_digest(df.select(*cols), cols).first()
        digests[t] = (r["n_rows"], r["digest"])
    return digests


def test_incremental_refresh_equals_rebuild_uneven_arrival(spark, tmp_path):
    """Three increments with UNEVEN arrival vs full rebuilds of the
    same cumulative corpus. Group A (even coins) and group B (odd
    coins) arrive on different schedules, exercising both densify-
    horizon hazards:

    - stage 2: only A gets new rows, and A's new data ends BEFORE B's
      standing max — densifying the affected subset to its own max
      (instead of the true global max) would cut A's grids short.
    - stage 3: only A advances the GLOBAL horizon — B (unaffected)
      must extend its standing dense series by pure ffill, or the
      increment diverges from a rebuild and per-slice reconciliation
      can never see it.
    """
    from pyspark.sql import functions as F

    ship = F.to_date("l_shipdate")
    in_scope = F.col("l_partkey") < N_COINS
    grp_a = in_scope & (F.col("l_partkey") % 2 == 0)
    grp_b = in_scope & (F.col("l_partkey") % 2 == 1)
    out_of_scope = ~in_scope  # arrives whole; coin_limit excludes it

    # cumulative arrival fronts: A lags B at stage 1-2, overtakes at 3
    arrivals = [
        (grp_a & (ship <= F.lit("1997-12-31")))
        | (grp_b & (ship <= F.lit("1998-05-31")))
        | out_of_scope,
        (grp_a & (ship <= F.lit("1998-03-31")))
        | (grp_b & (ship <= F.lit("1998-05-31")))
        | out_of_scope,
        (grp_a & (ship <= F.lit("1998-08-02")))
        | (grp_b & (ship <= F.lit("1998-05-31")))
        | out_of_scope,
    ]

    inc_out = str(tmp_path / "wh_inc")
    state = str(tmp_path / "state")
    # `since` bounds the dense grid (and the date-partitioned write
    # fan-out) to the arrival window — same scope on every run
    since = "1997-06-01"
    for i, arrival in enumerate(arrivals, start=1):
        stage = _stage_source(spark, str(tmp_path), f"stage{i}", arrival)
        rep = refresh_warehouse_incremental(
            spark, stage, inc_out, state, coin_limit=N_COINS, since=since
        )
        assert rep.passed, f"stage {i} audits/reconcile failed"
        if i == 1:
            # first run == full write of everything arrived; the
            # interesting rebuild comparisons are the uneven stages
            continue
        # uneven arrival means only group A carries new rows
        assert rep.affected_coins <= N_COINS // 2, (
            f"stage {i} should touch only group A"
        )
        # non-vacuousness: stage 2 leaves B already at the horizon (no
        # extension), stage 3 advances the horizon past B's standing
        # max so the pure-ffill extension branch MUST fire
        if i == 3:
            assert "coin_market_data_horizon" in rep.reconcile
        else:
            assert "coin_market_data_horizon" not in rep.reconcile
        # the full rebuild of the SAME cumulative corpus
        full_out = str(tmp_path / f"wh_full{i}")
        refresh_warehouse(
            spark, stage, full_out, coin_limit=N_COINS, since=since
        )
        assert _fact_digests(spark, inc_out) == _fact_digests(
            spark, full_out
        ), f"increment {i} diverged from full rebuild"


def test_scoped_dims_track_out_of_scope_arrivals(spark, tmp_path):
    """Under a since/until scope the main guard only watches in-scope
    facts, but dims read the whole history: an arrival OUTSIDE the
    scope window for a coin with no in-scope changes must still
    refresh that coin's first_seen/n_suppliers (the dim change
    detector diffs unscoped per-coin row counts against saved state —
    a staleness this test pins would otherwise be silent)."""
    from pyspark.sql import functions as F

    ship = F.to_date("l_shipdate")
    since = "1997-06-01"
    in_scope = F.col("l_partkey") < N_COINS

    # pick a coin and withhold its EARLIEST (pre-scope) rows at stage 1
    li = spark.read.parquet(os.path.join(SRC, "lineitem.parquet"))
    coin = (
        li.filter(in_scope & (ship < F.lit(since)))
        .groupBy("l_partkey").count().orderBy(F.desc("count"))
        .first()["l_partkey"]
    )
    early = (F.col("l_partkey") == coin) & (ship < F.lit(since))

    inc_out = str(tmp_path / "wh")
    state = str(tmp_path / "state")
    s1 = _stage_source(spark, str(tmp_path), "s1", ~early)
    refresh_warehouse_incremental(
        spark, s1, inc_out, state, coin_limit=N_COINS, since=since
    )
    facts1 = {
        r["coin_id"]: (r["first_seen"], r["n_suppliers"])
        for r in spark.read.parquet(f"{inc_out}/coin_facts")
        .select("coin_id", "first_seen", "n_suppliers").collect()
    }

    # stage 2: the withheld pre-scope rows arrive — no in-scope change
    s2 = _stage_source(spark, str(tmp_path), "s2", F.lit(True))
    rep = refresh_warehouse_incremental(
        spark, s2, inc_out, state, coin_limit=N_COINS, since=since
    )
    assert rep.passed
    facts2 = {
        r["coin_id"]: (r["first_seen"], r["n_suppliers"])
        for r in spark.read.parquet(f"{inc_out}/coin_facts")
        .select("coin_id", "first_seen", "n_suppliers").collect()
    }
    # the touched coin's observations moved to the full-history truth
    truth = (
        li.filter(F.col("l_partkey") == coin)
        .agg(
            F.min(ship).alias("fs"),
            F.countDistinct("l_suppkey").alias("ns"),
        )
        .first()
    )
    assert facts2[coin] == (truth["fs"], truth["ns"])
    assert facts2[coin] != facts1[coin] or facts1[coin][0] == truth["fs"]
    # every other coin's observations are unchanged
    assert all(v == facts2[k] for k, v in facts1.items() if k != coin)


def test_incremental_refresh_noop_second_run(spark, tmp_path):
    """Re-running with nothing new must touch zero coins, leave the
    tables byte-identical, and still audit green (the at-least-once
    replay discipline: watermarks advanced, so the pull is empty)."""
    inc_out = str(tmp_path / "wh")
    state = str(tmp_path / "state")
    first = refresh_warehouse_incremental(
        spark, SRC, inc_out, state, coin_limit=20, since="1998-01-01"
    )
    assert first.passed and first.affected_coins > 0
    before = _fact_digests(spark, inc_out)
    again = refresh_warehouse_incremental(
        spark, SRC, inc_out, state, coin_limit=20, since="1998-01-01"
    )
    assert again.passed and again.affected_coins == 0
    assert _fact_digests(spark, inc_out) == before


def test_incremental_refresh_backdated_arrival_guard(spark, tmp_path):
    """A raw row arriving AT/BELOW a coin's saved high-water mark — an
    append-only-contract violation — must never merge silently: the
    delta recompute would fold it into cumulative columns past the
    mark while `after_hwm` drops the row's own date from the merge
    (an internally inconsistent slice no audit can see). The guard
    must detect the coin, warn loudly, record it on the report, and
    heal by whole-slice replace so the standing warehouse still equals
    a full rebuild digest-for-digest."""
    from pyspark.sql import functions as F

    since = "1997-06-01"
    li = spark.read.parquet(os.path.join(SRC, "lineitem.parquet")).filter(
        F.to_date("l_shipdate") >= F.lit(since)
    )
    # a coin in scope with >= 4 distinct in-window ship dates: withhold
    # one MID date (arrives late = backdated below the mark) and the
    # LAST date (the new arrival that makes the coin 'affected')
    x = (
        li.filter(F.col("l_partkey") < N_COINS)
        .groupBy("l_partkey")
        .agg(F.countDistinct("l_shipdate").alias("nd"))
        .filter("nd >= 4")
        .orderBy("l_partkey")
        .first()["l_partkey"]
    )
    ds = sorted(
        r["d"]
        for r in li.filter(F.col("l_partkey") == x)
        .select(F.to_date("l_shipdate").alias("d"))
        .distinct()
        .collect()
    )
    mid, last = ds[1], ds[-1]
    ship = F.to_date("l_shipdate")
    held_back = (F.col("l_partkey") == x) & ship.isin([mid, last])

    stage1 = _stage_source(spark, str(tmp_path), "s1", ~held_back)
    inc_out = str(tmp_path / "wh")
    state = str(tmp_path / "state")
    rep1 = refresh_warehouse_incremental(
        spark, stage1, inc_out, state, coin_limit=N_COINS, since=since
    )
    assert rep1.passed and rep1.backdated_coins == 0

    # stage 2: the full corpus — `mid` is now BACKDATED (coin x's saved
    # mark is ds[-2] > mid) and `last` is a legitimate new arrival
    stage2 = _stage_source(spark, str(tmp_path), "s2", F.lit(True))
    with pytest.warns(UserWarning, match="append-only"):
        rep2 = refresh_warehouse_incremental(
            spark, stage2, inc_out, state, coin_limit=N_COINS, since=since
        )
    assert rep2.backdated_coins >= 1
    assert rep2.passed, "healed run must still audit + reconcile green"

    full_out = str(tmp_path / "full")
    refresh_warehouse(spark, stage2, full_out, coin_limit=N_COINS, since=since)
    assert _fact_digests(spark, inc_out) == _fact_digests(spark, full_out), (
        "whole-slice fallback diverged from the full rebuild"
    )


def test_validate_incremental_load_clean_and_dirty(spark):
    from etl_pipelines_spark.plans.reconcile import validate_incremental_load

    expected = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "id long, s string, v double",
    )
    clean = validate_incremental_load(expected, expected, ["id"])
    assert clean == {
        "clean": True,
        "digest_match": True,
        "n_added": 0,
        "n_removed": 0,
        "n_changed": 0,
        "violations": [],
    }

    loaded = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 99.0), (4, "d", 40.0)],
        "id long, s string, v double",
    )
    dirty = validate_incremental_load(expected, loaded, ["id"])
    assert not dirty["clean"] and not dirty["digest_match"]
    assert (dirty["n_added"], dirty["n_removed"], dirty["n_changed"]) == (1, 1, 1)
    assert len(dirty["violations"]) == 3

    # the duplicate-row case key diffs cannot see: same key set, one
    # row landed twice — only the checksum catches it
    duped = expected.unionByName(expected.filter("id = 1"))
    dup_report = validate_incremental_load(
        expected.select("id", "s", "v"),
        duped.select("id", "s", "v"),
        ["id"],
    )
    assert not dup_report["digest_match"]


# ------------------------------------------------------------------
# Declarative expectations (expectations.yml -> quality.py), the
# schema.yml authoring surface.


def test_expectations_config_matches_handwritten_suite():
    """The shipped config must declare exactly the rule set the
    hand-written round-3 suites ran (declared-vs-code parity)."""
    from etl_pipelines_spark.expectations import load_expectations

    cfg = load_expectations()
    assert set(cfg) == {
        "chains",
        "coins",
        "coin_facts",
        "coin_market_data",
        "coin_wallet_transfers",
        "coin_wallet_profits",
    }
    profits = cfg["coin_wallet_profits"]["checks"]
    assert {list(c)[0] for c in profits} == {"unique", "monotone"}
    facts = cfg["coin_facts"]["checks"]
    assert any(
        list(c)[0] == "referential" and c["referential"]["to"] == "coins"
        for c in facts
    )


def test_declared_rules_catch_violations(spark):
    """A frame violating a declared rule must be flagged through the
    declarative path — and the suite reports every failure at once."""
    from etl_pipelines_spark.expectations import run_expectations

    cfg = {
        "tbl": {
            "columns": {"name": ["not_null", "lowercase"]},
            "checks": [
                {"unique": {"keys": ["id"]}},
                {"referential": {"keys": ["id"], "to": "parent"}},
            ],
        }
    }
    df = spark.createDataFrame(
        [(1, "Ok"), (1, None), (3, "fine")], "id long, name string"
    )
    parent = spark.createDataFrame([(1,)], "id long")
    results = {r.name: r for r in run_expectations(df, "tbl", cfg, {"parent": parent})}
    assert not results["not_null(name)"].passed
    assert not results["lowercase(name)"].passed  # 'Ok'
    assert not results["unique(id)"].passed  # two id=1 rows
    assert not results["referential(id)"].passed  # id=3 orphan


def test_unknown_rule_fails_load(tmp_path):
    from etl_pipelines_spark.expectations import load_expectations

    bad = tmp_path / "exp.yml"
    bad.write_text(
        "tables:\n  t:\n    columns:\n      c: [not_nulll]\n"
    )
    with pytest.raises(ValueError, match="not_nulll"):
        load_expectations(str(bad))
    bad.write_text("tables:\n  t:\n    checks:\n      - no_such: {}\n")
    with pytest.raises(ValueError, match="no_such"):
        load_expectations(str(bad))


def test_referential_requires_declared_parent(spark):
    from etl_pipelines_spark.expectations import run_expectations

    cfg = {"t": {"checks": [{"referential": {"keys": ["id"], "to": "ghost"}}]}}
    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError, match="ghost"):
        run_expectations(df, "t", cfg, {})


def test_alternate_ruleset_drives_refresh(spark, tmp_path):
    """expectations_path swaps the ruleset: a deliberately impossible
    rule (chain values must be UPPERCASE-free ... they are lowercase,
    so flip it: require uniqueness on a non-unique column) must turn
    the report red without code changes."""
    import yaml

    from etl_pipelines_spark.plans.refresh import refresh_warehouse

    rules = {
        "tables": {
            "chains": {"checks": [{"unique": {"keys": ["chain_group"]}}]},
        }
    }
    p = tmp_path / "exp.yml"
    p.write_text(yaml.safe_dump(rules))
    report = refresh_warehouse(
        spark,
        "/root/testdata/sf0.001",
        str(tmp_path / "wh"),
        coin_limit=5,
        since="1998-06-01",
        expectations_path=str(p),
    )
    # several chains share a chain_group -> declared rule fails
    assert not report.passed
    assert [r.name for r in report.expectations if not r.passed] == [
        "unique(chain_group)"
    ]
