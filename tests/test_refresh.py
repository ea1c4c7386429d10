"""End-to-end warehouse refresh (§3.1): raw star schema -> three
curated partitioned tables -> expectation suites, one driver program."""

import pytest

from etl_pipelines_spark.plans.refresh import refresh_warehouse


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
