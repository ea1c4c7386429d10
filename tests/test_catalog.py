"""Catalog registry invariants — the structural contract between the
internal registry, the driver-facing consolidation, and the gate."""

import duckdb

from etl_pipelines_spark.queries import DRIVER_QUERIES, QUERIES
from etl_pipelines_spark.queries.combos import _COMBOS, _STANDALONE
from etl_pipelines_spark.sources.registry import TABLES

SF = "/root/testdata/sf0.001"


class TestCatalogInvariants:
    def test_driver_catalog_fits_gate_cap(self):
        """EXACTLY 50: the driver's correctness gate records the first
        50 registry entries, so a 51st would be silently dropped — and
        the catalog deliberately stays packed to the cap, so a count
        below 50 means an entry fell out unnoticed. New operators ride
        an existing combo (the q106 pattern; see CATALOG.md 'Packing
        discipline')."""
        assert len(DRIVER_QUERIES) == 50

    def test_bench_short_keys_unique(self):
        shorts = [n.split("_")[0] for n in DRIVER_QUERIES]
        assert len(set(shorts)) == len(shorts)

    def test_every_internal_query_reaches_the_driver(self):
        """Each internal query must be driver-visible: standalone, or a
        member of some combo (whose oracle embeds the member's oracle
        verbatim) — nothing silently drops out of the correctness
        gate."""
        covered = set(_STANDALONE)
        for name, spec in QUERIES.items():
            if name in covered:
                continue
            assert any(
                spec.oracle.strip() in c.oracle for c in _COMBOS
            ), f"{name} is neither standalone nor embedded in any combo oracle"

    def test_combo_member_counts_stay_hash_sensitive(self):
        """A combo's gate hash covers the UNION of its members — every
        member added dilutes how much of the hash any one member
        controls. Cap membership at 8 so a future member can't
        silently turn a combo into a low-sensitivity catch-all; past
        the cap, split the combo or promote members to standalone."""
        from etl_pipelines_spark.queries.combos import COMBO_MEMBERS

        for name, members in COMBO_MEMBERS.items():
            assert 1 <= len(members) <= 8, (
                f"{name} carries {len(members)} members — split it"
            )

    def test_all_driver_entries_have_descriptions_and_oracles(self):
        for name, spec in DRIVER_QUERIES.items():
            assert spec.oracle, name
            assert spec.description, name

    def test_every_driver_oracle_is_valid_duckdb_sql(self):
        """EXPLAIN every driver-facing oracle against the real testdata
        views — a syntax error or bad column reference in any combo's
        UNION ALL fails here instead of inside the external gate."""
        con = duckdb.connect()
        for tbl in TABLES:
            con.execute(
                f"CREATE VIEW {tbl} AS SELECT * FROM '{SF}/{tbl}.parquet'"
            )
        for name, spec in DRIVER_QUERIES.items():
            try:
                con.execute(f"EXPLAIN {spec.oracle}")
            except Exception as e:  # noqa: BLE001
                raise AssertionError(f"oracle for {name} is invalid: {e}") from e


def test_q64_distributed_finish_matches_driver_finish(spark):
    """Force the explode-over-patterns fallback (driver_pattern_max=1)
    and pin it row-identical to the driver-loop finish — the dispatch
    threshold must never change the answer, only where the result-sized
    finish runs."""
    from etl_pipelines_spark.queries.llmops import _q64_matrix

    def rows(df):
        return sorted(
            (
                r["source_a"], r["source_b"], r["n_a"], r["n_b"],
                r["n_intersect"], r["jaccard"],
            )
            for r in df.collect()
        )

    driver = rows(_q64_matrix(spark, SF))
    distributed = rows(_q64_matrix(spark, SF, driver_pattern_max=1))
    assert driver and driver == distributed


def test_coverage_doc_references_resolve():
    """Every qNN cited in COVERAGE.md exists in the internal registry,
    and every registry entry is cited somewhere in COVERAGE.md or
    CATALOG.md — the docs the parity judge reads cannot drift from the
    code."""
    import re
    from pathlib import Path

    from etl_pipelines_spark.queries import QUERIES

    known = {name.split("_")[0] for name in QUERIES}
    root = Path(__file__).resolve().parent.parent
    coverage = (root / "COVERAGE.md").read_text()
    catalog = (root / "CATALOG.md").read_text()
    cited = set(re.findall(r"\bq\d{2,3}\b", coverage))
    unknown = {c for c in cited if c not in known}
    assert not unknown, f"COVERAGE.md cites nonexistent queries: {sorted(unknown)}"
    # full entry names (q73_pivot_unpivot) document their query too
    documented = set(re.findall(r"\bq\d{2,3}(?=\b|_)", coverage + catalog))
    undocumented = {k for k in known if k not in documented}
    assert not undocumented, f"registry queries absent from docs: {sorted(undocumented)}"
