"""Evidence-layer integrity: every benchmark/correctness/oracle
artifact tracked at HEAD must be non-empty, parseable JSON with the
keys its consumers (SCALE.md, the judge) rely on.

Round-7 post-mortem: an end-of-round snapshot commit truncated
BENCH_sf1.json to zero bytes, and a CHANGELOG entry cited a
BENCH_codebook.json that was never committed. Both failure modes —
wiped-tracked-artifact and claimed-but-absent-artifact — die here.
"""

import json
import os
import re
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _tracked(prefix: str) -> list[str]:
    out = subprocess.run(
        ["git", "ls-files", f"{prefix}*.json"],
        cwd=REPO, capture_output=True, text=True, check=True,
    ).stdout.split()
    return sorted(out)


def _load(path: str) -> dict:
    full = os.path.join(REPO, path)
    assert os.path.getsize(full) > 2, f"{path} is empty/truncated at HEAD"
    with open(full) as fh:
        return json.load(fh)


class TestArtifactIntegrity:
    def test_bench_artifacts_parse_with_expected_keys(self):
        names = _tracked("BENCH_")
        assert names, "no BENCH_*.json tracked"
        for name in names:
            doc = _load(name)
            assert isinstance(doc, dict), name
            if name == "BENCH_codebook.json":
                # list-of-measurements artifact (ANN scale points)
                assert doc.get("points"), f"{name}: no measurement points"
                continue
            if name == "BENCH_refresh_scale.json":
                # probe rows: one-day increment vs rebuild at sf5/sf10
                assert doc.get("rows"), f"{name}: no probe rows"
                assert any(
                    (r.get("vs_rebuild") or 0) >= 3 for r in doc["rows"]
                ), f"{name}: no row clears the 3x sparse-churn bar"
                continue
            if re.match(r"BENCH_r\d+(_c\d+)?\.json$", name):
                # driver-side capture (incl. the low-core scaling run,
                # e.g. BENCH_r11_c8); shape is the driver's, not ours —
                # non-empty parseable JSON is the whole contract
                continue
            # repo-recorded bench runs share bench.py's full-record shape
            assert doc.get("metric") == "catalog_total_wall_clock", name
            assert isinstance(doc.get("value"), (int, float)) and doc["value"] > 0, name
            assert isinstance(doc.get("queries"), dict) and doc["queries"], name

    def test_ratio_artifacts_parse(self):
        """Interleaved spark-vs-oracle ratio records (tools/bench_ratio.py):
        both totals present, per-entry rows carry both sides. A filtered
        run must self-describe as a subset (distinct metric name +
        entry_filter) — a 7-entry record must not read as a catalog
        ratio (round-8 advice)."""
        names = _tracked("RATIO_")
        assert names, "no RATIO_*.json tracked"
        for name in names:
            doc = _load(name)
            assert doc.get("metric") in (
                "catalog_vs_oracle_interleaved",
                "subset_vs_oracle_interleaved",
            ), name
            assert doc.get("spark_total_sec") and doc.get("oracle_total_sec"), name
            rows = doc.get("entries") or {}
            assert rows, f"{name}: no per-entry rows"
            for k, r in rows.items():
                assert r.get("spark_sec") is not None, (name, k)
                assert r.get("oracle_sec") is not None, (name, k)
            if doc["metric"] == "subset_vs_oracle_interleaved":
                assert doc.get("entry_filter"), f"{name}: subset without filter"
            if "n_catalog_entries" in doc and doc["metric"].startswith("catalog"):
                assert doc["n_entries"] == doc["n_catalog_entries"], (
                    f"{name}: claims catalog metric but covers a subset"
                )

    def test_correctness_artifacts_parse_green_shape(self):
        names = _tracked("CORRECTNESS_")
        assert names, "no CORRECTNESS_*.json tracked"
        for name in names:
            doc = _load(name)
            assert isinstance(doc, dict) and doc, name
            rows = [v for v in doc.values() if isinstance(v, dict)]
            # per-entry rows (string-valued top-level keys are run
            # metadata, e.g. "corpus")
            assert rows, f"{name}: no per-entry result rows"

    def test_oracle_artifacts_parse(self):
        for name in _tracked("ORACLE_"):
            doc = _load(name)
            assert isinstance(doc, dict) and doc, name

    def test_catalog_artifacts_not_stale_vs_plan_code(self):
        """Every re-recordable CATALOG-level artifact (scaled bench /
        oracle / correctness / ratio records) must have been committed
        no earlier than the last commit touching plan-shaping code —
        the round-8 verdict found BENCH_sf1skew.json recorded before
        plan-touching commits landed, and nothing detected it. Exempt:
        probe artifacts for single operators (BENCH_codebook: ANN
        scale points; BENCH_refresh_scale: increment-vs-rebuild
        probes — pinned by their own operator tests), the driver's
        historical per-round snapshots (BENCH_r* — immutable history),
        and ORACLE_* (round-8 cross-session oracle timings, kept for
        provenance but SUPERSEDED as oracle evidence by the
        interleaved RATIO_* records, whose per-entry oracle minima are
        same-session). CORRECTNESS_* artifacts are correctness gates,
        not perf evidence — their freshness is managed by the per-
        round driver gate + check_parity re-emission, not this
        timestamp ratchet (a q33-scale oracle pass makes re-emission
        a ~45-minute operation; the sf0.01 driver gate re-runs every
        round regardless)."""
        # plan-SHAPING modules only: the library code whose changes
        # can alter what a catalog query executes. bench.py is
        # deliberately NOT here (round-9 lesson: a bench-serialization
        # fix invalidated three freshly-recorded interleaved RATIO
        # records and turned the suite red at HEAD) — bench.py is
        # recording machinery; it calls the same DRIVER_QUERIES
        # objects these paths define, so a bench-only change cannot
        # move a query's plan. Changes to the measurement PROTOCOL
        # live in tools/bench_ratio.py and are likewise out of scope:
        # the ratchet guards plan freshness, not protocol identity
        # (the artifact's recorded "protocol" field carries that).
        plan_paths = [
            "etl_pipelines_spark/queries",
            "etl_pipelines_spark/operators",
            "etl_pipelines_spark/llm",
            "etl_pipelines_spark/plans",
            "etl_pipelines_spark/sources",
            "etl_pipelines_spark/streaming",
        ]

        def last_commit_ts(*paths: str) -> int:
            out = subprocess.run(
                ["git", "log", "-1", "--format=%ct", "--", *paths],
                cwd=REPO, capture_output=True, text=True, check=True,
            ).stdout.strip()
            return int(out) if out else 0

        plan_ts = last_commit_ts(*plan_paths)
        exempt = re.compile(
            r"^BENCH_r\d+\.json$"
            r"|^BENCH_(codebook|refresh_scale)\.json$"
        )
        names = [
            n
            for p in ("BENCH_", "RATIO_")
            for n in _tracked(p)
            if not exempt.match(n)
        ]
        assert names, "no re-recordable catalog artifacts tracked"
        stale = [n for n in names if last_commit_ts(n) < plan_ts]
        assert not stale, (
            f"artifacts recorded before the last plan-touching commit "
            f"(re-record in a settled session): {stale}"
        )

    def test_changelog_cites_only_existing_artifacts(self):
        """Every '<NAME>.json' the CHANGELOG claims as committed must
        exist at HEAD — a false provenance claim is worse than a gap."""
        text = open(os.path.join(REPO, "CHANGELOG.md")).read()
        cited = set(re.findall(r"\b((?:BENCH|CORRECTNESS|ORACLE|RATIO)_[\w.]+\.json)\b", text))
        tracked = set(
            subprocess.run(
                ["git", "ls-files", "*.json"],
                cwd=REPO, capture_output=True, text=True, check=True,
            ).stdout.split()
        )
        missing = sorted(c for c in cited if c not in tracked)
        assert not missing, f"CHANGELOG cites absent artifacts: {missing}"
