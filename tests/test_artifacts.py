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
            if re.match(r"BENCH_r\d+\.json$", name):
                # driver-side capture; shape is the driver's, not ours —
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
