"""bench.py's mechanical noise-vs-regression gate (VERDICT r3 item 8):
a query flags only when its median worsens beyond 2x the larger recorded/
current spread (floored), and the reference snapshot resolves to the
highest-round committed BENCH_LOCAL file."""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from bench import _load_reference, _regressions  # noqa: E402


def test_regression_gate_separates_noise_from_real():
    ref = {
        "queries": {"q_noisy": 1.0, "q_stable": 1.0, "q_tiny": 0.01},
        "spread": {"q_noisy": 0.4, "q_stable": 0.02, "q_tiny": 0.0},
    }
    timings = {
        "q_noisy": 1.7,   # +0.7 but spread 0.4 -> tol 0.8: noise
        "q_stable": 1.5,  # +0.5 vs tol 2*max(0.02, 0.01, 0.15)=0.3: REAL
        "q_tiny": 0.05,   # +0.04 under the 0.3 floor tol: noise
        "q_new": 9.9,     # absent from ref: never flags
    }
    spreads = {"q_noisy": 0.1, "q_stable": 0.01, "q_tiny": 0.0, "q_new": 0.0}
    got = _regressions(timings, spreads, ref)
    assert set(got) == {"q_stable"}
    assert got["q_stable"] == {"ref": 1.0, "now": 1.5, "tol": 0.3}
    # the CURRENT run's spread also widens tolerance (a busy box this round)
    got2 = _regressions(timings, {**spreads, "q_stable": 0.6}, ref)
    assert got2 == {}


def test_reference_resolves_highest_round(tmp_path, monkeypatch):
    import bench

    for r, val in ((3, 1.0), (10, 2.0)):  # r10 must beat r3 (numeric, not lexical)
        (tmp_path / f"BENCH_LOCAL_sf0.1_r{r}.json").write_text(
            json.dumps({"queries": {"q": val}, "spread": {"q": 0.1}})
        )
    monkeypatch.setattr(bench, "_REPO", tmp_path)
    monkeypatch.delenv("SPARK_GRAFT_BENCH_REF", raising=False)
    name, data = bench._load_reference("0.1")
    assert name == "BENCH_LOCAL_sf0.1_r10.json" and data["queries"]["q"] == 2.0
    assert bench._load_reference("0.01") is None
    # explicit override wins
    monkeypatch.setenv(
        "SPARK_GRAFT_BENCH_REF", str(tmp_path / "BENCH_LOCAL_sf0.1_r3.json")
    )
    assert bench._load_reference("0.1")[1]["queries"]["q"] == 1.0
