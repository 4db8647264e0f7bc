"""bench._drift_vs_prev_round baseline selection (ADVICE r12): once the
current round's own BENCH_r{N}.json exists in the tree, a re-run must
still baseline against the PREVIOUS round — never against its own
output (self-referential drift). The round being produced is inferred
from VERDICT.md's "Round N" header (+1)."""

from __future__ import annotations

import json

import bench


def _bench_file(d, rnd, queries, calib=1.0, sf=0.1):
    (d / f"BENCH_r{rnd:02d}.json").write_text(
        json.dumps(
            {
                "parsed": {
                    "queries": queries,
                    "sf": sf,
                    "calibration": {"spark_range_sum_sec": calib},
                }
            }
        )
    )


def test_drift_skips_current_rounds_own_file(tmp_path):
    (tmp_path / "VERDICT.md").write_text("# VERDICT — Round 12\n")
    _bench_file(tmp_path, 12, {"q": 1.0})
    _bench_file(tmp_path, 13, {"q": 5.0})  # this round's own output
    out = bench._drift_vs_prev_round({"q": 2.0}, 1.0, here=str(tmp_path))
    assert out["prev_round"] == 12
    assert out["ratio_vs_prev"]["q"] == 2.0
    assert out["regressed"] == ["q"]


def test_drift_falls_back_to_newest_without_verdict(tmp_path):
    _bench_file(tmp_path, 11, {"q": 4.0})
    _bench_file(tmp_path, 12, {"q": 2.0})
    out = bench._drift_vs_prev_round({"q": 2.0}, 1.0, here=str(tmp_path))
    assert out["prev_round"] == 12
    assert out["regressed"] == []


def test_drift_normalizes_by_calibration(tmp_path):
    (tmp_path / "VERDICT.md").write_text("# VERDICT — Round 12\n")
    _bench_file(tmp_path, 12, {"q": 1.0}, calib=0.5)
    # 2x wall but the calibration probe also ran 2x slower -> ratio 1.0
    out = bench._drift_vs_prev_round({"q": 2.0}, 1.0, here=str(tmp_path))
    assert out["calib_env_ratio"] == 2.0
    assert out["ratio_vs_prev"]["q"] == 1.0
    assert out["regressed"] == []


def test_drift_none_when_no_history(tmp_path):
    assert (
        bench._drift_vs_prev_round({"q": 1.0}, 1.0, here=str(tmp_path))
        is None
    )
