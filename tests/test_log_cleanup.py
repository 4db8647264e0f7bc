"""Log metadata cleanup (maintenance.cleanup_log): pre-checkpoint JSON
and superseded checkpoints expire; reads stay correct from the retained
checkpoint; time travel / change feeds into the expired window raise a
clear error instead of silently replaying a truncated log."""

from __future__ import annotations

import os

import pytest

# log-retention cleanup battery: slow battery, full-suite close-out only
pytestmark = pytest.mark.slow

from delta_lake_health_spark.operators import maintenance
from delta_lake_health_spark.sources import delta_writer
from delta_lake_health_spark.sources.cdf import row_changes
from delta_lake_health_spark.sources.delta_log import DeltaLog


def _build(spark, t, n_commits=5):
    for i in range(n_commits):
        df = spark.range(i * 10, (i + 1) * 10).selectExpr(
            "id", "CAST(id % 3 AS LONG) AS k"
        )
        delta_writer.write(spark, df.coalesce(1), t)
    return DeltaLog(spark, t)


def _json_versions(t):
    d = os.path.join(t, "_delta_log")
    return sorted(
        int(f[:20]) for f in os.listdir(d) if f.endswith(".json") and f[:20].isdigit()
    )


def test_cleanup_expires_pre_checkpoint_json(spark, tmp_path):
    t = str(tmp_path / "t")
    log = _build(spark, t)
    log.checkpoint()  # at version 4
    m = maintenance.cleanup_log(spark, t, retention_hours=0.0)
    assert m["numDeletedJson"] == 4
    assert _json_versions(t) == [4]
    assert m["retainedFromVersion"] == 4
    # fresh reader reconstructs the full table from checkpoint + tail
    fresh = DeltaLog(spark, t)
    assert fresh.snapshot().count() == 50
    assert fresh.version() == 4
    # and new commits + reads keep working
    delta_writer.write(
        spark, spark.range(50, 60).selectExpr("id", "CAST(id % 3 AS LONG) AS k"), t
    )
    assert DeltaLog(spark, t).snapshot().count() == 60


def test_cleanup_respects_retention_window(spark, tmp_path):
    t = str(tmp_path / "t")
    log = _build(spark, t)
    log.checkpoint()
    m = maintenance.cleanup_log(spark, t, retention_hours=1.0)
    assert m["numDeletedJson"] == 0  # everything newer than the cutoff
    assert _json_versions(t) == [0, 1, 2, 3, 4]


def test_cleanup_noop_without_checkpoint(spark, tmp_path):
    t = str(tmp_path / "t")
    _build(spark, t)
    m = maintenance.cleanup_log(spark, t, retention_hours=0.0)
    assert m == {"numDeletedJson": 0, "numDeletedCheckpointFiles": 0}


def test_cleanup_drops_superseded_checkpoints(spark, tmp_path):
    t = str(tmp_path / "t")
    log = _build(spark, t, n_commits=3)
    log.checkpoint()  # v2
    delta_writer.write(
        spark, spark.range(100, 110).selectExpr("id", "CAST(id % 3 AS LONG) AS k"), t
    )
    DeltaLog(spark, t).checkpoint()  # v3 supersedes v2
    m = maintenance.cleanup_log(spark, t, retention_hours=0.0)
    assert m["numDeletedCheckpointFiles"] >= 1
    d = os.path.join(t, "_delta_log")
    assert not any(f.startswith(f"{2:020d}.checkpoint") for f in os.listdir(d))
    assert DeltaLog(spark, t).snapshot().count() == 40


def test_time_travel_into_expired_window_raises(spark, tmp_path):
    t = str(tmp_path / "t")
    log = _build(spark, t)
    log.checkpoint()
    maintenance.cleanup_log(spark, t, retention_hours=0.0)
    fresh = DeltaLog(spark, t)
    with pytest.raises(ValueError, match="cleaned\\s?up|retention"):
        fresh.snapshot(as_of=1)
    with pytest.raises(ValueError, match="cleaned\\s?up|retention"):
        fresh.changes(from_version=0).collect()
    with pytest.raises(ValueError, match="cleaned\\s?up|retention"):
        row_changes(spark, t, from_version=0)
    # in-window change feed still works
    assert row_changes(spark, t, from_version=4).count() == 10
