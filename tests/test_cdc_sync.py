"""APPLY CHANGES CDC replication — operators/sync.py.

Invariant under test: after every sync cycle, the target snapshot
equals the source snapshot exactly (same rows, any operation mix),
while the sync only reads the new commits' changes. Plus: first-call
seeding, no-op re-sync, and marker advancement.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from delta_lake_health_spark.operators.sync import apply_changes
from delta_lake_health_spark.sources import delta_writer
from delta_lake_health_spark.sources.delta_log import DeltaLog


def _rows(spark, path):
    return {
        (r.id, r.v)
        for r in DeltaLog(spark, path).snapshot().select("id", "v").collect()
    }


@pytest.fixture()
def pair(spark, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    delta_writer.write(
        spark,
        spark.range(0, 100).selectExpr("id", "CAST(id * 2 AS BIGINT) AS v"),
        src,
    )
    return src, dst


def test_seed_then_incremental_sync(spark, pair):
    src, dst = pair
    m = apply_changes(spark, src, dst, ["id"])
    assert m["seeded"] and m["numUpserts"] == 100
    assert _rows(spark, dst) == _rows(spark, src)

    # append + re-sync reads only the new commit
    delta_writer.write(
        spark,
        spark.range(100, 120).selectExpr("id", "CAST(id * 2 AS BIGINT) AS v"),
        src,
    )
    m = apply_changes(spark, src, dst, ["id"])
    assert not m["seeded"] and m["numUpserts"] == 20 and m["numDeletes"] == 0
    assert _rows(spark, dst) == _rows(spark, src)


def test_update_delete_merge_mix(spark, pair):
    src, dst = pair
    apply_changes(spark, src, dst, ["id"])
    # an UPDATE (delete+insert in the feed), a DV delete, and a MERGE
    delta_writer.update(spark, src, "id < 10", {"v": "v + 1000"})
    delta_writer.delete_with_dv(spark, src, "id BETWEEN 50 AND 59")
    delta_writer.merge(
        spark,
        src,
        spark.range(95, 105).selectExpr("id", "CAST(id * 7 AS BIGINT) AS v"),
        ["id"],
    )
    m = apply_changes(spark, src, dst, ["id"])
    assert m["numDeletes"] == 10
    assert _rows(spark, dst) == _rows(spark, src)
    # spot semantics: updated, merged-updated, merged-inserted, deleted
    got = dict(_rows(spark, dst))
    assert got[5] == 5 * 2 + 1000
    assert got[97] == 97 * 7
    assert got[104] == 104 * 7
    assert 55 not in got


def test_resync_is_noop(spark, pair):
    src, dst = pair
    apply_changes(spark, src, dst, ["id"])
    v_dst = delta_writer.current_version(dst)
    m = apply_changes(spark, src, dst, ["id"])
    assert m["numUpserts"] == 0 and m["numDeletes"] == 0
    assert delta_writer.current_version(dst) == v_dst  # nothing committed


def test_delete_only_cycle(spark, pair):
    src, dst = pair
    apply_changes(spark, src, dst, ["id"])
    delta_writer.delete_with_dv(spark, src, "id % 10 = 0")
    m = apply_changes(spark, src, dst, ["id"])
    assert m["numUpserts"] == 0 and m["numDeletes"] == 10
    assert _rows(spark, dst) == _rows(spark, src)
    assert DeltaLog(spark, dst).snapshot().count() == 90


def test_multi_cycle_convergence(spark, pair):
    src, dst = pair
    for step in range(3):
        if step:
            delta_writer.update(
                spark, src, f"id % 7 = {step}", {"v": f"v + {step * 100}"}
            )
            delta_writer.delete_with_dv(spark, src, f"id % 31 = {step}")
        apply_changes(spark, src, dst, ["id"])
        assert _rows(spark, dst) == _rows(spark, src), step
