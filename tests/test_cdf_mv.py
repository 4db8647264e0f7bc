"""Row-level change feed (sources/cdf.py) + incremental materialized
views (operators/mv.py).

The load-bearing assertions:
- the feed resolves appends, DV deletes, and merge rewrites to the right
  ROWS (not just files), and maintenance commits produce nothing;
- an MV refresh plans reads over ONLY the files the commits touched
  (the incrementality proof), stays exactly-once under replay, and its
  state always equals a full recompute.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest

# change-feed + incremental-MV battery: slow battery, full-suite close-out only
pytestmark = pytest.mark.slow
from pyspark.sql import functions as F

from delta_lake_health_spark.operators import maintenance, mv
from delta_lake_health_spark.sources import delta_writer
from delta_lake_health_spark.sources.cdf import row_changes
from delta_lake_health_spark.sources.delta_log import DeltaLog


@pytest.fixture()
def tmp_table(tmp_path):
    return str(tmp_path / "t")


def _rows(spark, lo, hi):
    return spark.range(lo, hi).selectExpr(
        "id", "CAST(id % 5 AS BIGINT) AS k", "CAST(id * 3 AS BIGINT) AS v"
    )


def test_row_changes_appends(spark, tmp_table):
    delta_writer.write(spark, _rows(spark, 0, 100), tmp_table)
    delta_writer.write(spark, _rows(spark, 100, 150), tmp_table)
    ch = row_changes(spark, tmp_table)
    by = {
        (r._change_type, r._commit_version): r.n
        for r in ch.groupBy("_change_type", "_commit_version")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert by == {("insert", 0): 100, ("insert", 1): 50}


def test_row_changes_dv_delete_rows(spark, tmp_table):
    delta_writer.write(spark, _rows(spark, 0, 100), tmp_table)
    delta_writer.delete_with_dv(spark, tmp_table, "id % 10 = 0")
    ch = row_changes(spark, tmp_table, from_version=1)
    deleted = sorted(r.id for r in ch.where("_change_type = 'delete'").collect())
    assert deleted == list(range(0, 100, 10))


def test_row_changes_merge_emits_delete_insert_pairs(spark, tmp_table):
    delta_writer.write(spark, _rows(spark, 0, 10).coalesce(1), tmp_table)
    src = spark.createDataFrame([(3, 99, 999), (42, 0, 0)], "id long, k long, v long")
    delta_writer.merge(spark, tmp_table, src, ["id"])
    ch = row_changes(spark, tmp_table, from_version=1)
    # the single hit file is rewritten: all 10 old rows deleted, 9
    # survivors + 2 source rows inserted
    assert ch.where("_change_type = 'delete'").count() == 10
    ins = {r.id: (r.k, r.v) for r in ch.where("_change_type = 'insert'").collect()}
    assert len(ins) == 11
    assert ins[3] == (99, 999) and ins[42] == (0, 0)
    # net effect of the feed == snapshot diff
    net = (
        ch.groupBy("id")
        .agg(
            F.sum(F.when(F.col("_change_type") == "insert", 1).otherwise(-1)).alias("s")
        )
        .where("s > 0")
        .count()
    )
    assert net == 1  # every rewritten id nets to 0; only new id 42 is +1


def test_row_changes_skips_maintenance_commits(spark, tmp_table):
    for lo in range(0, 80, 20):
        delta_writer.write(spark, _rows(spark, lo, lo + 20).coalesce(1), tmp_table)
    v_before = DeltaLog(spark, tmp_table).version()
    maintenance.compact(spark, tmp_table, small_file_size=1 << 30,
                        target_file_size=1 << 30)
    maintenance.zorder_cluster(spark, tmp_table, ["k"])
    v_after = DeltaLog(spark, tmp_table).version()
    assert v_after > v_before
    assert row_changes(spark, tmp_table, from_version=v_before + 1).count() == 0


def test_mv_refresh_reads_only_touched_files(spark, tmp_table, tmp_path):
    mv_path = str(tmp_path / "mv")
    delta_writer.write(spark, _rows(spark, 0, 200).repartition(4), tmp_table)
    mv.create_mv(spark, tmp_table, mv_path, ["k"], ["v"])
    delta_writer.write(spark, _rows(spark, 200, 260).repartition(2), tmp_table)
    m = mv.refresh_mv(spark, tmp_table, mv_path, ["k"], ["v"])
    appended = {
        r.path
        for r in DeltaLog(spark, tmp_table)
        .actions(use_checkpoint=False)
        .where("version = 1 AND add IS NOT NULL")
        .select(F.col("add.path").alias("path"))
        .collect()
    }
    assert set(m["files_read"]) == appended
    assert len(appended) == 2  # not the 4 base files


def _assert_mv_equals_recompute(spark, src_path, mv_path):
    got = {
        r.k: (r.n_rows, r.sum_v)
        for r in mv.read_mv(spark, mv_path).collect()
    }
    want = {
        r.k: (r.n_rows, r.sum_v)
        for r in DeltaLog(spark, src_path)
        .snapshot()
        .groupBy("k")
        .agg(F.count("*").alias("n_rows"), F.sum("v").alias("sum_v"))
        .collect()
    }
    assert got == want


def test_mv_tracks_mixed_workload(spark, tmp_table, tmp_path):
    mv_path = str(tmp_path / "mv")
    delta_writer.write(spark, _rows(spark, 0, 300).repartition(3), tmp_table)
    mv.create_mv(spark, tmp_table, mv_path, ["k"], ["v"])
    # append + DV delete + merge, refreshing after each
    delta_writer.write(spark, _rows(spark, 300, 400).repartition(2), tmp_table)
    mv.refresh_mv(spark, tmp_table, mv_path, ["k"], ["v"])
    _assert_mv_equals_recompute(spark, tmp_table, mv_path)
    delta_writer.delete_with_dv(spark, tmp_table, "id % 7 = 0")
    mv.refresh_mv(spark, tmp_table, mv_path, ["k"], ["v"])
    _assert_mv_equals_recompute(spark, tmp_table, mv_path)
    upd = spark.createDataFrame(
        [(5, 4, -1000), (1000, 0, 7)], "id long, k long, v long"
    )
    delta_writer.merge(spark, tmp_table, upd, ["id"])
    mv.refresh_mv(spark, tmp_table, mv_path, ["k"], ["v"])
    _assert_mv_equals_recompute(spark, tmp_table, mv_path)


def test_mv_refresh_exactly_once(spark, tmp_table, tmp_path):
    mv_path = str(tmp_path / "mv")
    delta_writer.write(spark, _rows(spark, 0, 100), tmp_table)
    mv.create_mv(spark, tmp_table, mv_path, ["k"], ["v"])
    delta_writer.write(spark, _rows(spark, 100, 120), tmp_table)
    m1 = mv.refresh_mv(spark, tmp_table, mv_path, ["k"], ["v"])
    assert m1["refreshed"]
    m2 = mv.refresh_mv(spark, tmp_table, mv_path, ["k"], ["v"])
    assert not m2["refreshed"]
    _assert_mv_equals_recompute(spark, tmp_table, mv_path)


def test_mv_group_disappears_when_count_hits_zero(spark, tmp_table, tmp_path):
    mv_path = str(tmp_path / "mv")
    df = spark.createDataFrame(
        [(i, i % 2, i) for i in range(10)], "id long, k long, v long"
    )
    delta_writer.write(spark, df, tmp_table)
    mv.create_mv(spark, tmp_table, mv_path, ["k"], ["v"])
    delta_writer.delete_with_dv(spark, tmp_table, "k = 1")
    mv.refresh_mv(spark, tmp_table, mv_path, ["k"], ["v"])
    ks = [r.k for r in mv.read_mv(spark, mv_path).collect()]
    assert ks == [0]


def test_table_changes_carries_commit_timestamps(spark, tmp_path):
    """The table_changes() veneer: row_changes plus _commit_timestamp
    resolved from the same ICT series timestampAsOf uses — every change
    row carries its commit's timestamp, version bounds respected."""
    from delta_lake_health_spark.sources import delta_writer
    from delta_lake_health_spark.sources.cdf import table_changes
    from delta_lake_health_spark.sources.delta_log import DeltaLog

    t = str(tmp_path / "t")
    delta_writer.write(spark, spark.range(0, 10).selectExpr("id"), t)
    delta_writer.write(
        spark, spark.range(10, 20).selectExpr("id"), t, mode="append"
    )
    delta_writer.delete(spark, t, "id < 3")

    ch = table_changes(spark, t, starting_version=1)
    rows = ch.collect()
    assert {r._commit_version for r in rows} == {1, 2}
    ict = dict(DeltaLog(spark, t).commit_timestamps())
    import datetime as dt

    for r in rows:
        want = ict[r._commit_version]
        got = int(
            r._commit_timestamp.replace(tzinfo=dt.timezone.utc).timestamp()
            * 1000
        )
        assert got == want, (r._commit_version, got, want)
    inserts = [r for r in rows if r._change_type == "insert"]
    deletes = [r for r in rows if r._change_type == "delete"]
    assert {r.id for r in inserts} == set(range(10, 20))
    assert {r.id for r in deletes} == {0, 1, 2}


def test_table_changes_by_timestamp_range(spark, tmp_path):
    """Timestamp addressing resolves through the same adjusted commit
    series as timestampAsOf: starting = earliest commit at/after,
    ending = latest at/before — and mixing modes is refused."""
    import pytest as _pytest

    from delta_lake_health_spark.sources import delta_writer
    from delta_lake_health_spark.sources.cdf import table_changes
    from delta_lake_health_spark.sources.delta_log import DeltaLog

    t = str(tmp_path / "ts_changes")
    for lo in (0, 10, 20):
        delta_writer.write(
            spark,
            spark.range(lo, lo + 10).selectExpr("id").coalesce(1),
            t,
        )
    series = DeltaLog(spark, t).commit_timestamps()  # [(v, ts_ms)]
    ts_by_v = dict(series)
    # exactly v1..v2
    got = table_changes(
        spark, t,
        starting_timestamp=ts_by_v[1], ending_timestamp=ts_by_v[2],
    )
    assert sorted(r.id for r in got.collect()) == list(range(10, 30))
    assert {r._commit_version for r in got.collect()} == {1, 2}
    # a future starting timestamp yields an empty feed
    empty = table_changes(spark, t, starting_timestamp=ts_by_v[2] + 10_000)
    assert empty.count() == 0
    with _pytest.raises(ValueError, match="versions OR timestamps"):
        table_changes(spark, t, starting_version=1, starting_timestamp=1)


def test_table_changes_timestamp_bounded_by_retention(spark, tmp_path):
    """Second-review round-5 (HIGH): a starting_timestamp that predates
    the retained log window must raise the retention error — returning
    a feed silently missing the expired commits' changes would corrupt
    an incremental consumer."""
    import pytest as _pytest

    from delta_lake_health_spark.operators import maintenance
    from delta_lake_health_spark.sources import delta_writer
    from delta_lake_health_spark.sources.cdf import table_changes
    from delta_lake_health_spark.sources.delta_log import DeltaLog

    t = str(tmp_path / "ret_changes")
    for lo in (0, 10, 20, 30):
        delta_writer.write(
            spark, spark.range(lo, lo + 10).selectExpr("id").coalesce(1), t
        )
    series_before = dict(DeltaLog(spark, t).commit_timestamps())
    DeltaLog(spark, t).checkpoint()
    maintenance.cleanup_log(spark, t, retention_hours=0.0)
    # a timestamp inside the EXPIRED window raises, like version addressing
    with _pytest.raises(ValueError, match="cleaned up|predates the retained"):
        table_changes(spark, t, starting_timestamp=series_before[1])
    # a timestamp at/after the earliest retained commit still works...
    delta_writer.write(
        spark, spark.range(40, 45).selectExpr("id").coalesce(1), t
    )
    got = table_changes(
        spark, t, starting_timestamp=dict(
            DeltaLog(spark, t).commit_timestamps()
        )[4]
    )
    assert sorted(r.id for r in got.collect()) == list(range(40, 45))
