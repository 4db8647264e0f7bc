"""The ``delta_tail`` streaming source (streaming/delta_source.py).

Covers: full-history replay, restart-from-checkpoint reading only new
commits (exactly-once), the append-only guard on DV/remove commits,
ignoreDeletes continuation, hive-partition value recovery, column
mapping, and invisibility of dataChange=false maintenance rewrites.
"""

from __future__ import annotations

import os

import pytest

# delta_tail source battery (paced drains): slow battery, full-suite close-out only
pytestmark = pytest.mark.slow

from delta_lake_health_spark.operators import maintenance
from delta_lake_health_spark.sources import delta_writer
from delta_lake_health_spark.streaming import delta_source


def _ids(spark, lo, hi):
    return spark.range(lo, hi).selectExpr("id", "CAST(id % 3 AS LONG) AS k")


def _drain(spark, table, out, ckpt, **opts):
    q = (
        delta_source.read_stream(spark, table, **opts)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return spark.read.parquet(out)


def test_replay_then_incremental(spark, tmp_path):
    t, out, ckpt = (str(tmp_path / p) for p in ("t", "out", "ckpt"))
    delta_writer.write(spark, _ids(spark, 0, 50).coalesce(2), t)
    delta_writer.write(spark, _ids(spark, 50, 80).coalesce(1), t)
    assert _drain(spark, t, out, ckpt).count() == 80
    delta_writer.write(spark, _ids(spark, 80, 100).coalesce(1), t)
    got = sorted(r.id for r in _drain(spark, t, out, ckpt).select("id").collect())
    assert got == list(range(100))  # new rows exactly once, no dupes


def test_starting_version_skips_history(spark, tmp_path):
    t, out, ckpt = (str(tmp_path / p) for p in ("t", "out", "ckpt"))
    delta_writer.write(spark, _ids(spark, 0, 40).coalesce(1), t)
    delta_writer.write(spark, _ids(spark, 40, 60).coalesce(1), t)
    df = _drain(spark, t, out, ckpt, startingVersion=1)
    assert sorted(r.id for r in df.select("id").collect()) == list(range(40, 60))


def test_delete_commit_fails_stream(spark, tmp_path):
    t, out, ckpt = (str(tmp_path / p) for p in ("t", "out", "ckpt"))
    delta_writer.write(spark, _ids(spark, 0, 30).coalesce(1), t)
    _drain(spark, t, out, ckpt)
    delta_writer.delete_with_dv(spark, t, "id = 7")
    with pytest.raises(Exception, match="deletion vector|ignoreDeletes"):
        _drain(spark, t, out, ckpt)


def test_ignore_deletes_continues(spark, tmp_path):
    t, out, ckpt = (str(tmp_path / p) for p in ("t", "out", "ckpt"))
    delta_writer.write(spark, _ids(spark, 0, 30).coalesce(1), t)
    _drain(spark, t, out, ckpt, ignoreDeletes=True)
    delta_writer.delete_with_dv(spark, t, "id = 7")
    delta_writer.write(spark, _ids(spark, 30, 40).coalesce(1), t)
    df = _drain(spark, t, out, ckpt, ignoreDeletes=True)
    # the delete is skipped (positions stay), the append arrives
    assert df.count() == 40


def test_maintenance_rewrites_invisible(spark, tmp_path):
    t, out, ckpt = (str(tmp_path / p) for p in ("t", "out", "ckpt"))
    for lo in range(0, 60, 20):
        delta_writer.write(spark, _ids(spark, lo, lo + 20).coalesce(1), t)
    assert _drain(spark, t, out, ckpt).count() == 60
    maintenance.compact(
        spark, t, small_file_size=1 << 30, target_file_size=1 << 30
    )
    maintenance.zorder_cluster(spark, t, ["k"])
    # rewrites add files but dataChange=false: stream sees nothing new
    assert _drain(spark, t, out, ckpt).count() == 60


def test_partitioned_table_values_recovered(spark, tmp_path):
    t, out, ckpt = (str(tmp_path / p) for p in ("t", "out", "ckpt"))
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5), (3, "a", 3.5)], "id long, g string, v double"
    )
    delta_writer.write(spark, df, t, partition_by=["g"])
    got = _drain(spark, t, out, ckpt)
    rows = {(r.id): (r.g, r.v) for r in got.collect()}
    assert rows == {1: ("a", 1.5), 2: ("b", 2.5), 3: ("a", 3.5)}


def test_column_mapped_table_streams_logical_names(spark, tmp_path):
    t, out, ckpt = (str(tmp_path / p) for p in ("t", "out", "ckpt"))
    delta_writer.write(spark, _ids(spark, 0, 20).coalesce(1), t)
    delta_writer.rename_column(spark, t, "k", "bucket")
    delta_writer.write(
        spark,
        spark.range(20, 30).selectExpr("id", "CAST(id % 3 AS LONG) AS bucket"),
        t,
    )
    got = _drain(spark, t, out, ckpt)
    assert "bucket" in got.columns and got.count() == 30
    assert got.where("bucket = id % 3").count() == 30


def test_batch_schema_matches_log(spark, tmp_path):
    t = str(tmp_path / "t")
    delta_writer.write(spark, _ids(spark, 0, 10).coalesce(1), t)
    s = delta_source.read_stream(spark, t)
    assert [f.name for f in s.schema.fields] == ["id", "k"]


def test_max_versions_per_trigger_paces_backlog(spark, tmp_path):
    """Admission control: after the first batch of a run (unbounded by
    API necessity — latestOffset gets no start argument), each periodic
    micro-batch admits at most maxVersionsPerTrigger commit versions, and
    a restart from checkpoint never re-reads or skips data."""
    import time as _time

    t, out, ckpt = (str(tmp_path / p) for p in ("t", "out", "ckpt"))
    delta_writer.write(spark, _ids(spark, 0, 20).coalesce(1), t)

    def start_query():
        return (
            delta_source.read_stream(spark, t, maxVersionsPerTrigger="1")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="300 milliseconds")
            .start()
        )

    def wait_rows(n, timeout=120):
        deadline = _time.time() + timeout
        while _time.time() < deadline:
            try:
                if spark.read.parquet(out).count() >= n:
                    return True
            except Exception:
                pass
            _time.sleep(0.5)
        return False

    q = start_query()
    try:
        assert wait_rows(20)
        # grow the backlog while the stream runs: each trigger may only
        # admit ONE of these four commits
        for lo in range(20, 100, 20):
            delta_writer.write(
                spark, _ids(spark, lo, lo + 20).coalesce(1), t, mode="append"
            )
        assert wait_rows(100)
    finally:
        q.stop()
    offsets = [
        f for f in os.listdir(os.path.join(ckpt, "offsets")) if f.isdigit()
    ]
    # batch 0 (initial drain) + at least one batch per paced commit
    assert len(offsets) >= 5, sorted(offsets)
    got = spark.read.parquet(out)
    assert sorted(r.id for r in got.collect()) == list(range(100))

    # restart from checkpoint with MORE backlog: the first batch of the
    # new run is unbounded, but nothing is re-read or skipped
    for lo in range(100, 140, 20):
        delta_writer.write(
            spark, _ids(spark, lo, lo + 20).coalesce(1), t, mode="append"
        )
    q = start_query()
    try:
        assert wait_rows(140)
    finally:
        q.stop()
    got = sorted(r.id for r in spark.read.parquet(out).collect())
    assert got == list(range(140)), f"dup or gap: {len(got)} rows"


def test_cleaned_up_history_fails_with_retention_error(spark, tmp_path):
    """A fresh stream over a table whose pre-checkpoint commits were
    expired by log cleanup must fail with a clear retention error, not a
    raw FileNotFoundError (and never silently skip the missing data)."""
    from delta_lake_health_spark.sources.delta_log import DeltaLog

    t, out, ckpt = (str(tmp_path / p) for p in ("t", "out", "ckpt"))
    for lo in range(0, 60, 20):
        delta_writer.write(spark, _ids(spark, lo, lo + 20).coalesce(1), t)
    DeltaLog(spark, t).checkpoint()
    maintenance.cleanup_log(spark, t, retention_hours=0.0)
    with pytest.raises(Exception, match="log retention|cleaned up"):
        _drain(spark, t, out, ckpt)


def test_bootstrap_snapshot_then_tail(spark, tmp_path):
    """bootstrapSnapshot: the first batch delivers the FULL current
    snapshot (reconstructed driver-side from checkpoint + JSON tail,
    working even after log cleanup expired the early commits), and
    subsequent batches tail only new commits — exactly once end to
    end."""
    from delta_lake_health_spark.sources.delta_log import DeltaLog

    t, out, ckpt = (str(tmp_path / p) for p in ("t", "out", "ckpt"))
    for lo in range(0, 60, 20):
        delta_writer.write(spark, _ids(spark, lo, lo + 20).coalesce(1), t)
    delta_writer.delete(spark, t, "id >= 50")  # rewrite: snapshot = 0..49
    DeltaLog(spark, t).checkpoint()
    maintenance.cleanup_log(spark, t, retention_hours=0.0)

    got = _drain(spark, t, out, ckpt, bootstrapSnapshot=True)
    assert sorted(r.id for r in got.collect()) == list(range(50))

    # tail: only the new commit arrives on the SAME checkpoint
    delta_writer.write(spark, _ids(spark, 100, 120).coalesce(1), t)
    got = _drain(spark, t, out, ckpt, bootstrapSnapshot=True)
    assert sorted(r.id for r in got.collect()) == (
        list(range(50)) + list(range(100, 120))
    )

    # a v2-checkpointed, DV-bearing table: bootstrap refuses (whole-file
    # reads would resurrect soft-deleted rows) until vectors are applied
    t2, out2, ckpt2 = (str(tmp_path / p) for p in ("t2", "out2", "ckpt2"))
    delta_writer.write(spark, _ids(spark, 0, 30).coalesce(1), t2)
    delta_writer.delete_with_dv(spark, t2, "id = 7")
    DeltaLog(spark, t2).checkpoint(format="v2")
    with pytest.raises(Exception, match="resurrect|ignoreDeletes"):
        _drain(spark, t2, out2, ckpt2, bootstrapSnapshot=True)
    maintenance.apply_deletion_vectors(spark, t2)
    DeltaLog(spark, t2).checkpoint(format="v2")
    maintenance.cleanup_log(spark, t2, retention_hours=0.0)
    got = _drain(
        spark, t2, out2 + "_b", ckpt2 + "_b", bootstrapSnapshot=True,
        ignoreDeletes=True,
    )
    assert sorted(r.id for r in got.collect()) == [
        i for i in range(30) if i != 7
    ]


def test_max_bytes_per_trigger_paces_by_size(spark, tmp_path):
    """maxBytesPerTrigger: after the first batch of a run, each trigger
    admits whole versions until the byte budget trips (at least one per
    trigger), delivering everything exactly once across several
    batches."""
    import time as _time

    t, out, ckpt = (str(tmp_path / p) for p in ("t", "out", "ckpt"))
    delta_writer.write(spark, _ids(spark, 0, 20).coalesce(1), t)
    q = (
        delta_source.read_stream(spark, t, maxBytesPerTrigger="1")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="300 milliseconds")
        .start()
    )

    def wait_rows(n, timeout=120):
        deadline = _time.time() + timeout
        while _time.time() < deadline:
            try:
                if spark.read.parquet(out).count() >= n:
                    return True
            except Exception:
                pass
            _time.sleep(0.5)
        return False

    try:
        assert wait_rows(20)
        for lo in range(20, 80, 20):
            delta_writer.write(
                spark, _ids(spark, lo, lo + 20).coalesce(1), t, mode="append"
            )
        assert wait_rows(80)
    finally:
        q.stop()
    offsets = [
        f for f in os.listdir(os.path.join(ckpt, "offsets")) if f.isdigit()
    ]
    # a 1-byte budget admits exactly one version per paced trigger
    assert len(offsets) >= 4, sorted(offsets)
    got = sorted(r.id for r in spark.read.parquet(out).collect())
    assert got == list(range(80))


def test_max_files_per_trigger_paces_by_file_count(spark, tmp_path):
    """maxFilesPerTrigger (Delta's default pacing knob): after the first
    batch of a run, each trigger admits whole versions until the
    cumulative dataChange add-file count reaches the budget (at least
    one version per trigger), delivering everything exactly once. Each
    backlog commit here has 2 files, so a budget of 3 admits exactly 2
    versions per paced trigger (2 files < 3, 4 files >= 3 -> stop)."""
    import time as _time

    t, out, ckpt = (str(tmp_path / p) for p in ("t", "out", "ckpt"))
    delta_writer.write(spark, _ids(spark, 0, 20).coalesce(1), t)
    q = (
        delta_source.read_stream(spark, t, maxFilesPerTrigger="3")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="300 milliseconds")
        .start()
    )

    def wait_rows(n, timeout=120):
        deadline = _time.time() + timeout
        while _time.time() < deadline:
            try:
                if spark.read.parquet(out).count() >= n:
                    return True
            except Exception:
                pass
            _time.sleep(0.5)
        return False

    try:
        assert wait_rows(20)
        for lo in range(20, 100, 20):
            delta_writer.write(
                spark, _ids(spark, lo, lo + 20).coalesce(2), t, mode="append"
            )
        assert wait_rows(100)
    finally:
        q.stop()
    offsets = [
        f for f in os.listdir(os.path.join(ckpt, "offsets")) if f.isdigit()
    ]
    # 4 backlog commits x 2 files at budget 3 -> >= 2 paced triggers
    # beyond the first batch
    assert len(offsets) >= 3, sorted(offsets)
    got = sorted(r.id for r in spark.read.parquet(out).collect())
    assert got == list(range(100))


# ---- readChangeFeed (streaming CDF, round 5) -------------------------------

def test_read_change_feed_appends_are_inserts(spark, tmp_path):
    t, out, ckpt = (str(tmp_path / p) for p in ("t", "out", "ckpt"))
    delta_writer.write(spark, _ids(spark, 0, 30).coalesce(1), t)
    delta_writer.write(spark, _ids(spark, 30, 50).coalesce(1), t)
    df = _drain(spark, t, out, ckpt, readChangeFeed=True)
    assert set(df.columns) == {"id", "k", "_change_type", "_commit_version"}
    rows = df.collect()
    assert len(rows) == 50
    assert {r._change_type for r in rows} == {"insert"}
    assert {r._commit_version for r in rows} == {0, 1}


def test_read_change_feed_streams_update_images(spark, tmp_path):
    """An UPDATE on a CDF-enabled table streams as true pre/post images
    read from the commit's change-data file — the rewrite's add files
    never feed the stream."""
    t, out, ckpt = (str(tmp_path / p) for p in ("t", "out", "ckpt"))
    delta_writer.write(spark, _ids(spark, 0, 40).coalesce(1), t)
    delta_writer.set_table_property(
        spark, t, "delta.enableChangeDataFeed", "true"
    )
    _drain(spark, t, out, ckpt, readChangeFeed=True)
    v = delta_writer.update(spark, t, "id < 4", {"k": "k + 100"})
    df = _drain(spark, t, out, ckpt, readChangeFeed=True)
    batch = [r for r in df.collect() if r._commit_version == v]
    assert len(batch) == 8  # 4 pre + 4 post, NOT the 40-row rewrite
    pre = {r.id: r.k for r in batch if r._change_type == "update_preimage"}
    post = {r.id: r.k for r in batch if r._change_type == "update_postimage"}
    assert set(pre) == set(post) == {0, 1, 2, 3}
    for i in pre:
        assert post[i] == pre[i] + 100


def test_read_change_feed_update_without_cdc_fails(spark, tmp_path):
    """An UPDATE on a table WITHOUT change data feed rewrites files via
    remove+add; the CDF stream must refuse (not fabricate row-level
    changes), same contract as the plain tail."""
    t, out, ckpt = (str(tmp_path / p) for p in ("t", "out", "ckpt"))
    delta_writer.write(spark, _ids(spark, 0, 20).coalesce(1), t)
    _drain(spark, t, out, ckpt, readChangeFeed=True)
    delta_writer.update(spark, t, "id = 1", {"k": "0"})
    with pytest.raises(Exception, match="ignoreDeletes|removes data"):
        _drain(spark, t, out, ckpt, readChangeFeed=True)


def test_read_change_feed_streams_cdc_deletes(spark, tmp_path):
    """A DELETE on a CDF-enabled table streams its change-data file as
    delete rows — no append-only refusal, no rewrite rows."""
    t, out, ckpt = (str(tmp_path / p) for p in ("t", "out", "ckpt"))
    delta_writer.write(spark, _ids(spark, 0, 30).coalesce(1), t)
    delta_writer.set_table_property(
        spark, t, "delta.enableChangeDataFeed", "true"
    )
    _drain(spark, t, out, ckpt, readChangeFeed=True)
    v = delta_writer.delete(spark, t, "id >= 25")
    df = _drain(spark, t, out, ckpt, readChangeFeed=True)
    batch = [r for r in df.collect() if r._commit_version == v]
    assert sorted(r.id for r in batch) == [25, 26, 27, 28, 29]
    assert {r._change_type for r in batch} == {"delete"}


def test_starting_timestamp_resolves_to_commit(spark, tmp_path):
    """startingTimestamp begins the tail at the earliest commit at or
    after the timestamp (ICT-aware), mirroring Delta's option."""
    import json as _json

    t, out, ckpt = (str(tmp_path / p) for p in ("t", "out", "ckpt"))
    delta_writer.write(spark, _ids(spark, 0, 20).coalesce(1), t)
    delta_writer.write(spark, _ids(spark, 20, 30).coalesce(1), t)
    # read v1's commit timestamp from the log, start exactly there
    v1 = _json.loads(
        [
            line for line in open(os.path.join(t, "_delta_log",
                                               f"{1:020d}.json"))
            if '"commitInfo"' in line
        ][0]
    )["commitInfo"]
    ts = v1.get("inCommitTimestamp") or v1["timestamp"]
    df = _drain(spark, t, out, ckpt, startingTimestamp=int(ts))
    assert sorted(r.id for r in df.select("id").collect()) == list(range(20, 30))
    # a FUTURE timestamp yields an empty tail (stream starts with the
    # next write), not an error
    out2, ckpt2 = str(tmp_path / "o2"), str(tmp_path / "c2")
    df2 = _drain(spark, t, out2, ckpt2, startingTimestamp=int(ts) + 10_000_000)
    assert df2.count() == 0


def test_starting_timestamp_and_version_conflict(spark, tmp_path):
    t = str(tmp_path / "t")
    delta_writer.write(spark, _ids(spark, 0, 5).coalesce(1), t)
    with pytest.raises(Exception, match="startingVersion OR startingTimestamp"):
        q = (
            delta_source.read_stream(
                spark, t, startingVersion=0, startingTimestamp="2020-01-01"
            )
            .writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)


def test_tail_streams_a_converted_table(spark, tmp_path):
    """CONVERT TO DELTA interop: a converted plain-parquet directory is
    a first-class streaming source — its v0 adds replay, and post-
    conversion appends arrive incrementally through the same
    checkpoint."""
    t, out, ckpt = (str(tmp_path / p) for p in ("t", "out", "ckpt"))
    _ids(spark, 0, 40).coalesce(2).write.parquet(t)
    delta_writer.convert_to_delta(spark, t)
    assert _drain(spark, t, out, ckpt).count() == 40
    delta_writer.write(spark, _ids(spark, 40, 55).coalesce(1), t,
                       mode="append")
    got = sorted(r.id for r in _drain(spark, t, out, ckpt).select("id").collect())
    assert got == list(range(55))


def test_skip_change_commits(spark, tmp_path):
    """skipChangeCommits: an UPDATE's rewrite commit is skipped entirely
    — the stream sees neither a failure nor duplicate rows from the
    re-added files; later plain appends still arrive."""
    t, out, ckpt = (str(tmp_path / p) for p in ("t", "out", "ckpt"))
    delta_writer.write(spark, _ids(spark, 0, 30).coalesce(1), t)
    assert _drain(spark, t, out, ckpt, skipChangeCommits=True).count() == 30
    delta_writer.update(spark, t, "id = 5", {"k": "99"})
    delta_writer.write(spark, _ids(spark, 30, 40).coalesce(1), t,
                       mode="append")
    got = _drain(spark, t, out, ckpt, skipChangeCommits=True)
    ids = sorted(r.id for r in got.select("id").collect())
    assert ids == list(range(40))  # no dupes from the rewrite
    assert got.where("k = 99").count() == 0  # rewrite never fed the stream
