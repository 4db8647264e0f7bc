"""r14: driver-side fast paths of DeltaLog (metadata / protocol / live
adds / dv paths / version) must be BIT-IDENTICAL to the Spark log-scan
path on every log shape the engine writes — json-only, post-checkpoint,
post-cleanup, with DVs and with re-added paths (add-wins)."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from delta_lake_health_spark.operators import maintenance
from delta_lake_health_spark.sources import delta_writer
from delta_lake_health_spark.sources.delta_log import DeltaLog


def _spark_side(spark, path):
    """The Spark-path answers, with every fast path disabled."""
    log = DeltaLog(spark, path)
    log._metadata_fast = lambda: None
    log._protocol_fast = lambda: None
    log._live_adds_fast = lambda: None
    log._dv_paths_fast = lambda: None
    log._fast_scan_state = lambda: None
    return log


def _fast_side(spark, path):
    from delta_lake_health_spark.sources import delta_log as dl

    dl._META_MEMO.clear()
    dl._LIVE_MEMO.clear()
    return DeltaLog(spark, path)


def _assert_parity(spark, path):
    fast, slow = _fast_side(spark, path), _spark_side(spark, path)
    assert fast.metadata() == slow.metadata()
    assert fast.protocol() == slow.protocol()
    assert fast.version() == slow.version()
    assert fast.deletion_vector_paths() == slow.deletion_vector_paths()
    f_rows = sorted(
        (r.path, dict(r.partitionValues or {}))
        for r in fast.live_files_rows()
    )
    s_rows = sorted(
        (r.path, dict(r.partitionValues or {}))
        for r in slow.live_files_rows()
    )
    assert f_rows == s_rows
    f_adds = sorted(fast.live_add_actions(), key=lambda a: a["path"])
    s_adds = sorted(slow.live_add_actions(), key=lambda a: a["path"])
    assert f_adds == s_adds


def test_fastpath_parity_json_only(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.range(0, 5000).selectExpr(
        "id", "id % 7 AS k", "CAST(id % 13 AS DOUBLE) AS v"
    )
    delta_writer.write(spark, df.repartition(4), path, mode="append")
    delta_writer.write(spark, df.repartition(2), path, mode="append")
    _assert_parity(spark, path)
    # overwrite removes + re-adds paths in one commit chain
    delta_writer.write(
        spark, df.where("k = 3").coalesce(1), path, mode="overwrite"
    )
    _assert_parity(spark, path)


def test_fastpath_parity_with_dvs_and_checkpoint(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.range(0, 5000).selectExpr(
        "id", "id % 7 AS k", "CAST(id % 13 AS DOUBLE) AS v"
    )
    delta_writer.write(spark, df.repartition(4), path, mode="append")
    delta_writer.delete_with_dv(spark, path, "k = 2")
    _assert_parity(spark, path)
    DeltaLog(spark, path).checkpoint()
    _assert_parity(spark, path)
    delta_writer.write(spark, df.repartition(2), path, mode="append")
    _assert_parity(spark, path)
    # post-cleanup: metaData/protocol/dv live only in the checkpoint
    DeltaLog(spark, path).checkpoint()
    maintenance.cleanup_log(spark, path, retention_hours=0.0)
    _assert_parity(spark, path)
    # snapshot contents identical through the fast live list
    n_fast = _fast_side(spark, path).snapshot().count()
    n_slow = _spark_side(spark, path).snapshot().count()
    assert n_fast == n_slow and n_fast > 0


def test_fastpath_parity_partitioned(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.range(0, 1000).selectExpr(
        "id", "CAST(id % 3 AS STRING) AS day"
    )
    delta_writer.write(
        spark, df.repartition(3), path, mode="append", partition_by=["day"]
    )
    delta_writer.write(
        spark, df.where("id < 100").coalesce(1), path, mode="append"
    )
    _assert_parity(spark, path)
    # partitionValues survive the pyarrow map conversion after checkpoint
    DeltaLog(spark, path).checkpoint()
    for f in glob.glob(os.path.join(path, "_delta_log", "*.json")):
        os.remove(f)
    _assert_parity(spark, path)
