"""Ports of the reference's own test suites onto the compat shim —
test/test_delta_analyzer_load.py and test/test_delta_analyzer_metrics.py
assertions mirrored verbatim (same table shapes, same thresholds, same
metric names including the skew dict shape) against
``delta_lake_health_spark.analyzer.DeltaAnalyzer``. The reference builds
tables with deltalake.write_deltalake / DeltaTable.delete /
optimize.compact; here the same sequence runs through our own writer and
maintenance operators."""

from __future__ import annotations

import shutil
import tempfile

import numpy as np
import pytest

from delta_lake_health_spark.analyzer import (
    DeltaAnalyzer,
    DeltaAnalyzerMetrics,
    Environment,
)
from delta_lake_health_spark.operators import maintenance
from delta_lake_health_spark.sources import delta_writer


def _tips_frame(spark, days, times, seed):
    """The reference fixtures' frame: uniform bills/tips over given
    day/time partition labels (np.random seeded for determinism)."""
    rng = np.random.default_rng(seed)
    n = len(days)
    rows = [
        (float(b), float(t), d, tm, int(s))
        for b, t, d, tm, s in zip(
            rng.uniform(10, 50, n), rng.uniform(1, 10, n),
            days, times, rng.integers(1, 5, n),
        )
    ]
    return spark.createDataFrame(
        rows, "total_bill double, tip double, day string, time string, size int"
    )


def _skewed_days_times():
    # test_delta_analyzer_metrics.py fixture: 80 Mon/Dinner, 10 Tue/Lunch,
    # 10 Wed/Lunch
    days = ["Mon"] * 80 + ["Tue"] * 10 + ["Wed"] * 10
    times = ["Dinner"] * 80 + ["Lunch"] * 10 + ["Lunch"] * 10
    return days, times


@pytest.fixture(scope="module")
def tmp_delta_table(spark):
    """Mirror of the reference's tmp_delta_table fixture: overwrite +
    3 sampled appends + delete(total_bill > 40) + optimize.compact()."""
    tmpdir = tempfile.mkdtemp()
    table_path = f"{tmpdir}/tips"
    days, times = _skewed_days_times()
    df = _tips_frame(spark, days, times, seed=1)
    delta_writer.write(spark, df, table_path, mode="overwrite",
                       partition_by=["day", "time"])
    for k in range(3):
        sample = _tips_frame(
            spark, days[:4] + days[-6:], times[:4] + times[-6:], seed=10 + k
        )
        delta_writer.write(spark, sample, table_path, mode="append",
                           partition_by=["day", "time"])
    delta_writer.delete(spark, table_path, "total_bill > 40")
    maintenance.compact(spark, table_path, small_file_size=32 * 1024 * 1024)
    yield table_path
    shutil.rmtree(tmpdir)


def test_analyze_python_by_path(spark, tmp_delta_table):
    """test_delta_analyzer_load.py::test_analyze_python_by_path —
    analyze-by-path returns a DeltaAnalyzerMetrics whose table_path
    echoes the table and whose version_count is positive."""
    analyzer = DeltaAnalyzer(environment=Environment.PYTHON, spark=spark)
    metrics = analyzer.analyze(table_path=tmp_delta_table)
    assert isinstance(metrics, DeltaAnalyzerMetrics)
    assert "tips" in metrics.table_path
    assert metrics.version_count > 0


def test_delta_analyzer_metrics_and_skewness(spark, tmp_delta_table):
    analyzer = DeltaAnalyzer(environment=Environment.PYTHON, spark=spark)
    metrics = analyzer.analyze(table_path=tmp_delta_table)
    assert metrics is not None
    assert metrics.number_of_writes >= 4
    assert metrics.number_of_deletes >= 1
    assert metrics.number_of_optimizes >= 0
    assert metrics.skewness_max > 0.7
    assert metrics.skewness_average > 0.2


def test_delta_analyzer_no_skewness(spark):
    tmpdir = tempfile.mkdtemp()
    table_path = f"{tmpdir}/tips_noskew"
    days = ["Mon"] * 60 + ["Tue"] * 60
    times = (["Dinner"] * 30 + ["Lunch"] * 30) * 2
    df = _tips_frame(spark, days, times, seed=2)
    delta_writer.write(spark, df, table_path, mode="overwrite",
                       partition_by=["day", "time"])
    analyzer = DeltaAnalyzer(environment=Environment.PYTHON, spark=spark)
    metrics = analyzer.analyze(table_path=table_path)
    assert metrics.skewness_max < 0.01
    assert metrics.skewness_average < 0.01
    shutil.rmtree(tmpdir)


def test_table_size_metrics_no_orphan_files(spark):
    tmpdir = tempfile.mkdtemp()
    table_path = f"{tmpdir}/tips_no_orphan"
    days = ["Mon"] * 50 + ["Tue"] * 50
    times = ["Dinner"] * 50 + ["Lunch"] * 50
    df = _tips_frame(spark, days, times, seed=3)
    delta_writer.write(spark, df, table_path, mode="overwrite",
                       partition_by=["day", "time"])
    analyzer = DeltaAnalyzer(environment="python", spark=spark)
    metrics = analyzer.analyze(table_path=table_path,
                               orphan_file_ratio_threshold=0.5)
    assert metrics is not None
    assert metrics.has_orphan_files is False
    shutil.rmtree(tmpdir)


def test_table_size_metrics_many_orphan_files(spark):
    """10 appends + delete + compact leave many superseded files on disk;
    at orphan_file_ratio_threshold=0.8 the analyzer must flag them."""
    tmpdir = tempfile.mkdtemp()
    table_path = f"{tmpdir}/tips_orphan"
    days = ["Mon"] * 50 + ["Tue"] * 50
    times = ["Dinner"] * 50 + ["Lunch"] * 50
    df = _tips_frame(spark, days, times, seed=4)
    delta_writer.write(spark, df, table_path, mode="overwrite",
                       partition_by=["day", "time"])
    for k in range(10):
        sample = _tips_frame(spark, days[:5] + days[-5:],
                             times[:5] + times[-5:], seed=40 + k)
        delta_writer.write(spark, sample, table_path, mode="append",
                           partition_by=["day", "time"])
    delta_writer.delete(spark, table_path, "total_bill > 40")
    maintenance.compact(spark, table_path, small_file_size=32 * 1024 * 1024)
    analyzer = DeltaAnalyzer(environment="python", spark=spark)
    metrics = analyzer.analyze(table_path=table_path,
                               orphan_file_ratio_threshold=0.8)
    assert metrics is not None
    assert metrics.has_orphan_files is True
    shutil.rmtree(tmpdir)


def test_skew_metrics_dictionary(spark):
    tmpdir = tempfile.mkdtemp()
    table_path = f"{tmpdir}/tips_skew"
    days, times = _skewed_days_times()
    df = _tips_frame(spark, days, times, seed=5)
    delta_writer.write(spark, df, table_path, mode="overwrite",
                       partition_by=["day", "time"])
    analyzer = DeltaAnalyzer(environment="python", spark=spark)
    metrics = analyzer.analyze(table_path=table_path)

    assert "skew_metrics" in metrics.__dict__
    for key in ("partition_columns", "skewness_max", "skewness_average",
                "is_skewed", "records_per_partition_dict"):
        assert key in metrics.skew_metrics

    assert metrics.skew_metrics["partition_columns"] == ["day", "time"]
    assert metrics.skewness_max == metrics.skew_metrics["skewness_max"]
    assert metrics.skewness_average == metrics.skew_metrics["skewness_average"]
    assert metrics.is_skewed == metrics.skew_metrics["is_skewed"]
    assert metrics.partition_skewness == metrics.skew_metrics["skewness_max"]

    records_per_partition = metrics.skew_metrics["records_per_partition_dict"]
    assert len(records_per_partition) > 0
    max_partition = max(records_per_partition.items(), key=lambda x: x[1])
    assert max_partition[1] >= 70
    assert "Mon" in str(max_partition[0])
    shutil.rmtree(tmpdir)
