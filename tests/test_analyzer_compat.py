"""Reference-API compat shim tests — mirrors the reference's
test/test_delta_analyzer_load.py (analyze by path returns metrics) and
exercises print_results / HealthResult."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from delta_lake_health_spark.analyzer import (
    DeltaAnalyzer,
    DeltaAnalyzerMetrics,
    Environment,
    HealthResult,
    HealthStatus,
)
from delta_lake_health_spark.sources import delta_writer
from tests.test_delta_health import _tips_df


@pytest.fixture(scope="module")
def compat_table(spark):
    tmp = tempfile.mkdtemp()
    path = f"{tmp}/complex_delta"
    delta_writer.write(spark, _tips_df(spark), path, mode="overwrite",
                       partition_by=["day"])
    delta_writer.write(spark, _tips_df(spark, 5, 5, 5, offset=200), path,
                       mode="append", partition_by=["day"])
    delta_writer.delete(spark, path, "total_bill > 40")
    yield path
    shutil.rmtree(tmp)


def test_analyze_by_path(spark, compat_table):
    analyzer = DeltaAnalyzer(environment=Environment.PYTHON, spark=spark)
    metrics = analyzer.analyze(table_path=compat_table)
    assert isinstance(metrics, DeltaAnalyzerMetrics)
    assert "complex_delta" in metrics.table_path
    assert metrics.version_count > 0
    assert metrics.health_score is not None
    # environment accepted as plain string too, same engine underneath
    m2 = DeltaAnalyzer(environment="databricks", spark=spark).analyze(
        table_path=compat_table
    )
    assert m2.record_count == metrics.record_count


def test_analyze_with_health_result(spark, compat_table):
    res = DeltaAnalyzer(spark=spark).analyze_with_health_result(
        table_path=compat_table
    )
    assert isinstance(res, HealthResult)
    assert isinstance(res.health_status, HealthStatus)
    assert res.health_metric == int(res.metrics.health_score)
    assert res.metrics.table_path.endswith("complex_delta")


def test_analyze_requires_path(spark):
    with pytest.raises(ValueError):
        DeltaAnalyzer(spark=spark).analyze()
    with pytest.raises(KeyError, match="unknown table name"):
        DeltaAnalyzer(spark=spark).analyze(table_name="never_registered")


def test_analyze_by_table_name(spark, compat_table):
    """forName parity: a registered name analyzes identically to its
    path, and the name becomes spark.sql-queryable."""
    from delta_lake_health_spark.sources.table_catalog import (
        list_tables,
        load_table,
        register_table,
    )

    register_table(spark, "compat_tips", compat_table)
    by_name = DeltaAnalyzer(spark=spark).analyze(table_name="compat_tips")
    by_path = DeltaAnalyzer(spark=spark).analyze(table_path=compat_table)
    assert by_name.record_count == by_path.record_count
    assert by_name.version_count == by_path.version_count
    assert by_name.table_path == by_path.table_path
    assert load_table(spark, "compat_tips").count() == by_name.record_count
    assert spark.sql("SELECT COUNT(*) AS n FROM compat_tips").collect()[0].n \
        == by_name.record_count
    assert "compat_tips" in list_tables(spark)
    with pytest.raises(ValueError, match="pass either"):
        DeltaAnalyzer(spark=spark).analyze(
            table_name="compat_tips", table_path=compat_table
        )


def test_print_results_matches_metrics(spark, compat_table, capsys):
    """Every number in the formatted report comes from the metrics object
    (reference base_analyzer.py:103-135 format)."""
    metrics = DeltaAnalyzer(spark=spark).analyze(table_path=compat_table)
    metrics.print_results()
    out = capsys.readouterr().out
    assert "Delta Table Analysis Results:" in out
    assert f"Health Score: {metrics.health_score:.1f}/100 ({metrics.health_status.value})" in out
    assert f"Version Count: {metrics.version_count}" in out
    assert f"Record Count: {metrics.record_count:,}" in out
    assert (
        f"Operations: {metrics.number_of_writes} writes, "
        f"{metrics.number_of_deletes} deletes, "
        f"{metrics.number_of_optimizes} optimizes" in out
    )
    assert f"Data Files: {metrics.data_file_count} files" in out
    assert f"Needs Vacuum: {metrics.needs_vacuum}" in out
    # partitioned table -> skew section present
    assert "Partition Skew Metrics:" in out
    assert f"Partition Count: {metrics.partition_count}" in out
