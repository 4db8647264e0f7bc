"""Visualization-layer parity tests vs the reference's
``visualization/notebook/*.py``: every figure builds as a plotly-schema
dict (``{"data", "layout"}``) with the reference's trace types, subplot
wiring, recommendation rules, and hover/annotation content."""

from __future__ import annotations

import json
import shutil
import tempfile

import pytest

from delta_lake_health_spark.analyzer import DeltaAnalyzer
from delta_lake_health_spark.operators.health import HealthMetrics, HealthStatus
from delta_lake_health_spark.sources import delta_writer
from delta_lake_health_spark.visualization import (
    analyze_file_distribution,
    create_health_dashboard,
    make_subplots,
    visualize_delta_operations,
    visualize_historical_trends,
    visualize_skew_analysis,
)
from tests.test_delta_health import _tips_df


@pytest.fixture(scope="module")
def viz_table(spark):
    tmp = tempfile.mkdtemp()
    path = f"{tmp}/viz_delta"
    delta_writer.write(spark, _tips_df(spark), path, mode="overwrite",
                       partition_by=["day"])
    delta_writer.write(spark, _tips_df(spark, 5, 5, 5, offset=200), path,
                       mode="append", partition_by=["day"])
    delta_writer.delete(spark, path, "total_bill > 40")
    yield path
    shutil.rmtree(tmp)


def _types(fig):
    return [t.get("type") for t in fig.data]


def test_make_subplots_grid_wiring():
    fig = make_subplots(
        rows=2, cols=2,
        specs=[[{"type": "indicator"}, {"secondary_y": True}],
               [{"type": "bar", "colspan": 2}, {}]],
        subplot_titles=("", "T2", "T3"),
    )
    # one cartesian cell at (1,2) -> xaxis/yaxis; colspan bar cell -> xaxis2
    assert "xaxis" in fig.layout and "xaxis2" in fig.layout
    assert "xaxis3" not in fig.layout
    # secondary y overlays the (1,2) primary
    sec = [k for k, v in fig.layout.items()
           if isinstance(v, dict) and v.get("overlaying") == "y"]
    assert sec == ["yaxis3"]
    # colspan cell spans the full width
    assert fig.layout["xaxis2"]["domain"][0] == 0.0
    assert fig.layout["xaxis2"]["domain"][1] == 1.0
    # row 1 sits above row 2 (plotly convention)
    assert fig.layout["yaxis"]["domain"][0] > fig.layout["yaxis2"]["domain"][1]
    # domain-typed cell got no axes, traces into it get a paper domain
    fig.add_trace({"type": "indicator", "value": 1}, row=1, col=1)
    assert "domain" in fig.data[0]
    # cartesian trace gets bound to its cell's axes
    fig.add_trace({"type": "scatter", "x": [1], "y": [1]}, row=1, col=2)
    assert fig.data[1]["xaxis"] == "x" and fig.data[1]["yaxis"] == "y"
    fig.add_trace({"type": "scatter", "x": [1], "y": [2]}, row=1, col=2,
                  secondary_y=True)
    assert fig.data[2]["yaxis"] == "y3"
    # titles appear as paper annotations
    texts = [a["text"] for a in fig.layout["annotations"]]
    assert texts == ["T2", "T3"]


def test_health_dashboard_structure_and_recommendations():
    m = HealthMetrics(
        record_count=1000, total_file_count=12, data_file_count=10,
        table_size_bytes=5 * 1024**2, folder_size_bytes=8 * 1024**2,
        needs_vacuum=True, files_needing_vacuum=2, needs_optimize=False,
        small_files_count=11, is_skewed=True, has_orphan_files=False,
        number_of_writes=7, number_of_deletes=2, number_of_optimizes=1,
        health_score=62.0, health_status=HealthStatus.UNHEALTHY,
    )
    fig = create_health_dashboard(m)
    assert _types(fig) == ["indicator", "table", "bar"]
    gauge = fig.data[0]
    assert gauge["value"] == 62.0
    assert gauge["gauge"]["bar"]["color"] == "orange"
    assert gauge["title"]["text"] == "Health Score: unhealthy"
    # needs_vacuum + small_files>10 + is_skewed => 3 recommendation rows
    actions = fig.data[1]["cells"]["values"][0]
    assert actions == ["RUN VACUUM", "RUN OPTIMIZE", "REBALANCE PARTITIONS"]
    bars = fig.data[2]
    assert bars["x"] == ["Writes", "Deletes", "Optimizes"]
    assert bars["y"] == [7, 2, 1]
    # metric annotations include the formatted record count
    texts = [a["text"] for a in fig.layout["annotations"]]
    assert any("Record Count: <b>1,000</b>" in t for t in texts)
    assert any("Table Size (MB): <b>5.00</b>" in t for t in texts)
    # round-trips through json
    json.loads(fig.to_json())


def test_health_dashboard_healthy_no_table():
    m = HealthMetrics(health_score=95.0, health_status=HealthStatus.HEALTHY)
    fig = create_health_dashboard(m)
    assert _types(fig) == ["indicator", "bar"]  # no recommendations table
    texts = [a["text"] for a in fig.layout.get("annotations", [])]
    assert "No maintenance actions required" in texts


def test_skew_analysis_structure():
    m = HealthMetrics(skew_metrics={
        "records_per_partition_dict": {f"p{i}": 100 - i for i in range(12)},
        "partition_columns": ["day"],
        "skewness_max": 0.45,
        "threshold": 0.1,
    })
    fig = visualize_skew_analysis(m)
    assert _types(fig) == ["bar", "pie", "indicator"]
    bar = fig.data[0]
    assert bar["x"][0] == "p0" and bar["y"][0] == 100  # ranked desc
    pie = fig.data[1]
    assert pie["labels"][-1] == "Others"  # >10 partitions folds the tail
    assert sum(pie["values"]) == sum(100 - i for i in range(12))
    gauge = fig.data[2]
    assert gauge["value"] == 0.45
    assert gauge["gauge"]["bar"]["color"] == "orange"
    assert "Partition Skew Analysis (day)" in fig.layout["title_text"]


def test_skew_analysis_empty():
    fig = visualize_skew_analysis(HealthMetrics())
    assert fig.data == []
    assert fig.layout["title"] == "No skew metrics available"


def test_delta_operations_figure(spark, viz_table):
    fig = visualize_delta_operations(spark, viz_table)
    types = _types(fig)
    # one scatter per distinct operation + 2 bar series
    assert types.count("bar") == 2
    scatter_names = {t["name"] for t in fig.data if t["type"] == "scatter"}
    assert {"WRITE", "DELETE"} <= scatter_names
    # hover text carries version/operation detail
    a_scatter = next(t for t in fig.data if t["type"] == "scatter")
    assert "Version:" in a_scatter["text"][0]
    # bars indexed by version, one entry per commit
    files_added = next(t for t in fig.data if t.get("name") == "Files Added")
    assert files_added["x"] == sorted(files_added["x"])
    assert len(files_added["x"]) >= 3  # write, append, delete


def test_file_distribution_figure(spark, viz_table):
    fig, files_df = analyze_file_distribution(spark, viz_table)
    assert _types(fig) == ["histogram", "bar"]
    assert files_df and all(r["size_mb"] > 0 for r in files_df)
    # sorted desc by size like the reference frame
    sizes = [r["size_mb"] for r in files_df]
    assert sizes == sorted(sizes, reverse=True)
    bar = fig.data[1]
    assert len(bar["x"]) == len(bar["y"]) > 0
    axis_titles = [v.get("title_text") for v in fig.layout.values()
                   if isinstance(v, dict)]
    assert any(t and t.startswith("Partition: day") for t in axis_titles)


def test_file_distribution_uses_analyzer_metrics(spark, viz_table):
    analyzer = DeltaAnalyzer(spark=spark)
    analyzer.analyze_with_health_result(table_path=viz_table)
    fig, _ = analyze_file_distribution(spark, viz_table, analyzer=analyzer)
    bar = fig.data[1]
    skew = analyzer.result.metrics.skew_metrics
    assert set(bar["x"]) <= {str(k) for k in
                             skew["records_per_partition_dict"]}


def test_historical_trends_from_report_frame(spark, viz_table):
    from delta_lake_health_spark.operators.report import historical_trends

    fig = visualize_historical_trends(historical_trends(spark, viz_table))
    names = [t["name"] for t in fig.data]
    assert {"Table Size (MB)", "Record Count", "Data Files"} <= set(names)
    # absent columns are skipped like the reference's all-NaN guard
    assert "Small Files" not in names
    # record count rides the secondary axis of (1,1)
    rc = next(t for t in fig.data if t["name"] == "Record Count")
    size = next(t for t in fig.data if t["name"] == "Table Size (MB)")
    assert rc["yaxis"] != size["yaxis"]
    assert fig.layout[f"yaxis{rc['yaxis'][1:]}"]["overlaying"] == size["yaxis"]


def test_historical_trends_accepts_row_dicts():
    rows = [
        {"date": "2024-01-01", "table_size_bytes": 1024**2,
         "number_of_writes": 1},
        {"date": "2024-01-02", "table_size_bytes": 3 * 1024**2,
         "number_of_writes": 2},
    ]
    fig = visualize_historical_trends(rows)
    size = next(t for t in fig.data if t["name"] == "Table Size (MB)")
    assert size["y"] == [1.0, 3.0]
    writes = next(t for t in fig.data if t["name"] == "Writes")
    assert writes["x"] == ["2024-01-01", "2024-01-02"]
