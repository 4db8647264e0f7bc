"""Health dashboard figure — parity with the reference's
``visualization/notebook/health_dashboard.py:5-142``
(``create_health_dashboard``): a 2x2 grid of health-score gauge,
key-metric annotations, recommended-actions table, and operation-count
bars, built from a :class:`HealthMetrics` (ours or the compat shim's)."""

from __future__ import annotations

from delta_lake_health_spark.operators.health import HealthMetrics, HealthStatus
from delta_lake_health_spark.visualization.figure import Figure, make_subplots

_STATUS_COLOR = {
    HealthStatus.HEALTHY: "green",
    HealthStatus.UNHEALTHY: "orange",
    HealthStatus.VERY_UNHEALTHY: "red",
}

_GAUGE_STEPS = [
    {"range": [0, 50], "color": "rgba(255, 0, 0, 0.2)"},
    {"range": [50, 80], "color": "rgba(255, 165, 0, 0.2)"},
    {"range": [80, 100], "color": "rgba(0, 128, 0, 0.2)"},
]


def recommended_actions(metrics: HealthMetrics) -> list[list[str]]:
    """The reference's recommendation rules (health_dashboard.py:81-93),
    exposed standalone so callers can use them without the figure."""
    recs = []
    if metrics.needs_vacuum or metrics.files_needing_vacuum > 0:
        recs.append(["RUN VACUUM",
                     "Vacuum the table to remove orphan files and reclaim "
                     "storage space"])
    if metrics.needs_optimize or metrics.small_files_count > 10:
        recs.append(["RUN OPTIMIZE",
                     "Optimize the table to combine small files and improve "
                     "query performance"])
    if metrics.is_skewed:
        recs.append(["REBALANCE PARTITIONS",
                     "Address data skew to ensure better query performance"])
    if metrics.has_orphan_files:
        recs.append(["CLEAN ORPHAN FILES",
                     "Remove orphan files to reclaim storage space"])
    return recs


def create_health_dashboard(metrics: HealthMetrics) -> Figure:
    score = metrics.health_score
    status = metrics.health_status
    if score is None or status is None:
        score, status = metrics.calculate_health_score()

    fig = make_subplots(
        rows=2, cols=2,
        specs=[[{"type": "indicator"}, {"type": "indicator"}],
               [{"type": "table"}, {"type": "bar"}]],
        subplot_titles=("", "Table Metrics",
                        "Recommended Actions", "Operation Counts"),
        column_widths=[0.5, 0.5],
        row_heights=[0.5, 0.5],
    )

    fig.add_trace({
        "type": "indicator",
        "mode": "gauge+number",
        "value": score,
        "title": {"text": f"Health Score: {status.value}"},
        "gauge": {
            "axis": {"range": [0, 100]},
            "bar": {"color": _STATUS_COLOR.get(status, "gray")},
            "steps": _GAUGE_STEPS,
            "threshold": {"line": {"color": "black", "width": 2},
                          "thickness": 0.75, "value": score},
        },
    }, row=1, col=1)

    mb = 1024.0 ** 2
    labeled = [
        ("Record Count", metrics.record_count),
        ("Total Files", metrics.total_file_count),
        ("Data Files", metrics.data_file_count),
        ("Table Size (MB)",
         None if metrics.table_size_bytes is None
         else metrics.table_size_bytes / mb),
        ("Folder Size (MB)",
         None if metrics.folder_size_bytes is None
         else metrics.folder_size_bytes / mb),
    ]
    shown = [(lab, v) for lab, v in labeled if v is not None]
    for i, (label, value) in enumerate(shown):
        if isinstance(value, float):
            text = f"{label}: <b>{value:,.2f}</b>"
        elif isinstance(value, int):
            text = f"{label}: <b>{value:,}</b>"
        else:
            text = f"{label}: <b>{value}</b>"
        fig.add_annotation(
            x=0.75, y=0.95 - i * 0.08, xref="paper", yref="paper",
            text=text, showarrow=False, font={"size": 11}, align="left",
        )

    recs = recommended_actions(metrics)
    if recs:
        fig.add_trace({
            "type": "table",
            "header": {"values": ["Action", "Description"],
                       "fill_color": "royalblue", "align": "left",
                       "font": {"color": "white", "size": 12}},
            "cells": {"values": [[r[0] for r in recs],
                                 [r[1] for r in recs]],
                      "fill_color": "lavender", "align": "left"},
        }, row=2, col=1)
    else:
        fig.add_annotation(
            x=0.25, y=0.25, xref="paper", yref="paper",
            text="No maintenance actions required", showarrow=False,
            font={"size": 14, "color": "green"}, align="center",
        )

    counts = [metrics.number_of_writes, metrics.number_of_deletes,
              metrics.number_of_optimizes]
    fig.add_trace({
        "type": "bar",
        "x": ["Writes", "Deletes", "Optimizes"],
        "y": counts,
        "marker_color": ["royalblue", "crimson", "green"],
        "text": counts,
        "textposition": "auto",
        "hovertemplate": "<b>%{x}</b><br>Count: %{y}<extra></extra>",
    }, row=2, col=2)

    fig.update_layout(height=800, width=1000,
                      title_text="Delta Table Health Dashboard",
                      showlegend=False)
    return fig
