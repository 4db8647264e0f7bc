"""Partition-skew figure — parity with the reference's
``visualization/notebook/skew_analysis.py:6-172``
(``visualize_skew_analysis``): top-partition bar chart with an average
line, partition-share donut, skewness gauge, and summary annotations,
from ``metrics.skew_metrics`` (``records_per_partition_dict`` /
``partition_columns`` / ``skewness_max`` — same dict shape as the
reference's analyzer)."""

from __future__ import annotations

import math

from delta_lake_health_spark.visualization.figure import Figure, make_subplots

# plotly.express qualitative Pastel — fixed public palette the reference
# passes to its donut (skew_analysis.py:102)
_PASTEL = [
    "rgb(102, 197, 204)", "rgb(246, 207, 113)", "rgb(248, 156, 116)",
    "rgb(220, 176, 242)", "rgb(135, 197, 95)", "rgb(158, 185, 243)",
    "rgb(254, 136, 177)", "rgb(201, 219, 116)", "rgb(139, 224, 164)",
    "rgb(180, 151, 231)", "rgb(179, 179, 179)",
]


def _empty(title: str, text: str) -> Figure:
    fig = Figure()
    fig.update_layout(title=title)
    fig.add_annotation(text=text, showarrow=False,
                       xref="paper", yref="paper", x=0.5, y=0.5)
    return fig


def visualize_skew_analysis(metrics) -> Figure:
    skew = getattr(metrics, "skew_metrics", None)
    if not skew:
        return _empty("No skew metrics available",
                      "No partition skew data available for analysis")
    per_part: dict = skew.get("records_per_partition_dict", {})
    if not per_part:
        return _empty("No partition count data available",
                      "Partition counts are not available")

    partition_cols = skew.get("partition_columns", ["partition"])
    ranked = sorted(per_part.items(), key=lambda kv: (-kv[1], str(kv[0])))

    fig = make_subplots(
        rows=2, cols=2,
        specs=[[{"type": "bar"}, {"type": "pie"}],
               [{"type": "indicator", "colspan": 2}, {}]],
        subplot_titles=("Partition Record Distribution",
                        "Partition Size Breakdown", ""),
        column_widths=[0.6, 0.4],
        row_heights=[0.7, 0.3],
    )

    top_n = min(15, len(ranked))
    top = ranked[:top_n]
    fig.add_trace({
        "type": "bar",
        "x": [str(k) for k, _ in top],
        "y": [v for _, v in top],
        "marker_color": "royalblue",
        "text": [v for _, v in top],
        "textposition": "auto",
        "hovertemplate": "<b>%{x}</b><br>Records: %{y}<extra></extra>",
    }, row=1, col=1)

    avg = sum(per_part.values()) / len(per_part)
    fig.add_shape(
        row=1, col=1, type="line",
        x0=-0.5, y0=avg, x1=top_n - 0.5, y1=avg,
        line={"color": "red", "width": 2, "dash": "dash"},
    )
    fig.add_annotation(
        row=1, col=1, x=top_n / 2, y=avg, text=f"Average: {avg:.1f}",
        showarrow=False, yshift=10, font={"color": "red"},
    )

    if len(ranked) > 10:
        pie = ranked[:10] + [
            ("Others", sum(v for _, v in ranked[10:]))
        ]
    else:
        pie = ranked
    fig.add_trace({
        "type": "pie",
        "labels": [str(k) for k, _ in pie],
        "values": [v for _, v in pie],
        "hole": 0.4,
        "textinfo": "percent+label",
        "insidetextorientation": "radial",
        "marker": {"colors": _PASTEL},
    }, row=1, col=2)

    skewness_max = skew.get("skewness_max", 0)
    if skewness_max < 0.3:
        gauge_color = "green"
    elif skewness_max < 0.7:
        gauge_color = "orange"
    else:
        gauge_color = "red"
    fig.add_trace({
        "type": "indicator",
        "mode": "gauge+number+delta",
        "value": skewness_max,
        "title": {"text": "Partition Skewness"},
        "gauge": {
            "axis": {"range": [0, 1]},
            "bar": {"color": gauge_color},
            "steps": [
                {"range": [0, 0.3], "color": "rgba(0, 250, 0, 0.2)"},
                {"range": [0.3, 0.7], "color": "rgba(255, 165, 0, 0.2)"},
                {"range": [0.7, 1], "color": "rgba(255, 0, 0, 0.2)"},
            ],
            "threshold": {"line": {"color": "black", "width": 2},
                          "thickness": 0.75, "value": skewness_max},
        },
        "delta": {"reference": skew.get("threshold", 0.1),
                  "increasing": {"color": "red"},
                  "decreasing": {"color": "green"}},
    }, row=2, col=1)

    values = list(per_part.values())
    mean = sum(values) / len(values)
    stddev = math.sqrt(sum((v - mean) ** 2 for v in values) / len(values))
    for i, (label, value) in enumerate([
        ("Max Records", max(values)),
        ("Min Records", min(values)),
        ("StdDev", stddev),
        ("Total Partitions", len(values)),
    ]):
        fig.add_annotation(
            x=0.85, y=0.15 - i * 0.03, xref="paper", yref="paper",
            text=f"{label}: <b>{value:,.1f}</b>", showarrow=False,
            font={"size": 12}, align="left",
        )

    fig.update_layout(
        title_text=f"Partition Skew Analysis ({', '.join(partition_cols)})",
        height=700, width=1000, showlegend=False,
    )
    fig.update_xaxes(row=1, col=1, title_text="Partition", tickangle=45)
    fig.update_yaxes(row=1, col=1, title_text="Record Count")
    return fig
