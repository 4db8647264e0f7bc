"""Historical-trends figure — parity with the reference's
``visualization/notebook/detailed_history_metrics.py:5-179``
(``visualize_historical_trends``): 2x2 grid of size growth, file
counts, efficiency metrics, and operation counts over time, with
secondary y axes. Accepts the reference's frame (a pandas DataFrame
with a ``date`` column), a Spark DataFrame (e.g.
``operators/report.py::historical_trends``, whose ``ts`` column is
used as the date), or a list of row dicts — optional columns are
skipped exactly as the reference skips all-NaN columns."""

from __future__ import annotations

from delta_lake_health_spark.visualization.figure import Figure, make_subplots

_MB = 1024.0 ** 2

# (column, trace name, line style, row, col, secondary_y, scale)
_PANELS = [
    ("table_size_bytes", "Table Size (MB)",
     {"color": "royalblue", "width": 3}, 1, 1, False, 1 / _MB),
    ("folder_size_bytes", "Folder Size (MB)",
     {"color": "red", "width": 3, "dash": "dot"}, 1, 1, False, 1 / _MB),
    ("record_count", "Record Count",
     {"color": "green", "width": 2}, 1, 1, True, 1),
    ("total_file_count", "Total Files",
     {"color": "blue", "width": 3}, 1, 2, False, 1),
    ("data_file_count", "Data Files",
     {"color": "purple", "width": 3}, 1, 2, False, 1),
    ("small_files_count", "Small Files",
     {"color": "orange", "width": 3}, 1, 2, False, 1),
    ("orphan_files_count", "Orphan Files",
     {"color": "red", "width": 3}, 1, 2, False, 1),
    ("file_size_efficiency", "File Size Efficiency",
     {"color": "teal", "width": 3}, 2, 1, False, 1),
    ("storage_efficiency", "Storage Efficiency",
     {"color": "darkorange", "width": 3}, 2, 1, False, 1),
    ("partition_skewness", "Partition Skewness",
     {"color": "brown", "width": 3}, 2, 1, True, 1),
    ("number_of_writes", "Writes",
     {"color": "blue", "width": 3}, 2, 2, False, 1),
    ("number_of_deletes", "Deletes",
     {"color": "red", "width": 3}, 2, 2, False, 1),
    ("number_of_optimizes", "Optimizes",
     {"color": "green", "width": 3}, 2, 2, False, 1),
]


def _as_rows(historical_df) -> list[dict]:
    if hasattr(historical_df, "toPandas"):  # Spark DataFrame
        return [row.asDict() for row in historical_df.collect()]
    if hasattr(historical_df, "to_dict"):  # pandas DataFrame
        return historical_df.to_dict("records")
    return [dict(r) for r in historical_df]


def visualize_historical_trends(historical_df) -> Figure:
    rows = _as_rows(historical_df)
    # datetimes render as ISO strings so the figure dict stays plain-JSON
    # serializable (plotly parses ISO date strings on the axis natively)
    dates = [
        d.isoformat(sep=" ") if hasattr(d, "isoformat") else d
        for d in (r.get("date", r.get("ts")) for r in rows)
    ]

    fig = make_subplots(
        rows=2, cols=2,
        subplot_titles=("Size Growth Over Time", "File Counts Over Time",
                        "Efficiency Metrics Over Time", "Operations Over Time"),
        specs=[[{"secondary_y": True}, {"secondary_y": False}],
               [{"secondary_y": True}, {"secondary_y": False}]],
    )

    for column, name, line, row, col, secondary, scale in _PANELS:
        values = [r.get(column) for r in rows]
        if all(v is None for v in values):
            continue
        fig.add_trace({
            "type": "scatter",
            "x": dates,
            "y": [None if v is None else v * scale for v in values],
            "name": name,
            "line": line,
        }, row=row, col=col, secondary_y=secondary)

    for r in (1, 2):
        for c in (1, 2):
            fig.update_xaxes(row=r, col=c, title_text="Date")
    fig.update_yaxes(row=1, col=1, title_text="Size (MB)")
    fig.update_yaxes(row=1, col=1, secondary_y=True, title_text="Record Count")
    fig.update_yaxes(row=1, col=2, title_text="File Count")
    fig.update_yaxes(row=2, col=1, title_text="Efficiency")
    fig.update_yaxes(row=2, col=1, secondary_y=True, title_text="Skewness")
    fig.update_yaxes(row=2, col=2, title_text="Operation Count")

    fig.update_layout(
        title_text="Historical Trends of Delta Table Health Metrics",
        height=800, width=1200,
        legend={"orientation": "h", "yanchor": "bottom", "y": 1.02,
                "xanchor": "right", "x": 1},
    )
    return fig
