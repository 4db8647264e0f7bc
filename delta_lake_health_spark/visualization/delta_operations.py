"""Operation-history figure — parity with the reference's
``visualization/notebook/delta_operations.py:8-177``
(``visualize_delta_operations``): per-operation scatter timeline with
rich hover text plus files-added/removed bars per version. The
reference walks ``DeltaTable(path).history()``; here the same rows come
from our ``DeltaLog.history()`` (one small driver collect — the history
is one row per commit, bounded by version count, not data size)."""

from __future__ import annotations

from delta_lake_health_spark.sources.delta_log import DeltaLog
from delta_lake_health_spark.visualization.figure import Figure, make_subplots

_OP_COLOR = {
    "WRITE": "blue",
    "MERGE": "purple",
    "DELETE": "red",
    "OPTIMIZE": "green",
    "VACUUM": "orange",
    "CREATE TABLE AS SELECT": "teal",
    "CREATE TABLE": "teal",
    "RESTORE": "brown",
}

_HOVER_PARAMS = ("predicate", "partitionBy", "dataChange", "description")


def _fmt_metric(key: str, value) -> str:
    try:
        num = float(value)
    except (TypeError, ValueError):
        return str(value)
    if "time" in key.lower() and num > 1000:
        return f"{num / 1000:.2f} seconds"
    if ("size" in key.lower() or "bytes" in key.lower()) and num > 1024:
        for cut, unit in ((1024 ** 3, "GB"), (1024 ** 2, "MB"), (1024, "KB")):
            if num > cut:
                return f"{num / cut:.2f} {unit}"
    return str(value)


def _hover_text(version, operation, op_metrics, op_params) -> str:
    parts = [f"Version: {version}<br>Operation: {operation}<br>"]
    if op_metrics:
        parts.append("<br><b>Operation Metrics:</b><br>")
        for k in sorted(op_metrics):
            label = k.replace("_", " ").title()
            parts.append(f"{label}: {_fmt_metric(k, op_metrics[k])}<br>")
    keep = {k: v for k, v in (op_params or {}).items() if k in _HOVER_PARAMS}
    if keep:
        parts.append("<br><b>Parameters:</b><br>")
        for k in sorted(keep):
            label = k.replace("_", " ").title()
            v = str(keep[k])
            if len(v) > 50:
                v = v[:47] + "..."
            parts.append(f"{label}: {v}<br>")
    return "".join(parts)


def _metric(m: dict, *keys: str) -> int:
    for k in keys:
        if m and m.get(k) is not None:
            try:
                return int(float(m[k]))
            except (TypeError, ValueError):
                continue
    return 0


def visualize_delta_operations(spark, table_path: str) -> Figure:
    history = (
        DeltaLog(spark, table_path).history().orderBy("version").collect()
    )
    ops = []
    for row in history:
        metrics = dict(row.operationMetrics or {})
        params = dict(row.operationParameters or {})
        ops.append({
            "operation": row.operation or "",
            "timestamp": row.timestamp,
            "version": row.version,
            "hover_text": _hover_text(row.version, row.operation,
                                      metrics, params),
            "num_files_added": _metric(metrics, "numFiles", "numAddedFiles",
                                       "num_added_files"),
            "num_files_removed": _metric(metrics, "numRemovedFiles",
                                         "num_removed_files"),
        })

    if not ops:
        fig = Figure()
        fig.update_layout(title="No operation history available")
        fig.add_annotation(text="No Delta table operations found in history",
                           showarrow=False, xref="paper", yref="paper",
                           x=0.5, y=0.5)
        return fig

    fig = make_subplots(
        rows=2, cols=1,
        subplot_titles=("Operation Timeline", "File and Row Changes"),
        specs=[[{"type": "scatter"}], [{"type": "bar"}]],
        row_heights=[0.6, 0.4],
        vertical_spacing=0.15,
    )

    seen = []
    for op in ops:
        if op["operation"] not in seen:
            seen.append(op["operation"])
    for op_type in seen:
        group = [o for o in ops if o["operation"] == op_type]
        fig.add_trace({
            "type": "scatter",
            "x": [o["timestamp"] for o in group],
            "y": [o["version"] for o in group],
            "mode": "markers",
            "name": op_type,
            "marker": {
                "size": [
                    max(10, min(50, (o["num_files_added"]
                                     + o["num_files_removed"] + 5) * 2))
                    for o in group
                ],
                "color": _OP_COLOR.get(op_type, "gray"),
                "line": {"width": 1, "color": "darkgray"},
            },
            "text": [o["hover_text"] for o in group],
            "hoverinfo": "text",
            "hoverlabel": {"bgcolor": "white", "font_size": 12,
                           "font_family": "Arial"},
        }, row=1, col=1)

    fig.add_trace({
        "type": "bar",
        "x": [o["version"] for o in ops],
        "y": [o["num_files_added"] for o in ops],
        "name": "Files Added",
        "marker_color": "rgba(0, 128, 0, 0.7)",
    }, row=2, col=1)
    fig.add_trace({
        "type": "bar",
        "x": [o["version"] for o in ops],
        "y": [o["num_files_removed"] for o in ops],
        "name": "Files Removed",
        "marker_color": "rgba(255, 0, 0, 0.7)",
    }, row=2, col=1)

    fig.update_layout(
        title="Delta Table Operation History",
        height=800, width=1000, hovermode="closest",
        legend={"orientation": "h", "yanchor": "bottom", "y": 1.02,
                "xanchor": "right", "x": 1},
    )
    fig.update_xaxes(row=1, col=1, title_text="Timestamp")
    fig.update_yaxes(row=1, col=1, title_text="Version")
    fig.update_xaxes(row=2, col=1, title_text="Version")
    fig.update_yaxes(row=2, col=1, title_text="Count")
    return fig
