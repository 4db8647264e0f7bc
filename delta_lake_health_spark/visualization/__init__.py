"""Notebook visualization layer — reference parity for
``src/delta_lake_health/visualization/notebook/*.py``.

The reference renders Plotly figures; this container has no plotly, so
the figures here are built as plotly-schema dicts (``{"data": [...],
"layout": {...}}``, the exact shape of ``plotly.graph_objects.Figure
.to_dict()``) by a small dependency-free engine in ``figure.py``. When
plotly *is* installed, every figure converts losslessly via
``Figure.to_plotly()`` — so a notebook user of the reference can call
the same five functions and get the same charts.

Data wrangling is Spark-side (``operators/report.py`` tidy frames and
the ``DeltaLog`` reader); only the final small frame is collected into
the figure, as the reference does with its pandas DataFrames.
"""

from delta_lake_health_spark.visualization.delta_operations import (
    visualize_delta_operations,
)
from delta_lake_health_spark.visualization.detailed_history_metrics import (
    visualize_historical_trends,
)
from delta_lake_health_spark.visualization.figure import Figure, make_subplots
from delta_lake_health_spark.visualization.file_distribution import (
    analyze_file_distribution,
)
from delta_lake_health_spark.visualization.health_dashboard import (
    create_health_dashboard,
)
from delta_lake_health_spark.visualization.skew_analysis import (
    visualize_skew_analysis,
)

__all__ = [
    "Figure",
    "make_subplots",
    "create_health_dashboard",
    "visualize_skew_analysis",
    "visualize_delta_operations",
    "analyze_file_distribution",
    "visualize_historical_trends",
]
