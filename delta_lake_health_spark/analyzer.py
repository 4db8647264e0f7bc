"""Drop-in compatibility surface for the reference's analyzer API.

The reference exposes a ``DeltaAnalyzer`` factory with ``analyze()`` /
``analyze_with_health_result()`` / ``create_health_result()`` and a
``HealthResult`` model (src/delta_lake_health/health_analyzers/
delta_analyzer.py:13-112, base_analyzer.py:138-143). This module gives a
reference user the same entry points over the Spark-native engine:

    from delta_lake_health_spark.analyzer import DeltaAnalyzer, Environment
    metrics = DeltaAnalyzer(environment=Environment.PYTHON).analyze(
        table_path="/path/to/table")
    metrics.print_results()

Differences, deliberate:
- both environments run the single Spark implementation (the reference
  switches between a delta-rs backend and a Databricks-Spark backend;
  here Spark IS the engine, local or cluster). ``environment`` is
  accepted and validated for API parity; when no session is passed one
  is created lazily.
- ``DeltaAnalyzerMetrics`` is an alias of :class:`HealthMetrics` (plain
  dataclass, no pydantic dependency) with the same field names, plus
  ``calculate_health_score()`` / ``print_results()`` methods.
- ``table_name`` resolves through our file-backed name catalog
  (:mod:`delta_lake_health_spark.sources.table_catalog`) — the
  ``forName`` half of delta_spark_analyzer.py:18-25 without a Hive
  metastore; unregistered names raise.
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import Enum

from delta_lake_health_spark.operators.health import (
    HealthAnalyzer,
    HealthMetrics,
    HealthStatus,
)

# Reference name for the metrics model (base_analyzer.py:17).
DeltaAnalyzerMetrics = HealthMetrics


class Environment(str, Enum):
    PYTHON = "python"
    DATABRICKS = "databricks"


@dataclass
class HealthResult:
    """Mirror of base_analyzer.py:140-143 (``HealthResult``)."""

    health_metric: int
    health_status: HealthStatus
    metrics: HealthMetrics | None = None


class DeltaAnalyzer:
    """Factory facade with the reference's signatures
    (delta_analyzer.py:13-112)."""

    def __init__(self, environment: str | Environment = "python", spark=None):
        if isinstance(environment, str):
            self.environment = Environment(environment.lower())
        else:
            self.environment = environment
        self.spark = spark
        # last analysis, under both the BaseAnalyzer attribute name
        # (base_analyzer.py:163 ``health_result``) and the ``result``
        # name the reference's file_distribution.py:60 probes for
        self.health_result: HealthResult | None = None
        self.result: HealthResult | None = None

    def _session(self):
        if self.spark is None:
            from delta_lake_health_spark.session import get_spark

            self.spark = get_spark("delta-analyzer")
        return self.spark

    def create_health_result(self, metrics: HealthMetrics) -> HealthResult:
        metrics.calculate_health_score()
        return HealthResult(
            health_metric=int(metrics.health_score or 0),
            health_status=metrics.health_status or HealthStatus.UNKNOWN,
            metrics=metrics,
        )

    def analyze(
        self,
        table_name: str | None = None,
        table_path: str | None = None,
        skew_threshold: float = 0.1,
        vacuum_size_ratio_threshold: float = 0.7,
        orphan_file_ratio_threshold: float = 0.8,
        small_file_size_mb: float = 10.0,
        small_file_ratio_threshold: float = 0.3,
    ) -> HealthMetrics:
        if table_name is not None and table_path is not None:
            raise ValueError("pass either table_name or table_path, not both")
        if table_name is not None:
            from delta_lake_health_spark.sources.table_catalog import (
                resolve_table,
            )

            table_path = resolve_table(self._session(), table_name)
        if table_path is None:
            raise ValueError("table_name or table_path must be provided")
        metrics = HealthAnalyzer(self._session()).analyze_table(
            table_path,
            skew_threshold=skew_threshold,
            vacuum_size_ratio_threshold=vacuum_size_ratio_threshold,
            orphan_file_ratio_threshold=orphan_file_ratio_threshold,
            small_file_size_mb=small_file_size_mb,
            small_file_ratio_threshold=small_file_ratio_threshold,
        )
        metrics.calculate_health_score()
        return metrics

    def analyze_with_health_result(
        self,
        table_name: str | None = None,
        table_path: str | None = None,
        skew_threshold: float = 0.1,
        vacuum_size_ratio_threshold: float = 0.7,
        orphan_file_ratio_threshold: float = 0.8,
        small_file_size_mb: float = 10.0,
        small_file_ratio_threshold: float = 0.3,
    ) -> HealthResult:
        metrics = self.analyze(
            table_name=table_name,
            table_path=table_path,
            skew_threshold=skew_threshold,
            vacuum_size_ratio_threshold=vacuum_size_ratio_threshold,
            orphan_file_ratio_threshold=orphan_file_ratio_threshold,
            small_file_size_mb=small_file_size_mb,
            small_file_ratio_threshold=small_file_ratio_threshold,
        )
        self.health_result = self.result = self.create_health_result(metrics)
        return self.health_result


__all__ = [
    "DeltaAnalyzer",
    "DeltaAnalyzerMetrics",
    "Environment",
    "HealthResult",
    "HealthStatus",
]
