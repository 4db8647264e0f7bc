"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 together with its DuckDB oracle SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF_SMOKE = "/root/testdata/sf0.001"


def _registry() -> tuple[dict, dict]:
    """Collect QUERIES/ORACLE from every plan module (import-gated so a
    broken optional module never takes down the whole registry)."""
    import importlib

    queries: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    oracle: dict[str, str] = {}
    for mod_name in (
        "delta_lake_health_spark.plans.analytics",
        "delta_lake_health_spark.plans.events",
        "delta_lake_health_spark.plans.health",
        "delta_lake_health_spark.plans.dedup",
        "delta_lake_health_spark.plans.text",
        "delta_lake_health_spark.plans.similarity",
        "delta_lake_health_spark.plans.sketch",
        "delta_lake_health_spark.plans.media",
    ):
        try:
            mod = importlib.import_module(mod_name)
        except ImportError:
            continue
        queries.update(getattr(mod, "QUERIES", {}))
        oracle.update(getattr(mod, "ORACLE", {}))
    return queries, oracle


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (Q1 pricing summary) on sf0.001."""
    from delta_lake_health_spark.plans.analytics import q1_pricing_summary

    return q1_pricing_summary(spark, SF_SMOKE)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registry()[0]


def oracle_sql() -> dict[str, str]:
    return _registry()[1]
