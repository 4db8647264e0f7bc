"""Name → path catalog for our Delta tables — the ``forName`` half of the
reference's loaders (delta_spark_analyzer.py:18-25 resolves
``table_name`` through the metastore; delta_analyzer.py's python
environment only supports paths).

There is no Hive metastore in scope, so this is a deliberately small
file-backed registry: a JSON map under the Spark SQL warehouse directory
(one tiny driver-side read per resolve — the same cost class as a
metastore RPC). ``register_table`` also publishes a temp view of the
table's snapshot so the name is immediately queryable via
``spark.sql``.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

CATALOG_FILE = "_delta_name_catalog.json"


def _catalog_path(spark: SparkSession) -> str:
    warehouse = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    return os.path.join(warehouse, CATALOG_FILE)


def _read_catalog(spark: SparkSession) -> dict[str, str]:
    path = _catalog_path(spark)
    if not os.path.isfile(path):
        return {}
    with open(path) as f:
        return json.load(f)


def register_table(
    spark: SparkSession, name: str, table_path: str, replace: bool = True
) -> None:
    """Bind ``name`` to a Delta table path and publish a temp view of its
    current snapshot. ``replace=False`` raises if the name is taken."""
    from delta_lake_health_spark.sources.delta_log import DeltaLog

    table_path = os.path.abspath(table_path)
    DeltaLog(spark, table_path)  # validates it IS a Delta table
    cat = _read_catalog(spark)
    if not replace and name in cat and cat[name] != table_path:
        raise ValueError(f"table name {name!r} already bound to {cat[name]}")
    cat[name] = table_path
    path = _catalog_path(spark)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(cat, f, indent=1, sort_keys=True)
    os.replace(tmp, path)
    DeltaLog(spark, table_path).snapshot().createOrReplaceTempView(name)


def resolve_table(spark: SparkSession, name: str) -> str:
    """Path bound to ``name``; KeyError if unregistered."""
    cat = _read_catalog(spark)
    if name not in cat:
        raise KeyError(
            f"unknown table name {name!r}; register it with "
            f"register_table(spark, name, path)"
        )
    return cat[name]


def load_table(spark: SparkSession, name: str) -> DataFrame:
    """Snapshot of the table registered under ``name`` (forName)."""
    from delta_lake_health_spark.sources.delta_log import DeltaLog

    return DeltaLog(spark, resolve_table(spark, name)).snapshot()


def list_tables(spark: SparkSession) -> dict[str, str]:
    return dict(_read_catalog(spark))
