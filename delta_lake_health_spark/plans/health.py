"""Health-metric queries over the testdata tables (SURVEY §2.1 D5-D7).

These expose the skewness operators as driver-checkable queries with DuckDB
oracles: partition skewness of ``orders`` by order month and of ``lineitem``
by return flag, plus the records-per-partition breakdown. The full
Delta-table analyzer (log reconstruction, orphan files, maintenance) lives
in ``operators/health.py`` + ``sources/delta_log.py`` and is pytest-driven
— it needs a Delta table on disk, not a plain parquet input.

Reference parity: skew formulas from
src/delta_lake_health/health_analyzers/delta_python_analyzer.py:68-73.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from delta_lake_health_spark.operators.skew import records_per_partition, skewness_agg
from delta_lake_health_spark.sources.catalog import load

QUERIES: dict = {}
ORACLE: dict = {}


def query(name: str, sql: str | None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE[name] = sql
        return fn

    return deco


def _skew_sql(counts_subquery: str) -> str:
    return f"""
    WITH counts AS ({counts_subquery}),
    m AS (SELECT AVG(cnt) AS mean_cnt FROM counts)
    SELECT ROUND(CASE WHEN COUNT(*) <= 1 OR MAX(cnt) = 0 THEN 0.0
                 ELSE (MAX(cnt) - MIN(cnt)) / CAST(MAX(cnt) AS DOUBLE) END, 6)
             AS skewness_max,
           ROUND(CASE WHEN COUNT(*) <= 1 OR MAX(mean_cnt) = 0 THEN 0.0
                 ELSE AVG(ABS(cnt - mean_cnt)) / MAX(mean_cnt) END, 6)
             AS skewness_average,
           COUNT(*) AS n_partitions
    FROM counts CROSS JOIN m
    """


# --------------------------------------------------------------------------
# D5/D6 — skewness of orders by order month (both methods, one row).
@query(
    "skew_orders_by_month",
    _skew_sql(
        "SELECT STRFTIME(DATE_TRUNC('month', o_orderdate), '%Y-%m') AS pk, "
        "COUNT(*) AS cnt FROM orders GROUP BY 1"
    ),
)
def skew_orders_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").withColumn(
        "order_month", F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM")
    )
    return skewness_agg(records_per_partition(orders, ["order_month"]))


# --------------------------------------------------------------------------
# D5/D6 — skewness of lineitem by return flag (a genuinely skewed key).
@query(
    "skew_lineitem_returnflag",
    _skew_sql("SELECT l_returnflag AS pk, COUNT(*) AS cnt FROM lineitem GROUP BY 1"),
)
def skew_lineitem_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return skewness_agg(records_per_partition(li, ["l_returnflag"]))


# --------------------------------------------------------------------------
# D7 — records-per-partition breakdown (the dict, as a DataFrame).
@query(
    "records_per_partition_orders",
    """
    SELECT o_orderstatus AS partition_key, COUNT(*) AS cnt
    FROM orders GROUP BY 1 ORDER BY partition_key
    """,
)
def records_per_partition_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return records_per_partition(orders, ["o_orderstatus"]).orderBy("partition_key")


# --------------------------------------------------------------------------
# D5/D6 multi-column variant — composite partition key (status, priority),
# rendered like the reference's str(tuple) keys.
@query(
    "skew_orders_status_priority",
    _skew_sql(
        "SELECT o_orderstatus || '|' || o_orderpriority AS pk, COUNT(*) AS cnt "
        "FROM orders GROUP BY 1"
    ),
)
def skew_orders_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").withColumn(
        "status_priority", F.concat_ws("|", "o_orderstatus", "o_orderpriority")
    )
    return skewness_agg(records_per_partition(orders, ["status_priority"]))
