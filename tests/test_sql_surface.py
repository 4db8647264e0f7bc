"""The engine's tables register as temp views, so the whole oracle SQL
dialect (minus DuckDB-isms) is also runnable via spark.sql — prove it for
a representative query."""

from __future__ import annotations

from tests.conftest import SF_DIR


def test_register_all_and_sql(spark):
    from delta_lake_health_spark.plans.analytics import q1_pricing_summary
    from delta_lake_health_spark.sources.catalog import TABLES, register_all

    register_all(spark, SF_DIR)
    for t in TABLES:
        assert spark.catalog.tableExists(t)

    sql_rows = spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2) AS sum_qty,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= DATE '2000-12-01'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
        """
    ).collect()
    df_rows = q1_pricing_summary(spark, SF_DIR).collect()
    assert [(r.l_returnflag, r.l_linestatus, r.sum_qty, r.count_order) for r in sql_rows] == [
        (r.l_returnflag, r.l_linestatus, r.sum_qty, r.count_order) for r in df_rows
    ]


def test_events_view_has_converted_timestamp(spark):
    from delta_lake_health_spark.sources.catalog import register_all

    register_all(spark, SF_DIR)
    row = spark.sql("SELECT ts FROM events ORDER BY event_id LIMIT 1").collect()[0]
    import datetime

    assert isinstance(row.ts, datetime.datetime)  # nanos already cast
