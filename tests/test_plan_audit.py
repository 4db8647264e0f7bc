"""Physical-plan audits: the scale properties SURVEY §4 promises must be
visible in the plan, not just intended — filters pushed into the parquet
scan, projections pruned to the referenced columns, dimension joins
broadcast, and no cartesian products anywhere in the registry."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR


def _plan(df) -> str:
    """Full formatted physical plan (toString() truncates long filter
    lists)."""
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def _final_plan(df) -> str:
    """Executed plan AFTER an action, so AQE has finalized it and
    whole-stage-codegen wrapping is visible."""
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_q6_filter_pushdown_and_column_pruning(spark):
    """Q6 is the pushdown showcase: every predicate reaches PushedFilters
    and the scan reads only the 4 referenced columns."""
    from delta_lake_health_spark.plans.analytics import q6_forecast_revenue

    plan = _plan(q6_forecast_revenue(spark, SF_DIR))
    assert "PushedFilters: [" in plan
    for pushed in (
        "GreaterThanOrEqual(l_shipdate",
        "LessThan(l_shipdate",
        "GreaterThanOrEqual(l_discount,0.05)",
        "LessThanOrEqual(l_discount,0.07)",
        "LessThan(l_quantity,24",
    ):
        assert pushed in plan, f"missing pushed filter {pushed}"
    read_schema = plan.split("ReadSchema: ")[1].splitlines()[0]
    assert "l_shipdate" in read_schema and "l_discount" in read_schema
    assert "l_extendedprice" in read_schema and "l_quantity" in read_schema
    assert "l_orderkey" not in read_schema  # pruned
    assert "l_comment" not in read_schema


def test_q1_column_pruning(spark):
    from delta_lake_health_spark.plans.analytics import q1_pricing_summary

    plan = _plan(q1_pricing_summary(spark, SF_DIR))
    read_schema = plan.split("ReadSchema: ")[1].splitlines()[0]
    assert "l_orderkey" not in read_schema
    assert "l_partkey" not in read_schema
    assert "l_returnflag" in read_schema


def test_q5_broadcasts_all_dims(spark):
    """Q5's five dimension joins must be broadcast — exactly one
    shuffle-based join (lineitem x orders) is allowed."""
    from delta_lake_health_spark.plans.analytics import q5_local_supplier

    plan = _plan(q5_local_supplier(spark, SF_DIR))
    assert plan.count("BroadcastHashJoin") >= 4
    assert "CartesianProduct" not in plan


def test_q1_whole_stage_codegen(spark):
    """The scan->filter->partial-agg pipeline must sit inside a
    WholeStageCodegen span (no interpreted operators in the hot path),
    and aggregate as HashAggregate, never SortAggregate."""
    from delta_lake_health_spark.plans.analytics import q1_pricing_summary

    plan = _final_plan(q1_pricing_summary(spark, SF_DIR))
    # '*(N)' marks a whole-stage-codegen span in executedPlan.toString()
    assert "*(1) HashAggregate" in plan or "*(1) Filter" in plan
    assert "HashAggregate" in plan
    assert "SortAggregate" not in plan


def test_no_cartesian_products_anywhere(spark):
    """No query in the registry may plan a CartesianProduct; nested-loop
    joins are allowed only with a broadcast side (tiny by construction)."""
    import __spark_entry__ as e

    offenders = []
    for name, fn in e.queries().items():
        plan = _plan(fn(spark, SF_DIR))
        if "CartesianProduct" in plan:
            offenders.append(name)
    assert not offenders, f"cartesian products in: {offenders}"


def test_events_reads_prune_props(spark):
    """The wide 'props' payload column must never be read by event
    aggregations."""
    from delta_lake_health_spark.plans.events import QUERIES

    for name in ("events_tumbling_hourly", "events_user_stats"):
        plan = _plan(QUERIES[name](spark, SF_DIR))
        read_schema = plan.split("ReadSchema: ")[1].splitlines()[0]
        assert "props" not in read_schema, f"{name} reads props"
