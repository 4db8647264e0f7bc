"""Salted agg/join must be semantics-identical to the unsalted plans."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from delta_lake_health_spark.operators.salt import salted_agg, salted_join
from delta_lake_health_spark.sources.catalog import load
from tests.conftest import SF_DIR


def test_salted_agg_matches_plain(spark):
    li = load(spark, SF_DIR, "lineitem")
    plain = {
        (r.l_returnflag, r.l_linestatus): (r.n, round(r.total, 2), r.mx)
        for r in li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("l_quantity").alias("total"),
            F.max("l_extendedprice").alias("mx"),
        )
        .collect()
    }
    salted = {
        (r.l_returnflag, r.l_linestatus): (r.n, round(r.total, 2), r.mx)
        for r in salted_agg(
            li,
            ["l_returnflag", "l_linestatus"],
            {"n": "count(*)", "total": "sum(l_quantity)",
             "mx": "max(l_extendedprice)"},
        ).collect()
    }
    assert salted == plain


def test_salted_agg_rejects_non_reaggregable(spark):
    li = load(spark, SF_DIR, "lineitem")
    with pytest.raises(ValueError, match="not re-aggregable"):
        salted_agg(li, ["l_returnflag"], {"a": "avg(l_quantity)"})


def test_salted_join_matches_plain(spark):
    li = load(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
    orders = load(spark, SF_DIR, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    plain = sorted(
        (r.l_orderkey, r.l_quantity, r.o_orderpriority)
        for r in li.join(orders, "l_orderkey").collect()
    )
    salted = sorted(
        (r.l_orderkey, r.l_quantity, r.o_orderpriority)
        for r in salted_join(li, orders, ["l_orderkey"], n_salts=8).collect()
    )
    assert salted == plain


def test_salted_join_rejects_outer_joins(spark):
    import pytest
    from delta_lake_health_spark.operators.salt import salted_join

    df = spark.range(4)
    for how in ("right", "rightouter", "full", "outer", "full_outer", "cross"):
        with pytest.raises(ValueError, match="salted_join does not support"):
            salted_join(df, df, ["id"], how=how)
