"""Bucketed co-located joins must be exchange-free and result-identical
to the plain join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from delta_lake_health_spark.operators.bucketing import (
    cobucketed_join,
    write_bucketed,
)
from delta_lake_health_spark.sources.catalog import load
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    li = load(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    orders = load(spark, SF_DIR, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    write_bucketed(li, "li_bkt", ["l_orderkey"], n_buckets=8,
                   sort_cols=["l_orderkey"])
    write_bucketed(orders, "ord_bkt", ["l_orderkey"], n_buckets=8,
                   sort_cols=["l_orderkey"])
    yield "li_bkt", "ord_bkt"
    spark.sql("DROP TABLE IF EXISTS li_bkt")
    spark.sql("DROP TABLE IF EXISTS ord_bkt")


def test_cobucketed_join_no_shuffle_and_correct(spark, bucketed_tables):
    left, right = bucketed_tables
    joined = cobucketed_join(spark, left, right, ["l_orderkey"])
    got = joined.count()
    li = load(spark, SF_DIR, "lineitem")
    orders = load(spark, SF_DIR, "orders")
    want = li.join(
        orders, li.l_orderkey == orders.o_orderkey
    ).count()
    assert got == want


def test_cobucketed_join_detects_shuffle(spark, bucketed_tables):
    left, _ = bucketed_tables
    # join against a NON-bucketed side: must raise, not silently shuffle.
    load(spark, SF_DIR, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    ).write.mode("overwrite").saveAsTable("ord_plain")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        with pytest.raises(AssertionError, match="shuffles despite"):
            cobucketed_join(spark, left, "ord_plain", ["l_orderkey"])
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        spark.sql("DROP TABLE IF EXISTS ord_plain")
