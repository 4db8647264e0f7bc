"""plans/prefix_rank.py — the shared two-phase bucketed prefix-rank
(four registry queries route through it). Property: for ANY data and
ANY order-aligned domain-bounded bucketing, the distributed rank/sum
equals the single-window global form exactly."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from delta_lake_health_spark.plans.prefix_rank import (
    bucketed_prefix_sum,
    bucketed_row_number,
    ntile_from_rank,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, v double, wgt long")


def _cases():
    rng = random.Random(7)
    yield [(i, float(rng.randint(-50, 50)), rng.randint(1, 9))
           for i in range(200)]
    # heavy ties on v
    yield [(i, float(rng.randint(0, 3)), 1) for i in range(97)]
    # single row / single bucket
    yield [(1, 5.0, 3)]
    # negative values straddling bucket boundaries
    yield [(i, (i - 25) * 1.0, 2) for i in range(50)]


@pytest.mark.parametrize("case", list(range(4)))
def test_bucketed_row_number_equals_global_window(spark, case):
    rows = list(_cases())[case]
    df = _df(spark, rows)
    bucket = F.floor(F.col("v") / 7.0).cast("long")
    got = {
        r.id: r.r
        for r in bucketed_row_number(
            df, bucket, [F.col("v"), F.col("id")], "r"
        ).collect()
    }
    w = Window.orderBy("v", "id")
    want = {
        r.id: r.r
        for r in df.withColumn("r", F.row_number().over(w)).collect()
    }
    assert got == want


@pytest.mark.parametrize("case", list(range(4)))
def test_bucketed_prefix_sum_equals_global_window(spark, case):
    rows = list(_cases())[case]
    df = _df(spark, rows)
    bucket = F.floor(F.col("v") / 5.0).cast("long")
    got = {
        r.id: r.s
        for r in bucketed_prefix_sum(
            df, bucket, [F.col("v"), F.col("id")], F.col("wgt"), "s"
        ).collect()
    }
    w = (
        Window.orderBy("v", "id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    want = {
        r.id: r.s
        for r in df.withColumn(
            "s", F.coalesce(F.sum("wgt").over(w), F.lit(0))
        ).collect()
    }
    assert got == want


def test_ntile_from_rank_matches_spark_ntile(spark):
    """Closed-form NTILE == Spark's NTILE for every (n, k) shape
    including n < k, n % k == 0, and big-remainder cases."""
    for n, k in [(1, 4), (3, 5), (8, 4), (10, 4), (100, 7), (13, 13)]:
        df = spark.range(1, n + 1).withColumnRenamed("id", "r")
        got = {
            r.r: r.t
            for r in df.select(
                "r", ntile_from_rank(F.col("r"), F.lit(n), k).alias("t")
            ).collect()
        }
        w = Window.orderBy("r")
        want = {
            r.r: r.t
            for r in df.select(
                "r", F.ntile(k).over(w).alias("t")
            ).collect()
        }
        assert got == want, (n, k)


def test_bucketed_row_number_tied_order_is_still_a_permutation(spark):
    """Review fix (r11): without a unique tiebreaker the helper must
    still behave like ROW_NUMBER — every row gets a DISTINCT rank
    (arbitrary among ties), not the RANGE-frame behavior that hands all
    tied rows the same value."""
    rows = [(i, float(i % 3), 1) for i in range(60)]  # heavy ties, no tiebreak col in order
    df = _df(spark, rows)
    got = [
        r.r
        for r in bucketed_row_number(
            df, F.floor(F.col("v")).cast("long"), [F.col("v")], "r"
        ).collect()
    ]
    assert sorted(got) == list(range(1, 61))
