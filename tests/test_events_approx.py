"""Approx-percentile twins (E6/E22/E24 ``approx=True``): the
percentile_approx form is the one a 100 TB run would use (fixed-size
mergeable sketch state instead of per-group sorted buffers).  Each test
asserts a RANK-ERROR bound: every approx quantile must lie inside the
exact [p-eps, p+eps] quantile bracket of the same distribution, i.e. the
sketch's rank error is at most eps — far looser than percentile_approx's
1/accuracy guarantee, but engine-independent and stable at sf0.01."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE

EPS = 0.02  # rank-error tolerance


def _bracket_check(dist, group_col, value_col, approx_df, pct_cols):
    """For each group and each (out_col -> p), assert exact quantile at
    p-EPS <= approx value <= exact quantile at p+EPS."""
    brackets = dist.groupBy(group_col).agg(
        *[
            F.expr(
                f"percentile({value_col}, {max(p - EPS, 0.0)})"
            ).alias(f"lo_{c}")
            for c, p in pct_cols.items()
        ],
        *[
            F.expr(
                f"percentile({value_col}, {min(p + EPS, 1.0)})"
            ).alias(f"hi_{c}")
            for c, p in pct_cols.items()
        ],
    )
    joined = approx_df.join(brackets, group_col).collect()
    assert joined, "no groups to check"
    for r in joined:
        for c in pct_cols:
            lo, hi, v = r[f"lo_{c}"], r[f"hi_{c}"], r[c]
            # approx output is rounded to 6 dp downstream — allow ulp slack
            assert lo - 1e-6 <= v <= hi + 1e-6, (
                f"{r[group_col]}.{c}: {v} outside exact bracket "
                f"[{lo}, {hi}]"
            )


def test_value_percentiles_approx_rank_error(spark):
    from delta_lake_health_spark.plans.events import events_value_percentiles

    ev = spark.read.parquet(f"{SF_ORACLE}/events.parquet")
    approx = events_value_percentiles(spark, SF_ORACLE, approx=True)
    _bracket_check(
        ev.select("event_type", "value"),
        "event_type",
        "value",
        approx,
        {"p50": 0.5, "p95": 0.95, "p99": 0.99},
    )
    # group cardinality and ordering match the exact form
    exact = events_value_percentiles(spark, SF_ORACLE)
    assert [r.event_type for r in approx.collect()] == [
        r.event_type for r in exact.collect()
    ]


def test_funnel_latency_approx_rank_error(spark):
    from delta_lake_health_spark.plans.events import (
        _funnel_lags,
        events_funnel_latency,
    )

    approx = events_funnel_latency(spark, SF_ORACLE, approx=True)
    _bracket_check(
        _funnel_lags(spark, SF_ORACLE),
        "step",
        "lag_s",
        approx,
        {"p50_s": 0.5, "p90_s": 0.9, "p99_s": 0.99},
    )


def test_inter_event_gaps_approx_rank_error(spark):
    from delta_lake_health_spark.plans.events import (
        _inter_event_gaps,
        events_inter_event_gaps,
    )

    approx = events_inter_event_gaps(spark, SF_ORACLE, approx=True)
    _bracket_check(
        _inter_event_gaps(spark, SF_ORACLE),
        "event_type",
        "gap_s",
        approx,
        {"p50_s": 0.5, "p90_s": 0.9},
    )


@pytest.mark.parametrize(
    "qname",
    ["events_value_percentiles", "events_funnel_latency",
     "events_inter_event_gaps"],
)
def test_exact_form_unchanged_in_registry(qname):
    """The registry still serves the exact (oracle-parity) form — the
    approx twin is opt-in via the keyword only."""
    import inspect

    from delta_lake_health_spark.plans import events

    fn = events.QUERIES[qname]
    sig = inspect.signature(fn)
    assert sig.parameters["approx"].default is False
