"""CUSUM change-point alerts (E37) — the window identity vs the
textbook recursion.

The query computes S_t = max(0, S_{t-1} + x_t - k) as
P_t - min(0, min_{j<=t} P_j) (two running windows, no recursion); this
test replays the DIRECT sequential recursion in pure Python over the
same hourly series and demands identical alert counts, max statistic,
and first alert hour per series — proving the identity, not just the
plumbing. A synthetic step-change series sanity-checks detection.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from delta_lake_health_spark.plans.events import (
    _CUSUM_H,
    _CUSUM_SLACK,
    QUERIES,
)
from delta_lake_health_spark.sources.catalog import load
from tests.conftest import SF_ORACLE


def _recursive_cusum(series, k):
    s, out = 0.0, []
    for x in series:
        s = max(0.0, s + x - k)
        out.append(s)
    return out


def test_window_identity_matches_recursion(spark):
    ev = load(spark, SF_ORACLE, "events")
    hrs = (
        ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("hr"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    by_type: dict = {}
    for r in hrs:
        by_type.setdefault(r.event_type, []).append((r.hr, r.c))
    got = {
        r.event_type: r
        for r in QUERIES["events_cusum_alerts"](spark, SF_ORACLE).collect()
    }
    assert set(got) == set(by_type)
    for et, rows in by_type.items():
        rows.sort()
        counts = [c for _, c in rows]
        mu = sum(counts) / len(counts)
        cus = _recursive_cusum(counts, mu + _CUSUM_SLACK)
        n_alerts = sum(1 for v in cus if v > _CUSUM_H)
        first = next(
            (rows[i][0] for i, v in enumerate(cus) if v > _CUSUM_H), None
        )
        r = got[et]
        assert r.n_hours == len(rows)
        assert r.n_alert_hours == n_alerts, et
        assert abs(r.max_cusum - max(cus)) < 1e-6, et
        assert r.first_alert == (
            first.strftime("%Y-%m-%d %H:%M:%S") if first else None
        ), et


def test_step_change_detected_and_quiet_series_silent(spark):
    """A flat series never alerts; a series with a level shift alerts
    at (or just after) the shift and stays alerted."""
    flat = [10.0] * 48
    assert all(
        v <= _CUSUM_H
        for v in _recursive_cusum(flat, sum(flat) / len(flat) + _CUSUM_SLACK)
    )
    step = [10.0] * 24 + [14.0] * 24
    k = sum(step) / len(step) + _CUSUM_SLACK
    cus = _recursive_cusum(step, k)
    first = next(i for i, v in enumerate(cus) if v > _CUSUM_H)
    assert 24 <= first <= 28
    assert all(v > _CUSUM_H for v in cus[first:])
