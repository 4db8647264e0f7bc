"""Kleinberg burst detection (E38) — operators/bursts.py.

Contract: (1) a Poisson-regular stream stays in the base state; (2) a
stream with a dense burst inserted labels exactly that region bursty;
(3) the Spark applyInPandas pass equals the pure-Python core per user;
(4) the registry query is deterministic with bounded output.
"""

from __future__ import annotations

from delta_lake_health_spark.operators.bursts import kleinberg_two_state
from delta_lake_health_spark.plans.events import QUERIES
from tests.conftest import SF_ORACLE


def test_regular_stream_no_bursts():
    times = [float(i * 10) for i in range(50)]
    r = kleinberg_two_state(times)
    assert r == {"n_bursts": 0, "burst_gaps": 0, "longest_burst": 0}


def test_dense_burst_detected_in_right_region():
    # 20 gaps of 10s, then 20 gaps of 0.5s (the burst), then 20 of 10s
    times, t = [0.0], 0.0
    for _ in range(20):
        t += 10.0
        times.append(t)
    for _ in range(20):
        t += 0.5
        times.append(t)
    for _ in range(20):
        t += 10.0
        times.append(t)
    r = kleinberg_two_state(times)
    assert r["n_bursts"] == 1
    assert 15 <= r["longest_burst"] <= 22
    assert r["burst_gaps"] == r["longest_burst"]


def test_degenerate_streams():
    assert kleinberg_two_state([]) == {
        "n_bursts": 0, "burst_gaps": 0, "longest_burst": 0,
    }
    assert kleinberg_two_state([1.0, 2.0]) == {
        "n_bursts": 0, "burst_gaps": 0, "longest_burst": 0,
    }
    assert kleinberg_two_state([5.0, 5.0, 5.0]) == {
        "n_bursts": 0, "burst_gaps": 0, "longest_burst": 0,
    }


def test_spark_pass_matches_reference(spark):
    from pyspark.sql import functions as F

    from delta_lake_health_spark.sources.catalog import load

    got = {
        r.user_id: r
        for r in QUERIES["events_user_bursts"](spark, SF_ORACLE).collect()
    }
    assert len(got) == 25
    ev = load(spark, SF_ORACLE, "events").select(
        "user_id", F.unix_micros("ts").alias("ts_us")
    )
    sample = list(got)[:5]
    rows = (
        ev.where(F.col("user_id").isin(sample))
        .orderBy("user_id", "ts_us")
        .collect()
    )
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r.ts_us / 1e6)
    for uid in sample:
        ref = kleinberg_two_state(sorted(by_user[uid]))
        assert got[uid].n_bursts == ref["n_bursts"], uid
        assert got[uid].burst_gaps == ref["burst_gaps"], uid
        assert got[uid].longest_burst == ref["longest_burst"], uid
        assert got[uid].n_events == len(by_user[uid])
