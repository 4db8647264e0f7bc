"""Property tests (SURVEY §5): score/skew bounds against a pure-Python
reference implementation of the reference repo's formulas."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from delta_lake_health_spark.operators.health import HealthMetrics, health_score
from delta_lake_health_spark.operators.skew import records_per_partition, skewness_agg

metrics_strategy = st.builds(
    HealthMetrics,
    number_of_writes=st.integers(0, 1000),
    number_of_optimizes=st.integers(0, 100),
    needs_vacuum=st.booleans(),
    skewness_max=st.floats(0, 1),
    small_files_count=st.integers(0, 10_000),
    has_orphan_files=st.booleans(),
)


@given(metrics_strategy)
def test_health_score_bounded(m):
    score, status = health_score(m)
    assert 0.0 <= score <= 100.0
    assert status is not None


@given(st.integers(0, 1000), st.integers(0, 100))
def test_health_score_monotone_in_writes(w, opt):
    """More writes never lowers the freshness component (all else equal)."""
    lo = HealthMetrics(number_of_writes=w, number_of_optimizes=opt)
    hi = HealthMetrics(number_of_writes=w + 1, number_of_optimizes=opt)
    # optimize ratio shrinks as writes grow, so compare freshness-only
    fresh_lo = min(lo.number_of_writes / 10 * 25.0, 25.0)
    fresh_hi = min(hi.number_of_writes / 10 * 25.0, 25.0)
    assert fresh_hi >= fresh_lo


def _py_skew(counts: list[int]) -> tuple[float, float]:
    """The reference's formulas (delta_python_analyzer.py:68-73)."""
    if len(counts) <= 1 or max(counts) == 0:
        return 0.0, 0.0
    mx, mn = max(counts), min(counts)
    mean = sum(counts) / len(counts)
    avg_dev = sum(abs(c - mean) for c in counts) / len(counts)
    return (mx - mn) / mx, (avg_dev / mean if mean else 0.0)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(st.integers(1, 50), min_size=1, max_size=6))
def test_skewness_matches_python_reference(spark, sizes):
    rows = [(f"p{i}",) for i, n in enumerate(sizes) for _ in range(n)]
    df = spark.createDataFrame(rows, "k string")
    got = skewness_agg(records_per_partition(df, ["k"])).collect()[0]
    want_max, want_avg = _py_skew(sizes)
    assert abs(got.skewness_max - round(want_max, 6)) < 1e-9
    assert abs(got.skewness_average - round(want_avg, 6)) < 1e-9
    assert 0.0 <= got.skewness_max <= 1.0
    assert got.n_partitions == len(sizes)
