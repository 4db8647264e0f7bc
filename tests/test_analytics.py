"""Every analytics query must match its DuckDB oracle at sf0.01 — the same
check the driver runs (row count + schema + order-insensitive values)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_ORACLE
from tests.oracle_check import compare


def _pairs():
    from delta_lake_health_spark.plans import analytics

    return sorted(analytics.ORACLE)


@pytest.mark.parametrize("name", _pairs())
def test_analytics_vs_oracle(spark, duck, name):
    from delta_lake_health_spark.plans import analytics

    n = compare(spark, duck, analytics.QUERIES[name], analytics.ORACLE[name], SF_ORACLE)
    assert n >= 0
