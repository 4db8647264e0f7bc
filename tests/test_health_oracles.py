"""Every plans/health query must match its DuckDB oracle at sf0.01 —
the same check the driver runs (row count + schema + values). The
delta_* fixture-backed queries build their own tables under /tmp."""

from __future__ import annotations

import pytest

from tests.conftest import SF_ORACLE
from tests.oracle_check import compare


def _names():
    from delta_lake_health_spark.plans import health

    return sorted(health.ORACLE)


@pytest.mark.parametrize("name", _names())
def test_health_vs_oracle(spark, duck, name):
    from delta_lake_health_spark.plans import health

    n = compare(spark, duck, health.QUERIES[name], health.ORACLE[name], SF_ORACLE)
    assert n >= 0
