"""Oracle checks for the media plan family (plans/media.py) — the same
driver-style compare the other plan suites run, so the rotation's top
entry (media_decode_roundtrip) is proven every suite run, not only by
the per-round driver."""

from __future__ import annotations

import pytest

from tests.conftest import SF_ORACLE
from tests.oracle_check import compare


def _mod():
    import importlib

    return importlib.import_module("delta_lake_health_spark.plans.media")


@pytest.mark.parametrize("name", sorted(_mod().ORACLE))
def test_media_vs_oracle(spark, duck, name):
    m = _mod()
    compare(spark, duck, m.QUERIES[name], m.ORACLE[name], SF_ORACLE)
