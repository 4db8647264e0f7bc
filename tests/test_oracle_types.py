"""Oracle result-type lint (round 8, VERDICT r7 task #3).

The driver's correctness gate hashes serialized values, so a DuckDB oracle
whose aggregate silently widens to HUGEINT (int128) or DECIMAL hash-mismatches
a numerically identical Spark `long`/`double` result — exactly what turned
`events_user_value_pareto` red in round 7 (`SUM(v_int)` without a BIGINT
cast). This lint prepares every registered oracle against the sf0.001 views
and asserts no result column carries one of the divergent-serialization
types, so that class of red row is caught before the driver runs.

Type inspection uses the relation's bound schema (no fetch), so the whole
sweep over ~135 oracles costs seconds.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_LINT = "/root/testdata/sf0.001"

# Types whose DuckDB serialization diverges from Spark's long/double even
# when every value is numerically identical.
FORBIDDEN = ("HUGEINT", "UHUGEINT", "DECIMAL")


def _oracles() -> dict[str, str]:
    import __spark_entry__ as e

    return e.oracle_sql()


@pytest.fixture(scope="module")
def duck_lint():
    import duckdb

    from delta_lake_health_spark.sources.catalog import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{SF_LINT}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(_oracles()))
def test_oracle_column_types(duck_lint, name):
    sql = _oracles()[name]
    rel = duck_lint.sql(sql)
    bad = [
        (col, str(typ))
        for col, typ in zip(rel.columns, rel.types)
        if any(str(typ).upper().startswith(f) for f in FORBIDDEN)
    ]
    assert not bad, (
        f"oracle '{name}' returns driver-divergent column type(s) {bad}; "
        "CAST the aggregate (e.g. CAST(SUM(x) AS BIGINT) / AS DOUBLE) so "
        "DuckDB and Spark serialize identically"
    )
