#!/usr/bin/env python
"""Full-registry oracle sweep: run every registered query against its DuckDB
oracle at $SPARK_GRAFT_SF_DIR (default sf0.01), exactly like the driver's
correctness gate. Prints one line per query (green / rows-only / RED) and a
summary. Usage:

    SPARK_GRAFT_CPUS=8 python tools/oracle_sweep.py [name ...]

With names, sweeps only those queries (still oracle-compared when an oracle
exists). Exit code 1 if anything is red.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> int:
    import duckdb

    import __spark_entry__ as e
    from delta_lake_health_spark.session import get_spark
    from delta_lake_health_spark.sources.catalog import TABLES
    from tests.oracle_check import compare

    spark = get_spark("sweep")
    duck = duckdb.connect()
    for t in TABLES:
        duck.sql(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    qs = e.queries()
    osql = e.oracle_sql()
    names = sys.argv[1:] or list(qs)
    red = []
    t_all = time.perf_counter()
    for name in names:
        if name not in qs:
            print(f"?? {name}: not in registry", flush=True)
            red.append(name)
            continue
        t0 = time.perf_counter()
        try:
            if name in osql:
                n = compare(spark, duck, qs[name], osql[name], SF_DIR)
                status = f"green ({n} rows)"
            else:
                n = qs[name](spark, SF_DIR).count()
                status = f"rows-only ({n} rows)"
        except Exception as ex:  # noqa: BLE001
            status = f"RED: {type(ex).__name__}: {str(ex)[:300]}"
            red.append(name)
        print(f"{name}: {status} [{time.perf_counter() - t0:.1f}s]", flush=True)
    print(
        f"== {len(names) - len(red)}/{len(names)} green, {len(red)} red, "
        f"{time.perf_counter() - t_all:.0f}s total =="
    )
    if red:
        print("RED:", ", ".join(red))
    return 1 if red else 0


if __name__ == "__main__":
    raise SystemExit(main())
