#!/usr/bin/env python
"""Capture .explain("formatted") for registry queries into text files.

    SPARK_GRAFT_CPUS=8 python tools/explain_capture.py <outdir> <suffix> [name ...]

Writes <outdir>/<name>_<suffix>.txt for each query (default: every headline
query in bench.py). Plans are built against $SPARK_GRAFT_SF_DIR (default
sf0.1) — plan construction only, nothing is executed, so this is cheap; AQE
plans print isFinalPlan=false (the judged artifact is the static shape:
Exchange count, join strategy, PushedFilters, codegen spans).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    import __spark_entry__ as e
    import bench
    from delta_lake_health_spark.session import get_spark

    outdir, suffix = sys.argv[1], sys.argv[2]
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("explain")
    qs = e.queries()
    names = sys.argv[3:] or [n for n in bench.HEADLINE if n in qs]
    import contextlib
    import io

    for name in names:
        try:
            df = qs[name](spark, SF_DIR)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as ex:  # noqa: BLE001
            plan = f"EXPLAIN FAILED: {type(ex).__name__}: {ex}"
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"{name}: {len(plan.splitlines())} plan lines -> {path}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
