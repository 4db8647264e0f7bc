#!/usr/bin/env python
"""Isolate query timings with the noop sink (optimization guide §1.4/§1.5).

    SPARK_GRAFT_CPUS=32 python tools/isolate.py [-n RUNS] name [name ...]

For each registry query: builds the plan against $SPARK_GRAFT_SF_DIR
(default sf0.1), executes it RUNS times (default 3) through
``df.write.format("noop")`` — which computes every column of every row —
and prints min/median. One warmup execution per query first. Jobs are
labeled via setJobDescription.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    args = sys.argv[1:]
    runs = 3
    if args and args[0] == "-n":
        runs = int(args[1])
        args = args[2:]

    import __spark_entry__ as e
    from delta_lake_health_spark.session import get_spark

    spark = get_spark("isolate")
    qs = e.queries()
    # warm file listing + page cache like bench.py does
    from delta_lake_health_spark.sources.catalog import TABLES, load

    for t in TABLES:
        load(spark, SF_DIR, t).count()

    for name in args:
        fn = qs[name]
        sc = spark.sparkContext
        sc.setJobDescription(f"warmup: {name}")
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        times = []
        for i in range(runs):
            sc.setJobDescription(f"run{i}: {name}")
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
        sc.setJobDescription(None)
        print(
            f"{name}: min={min(times):.3f}s median={statistics.median(times):.3f}s"
            f" runs={['%.3f' % t for t in times]}",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
