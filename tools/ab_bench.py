"""Targeted per-query A/B bench — one COLD process, one tree, a few
queries (the drift-attribution protocol from VERDICT r10 #3 / r11 #1).

Run alternately against HEAD and a `git worktree` of an older tree,
min-of-N over the pairs, and read the calibration probe first: this box
swings fixed-work numpy timings 3x+ between runs, so single-run deltas
under ~1.3x are environment, not code.

Usage:
    python tools/ab_bench.py <repo_dir> <query1,query2,...> [sf_dir]

Prints one JSON line {"repo": ..., "calib": s, "queries": {name: s}}.
Each query runs twice in-process; the min is reported (same estimator
as bench.py). IVF-PQ artifacts are force-rebuilt UNTIMED first when an
ann_ivf_pq query is in the set, mirroring bench.py's build/probe split.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    repo = os.path.abspath(sys.argv[1])
    names = sys.argv[2].split(",")
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    sys.path.insert(0, repo)
    import __spark_entry__ as e
    from delta_lake_health_spark.session import get_spark

    spark = get_spark("ab")
    qs = e.queries()

    import numpy as np

    a = np.random.default_rng(0).random((1500, 1500))
    t0 = time.perf_counter()
    for _ in range(3):
        a = a @ a / np.linalg.norm(a)
    calib = round(time.perf_counter() - t0, 3)

    # warmup: tables + tiny-SF runs (JIT/codegen), per bench.py
    from delta_lake_health_spark.sources.catalog import TABLES, load

    for t in TABLES:
        load(spark, sf_dir, t).count()
    for name in names:
        try:
            qs[name](spark, "/root/testdata/sf0.001").count()
        except Exception:
            pass

    if any("ivf_pq" in n for n in names):
        from delta_lake_health_spark.plans.similarity import (
            build_ivfpq_artifacts,
        )

        build_ivfpq_artifacts(spark, sf_dir, force=True)["codes"].count()

    timings = {}
    for name in names:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
    print(json.dumps({"repo": repo, "calib": calib, "queries": timings}))


if __name__ == "__main__":
    main()
