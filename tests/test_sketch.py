"""Error-bound tests for the sketch operators: the approximate answers
must land within their configured bounds of the exact ones."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from delta_lake_health_spark.plans import sketch
from delta_lake_health_spark.sources.catalog import load

SF = "/root/testdata/sf0.01"


def test_approx_distinct_within_bound(spark):
    approx = {
        r.event_type: r.approx_users
        for r in sketch.sketch_approx_distinct(spark, SF).collect()
    }
    exact = {
        r.event_type: r.exact_users
        for r in load(spark, SF, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact_users"))
        .collect()
    }
    assert set(approx) == set(exact)
    for k in exact:
        rel_err = abs(approx[k] - exact[k]) / max(exact[k], 1)
        # HLL++ rsd is a standard deviation; 5 sigma is a safe determinism
        # margin (the sketch itself is deterministic for fixed input)
        assert rel_err <= 5 * sketch.RSD, (k, approx[k], exact[k])


def test_approx_percentiles_within_bound(spark):
    approx = {
        r.event_type: (r.p50, r.p95, r.p99)
        for r in sketch.sketch_approx_percentiles(spark, SF).collect()
    }
    ev = load(spark, SF, "events")
    exact = {
        r.event_type: (r.p50, r.p95, r.p99)
        for r in ev.groupBy("event_type")
        .agg(
            F.expr("percentile(value, 0.5)").alias("p50"),
            F.expr("percentile(value, 0.95)").alias("p95"),
            F.expr("percentile(value, 0.99)").alias("p99"),
        )
        .collect()
    }
    # GK bound is on RANK error (<= n/accuracy); translate through the
    # empirical value spread: the approx value must sit between the exact
    # quantiles at q +- 2/accuracy
    for k, (a50, a95, a99) in approx.items():
        for q, a in ((0.5, a50), (0.95, a95), (0.99, a99)):
            lo_q, hi_q = max(q - 2.0 / sketch.PCT_ACCURACY * 100, 0.0), min(
                q + 2.0 / sketch.PCT_ACCURACY * 100, 1.0
            )
            lo, hi = (
                ev.where(F.col("event_type") == k)
                .agg(
                    F.expr(f"percentile(value, {lo_q})").alias("lo"),
                    F.expr(f"percentile(value, {hi_q})").alias("hi"),
                )
                .collect()[0]
            )
            assert lo - 1e-9 <= a <= hi + 1e-9, (k, q, a, lo, hi)


def test_hll_core_determinism_and_bound():
    """Pure-numpy HLL core: same keys in any order/chunking produce the
    SAME registers; estimate within 5% of exact for 10k keys."""
    import numpy as np

    from delta_lake_health_spark.operators import hll

    keys = np.arange(10_000, dtype=np.uint64) * 7919 + 13
    a = hll.update_registers(hll.empty_registers(), keys)
    # reversed order, three chunks, with duplicates appended
    b = hll.empty_registers()
    for chunk in np.array_split(keys[::-1], 3):
        hll.update_registers(b, chunk)
    hll.update_registers(b, keys[:100])
    assert np.array_equal(a, b)
    est = hll.estimate(a)
    assert abs(est - 10_000) / 10_000 < 0.05
    # mergeability: union of two halves == one pass
    h1 = hll.update_registers(hll.empty_registers(), keys[:5000])
    h2 = hll.update_registers(hll.empty_registers(), keys[5000:])
    assert np.array_equal(hll.merge_registers(h1, h2), a)


def test_windowed_hll_users_error_bound(spark):
    """Batch windowed HLL estimates stay within 5% of the exact
    per-window distinct counts (P=12 -> ~1.6% typical error)."""
    from delta_lake_health_spark.plans.sketch import QUERIES
    from delta_lake_health_spark.sources.catalog import load
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    got = {
        (r.window_start, r.event_type): r.approx_users
        for r in QUERIES["events_windowed_hll_users"](spark, sf).collect()
    }
    exact = {
        (r.window_start, r.event_type): r.n
        for r in (
            load(spark, sf, "events")
            .groupBy(
                F.date_format(
                    F.window("ts", "1 hour").getField("start"),
                    "yyyy-MM-dd HH:mm:ss",
                ).alias("window_start"),
                "event_type",
            )
            .agg(F.countDistinct("user_id").alias("n"))
            .collect()
        )
    }
    assert set(got) == set(exact)
    for k, est in got.items():
        assert abs(est - exact[k]) <= max(2, 0.05 * exact[k]), (k, est, exact[k])


def test_cms_core_properties():
    """Overestimate-only, additive merge == concatenated stream, and
    deterministic string hashing."""
    import numpy as np

    from delta_lake_health_spark.operators import cms

    rng = np.random.default_rng(7)
    words = [f"w{int(i)}" for i in rng.zipf(1.5, size=5000) if i < 500]
    half = len(words) // 2
    a, b = cms.new_sketch(), cms.new_sketch()
    cms.update(a, cms.hash_strings(words[:half]))
    cms.update(b, cms.hash_strings(words[half:]))
    both = cms.new_sketch()
    cms.update(both, cms.hash_strings(words))
    assert np.array_equal(cms.merge(a, b), both)

    uniq = sorted(set(words))
    exact = {w: words.count(w) for w in uniq}
    est = cms.estimate(both, cms.hash_strings(uniq))
    n = len(words)
    for w, e in zip(uniq, est):
        assert e >= exact[w]
        assert e <= exact[w] + 0.01 * n  # far inside the eps*N bound
    # determinism across calls
    assert np.array_equal(cms.hash_strings(uniq), cms.hash_strings(uniq))


def test_sketch_heavy_hitters_vs_exact(spark):
    """Estimates never under-count and the reported top-20 contains the
    exact top-10 tokens."""
    from pyspark.sql import functions as F

    from delta_lake_health_spark.plans.sketch import QUERIES
    from delta_lake_health_spark.sources.catalog import load

    sf = "/root/testdata/sf0.01"
    got = {r.token: r.est_count
           for r in QUERIES["sketch_heavy_hitters"](spark, sf).collect()}
    exact = {
        r.w: r.c
        for r in load(spark, sf, "documents")
        .select(F.explode(F.split("text", " ")).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
        .collect()
    }
    assert len(got) == 20
    total = sum(exact.values())
    for t, e in got.items():
        assert e >= exact.get(t, 0)
        assert e <= exact.get(t, 0) + 0.001 * total
    top10 = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert all(t in got for t, _ in top10)


# --------------------------------------------------------------------------
# K5 — KMV bottom-k sketch (operators/kmv.py)


def test_kmv_core_properties():
    """Merge-covering, idempotence, exact-below-K regime, and the
    ~1/sqrt(K) error bound on big synthetic sets with known overlap."""
    import numpy as np

    from delta_lake_health_spark.operators import kmv

    # exact regime: fewer than K distinct values -> estimate is exact
    small = kmv.hash_i64(np.arange(500))
    sk = kmv.sketch(small)
    assert len(sk) == 500
    assert kmv.estimate(sk) == 500.0

    # union of bottom-ks == bottom-k of union (any split, any order)
    a = kmv.hash_i64(np.arange(0, 150_000))
    b = kmv.hash_i64(np.arange(100_000, 250_000))  # 50k overlap
    assert np.array_equal(
        kmv.union(kmv.sketch(a), kmv.sketch(b)),
        kmv.sketch(np.concatenate([b, a])),
    )
    assert np.array_equal(
        kmv.union(kmv.sketch(a), kmv.sketch(a)), kmv.sketch(a)
    )

    # estimator accuracy: |A|=|B|=150k, |A∩B|=50k, |A∪B|=250k
    tol = 5.0 / np.sqrt(kmv.K)  # 5 sigma of the ~1/sqrt(K) rel. error
    assert abs(kmv.estimate(kmv.sketch(a)) - 150_000) < 150_000 * tol
    est_inter, jac = kmv.intersect_estimate(kmv.sketch(a), kmv.sketch(b))
    assert abs(est_inter - 50_000) < 50_000 * 3 * tol  # ratio compounds
    assert abs(jac - 0.2) < 0.2 * 3 * tol


def test_sketch_user_overlap_exact_below_k(spark):
    """At driver SFs every event type has < K distinct users, so the KMV
    query's 'estimates' must equal the EXACT pairwise overlap counts."""
    from delta_lake_health_spark.plans import sketch as plans_sketch
    from delta_lake_health_spark.sources.catalog import load

    sf = "/root/testdata/sf0.001"
    got = {
        (r.type_a, r.type_b): r
        for r in plans_sketch.QUERIES["sketch_user_overlap"](spark, sf).collect()
    }
    ev = load(spark, sf, "events").select("event_type", "user_id").distinct()
    users = {
        t: {r.user_id for r in ev.where(F.col("event_type") == t).collect()}
        for t in {r.event_type for r in ev.select("event_type").collect()}
    }
    assert len(got) == len(users) * (len(users) - 1) // 2
    for (a, b), r in got.items():
        inter = users[a] & users[b]
        union = users[a] | users[b]
        assert r.est_users_a == len(users[a])
        assert r.est_users_b == len(users[b])
        assert r.est_shared == len(inter)
        assert r.jaccard == pytest.approx(len(inter) / len(union), abs=1e-6)
