"""Bloom-filter operator properties (SURVEY §2.65 / X11): zero false
negatives, order-invariant merge, false-positive bound, and real pruning
power on non-members."""

from __future__ import annotations

import numpy as np

from delta_lake_health_spark.operators import bloom


def _keys(prefix: str, n: int) -> np.ndarray:
    return bloom.hash_strings([f"{prefix}:{i}" for i in range(n)])


def test_no_false_negatives_and_merge_equals_concat():
    a_keys, b_keys = _keys("a", 5000), _keys("b", 5000)
    fa = bloom.add(bloom.new_filter(), a_keys)
    fb = bloom.add(bloom.new_filter(), b_keys)
    merged = bloom.merge(fa, fb)
    both = bloom.add(
        bloom.add(bloom.new_filter(), b_keys), a_keys
    )  # reversed insert order
    assert np.array_equal(merged, both)
    # every inserted key is found — the guarantee exact verification
    # relies on (a miss can safely skip the verify join)
    assert bloom.contains(merged, a_keys).all()
    assert bloom.contains(merged, b_keys).all()


def test_false_positive_rate_within_bound():
    n = 100_000
    filt = bloom.add(bloom.new_filter(), _keys("member", n))
    probes = _keys("other", 100_000)
    fp = bloom.contains(filt, probes).mean()
    # theory: (1 - e^(-kn/m))^k with m=2^23, k=6, n=1e5 -> ~2.8e-6;
    # allow two orders of slack for hash-family imperfection
    expected = (1 - np.exp(-bloom.K * n / bloom.M_BITS)) ** bloom.K
    assert fp <= max(expected * 100, 1e-4), (fp, expected)


def test_prefilter_prunes_non_members():
    filt = bloom.add(bloom.new_filter(), _keys("corpus", 10_000))
    mixed = np.concatenate([_keys("corpus", 100), _keys("new", 10_000)])
    hits = bloom.contains(filt, mixed)
    assert hits[:100].all()  # members always pass
    # non-members are almost entirely pruned before the exact join
    assert hits[100:].mean() < 0.01


def test_small_filter_degrades_but_never_drops_members():
    tiny = bloom.add(bloom.new_filter(1 << 10), _keys("m", 2000))
    assert bloom.contains(tiny, _keys("m", 2000)).all()


def test_bloom_merge_parts_scales_and_honors_conf(spark):
    """r14: the OR-merge fan-in is conf-overridable and scales with the
    shuffle width feeding the build (VERDICT r13 #7 / ADVICE r13)."""
    from delta_lake_health_spark.plans.dedup import _bloom_merge_parts

    key = "spark.delta_lake_health.bloom.mergeParts"
    sp_key = "spark.sql.shuffle.partitions"
    old_sp = spark.conf.get(sp_key)
    try:
        spark.conf.set(sp_key, "32")
        assert _bloom_merge_parts(spark) == 16  # local floor unchanged
        spark.conf.set(sp_key, str(1_000_000))
        assert _bloom_merge_parts(spark) == 1_000_000 // 4096
        spark.conf.set(key, "7")
        assert _bloom_merge_parts(spark) == 7  # explicit conf wins
    finally:
        spark.conf.unset(key)
        spark.conf.set(sp_key, old_sp)
