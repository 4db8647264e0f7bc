"""Bottom-k-by-hash quantile sketch (K6) — operators/psample.py.

Contract: (1) ORDER-INVARIANCE — any partitioning of the same rows
merges to the bit-identical sketch (the property GK/t-digest lack);
(2) union is associative/commutative/idempotent; (3) quantiles are
EXACT below k rows and within rank-error bounds above; (4) the registry
query's nearest-rank extraction equals the operator's.
"""

from __future__ import annotations

import numpy as np

from delta_lake_health_spark.operators import psample
from delta_lake_health_spark.plans.sketch import QUERIES
from tests.conftest import SF_ORACLE


def _chunks(keys, vals, n):
    ix = np.array_split(np.arange(len(keys)), n)
    return [(keys[i], vals[i]) for i in ix]


def test_order_invariant_merge_bit_identity():
    rng_keys = np.arange(100_000, dtype=np.int64) * 7919 + 13
    vals = (rng_keys % 1000).astype(np.float64)
    whole = psample.sketch(rng_keys, vals)
    for n_parts in (8, 64, 333):
        parts = [
            psample.sketch(k, v) for k, v in _chunks(rng_keys, vals, n_parts)
        ]
        merged = parts[0]
        for p in parts[1:]:
            merged = psample.union(merged, p)
        assert np.array_equal(merged[0], whole[0]), n_parts
        assert np.array_equal(merged[1], whole[1]), n_parts
    # reversed merge order: same sketch (commutativity at scale)
    merged_rev = parts[-1]
    for p in reversed(parts[:-1]):
        merged_rev = psample.union(merged_rev, p)
    assert np.array_equal(merged_rev[0], whole[0])


def test_union_idempotent_and_duplicate_keys():
    keys = np.arange(5000, dtype=np.int64)
    vals = keys.astype(np.float64)
    a = psample.sketch(keys, vals)
    assert np.array_equal(psample.union(a, a)[0], a[0])
    # replayed rows (same keys) never double-count
    twice = psample.sketch(
        np.concatenate([keys, keys]), np.concatenate([vals, vals])
    )
    assert np.array_equal(twice[0], a[0])


def test_exact_below_k_and_rank_error_above():
    small = np.arange(500, dtype=np.int64)
    sk = psample.sketch(small, small.astype(np.float64))
    p50, p90 = psample.quantiles(sk, [0.5, 0.9])
    assert p50 == 249.0 and p90 == 449.0  # exact nearest-rank
    big = np.arange(200_000, dtype=np.int64)
    vals = big.astype(np.float64)  # value == true rank position
    skb = psample.sketch(big, vals)
    for q in (0.1, 0.5, 0.9, 0.99):
        (est,) = psample.quantiles(skb, [q])
        true_rank = est / len(big)
        assert abs(true_rank - q) <= 0.05, (q, true_rank)


def test_registry_query_matches_operator(spark):
    from pyspark.sql import functions as F

    from delta_lake_health_spark.sources.catalog import load

    got = {
        r.event_type: r
        for r in QUERIES["sketch_sample_quantiles"](
            spark, SF_ORACLE
        ).collect()
    }
    ev = (
        load(spark, SF_ORACLE, "events")
        .select("event_type", "event_id", "value")
        .collect()
    )
    by_type: dict = {}
    for r in ev:
        by_type.setdefault(r.event_type, ([], []))
        by_type[r.event_type][0].append(r.event_id)
        by_type[r.event_type][1].append(r.value)
    assert set(got) == set(by_type)
    for et, (keys, vals) in by_type.items():
        sk = psample.sketch(np.array(keys), np.array(vals))
        p50, p90, p99 = psample.quantiles(sk, [0.5, 0.9, 0.99])
        r = got[et]
        assert r.n_sample == len(sk[0])
        assert (r.p50, r.p90, r.p99) == (p50, p90, p99), et
        # the sample's quantile must sit near the exact one in rank
        exact = np.sort(np.array(vals))
        true_rank = np.searchsorted(exact, r.p50) / len(exact)
        assert abs(true_rank - 0.5) <= 0.06, et


def test_union_commutative_on_hash_ties():
    """Equal hashes carrying different values (replay with a corrected
    value, or a 64-bit collision) must merge operand-order-free: the
    smallest value wins deterministically."""
    h = np.array([5, 9], dtype=np.uint64)
    a = (h, np.array([1.0, 7.0]))
    b = (h, np.array([2.0, 3.0]))
    ab, ba = psample.union(a, b), psample.union(b, a)
    assert np.array_equal(ab[0], ba[0])
    assert np.array_equal(ab[1], ba[1])
    assert list(ab[1]) == [1.0, 3.0]  # min value per hash
