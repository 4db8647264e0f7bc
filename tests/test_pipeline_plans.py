"""Oracle checks for events, text-analysis, and dedup plan families."""

from __future__ import annotations

import pytest

from tests.conftest import SF_ORACLE
from tests.oracle_check import compare


def _names(mod):
    return sorted(mod.ORACLE)


def _mod(name):
    import importlib

    return importlib.import_module(f"delta_lake_health_spark.plans.{name}")


@pytest.mark.parametrize("name", _names(_mod("events")))
def test_events_vs_oracle(spark, duck, name):
    m = _mod("events")
    compare(spark, duck, m.QUERIES[name], m.ORACLE[name], SF_ORACLE)


@pytest.mark.parametrize("name", _names(_mod("text")))
def test_text_vs_oracle(spark, duck, name):
    m = _mod("text")
    compare(spark, duck, m.QUERIES[name], m.ORACLE[name], SF_ORACLE)


@pytest.mark.parametrize("name", _names(_mod("dedup")))
def test_dedup_vs_oracle(spark, duck, name):
    m = _mod("dedup")
    compare(spark, duck, m.QUERIES[name], m.ORACLE[name], SF_ORACLE)


def test_dedup_finds_known_duplicates_at_sf01(spark):
    """sf0.1 contains 8 exact-duplicate documents; the LSH candidate set
    must cover every exact-duplicate pair (minhash of identical text is
    identical, so all bands collide)."""
    m = _mod("dedup")
    sf = "/root/testdata/sf0.1"
    exact = {
        (r.keep_doc_id, r.n_copies)
        for r in m.QUERIES["dedup_exact"](spark, sf).collect()
    }
    assert sum(n - 1 for _, n in exact) >= 1, "expected exact dups at sf0.1"
    pairs = {
        (r.doc_a, r.doc_b) for r in m.QUERIES["dedup_minhash_pairs"](spark, sf).collect()
    }
    assert len(pairs) >= sum(n - 1 for _, n in exact)


@pytest.mark.parametrize("name", _names(_mod("health")))
def test_health_vs_oracle(spark, duck, name):
    m = _mod("health")
    compare(spark, duck, m.QUERIES[name], m.ORACLE[name], SF_ORACLE)


def test_dedup_clusters_consistent_with_pairs(spark):
    """Every candidate pair must land in the same cluster, and cluster ids
    are the component-min doc_id."""
    m = _mod("dedup")
    sf = "/root/testdata/sf0.01"
    pairs = [(r.doc_a, r.doc_b) for r in m.QUERIES["dedup_minhash_pairs"](spark, sf).collect()]
    clusters = {r.doc_id: r.cluster for r in m.QUERIES["dedup_clusters"](spark, sf).collect()}
    for a, b in pairs:
        assert clusters[a] == clusters[b], (a, b)
    assert all(c <= d for d, c in clusters.items())  # cluster id is a min
