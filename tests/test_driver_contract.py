"""Guards on the __spark_entry__ driver contract itself: a typo in the
front-loaded verification list or an oracle key without a query would
silently shrink the correctness surface the driver checks."""

from __future__ import annotations

import __spark_entry__ as e


def test_registry_integrity():
    qs, orc = e.queries(), e.oracle_sql()
    assert len(qs) >= 85
    # every oracle belongs to a registered query
    assert set(orc) <= set(qs)
    # every front-loaded name actually resolves (no silent drops)
    missing = [n for n in e._VERIFY_FIRST if n not in qs]
    assert not missing, f"_VERIFY_FIRST names not in registry: {missing}"
    # front-loaded names come first, in order
    assert list(qs)[: len(e._VERIFY_FIRST)] == [
        n for n in e._VERIFY_FIRST if n in qs
    ]
    # only the by-design rows-only queries lack oracles (sketches, the
    # eigendecomposition/iterative-BPE censuses, the r7
    # percentile_approx twins, the two-quantizer IVF+PQ composition,
    # and the r10 rfft-fingerprint / Viterbi-burst additions — none
    # expressible in the oracle's SQL; each carries a pytest
    # error-bound/parity test instead)
    assert sorted(set(qs) - set(orc)) == [
        "ann_graph_topk",
        "ann_ivf_pq_topk",
        "embedding_pca_census",
        "events_funnel_latency_approx",
        "events_inter_event_gaps_approx",
        "events_user_bursts",
        "events_value_percentiles_approx",
        "events_windowed_hll_users",
        "media_audio_fingerprint",
        "media_audio_fp_served",
        "sketch_approx_distinct",
        "sketch_approx_percentiles",
        "sketch_heavy_hitters",
        "sketch_sample_quantiles",
        "sketch_user_overlap",
        "text_bpe_tokenize_fertility",
    ]


def test_entry_is_flagship_q1(spark):
    df = e.entry(spark)
    assert df.columns[:2] == ["l_returnflag", "l_linestatus"]
    rows = df.collect()
    assert len(rows) >= 1


def test_verify_first_is_complete_and_duplicate_free():
    """r12: the rotation list is GENERATED (tools/gen_verify_first.py)
    and enumerates the complete registry — a query missing from it
    would fall back to module order, quietly escaping the rotation."""
    import __spark_entry__ as e

    qs, _ = e._registry()
    assert len(e._VERIFY_FIRST) == len(set(e._VERIFY_FIRST))
    missing = [n for n in qs if n not in e._VERIFY_FIRST]
    assert not missing, f"registry queries not in rotation: {missing}"
