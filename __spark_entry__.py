"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 together with its DuckDB oracle SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF_SMOKE = "/root/testdata/sf0.001"

# STANDING ROTATION RULE (applies every round): the correctness driver
# verifies registry entries in insertion order and caps near 50 rows per
# round, so _VERIFY_FIRST must be rebuilt each round as
#   (1) queries with NO green driver row yet (newest additions + any red
#       or stale-schema rows), then
#   (2) queries whose newest green row is OLDEST (so no query's last
#       green row ages past ~2 rounds), families whose code changed this
#       round first,
#   (3) everything else (freshest green rows) is left unlisted — the
#       registry appends it in module order past the cap.
# Round 10: (1) the round's new queries (no driver row yet: DSIR,
# variant props, MMR rerank, audio fingerprint, the UPDATE /
# OPTIMIZE+ZORDER / FSCK / DEEP-CLONE / HILBERT lifecycle rows, CUSUM
# alerts, Kleinberg bursts, sample quantiles), (2) queries whose CODE
# changed this round (graph-init dense ranks -> ann_graph_topk; bloom
# probe gating -> delta_bloom_point_lookup; copy_into legacy identity ->
# delta_copy_into_snapshot), (3) the 27 r6-aged oracle rows (the oldest
# remaining block: delta ops, dedup residue, analytics, events, text,
# similarity, sketches, media), (4) as much of the r7-aged block as fits
# the ~50 cap — rows-only approx twins and the ANN family first.
# Everything past the cap encodes round-11 priority. Goal state after
# r10: no row's newest green predates r7.
_VERIFY_FIRST = (
    # (1) NEW this round — no driver row yet
    "text_dsir_weights",
    "events_props_variant",
    "ann_mmr_rerank",
    "media_audio_fingerprint",
    "delta_update_snapshot",
    "delta_optimize_zorder_snapshot",
    "events_cusum_alerts",
    "events_user_bursts",
    "delta_fsck_snapshot",
    "delta_deep_clone_snapshot",
    "sketch_sample_quantiles",
    "delta_hilbert_snapshot",
    "text_bm25_topk",
    "ann_rrf_fusion",
    "delta_restore_timestamp_snapshot",
    # (2) code changed this round since newest green row
    "ann_graph_topk",
    "delta_bloom_point_lookup",
    "delta_copy_into_snapshot",
    # (3) r6-aged oracle rows — the oldest remaining block
    "q1_pricing_summary",
    "q2_min_cost_supplier",
    "q3_shipping_priority",
    "q4_order_priority",
    "q9_product_profit",
    "q11_important_values",
    "q16_supplier_part_counts",
    "q20_excess_shipments",
    "revenue_mom_growth",
    "supplier_fulfillment_rate",
    "orders_grouping_sets",
    "customer_rfm_scores",
    "events_value_percentiles",
    "events_funnel_latency",
    "events_hourly_gapfill",
    "events_inter_event_gaps",
    "text_bpe_merge_candidates",
    "text_repeated_ngram_spans",
    "text_filter_funnel_census",
    "documents_stratified_sample",
    "ann_pq_adc_topk",
    "knn_label_vote",
    "embedding_matryoshka_census",
    "embedding_pca_census",
    "sketch_heavy_hitters",
    "sketch_user_overlap",
    "media_decode_roundtrip",
    # (4) r7-aged block, oldest families first: rows-only approx twins,
    # media transform, ANN, then assorted
    "events_value_percentiles_approx",
    "events_funnel_latency_approx",
    "events_inter_event_gaps_approx",
    "media_transform_roundtrip",
    "ann_bruteforce_topk",
    "ann_ivf_topk",
    "ann_lsh_buckets",
    "ann_range_search",
    "ann_filtered_topk",
    "delta_identity_series",
    "dedup_minhash_calibration",
    "corpus_stats",
    "corpus_epoch_shuffle",
    "text_token_counts",
    "text_quality_scores",
    "text_lang_id",
    # --- past the ~50 cap: remaining r7 rows, encodes round-11 priority
    "text_fingerprint",
    "text_scrub_pii",
    "text_hash_sample",
    "text_train_val_test_split",
    "text_gopher_quality_filter",
    "text_top_ngrams",
    "text_split_contamination",
    "text_language_balance_sample",
    "text_length_histogram",
    "text_zipf_slope",
    "text_hashed_linear_quality",
    "text_scrub_repeated_spans",
    "events_tumbling_hourly",
    "events_sessionization",
    "events_user_stats",
    "events_purchase_funnel",
    "events_purchase_attribution",
    "events_purchase_sessions",
    "events_sliding_hourly",
    "events_props_json",
    "events_type_pivot",
    "events_daily_retention",
    "events_funnel_strict_order",
    "events_session_window_native",
    "events_activity_heatmap",
    "events_markov_transitions",
    "events_user_decay_scores",
    "events_weekly_cohort_retention",
    "events_metronome_census",
    "events_click_to_purchase",
    "events_click_purchase_nearest",
)


def _registry() -> tuple[dict, dict]:
    """Collect QUERIES/ORACLE from every plan module (import-gated so a
    broken optional module never takes down the whole registry)."""
    import importlib

    queries: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    oracle: dict[str, str] = {}
    for mod_name in (
        "delta_lake_health_spark.plans.analytics",
        "delta_lake_health_spark.plans.events",
        "delta_lake_health_spark.plans.health",
        "delta_lake_health_spark.plans.dedup",
        "delta_lake_health_spark.plans.text",
        "delta_lake_health_spark.plans.similarity",
        "delta_lake_health_spark.plans.sketch",
        "delta_lake_health_spark.plans.media",
    ):
        try:
            mod = importlib.import_module(mod_name)
        except ImportError:
            continue
        queries.update(getattr(mod, "QUERIES", {}))
        oracle.update(getattr(mod, "ORACLE", {}))

    ordered = [k for k in _VERIFY_FIRST if k in queries]
    ordered += [k for k in queries if k not in _VERIFY_FIRST]
    queries = {k: queries[k] for k in ordered}
    oracle = {k: oracle[k] for k in ordered if k in oracle}
    return queries, oracle


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (Q1 pricing summary) on sf0.001."""
    from delta_lake_health_spark.plans.analytics import q1_pricing_summary

    return q1_pricing_summary(spark, SF_SMOKE)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registry()[0]


def oracle_sql() -> dict[str, str]:
    return _registry()[1]
