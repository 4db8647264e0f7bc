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
#   (2) queries whose CODE changed this round since their newest green
#       row, then
#   (3) everything else by OLDEST newest-green round first (so no
#       query's last green row ages unboundedly).
# Round 14: the list below is GENERATED, not hand-curated —
# `python tools/gen_verify_first.py --changed <names>` computes it from
# the CORRECTNESS_r*.json history; it enumerates the COMPLETE registry
# so insertion order is fully determined. The ~50-row driver cap lands
# on: the new rows, this round's changed set, the full 10-row r8-aged
# block VERDICT r12 #7 mandates, and the head of the r9-aged block.
_VERIFY_FIRST = (
    "ann_mmr_rerank",  # newest green r11, CHANGED this round
    "text_chunk_hybrid_topk",  # newest green r13, CHANGED this round
    "text_chunk_bm25_topk",  # newest green r13, CHANGED this round
    "pipeline_corpus_build",  # newest green r9, CHANGED this round
    "dedup_keep_corpus",  # newest green r13, CHANGED this round
    "dedup_clusters",  # newest green r13, CHANGED this round
    "dedup_shingle_duplication",  # newest green r13, CHANGED this round
    "text_repeated_ngram_spans",  # newest green r10, CHANGED this round
    "text_scrub_repeated_spans",  # newest green r11, CHANGED this round
    "dedup_incremental_bloom",  # newest green r13, CHANGED this round
    "dedup_source_overlap",  # newest green r13, CHANGED this round
    "text_split_contamination",  # newest green r11, CHANGED this round
    "dedup_ngram_jaccard",  # newest green r13, CHANGED this round
    "dedup_minhash_verified",  # newest green r13, CHANGED this round
    "dedup_minhash_probe",  # newest green r13, CHANGED this round
    "dedup_minhash_served",  # newest green r13, CHANGED this round
    "health_analyzer_report",  # newest green r9, CHANGED this round
    "text_dsir_weights",  # newest green r10, CHANGED this round
    "text_tfidf_keywords",  # newest green r9, CHANGED this round
    "ann_sq_int8_topk",  # newest green r12, CHANGED this round
    "dedup_graph_pagerank",  # newest green r13, CHANGED this round
    "dedup_simhash",  # newest green r13, CHANGED this round
    "dedup_exact",  # newest green r13, CHANGED this round
    "dedup_exact_stats",  # newest green r13, CHANGED this round
    "pipeline_stream_door_census",  # newest green r13, CHANGED this round
    "pipeline_door_quarantine",  # newest green r13, CHANGED this round
    "media_phash_served",  # newest green r13, CHANGED this round
    "text_bm25_served",  # newest green r12, CHANGED this round
    "delta_change_feed",  # newest green r13, CHANGED this round
    "delta_merge_snapshot",  # newest green r13, CHANGED this round
    "delta_row_ids",  # newest green r13, CHANGED this round
    "delta_optimize_zorder_snapshot",  # newest green r10, CHANGED this round
    "delta_hilbert_snapshot",  # newest green r10, CHANGED this round
    "delta_identity_series",  # newest green r12, CHANGED this round
    "delta_column_defaults",  # newest green r12, CHANGED this round
    "delta_update_snapshot",  # newest green r10, CHANGED this round
    "delta_cdc_sync",  # newest green r11, CHANGED this round
    "delta_copy_into_snapshot",  # newest green r11, CHANGED this round
    "delta_vacuum_snapshot",  # newest green r13, CHANGED this round
    "delta_clone_snapshot",  # newest green r13, CHANGED this round
    "delta_deep_clone_snapshot",  # newest green r11, CHANGED this round
    "profile_table_columns",  # newest green r9
    "referential_integrity_audit",  # newest green r9
    "sketch_approx_distinct",  # newest green r9
    "sketch_approx_percentiles",  # newest green r9
    "text_bigram_cross_entropy",  # newest green r9
    "text_bpe_tokenize_fertility",  # newest green r9
    "text_chunk_dedup",  # newest green r9
    "text_repetition_census",  # newest green r9
    "text_unigram_surprise",  # newest green r9
    "ann_bruteforce_topk",  # newest green r10
    "ann_graph_topk",  # newest green r10
    "ann_pq_adc_topk",  # newest green r10
    "delta_bloom_point_lookup",  # newest green r10
    "delta_restore_timestamp_snapshot",  # newest green r10
    "documents_stratified_sample",  # newest green r10
    "embedding_matryoshka_census",  # newest green r10
    "embedding_pca_census",  # newest green r10
    "events_funnel_latency",  # newest green r10
    "events_funnel_latency_approx",  # newest green r10
    "events_hourly_gapfill",  # newest green r10
    "events_inter_event_gaps",  # newest green r10
    "events_inter_event_gaps_approx",  # newest green r10
    "events_props_variant",  # newest green r10
    "events_user_bursts",  # newest green r10
    "events_value_percentiles",  # newest green r10
    "events_value_percentiles_approx",  # newest green r10
    "knn_label_vote",  # newest green r10
    "media_audio_fingerprint",  # newest green r10
    "media_decode_roundtrip",  # newest green r10
    "media_transform_roundtrip",  # newest green r10
    "orders_grouping_sets",  # newest green r10
    "q11_important_values",  # newest green r10
    "q16_supplier_part_counts",  # newest green r10
    "q1_pricing_summary",  # newest green r10
    "q20_excess_shipments",  # newest green r10
    "q2_min_cost_supplier",  # newest green r10
    "q3_shipping_priority",  # newest green r10
    "q4_order_priority",  # newest green r10
    "q9_product_profit",  # newest green r10
    "revenue_mom_growth",  # newest green r10
    "sketch_heavy_hitters",  # newest green r10
    "sketch_sample_quantiles",  # newest green r10
    "sketch_user_overlap",  # newest green r10
    "supplier_fulfillment_rate",  # newest green r10
    "text_bpe_merge_candidates",  # newest green r10
    "text_filter_funnel_census",  # newest green r10
    "ann_rrf_fusion",  # newest green r11
    "dedup_containment",  # newest green r11
    "delta_convert_snapshot",  # newest green r11
    "delta_fsck_snapshot",  # newest green r11
    "delta_reorg_purge",  # newest green r11
    "events_ab_holdout_lift",  # newest green r11
    "events_activity_heatmap",  # newest green r11
    "events_click_purchase_nearest",  # newest green r11
    "events_click_to_purchase",  # newest green r11
    "events_cusum_alerts",  # newest green r11
    "events_daily_retention",  # newest green r11
    "events_funnel_strict_order",  # newest green r11
    "events_markov_transitions",  # newest green r11
    "events_metronome_census",  # newest green r11
    "events_props_json",  # newest green r11
    "events_purchase_attribution",  # newest green r11
    "events_purchase_funnel",  # newest green r11
    "events_purchase_sessions",  # newest green r11
    "events_session_window_native",  # newest green r11
    "events_sessionization",  # newest green r11
    "events_sliding_hourly",  # newest green r11
    "events_top_paths",  # newest green r11
    "events_tumbling_hourly",  # newest green r11
    "events_type_pivot",  # newest green r11
    "events_user_decay_scores",  # newest green r11
    "events_user_stats",  # newest green r11
    "events_user_streaks",  # newest green r11
    "events_weekly_cohort_retention",  # newest green r11
    "media_audio_fp_served",  # newest green r11
    "text_chunk_census",  # newest green r11
    "text_fingerprint",  # newest green r11
    "text_gopher_quality_filter",  # newest green r11
    "text_hash_sample",  # newest green r11
    "text_hashed_linear_quality",  # newest green r11
    "text_language_balance_sample",  # newest green r11
    "text_length_histogram",  # newest green r11
    "text_scrub_pii",  # newest green r11
    "text_top_ngrams",  # newest green r11
    "text_train_val_test_split",  # newest green r11
    "text_zipf_slope",  # newest green r11
    "ann_filtered_topk",  # newest green r12
    "ann_ivf_pq_topk",  # newest green r12
    "ann_ivf_topk",  # newest green r12
    "ann_lsh_buckets",  # newest green r12
    "ann_range_search",  # newest green r12
    "catalog_sql_revenue_by_nation",  # newest green r12
    "corpus_epoch_shuffle",  # newest green r12
    "corpus_stats",  # newest green r12
    "customer_balance_quartiles",  # newest green r12
    "customer_rfm_scores",  # newest green r12
    "customers_without_orders",  # newest green r12
    "dedup_minhash_calibration",  # newest green r12
    "dedup_minhash_pairs",  # newest green r12
    "documents_priority_sample_k",  # newest green r12
    "embedding_label_centroids",  # newest green r12
    "events_user_value_pareto",  # newest green r12
    "events_watermark_lateness",  # newest green r12
    "media_scene_changes",  # newest green r12
    "nation_coverage_setops",  # newest green r12
    "order_status_rollup",  # newest green r12
    "orders_cube",  # newest green r12
    "orders_rollup",  # newest green r12
    "part_brand_stats",  # newest green r12
    "part_name_textops",  # newest green r12
    "q10_returned_items",  # newest green r12
    "q12_late_shipments",  # newest green r12
    "q13_customer_distribution",  # newest green r12
    "q14_promo_effect",  # newest green r12
    "q15_top_supplier",  # newest green r12
    "q17_small_quantity_revenue",  # newest green r12
    "q18_large_orders",  # newest green r12
    "q19_discounted_revenue",  # newest green r12
    "q21_waiting_suppliers",  # newest green r12
    "q22_idle_customers",  # newest green r12
    "q5_local_supplier",  # newest green r12
    "q6_forecast_revenue",  # newest green r12
    "text_bm25_topk",  # newest green r12
    "text_html_boilerplate",  # newest green r12
    "text_lang_id",  # newest green r12
    "text_pack_sequences",  # newest green r12
    "text_quality_scores",  # newest green r12
    "text_token_counts",  # newest green r12
    "corpus_mixture_weights",  # newest green r13
    "dedup_embedding_cosine",  # newest green r13
    "dedup_semantic_prune",  # newest green r13
    "delta_dv_snapshot",  # newest green r13
    "delta_generated_columns",  # newest green r13
    "delta_mv_refresh",  # newest green r13
    "delta_restore_snapshot",  # newest green r13
    "delta_row_changes",  # newest green r13
    "delta_schema_evolution",  # newest green r13
    "delta_skipping_conjunction",  # newest green r13
    "delta_skipping_prune",  # newest green r13
    "delta_time_travel_v0",  # newest green r13
    "embedding_scalar_quantize",  # newest green r13
    "events_anomaly_zscore",  # newest green r13
    "events_sequence_pattern",  # newest green r13
    "events_windowed_hll_users",  # newest green r13
    "media_phash_neardup",  # newest green r13
    "q7_volume_shipping",  # newest green r13
    "q8_market_share",  # newest green r13
    "records_per_partition_orders",  # newest green r13
    "revenue_7day_moving",  # newest green r13
    "running_revenue_by_month",  # newest green r13
    "skew_lineitem_returnflag",  # newest green r13
    "skew_orders_by_month",  # newest green r13
    "skew_orders_status_priority",  # newest green r13
    "text_quality_lr_train",  # newest green r13
    "topn_orders_per_customer",  # newest green r13
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
