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
# Round 5: front-load media_decode_roundtrip (r3 row predates the
# WAV/Y4M schema change), profile_table_columns (r4 red row, output made
# tz-representation-robust this round), the 15 queries added late in
# round 4 that have never been driver-checked, and this round's new
# queries; then the r3-green families (dedup/corpus first — their code
# moved in round 4; events/percentile forms changed this round).
_VERIFY_FIRST = (
    # (1) never driver-verified / stale / previously red
    "media_decode_roundtrip",
    "profile_table_columns",
    "ann_pq_adc_topk",
    "dedup_incremental_bloom",
    "text_tfidf_keywords",
    "dedup_graph_pagerank",
    "dedup_source_overlap",
    "knn_label_vote",
    "events_funnel_latency",
    "events_hourly_gapfill",
    "text_bpe_merge_candidates",
    "embedding_matryoshka_census",
    "revenue_mom_growth",
    "supplier_fulfillment_rate",
    "events_inter_event_gaps",
    "sketch_heavy_hitters",
    "sketch_user_overlap",
    "embedding_pca_census",
    "text_bpe_tokenize_fertility",
    # (1b) new in round 5 — inserted here as they land
    "text_repeated_ngram_spans",
    "text_filter_funnel_census",
    "documents_stratified_sample",
    "delta_row_ids",
    "delta_skipping_conjunction",
    "orders_grouping_sets",
    "customer_rfm_scores",
    "referential_integrity_audit",
    # (2a) r4-green rows whose code moved MOST in round 5: the delta
    # reader/writer gained struct-schema conforming, row tracking
    # (tags/baseRowId/domainMetadata columns), CDC actions, and the
    # shared driver-side scan — re-prove the delta family on it
    "delta_time_travel_v0",
    "delta_change_feed",
    "delta_skipping_prune",
    "delta_dv_snapshot",
    "delta_mv_refresh",
    "delta_row_changes",
    "health_analyzer_report",
    # (2b) oldest green row is r3; dedup/corpus code moved in round 4
    "dedup_clusters",
    "dedup_shingle_duplication",
    "pipeline_corpus_build",
    "dedup_keep_corpus",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_embedding_cosine",
    # flagship analytics whose newest green row is r3
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q4_order_priority",
    "q2_min_cost_supplier",
    "q9_product_profit",
    "q11_important_values",
    "q16_supplier_part_counts",
    "q20_excess_shipments",
    # events family (r3 rows; percentile internals gain approx twins r5)
    "events_value_percentiles",
    "events_tumbling_hourly",
    "events_sessionization",
    "events_sliding_hourly",
    "events_purchase_sessions",
    "events_user_stats",
    "events_purchase_funnel",
    "events_purchase_attribution",
    "events_props_json",
    "events_type_pivot",
    "events_daily_retention",
    "events_funnel_strict_order",
    "events_session_window_native",
    "events_activity_heatmap",
    # similarity family (r3 rows)
    "ann_bruteforce_topk",
    "ann_ivf_topk",
    "ann_lsh_buckets",
    "embedding_label_centroids",
    # text family (r3 rows) — past the ~50 cap; encodes round-6 priority
    "text_token_counts",
    "text_quality_scores",
    "text_lang_id",
    "text_fingerprint",
    "corpus_stats",
    "text_scrub_pii",
    "text_hash_sample",
    "text_gopher_quality_filter",
    "text_top_ngrams",
    "text_train_val_test_split",
    "text_split_contamination",
    "text_language_balance_sample",
    "text_length_histogram",
    "sketch_approx_distinct",
    "sketch_approx_percentiles",
    "events_windowed_hll_users",
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
