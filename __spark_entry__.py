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
# Round 7: every red/stale row was cleared in r6, so the front of the
# list is pure rotation — the 30 queries whose newest green row dates to
# r3 (13 events + 13 text + 4 ann, per the r6 verdict), then the new
# rows-only approx twins and the queries whose code the round-7
# vocab-floor work touches, then the oldest r4 rows up to the ~50 cap.
# Everything past the cap encodes round-8 priority (remaining r4 rows).
_VERIFY_FIRST = (
    # (1) NEW this round (no driver row yet): Markov transitions, decayed
    # engagement, radius retrieval, Zipf-slope census, hashed linear
    # quality scorer, weekly cohort retention
    "events_markov_transitions",
    "events_user_decay_scores",
    "ann_range_search",
    "text_zipf_slope",
    "text_hashed_linear_quality",
    "events_weekly_cohort_retention",
    "ann_ivf_pq_topk",
    "events_user_value_pareto",
    "text_bigram_cross_entropy",
    "dedup_minhash_calibration",
    "events_metronome_census",
    "events_click_to_purchase",
    "delta_identity_series",
    "text_scrub_repeated_spans",
    "ann_filtered_topk",
    "events_click_purchase_nearest",
    "corpus_epoch_shuffle",
    "media_transform_roundtrip",
    # new rows-only entries this round: the percentile_approx twins
    # (first driver row needed — ahead of the aged-but-locally-green
    # rotation block so the ~50 cap can't push them out)
    "events_value_percentiles_approx",
    "events_funnel_latency_approx",
    "events_inter_event_gaps_approx",
    # (2) oldest green row is r3 — events family (13)
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
    # r3 rows — text family (13)
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
    # r3 rows — similarity family (4)
    "ann_bruteforce_topk",
    "ann_ivf_topk",
    "ann_lsh_buckets",
    "embedding_label_centroids",
    # (1b) code touched by the round-7 vocab-floor work — re-prove
    "text_unigram_surprise",
    "text_tfidf_keywords",
    "text_bpe_tokenize_fertility",
    # (2b) oldest r4 rows, filling to the ~50 cap
    "q5_local_supplier",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q10_returned_items",
    "q12_late_shipments",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q22_idle_customers",
    "q14_promo_effect",
    "q18_large_orders",
    "q19_discounted_revenue",
    "customers_without_orders",
    # --- past the ~50 cap: remaining r4 rows, encodes round-8 priority
    "topn_orders_per_customer",
    "order_status_rollup",
    "part_brand_stats",
    "running_revenue_by_month",
    "nation_coverage_setops",
    "orders_rollup",
    "q21_waiting_suppliers",
    "orders_cube",
    "revenue_7day_moving",
    "customer_balance_quartiles",
    "part_name_textops",
    "catalog_sql_revenue_by_nation",
    "skew_orders_by_month",
    "skew_lineitem_returnflag",
    "skew_orders_status_priority",
    "records_per_partition_orders",
    "events_anomaly_zscore",
    "events_sequence_pattern",
    "dedup_exact",
    "dedup_exact_stats",
    "dedup_minhash_pairs",
    "text_repetition_census",
    "text_chunk_dedup",
    "text_pack_sequences",
    "corpus_mixture_weights",
    "dedup_semantic_prune",
    "embedding_scalar_quantize",
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
