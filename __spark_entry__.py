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
# Round 8: r7's cap landed exactly at ann_lsh_buckets, so the front is
# (1) the round's new queries (no driver row yet), (2) the one r7 RED
# row (events_user_value_pareto — oracle HUGEINT cast, fixed this
# round), (3) queries whose CODE changed in r7/r8 but whose newest row
# predates the change (the vocab-bound trio; tf-idf changes again this
# round via the broadcast short-circuit), (4) embedding_label_centroids
# (r3 — missed the r7 cap by one slot), then (5) the r4-aged rotation
# block. Everything past the ~50 cap encodes round-9 priority.
_VERIFY_FIRST = (
    # (1) NEW this round — no driver row yet (names appended here as
    # each lands; test_registry_integrity rejects unresolved names)
    "delta_convert_snapshot",
    "delta_reorg_purge",
    "events_user_streaks",
    "events_ab_holdout_lift",
    "ann_sq_int8_topk",
    "media_phash_neardup",
    "text_quality_lr_train",
    "delta_copy_into_snapshot",
    "delta_bloom_point_lookup",
    "dedup_containment",
    "events_top_paths",
    "documents_priority_sample_k",
    "media_scene_changes",
    "events_watermark_lateness",
    # (2) the single r7 red row, oracle cast fixed (VERDICT r7 #2)
    "events_user_value_pareto",
    # (3) code changed since newest green row
    "text_tfidf_keywords",
    "text_unigram_surprise",
    "text_bpe_tokenize_fertility",
    "ann_ivf_pq_topk",
    # (4) r3 straggler
    "embedding_label_centroids",
    # (5) r4-aged rotation block (oldest first; 14 never reached in r7)
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
    # --- past the ~50 cap: remaining r4 rows, encodes round-9 priority
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
