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
# Round 11: (1) the round's new query (text_bm25_served — the
# persisted-BM25 serving path), (2) queries whose CODE changed this
# round: the two-phase bucketed-rank rewrites (customer_balance_
# quartiles, customer_rfm_scores), the rerank-operator refactor + the
# served-IVF candidate stage (ann_mmr_rerank, ann_rrf_fusion), the
# cusum_hourly_series extraction (events_cusum_alerts), the BM25
# oracle-constant extraction (text_bm25_topk), and four lifecycle rows
# exercising the new build_once fixture guard's distinct shapes —
# value-marker (fsck), two-table clean (deep clone), value-returning
# builds (copy_into, which also carries the legacy-identity fix, and
# cdc_sync), (3) the ENTIRE r7-aged block (VERDICT r10 task #2 — the
# 30 rows whose newest green dated to r7), (4) the head of the r8-aged
# block up to the ~50 cap. Past-cap entries encode round-12 priority:
# the rest of the r8 rows, then the r9 lifecycle rows. Goal state
# after r11: no row's newest green predates r8.
_VERIFY_FIRST = (
    # (1) NEW this round — no driver row yet
    "text_bm25_served",
    "media_audio_fp_served",
    "text_chunk_census",
    # (2) code changed this round since newest green row
    "customer_balance_quartiles",
    "customer_rfm_scores",
    "ann_mmr_rerank",
    "ann_rrf_fusion",
    "events_cusum_alerts",
    "text_bm25_topk",
    "delta_fsck_snapshot",
    "delta_deep_clone_snapshot",
    "delta_copy_into_snapshot",
    "delta_cdc_sync",
    # (3) the full r7-aged block — front-loaded per VERDICT r10 #2
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
    # (4) head of the r8-aged block, to the ~50 cap
    "delta_convert_snapshot",
    "delta_reorg_purge",
    "dedup_containment",
    "events_user_streaks",
    "events_ab_holdout_lift",
    "events_top_paths",
    "events_watermark_lateness",
    "ann_sq_int8_topk",
    "documents_priority_sample_k",
    # --- past the ~50 cap: encodes round-12 priority — the rest of the
    # r8 rows, then the r9 lifecycle rows
    "text_quality_lr_train",
    "media_phash_neardup",
    "media_scene_changes",
    "ann_ivf_pq_topk",
    "delta_restore_snapshot",
    "delta_clone_snapshot",
    "delta_merge_snapshot",
    "delta_vacuum_snapshot",
    "delta_schema_evolution",
    "delta_generated_columns",
    "ann_graph_topk",
    "delta_bloom_point_lookup",
    "text_tfidf_keywords",
    "dedup_incremental_bloom",
    "dedup_graph_pagerank",
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
