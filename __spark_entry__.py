"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 together with its DuckDB oracle SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF_SMOKE = "/root/testdata/sf0.001"

# The correctness driver verifies registry entries in insertion order and
# caps near 50 rows per round.  Round 2 verified the first 50 (analytics /
# events / health / dedup X1-X3); these 19 never got a driver-green row, so
# round 3 front-loads them.  Queries past the cap this round all have green
# rows in CORRECTNESS_r02.json.
_VERIFY_FIRST = (
    # new in round 3 (complete the TPC-H-22 surface)
    "q2_min_cost_supplier",
    "q9_product_profit",
    "q11_important_values",
    "q16_supplier_part_counts",
    "q20_excess_shipments",
    "text_gopher_quality_filter",
    "text_top_ngrams",
    "dedup_shingle_duplication",
    "text_split_contamination",
    "text_language_balance_sample",
    "dedup_keep_corpus",
    "events_daily_retention",
    "pipeline_corpus_build",
    "events_funnel_strict_order",
    "events_session_window_native",
    "text_length_histogram",
    "events_activity_heatmap",
    # never driver-verified before round 3
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_embedding_cosine",
    "dedup_clusters",
    "text_token_counts",
    "text_quality_scores",
    "text_lang_id",
    "text_fingerprint",
    "corpus_stats",
    "text_scrub_pii",
    "text_hash_sample",
    "text_train_val_test_split",
    "ann_bruteforce_topk",
    "ann_ivf_topk",
    "ann_lsh_buckets",
    "embedding_label_centroids",
    "sketch_approx_distinct",
    "sketch_approx_percentiles",
    "events_windowed_hll_users",
    "media_decode_roundtrip",
    # the events table's on-disk ts type changed in the round-3 testdata
    # drop (nanos -> micros) — re-verify the whole events family against
    # the new files rather than relying on r2 rows from the old ones
    "events_tumbling_hourly",
    "events_sessionization",
    "events_sliding_hourly",
    "events_user_stats",
    "events_purchase_funnel",
    "events_purchase_attribution",
    "events_purchase_sessions",
    "events_props_json",
    "events_type_pivot",
    "events_value_percentiles",
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
