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
# Round 9: per the VERDICT r8 rotation order — (1) the round's new
# queries (no driver row yet), (2) queries whose CODE changed this
# round (incremental bloom index, copy_into identity, distributed
# reorg probe, the AQE vocab-join rewrite touching the four text
# consumers), (3) the three r3-aged rows-only sketch entries, (4) the
# 11 r4-aged oracle rows, then (5) the r6-aged block (delta ops first,
# then dedup, analytics, events, text, similarity, sketches, media).
# Everything past the ~50 cap encodes round-10 priority. Goal state
# after r9: no oracle row's newest green predates r6, no rows-only
# entry's newest execution predates r8.
_VERIFY_FIRST = (
    # (1) NEW this round — no driver row yet
    "delta_cdc_sync",
    "ann_graph_topk",
    "delta_restore_snapshot",
    "delta_clone_snapshot",
    "delta_schema_evolution",
    "delta_generated_columns",
    "delta_merge_snapshot",
    "delta_vacuum_snapshot",
    # (2) code changed this round since newest green row
    "delta_bloom_point_lookup",
    "delta_copy_into_snapshot",
    "delta_reorg_purge",
    "text_tfidf_keywords",
    "text_unigram_surprise",
    "text_bigram_cross_entropy",
    "text_bpe_tokenize_fertility",
    # (3) r3-aged rows-only sketch paths (VERDICT r8 task #1)
    "sketch_approx_distinct",
    "sketch_approx_percentiles",
    "events_windowed_hll_users",
    # (4) r4-aged oracle rows — the last of the r4 block
    "corpus_mixture_weights",
    "dedup_exact",
    "dedup_exact_stats",
    "dedup_minhash_pairs",
    "dedup_semantic_prune",
    "embedding_scalar_quantize",
    "events_anomaly_zscore",
    "events_sequence_pattern",
    "text_chunk_dedup",
    "text_pack_sequences",
    "text_repetition_census",
    # (5) r6-aged block: delta ops first ...
    "delta_time_travel_v0",
    "delta_dv_snapshot",
    "delta_mv_refresh",
    "delta_row_changes",
    "health_analyzer_report",
    "delta_change_feed",
    "delta_skipping_prune",
    "delta_skipping_conjunction",
    "delta_row_ids",
    "profile_table_columns",
    "referential_integrity_audit",
    # ... then the r6 dedup block ...
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_embedding_cosine",
    "dedup_clusters",
    "dedup_shingle_duplication",
    "dedup_keep_corpus",
    "pipeline_corpus_build",
    "dedup_incremental_bloom",
    "dedup_source_overlap",
    "dedup_graph_pagerank",
    # ... r6 analytics ...
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q4_order_priority",
    "q2_min_cost_supplier",
    "q9_product_profit",
    "q11_important_values",
    "q16_supplier_part_counts",
    "q20_excess_shipments",
    # --- past the ~50 cap: remaining r6 rows, encodes round-10 priority
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
    "sketch_heavy_hitters",
    "sketch_user_overlap",
    "media_decode_roundtrip",
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
