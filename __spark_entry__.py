"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``lab3_lakehouse_spark/``; queries register
themselves in ``lab3_lakehouse_spark.queries`` (one entry per operator
from SURVEY.md §2 + the §2.7/north-star extension surface).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from lab3_lakehouse_spark.queries import ORACLES, QUERIES

SF0001_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: A1 daily revenue (the reference's signature gold
    aggregate, etl_pipeline.py:107-116) over the sf0.001 corpus."""
    return QUERIES["daily_revenue"](spark, SF0001_DIR)


# Queries whose verdict would CHANGE this round come first (the driver
# checks the first 50 registry entries per round). Round-8 rotation
# (executes the written r7 plan, generalized to "oldest verdict
# first"): slots 1-15 are the queries NEW this round (SemDeDup
# cluster-pruned dedup, temperature-mix materializer, DSIR importance
# selection, IVF-PQ composed ANN, nDCG@10 retrieval eval, matryoshka
# truncation audit, retraction-based IVM, l-diversity audit, Holt
# trend, chi-square categorical drift, perceptual-hash media dedup,
# BM25 lexical retrieval, hybrid RRF, grouped trimmed mean,
# categorical mutual information — no driver verdict exists);
# 16-18 the
# r8-EDITED queries (the PQ skinny-shuffle + deterministic-codebook
# rework touched ann_pq_topk, the single-pass triangle attribution
# touched copurchase_edge_embeddedness, and the null-safe spine guard
# touched events_gap_filled_daily); 19-50 a 32-entry slice of the
# 39-entry r4-green block — incl. ann_lsh_topk (r4 verdict + the
# 1.78x bench drift r7 flagged; single-bench r8: 1.20 s, the drift
# was env variance) and the 5 streaming/SCD entries the r7 window
# displaced. The SEVEN r4-green entries the new queries pushed below
# the boundary (window_top_orders_per_customer, window_running_spend,
# window_rank_parts_by_price, window_lag_lead_events,
# value_percentiles, unpivot_order_amounts, top_building_orders) MUST
# lead the r9 window — their verdicts are four rounds old there. All 50 pre-verified green through the exact
# driver gate (check_query at sf0.01) before commit.
#
# ROUND-9 ROTATION PLAN (for the next builder): lead with (1) any
# query round 9 edits after its last check, (2) the 40-entry
# r5-green remainder directly below the boundary (their verdicts
# will be FOUR rounds old by r9), then (3) the r6-green block.
# The r7/r8 blocks at the back have the freshest verdicts.
# tests/test_engine.py::test_priority_rotation_names_all_registered
# guards against typos silently shrinking the window.
_PRIORITY = [
    "semantic_dedup_clustered",
    "temperature_mix_materialized",
    "dsir_target_selection",
    "ann_ivfpq_topk",
    "retrieval_label_ndcg",
    "matryoshka_truncation_audit",
    "incremental_agg_retractions",
    "l_diversity_audit",
    "revenue_holt_trend",
    "categorical_drift_chi2",
    "media_phash_dup_partners",
    "bm25_lexical_topk",
    "hybrid_rrf_retrieval",
    "trimmed_mean_event_values",
    "priority_status_mutual_info",
    "ann_pq_topk",
    "copurchase_edge_embeddedness",
    "events_gap_filled_daily",
    "ann_ivf_topk",
    "ann_lsh_topk",
    "approx_distinct_users",
    "daily_revenue",
    "derived_metrics",
    "explode_embedding_positions",
    "global_top_orders",
    "grouping_sets_orders",
    "hourly_demand",
    "join_anti_customers_without_urgent_orders",
    "join_customer_orders",
    "join_left_order_stats",
    "join_semi_customers_with_urgent_orders",
    "latest_event_per_user",
    "media_decode_features",
    "media_frame_sample",
    "merge_cdc_orders",
    "ml_feature_table",
    "ml_rf_metrics",
    "pack_documents_concat_chop",
    "pivot_user_event_counts",
    "pricing_summary",
    "quality_filter",
    "regional_revenue",
    "reject_report",
    "scd2_customer_priority",
    "set_union_orders",
    "sliding_window_counts",
    "stratified_sample_documents",
    "streaming_purchase_view_join",
    "streaming_session_windows",
    "streaming_tumbling_hourly",
    # ---- 50-slot window boundary ----
    "top_building_orders",
    "unpivot_order_amounts",
    "value_percentiles",
    "window_lag_lead_events",
    "window_rank_parts_by_price",
    "window_running_spend",
    "window_top_orders_per_customer",
    "part_copurchase_pagerank",
    "minhash_lsh_near_dups",
    "shared_span_dup_report",
    "dup_groups_connected",
    "decontamination_ngram_overlap",
    "kmeans_cluster_contract",
    "ann_filtered_topk",
    "bloom_filter_semi_join",
    "bpe_pair_frequencies",
    "chunk_documents_sliding",
    "cms_heavy_tokens_contract",
    "customer_rfm_segments",
    "daily_user_novelty_rate",
    "dedup_fingerprint_groups",
    "domain_mix_weights",
    "dow_hour_activity_matrix",
    "event_transition_matrix",
    "event_value_trends",
    "funnel_stage_conversion",
    "hll_mergeable_daily_users",
    "incremental_join_maintenance",
    "join_cardinality_preflight",
    "join_key_skew_report",
    "kmv_audience_overlap",
    "lang_id_predictions",
    "lineitem_stat_moments",
    "mad_outlier_report",
    "packing_utilization_report",
    "per_source_document_quota",
    "rare_token_doc_quality",
    "referential_integrity_audit",
    "revenue_pareto_curve",
    "seasonal_residual_anomalies",
    "segment_top_spenders_with_ties",
    "sql_forecast_revenue",
    "sql_shipmode_priority",
    "text_quality_features",
    "tfidf_top_terms",
    "throttled_event_stream",
    "time_decay_user_value",
    "token_counts",
    "unicode_nfc_report",
    "unigram_surprisal_scores",
    "user_retention_cohorts",
    "word_jaccard_near_dups",
    "zipf_fit_tokens",
    "approx_top_tokens_contract",
    "basket_association_rules",
    "benford_price_audit",
    "bigram_surprisal_scores",
    "categorical_entropy_report",
    "containment_near_dups",
    "containment_prefix_filtered",
    "crossval_fold_balance",
    "distinct_user_count",
    "distinct_user_event_types",
    "distribution_drift_psi",
    "embedding_quantization_report",
    "embedding_random_projection",
    "equi_depth_price_buckets",
    "fuzzy_part_name_matches",
    "global_balance_ranks",
    "gopher_repetition_rules",
    "heavy_hitter_tokens",
    "impute_event_values",
    "incremental_near_dup_new_docs",
    "interval_overlap_view_purchase",
    "order_price_histogram",
    "profile_orders_columns",
    "rolling_7d_distinct_users",
    "semantic_dedup_flags",
    "set_except_orders",
    "set_intersect_orders",
    "snapshot_diff_orders",
    "sql_cheapest_supplier_per_part",
    "sql_disjunctive_revenue",
    "sql_important_parts",
    "sql_nation_profit",
    "sql_national_market_share",
    "sql_order_count_distribution",
    "sql_part_promotion_suppliers",
    "sql_part_supplier_counts",
    "sql_promo_revenue_share",
    "sql_returned_item_report",
    "sql_top_revenue_supplier",
    "sql_volume_shipping",
    "sql_waiting_suppliers",
    "token_pmi_collocations",
    "user_activity_coverage",
    "user_burstiness_profile",
    "weighted_doc_sample",
    "ann_topk_bruteforce",
    "approx_percentiles_contract",
    "asof_purchase_last_view",
    "binary_media_metadata",
    "bootstrap_revenue_ci",
    "corpus_quality_gate",
    "cube_order_status_priority",
    "daily_revenue_ewma",
    "dedup_exact_keep_first",
    "distribution_drift_ks",
    "doc_fingerprint_matches",
    "doc_quality_rank_ensemble",
    "domain_temperature_mix",
    "embedding_cosine_pairs",
    "embedding_label_centroids",
    "event_type_trigram_paths",
    "funnel_conversion_deadline",
    "incremental_rollup_hourly",
    "json_extract_props",
    "k_anonymity_audit",
    "kcore_part_graph",
    "part_copurchase_communities",
    "part_copurchase_triangles",
    "pii_redaction_report",
    "range_join_price_bands",
    "retrieval_label_mrr",
    "revenue_cusum_changepoints",
    "revenue_theilsen_trend",
    "rollup_lineitem_status",
    "salted_agg_event_type",
    "salted_join_lineitem_supplier",
    "scalar_date_funcs",
    "scalar_math_funcs",
    "scalar_string_funcs",
    "session_window_per_user",
    "simhash_near_dups",
    "sql_balance_prospects",
    "sql_large_volume_customers",
    "sql_late_order_priority",
    "sql_small_qty_revenue",
    "streaming_dedup_users",
    "streaming_stateful_user_totals",
    "streaming_static_enrichment",
    "tumbling_window_hourly",
    "union_evolved_event_slices",
    "window_distribution_ranks",
    "window_trailing_1h_sum",
]


def _ordered(names: dict) -> list[str]:
    front = [n for n in _PRIORITY if n in names]
    return front + [n for n in names if n not in set(front)]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {n: QUERIES[n] for n in _ordered(QUERIES)}


def oracle_sql() -> dict[str, str]:
    return {n: ORACLES[n] for n in _ordered(QUERIES) if n in ORACLES}
