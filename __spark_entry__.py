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
# checks the first 50 registry entries per round). ROUND-14 rotation
# (executes the plan written in the r13 header; ages below are
# DRIVER-stamped ages):
#   slots 1-7   the NEW r14 second-batch ops: bpe_train_apply
#               (iterative BPE merge training on the word-frequency
#               collapse, trajectory replayed by chained oracle CTEs),
#               xlingual_mined_pairs (ratio-margin bitext mining),
#               ngram_novelty_profile (first-occurrence trigram
#               novelty), cluster_balanced_sample (embedding-space
#               quota sampling), vocab_coverage_curve (tokenizer
#               sizing table), lsh_banding_frontier (MinHash S-curve
#               tuning table), packing_ffd_report (no-split FFD
#               packing, recursive-CTE oracle). These shift every
#               slot below by 7 — with the 2 first-batch ops, the
#               last 9 entries of the r13-planned window
#               (sql_important_parts … scalar_math_funcs) fall past
#               the boundary and lead the r15 displaced queue.
#   (next 2)    the NEW r14 first-batch ops (quality_classifier_curriculum — a
#               GD-trained logistic quality classifier DISTILLING the
#               corpus-frequency Gopher gate into four scan-local
#               features, trajectory round4-pinned so training,
#               scores, AUC, loss and phase cuts all replay exactly
#               in the recursive-CTE oracle; packed_batch_manifest —
#               the per-(shard, epoch) packed-sequence manifest that
#               composes deterministic_shard_assignment +
#               epoch_shuffle_plan + concat-chop packing into the
#               table a training data loader actually consumes).
#   slots 3-5   the r14-EDITED entries re-verified: epoch_shuffle_plan
#               (shared _epoch_order_frame refactor with the new
#               manifest entry), minhash_band_rebalance (the params
#               sidecar tier now validates num_perm/seed/band
#               multiplicity before any rewrite), and
#               word_jaccard_near_dups (banded-pairs threshold guard
#               hardened from assert to ValueError).
#   slots 6-13  the 8 entries displaced past the r13 boundary
#               (global_balance_ranks … embedding_random_projection —
#               all green in the r13 pre-sweep; they led this queue
#               per the r13 plan; global_balance_ranks is also the
#               r13 verdict's perf-weak item, re-adjudicated in
#               COVERAGE.md §r14 and A/B-slotted in bench.py).
#   slots 14-50 the r5-r9-green fill continuing from
#               sql_returned_item_report in the r13-header order —
#               the oldest remaining driver stamps advance.
# After the boundary: the rest of the r5-r9 fill in prior order, the
# r10, r11, r12 blocks, and the r13-stamped window LAST (freshest
# stamps re-verify last).
#
# ROUND-15 ROTATION PLAN (for the next builder): lead with (1) any
# r15 edits/new ops, (2) whatever this round's additions displace
# past slot 50 (check CORRECTNESS_r14.json's actual window against
# the list below), (3) the r5-r9 fill continuing after the boundary
# in the order below, (4) keep the r10-r13 blocks at the end
# (freshest last).
# tests/test_engine.py::test_priority_rotation_names_all_registered
# guards against typos silently shrinking the window.
_PRIORITY = [
    "bpe_train_apply",  # --- r14 NEW ops first (second batch: iterative
    "xlingual_mined_pairs",  #     BPE trainer, CCMatrix margin mining,
    "ngram_novelty_profile",  #    first-occurrence trigram novelty,
    "cluster_balanced_sample",  #  embedding-space quota sampling,
    "vocab_coverage_curve",  #     tokenizer vocab sizing table,
    "lsh_banding_frontier",  #     MinHash S-curve tuning table,
    "packing_ffd_report",  #       no-split FFD sequence packing)
    "quality_classifier_curriculum",  # --- r14 NEW ops (first batch)
    "packed_batch_manifest",
    "epoch_shuffle_plan",  # --- r14-EDITED: shared _epoch_order_frame refactor
    "minhash_band_rebalance",  # --- r14-EDITED: params-sidecar validation
    "word_jaccard_near_dups",  #     (+ banded-pairs ValueError guard)
    "global_balance_ranks",  # --- the 8 entries displaced past the r13 boundary
    "containment_near_dups",
    "containment_prefix_filtered",
    "weighted_doc_sample",
    "bigram_surprisal_scores",
    "token_pmi_collocations",
    "crossval_fold_balance",
    "embedding_random_projection",
    "sql_returned_item_report",  # --- r5-r9 fill continuing in prior order
    "order_price_histogram",
    "profile_orders_columns",
    "approx_top_tokens_contract",
    "equi_depth_price_buckets",
    "snapshot_diff_orders",
    "gopher_repetition_rules",
    "heavy_hitter_tokens",
    "semantic_dedup_flags",
    "embedding_quantization_report",
    "fuzzy_part_name_matches",
    "impute_event_values",
    "interval_overlap_view_purchase",
    "incremental_near_dup_new_docs",
    "basket_association_rules",
    "user_activity_coverage",
    "user_burstiness_profile",
    "rolling_7d_distinct_users",
    "benford_price_audit",
    "categorical_entropy_report",
    "distribution_drift_psi",
    "sql_volume_shipping",
    "sql_national_market_share",
    "sql_nation_profit",
    "sql_promo_revenue_share",
    "sql_disjunctive_revenue",
    "sql_order_count_distribution",
    "sql_waiting_suppliers",
    "sql_part_promotion_suppliers",
    "sql_top_revenue_supplier",
    "sql_important_parts",
    "sql_part_supplier_counts",
    "sql_cheapest_supplier_per_part",
    "window_distribution_ranks",
    "rollup_lineitem_status",
    "cube_order_status_priority",
    "scalar_string_funcs",
    "scalar_date_funcs",
    "scalar_math_funcs",
    "json_extract_props",
    "tumbling_window_hourly",
    "session_window_per_user",
    "union_evolved_event_slices",
    "dedup_exact_keep_first",
    "simhash_near_dups",
    "embedding_cosine_pairs",
    "ann_topk_bruteforce",
    "doc_fingerprint_matches",
    "binary_media_metadata",
    "asof_purchase_last_view",
    "window_trailing_1h_sum",
    "salted_join_lineitem_supplier",
    "range_join_price_bands",
    "approx_percentiles_contract",
    "salted_agg_event_type",
    "sql_late_order_priority",
    "sql_small_qty_revenue",
    "sql_large_volume_customers",
    "sql_balance_prospects",
    "incremental_rollup_hourly",
    "pii_redaction_report",
    "embedding_label_centroids",
    "corpus_quality_gate",
    "daily_revenue_ewma",
    "part_copurchase_communities",
    "part_copurchase_triangles",
    "distribution_drift_ks",
    "bootstrap_revenue_ci",
    "revenue_theilsen_trend",
    "event_type_trigram_paths",
    "domain_temperature_mix",
    "doc_quality_rank_ensemble",
    "retrieval_label_mrr",
    "funnel_conversion_deadline",
    "k_anonymity_audit",
    "ann_store_ivfpq_topk",
    "media_phash_store_partners",
    "streaming_bm25_index",
    "kll_tier_compaction",
    "cross_source_containment",
    "bm25_store_compaction",
    "t_closeness_audit",
    "functional_dependency_audit",
    "part_price_size_skyline",
    "kaplan_meier_conversion",
    "welch_ttest_purchase_click",
    "spearman_value_hour",
    "gini_segment_spend",
    "acf_daily_revenue",
    "copurchase_degree_assortativity",
    "embedding_feature_covariance",
    "mannwhitney_value_shift",
    "conversion_rate_ztest",
    "heaps_vocabulary_growth",
    "hard_negative_mining",
    "kll_quantile_contract",
    "reject_report",
    "derived_metrics",
    "pricing_summary",
    "join_customer_orders",
    "join_left_order_stats",
    "join_semi_customers_with_urgent_orders",
    "join_anti_customers_without_urgent_orders",
    "regional_revenue",
    "global_top_orders",
    "set_union_orders",
    "approx_distinct_users",
    "grouping_sets_orders",
    "ann_ivf_topk",
    "ann_lsh_topk",
    "media_decode_features",
    "media_frame_sample",
    "pack_documents_concat_chop",
    "stratified_sample_documents",
    "sliding_window_counts",
    "ml_feature_table",
    "ml_rf_metrics",
    "pivot_user_event_counts",
    "explode_embedding_positions",
    "latest_event_per_user",
    "merge_cdc_orders",
    "scd2_customer_priority",
    "calibration_threshold_audit",
    "rerank_store_candidates",
    "source_token_jsd",
    "good_turing_oov_estimate",
    "fold_target_encoding",
    "multi_touch_attribution",
    "hard_negative_store_mining",
    "code_switch_langmix",
    "source_length_calibration",
    "neyman_stratified_sample",
    "dp_noisy_counts",
    "jaro_winkler_name_matches",
    "bm25_postings_topk",
    "ann_ivfpq_topk",
    "ann_pq_topk",
    "rerank_fused_candidates",
    "winsorized_mean_event_values",
    "media_phash_dup_partners",
    "dedup_fingerprint_groups",
    "decontamination_ngram_overlap",
    "tfidf_top_terms",
    "minhash_lsh_near_dups",
    "text_quality_features",
    "lang_id_predictions",
    "token_counts",
    "bpe_pair_frequencies",
    "domain_mix_weights",
    "unigram_surprisal_scores",
    "priority_status_mutual_info",
    "retrieval_label_ndcg",
    "temperature_mix_materialized",
    "semantic_dedup_clustered",
    "hybrid_rrf_retrieval",
    "max_dup_span_segments",
    "dup_span_repair_report",
    "ivf_cell_balance_report",
    "tokenizer_fertility_by_source",
    "embedding_norm_audit",
    "region_revenue_ols",
    "length_stratified_sample",
    "token_budget_epoch_allocation",
    "uniform_sample_store",
    "conformal_quality_threshold",
    "embedding_centroid_drift",
    "weighted_sample_store",
    "streaming_kll_store",
    "decontamination_bloom_store",
    "streaming_bloom_decontamination",
    "sql_shipping_priority",
    "asof_view_next_purchase",
    "bm25_lexical_topk",
    "incremental_agg_retractions",
    "matryoshka_truncation_audit",
    "dsir_target_selection",
    "trimmed_mean_event_values",
    "categorical_drift_chi2",
    "l_diversity_audit",
    "streaming_tumbling_hourly",
    "streaming_session_windows",
    "streaming_dedup_users",
    "streaming_static_enrichment",
    "streaming_purchase_view_join",
    "streaming_stateful_user_totals",
    "copurchase_edge_embeddedness",
    "events_gap_filled_daily",
    "window_top_orders_per_customer",
    "window_running_spend",
    "window_rank_parts_by_price",
    "window_lag_lead_events",
    "value_percentiles",
    "unpivot_order_amounts",
    "top_building_orders",
    "daily_revenue",
    "hourly_demand",
    "quality_filter",
    "zipf_fit_tokens",
    "hll_mergeable_daily_users",
    "lineitem_stat_moments",
    "event_value_trends",
    "chunk_documents_sliding",
    "cms_heavy_tokens_contract",
    "bloom_filter_semi_join",
    "rare_token_doc_quality",
    "funnel_stage_conversion",
    "time_decay_user_value",
    "mad_outlier_report",
    "ann_store_reindex_swap",  # --- the r13-stamped window (freshest stamps last)
    "deterministic_shard_assignment",
    "semantic_decontamination",
    "context_window_fit",
    "curriculum_quality_phases",
    "streaming_semantic_decontamination",
    "ann_recall_frontier",
    "incremental_split_maintenance",
    "leakage_safe_split_assignment",
    "dup_groups_connected",
    "cross_source_dup_matrix",
    "dup_group_size_histogram",
    "dup_component_density_audit",
    "dup_canonical_selection",
    "dedup_discounted_token_budget",
    "streaming_split_assignment",
    "kcore_part_graph",
    "revenue_cusum_changepoints",
    "revenue_holt_trend",
    "holt_winters_weekly",
    "user_retention_cohorts",
    "per_source_document_quota",
    "ann_filtered_topk",
    "kmeans_cluster_contract",
    "shared_span_dup_report",
    "referential_integrity_audit",
    "event_transition_matrix",
    "throttled_event_stream",
    "unicode_nfc_report",
    "segment_top_spenders_with_ties",
    "revenue_pareto_curve",
    "customer_rfm_segments",
    "packing_utilization_report",
    "dow_hour_activity_matrix",
    "join_key_skew_report",
    "join_cardinality_preflight",
    "seasonal_residual_anomalies",
    "part_copurchase_pagerank",
    "kmv_audience_overlap",
    "incremental_join_maintenance",
    "daily_user_novelty_rate",
    "sql_forecast_revenue",
    "sql_shipmode_priority",
    "set_intersect_orders",
    "set_except_orders",
    "distinct_user_event_types",
    "distinct_user_count",
]



def _ordered(names: dict) -> list[str]:
    front = [n for n in _PRIORITY if n in names]
    return front + [n for n in names if n not in set(front)]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {n: QUERIES[n] for n in _ordered(QUERIES)}


def oracle_sql() -> dict[str, str]:
    return {n: ORACLES[n] for n in _ordered(QUERIES) if n in ORACLES}
