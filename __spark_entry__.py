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
# checks the first 50 registry entries per round). Round-7 rotation
# (executes the written r6 plan): slots 1-9 are the queries NEW this
# round (composed quality gate, Poisson bootstrap, Theil-Sen, k-core,
# trigram paths, temperature mix, rank ensemble, CUSUM, PQ ANN,
# retrieval MRR eval, deadline funnel, k-anonymity — no driver verdict
# exists); 10-15 the r7-EDITED queries (the KS-oracle
# empty-side guard touched distribution_drift_ks, the dead-local
# cleanup touched daily_revenue_ewma's oracle, the executor-side grid
# rewrite touched events_gap_filled_daily, and the LPA tie-break +
# triangle-core rework touched communities/triangles/embeddedness);
# 16-37 the 22-entry r3-green remainder whose verdicts are FOUR rounds
# old (exactly the r6 plan's block); 38-50 the first 13 of the
# r4-green block (three rounds old). All 50 pre-verified green through
# the exact driver gate (check_query at sf0.01) before commit.
#
# ROUND-8 ROTATION PLAN (for the next builder): lead with (1) any
# query round 8 edits after its last check, (2) the 5 r4-green
# entries displaced from this window (scd2_customer_priority,
# streaming_tumbling_hourly, sliding_window_counts,
# streaming_session_windows, streaming_purchase_view_join) plus the
# rest of the r4-green block directly below the boundary (their
# verdicts will be FOUR rounds old by r8), then (3) the r5-green
# block (pack_documents... and the 16 sqlsuite/containment entries),
# then r6-green. The r3-remainder and r6-window blocks will have
# fresh r7 verdicts and belong at the back.
# tests/test_engine.py::test_priority_rotation_names_all_registered
# guards against typos silently shrinking the window.
_PRIORITY = [
    "corpus_quality_gate",
    "bootstrap_revenue_ci",
    "revenue_theilsen_trend",
    "kcore_part_graph",
    "event_type_trigram_paths",
    "domain_temperature_mix",
    "doc_quality_rank_ensemble",
    "revenue_cusum_changepoints",
    "ann_pq_topk",
    "retrieval_label_mrr",
    "funnel_conversion_deadline",
    "k_anonymity_audit",
    "distribution_drift_ks",
    "daily_revenue_ewma",
    "events_gap_filled_daily",
    "part_copurchase_communities",
    "part_copurchase_triangles",
    "copurchase_edge_embeddedness",
    "rollup_lineitem_status",
    "cube_order_status_priority",
    "scalar_string_funcs",
    "scalar_date_funcs",
    "scalar_math_funcs",
    "json_extract_props",
    "tumbling_window_hourly",
    "session_window_per_user",
    "dedup_exact_keep_first",
    "embedding_cosine_pairs",
    "ann_topk_bruteforce",
    "binary_media_metadata",
    "streaming_stateful_user_totals",
    "approx_percentiles_contract",
    "streaming_dedup_users",
    "sql_large_volume_customers",
    "streaming_static_enrichment",
    "window_distribution_ranks",
    "pii_redaction_report",
    "embedding_label_centroids",
    "sql_balance_prospects",
    "union_evolved_event_slices",
    "window_trailing_1h_sum",
    "simhash_near_dups",
    "doc_fingerprint_matches",
    "incremental_rollup_hourly",
    "asof_purchase_last_view",
    "range_join_price_bands",
    "salted_join_lineitem_supplier",
    "salted_agg_event_type",
    "sql_late_order_priority",
    "sql_small_qty_revenue",
    # ---- 50-slot window boundary ----
    "ann_lsh_topk",
    "ann_ivf_topk",
    "merge_cdc_orders",
    "bigram_surprisal_scores",
    "token_pmi_collocations",
    "distribution_drift_psi",
    "weighted_doc_sample",
    "incremental_near_dup_new_docs",
    "embedding_quantization_report",
    "benford_price_audit",
    "categorical_entropy_report",
    "crossval_fold_balance",
    "user_burstiness_profile",
    "rolling_7d_distinct_users",
    "embedding_random_projection",
    "user_activity_coverage",
    "basket_association_rules",
    "sql_volume_shipping",
    "sql_national_market_share",
    "sql_nation_profit",
    "sql_promo_revenue_share",
    "sql_disjunctive_revenue",
    "global_balance_ranks",
    "sql_order_count_distribution",
    "sql_waiting_suppliers",
    "sql_part_promotion_suppliers",
    "sql_top_revenue_supplier",
    "containment_near_dups",
    "containment_prefix_filtered",
    "snapshot_diff_orders",
    "sql_important_parts",
    "sql_part_supplier_counts",
    "sql_cheapest_supplier_per_part",
    "gopher_repetition_rules",
    "heavy_hitter_tokens",
    "approx_top_tokens_contract",
    "semantic_dedup_flags",
    "sql_returned_item_report",
    "profile_orders_columns",
    "fuzzy_part_name_matches",
    "impute_event_values",
    "interval_overlap_view_purchase",
    "equi_depth_price_buckets",
    "order_price_histogram",
    "set_intersect_orders",
    "set_except_orders",
    "distinct_user_event_types",
    "distinct_user_count",
    "scd2_customer_priority",
    "streaming_tumbling_hourly",
    "sliding_window_counts",
    "streaming_session_windows",
    "streaming_purchase_view_join",
    "pack_documents_concat_chop",
    "stratified_sample_documents",
    "media_decode_features",
    "media_frame_sample",
    "ml_feature_table",
    "ml_rf_metrics",
    "value_percentiles",
    "approx_distinct_users",
    "grouping_sets_orders",
    "pivot_user_event_counts",
    "unpivot_order_amounts",
    "explode_embedding_positions",
    "latest_event_per_user",
    "daily_revenue",
    "hourly_demand",
    "quality_filter",
    "reject_report",
    "derived_metrics",
    "pricing_summary",
    "join_customer_orders",
    "join_left_order_stats",
    "join_semi_customers_with_urgent_orders",
    "join_anti_customers_without_urgent_orders",
    "regional_revenue",
    "top_building_orders",
    "window_top_orders_per_customer",
    "window_running_spend",
    "window_lag_lead_events",
    "window_rank_parts_by_price",
    "global_top_orders",
    "set_union_orders",
    "sql_forecast_revenue",
    "sql_shipmode_priority",
    "bpe_pair_frequencies",
    "domain_mix_weights",
    "part_copurchase_pagerank",
    "unigram_surprisal_scores",
    "zipf_fit_tokens",
    "kmv_audience_overlap",
    "incremental_join_maintenance",
    "daily_user_novelty_rate",
    "minhash_lsh_near_dups",
    "cms_heavy_tokens_contract",
    "bloom_filter_semi_join",
    "rare_token_doc_quality",
    "funnel_stage_conversion",
    "time_decay_user_value",
    "mad_outlier_report",
    "user_retention_cohorts",
    "per_source_document_quota",
    "ann_filtered_topk",
    "kmeans_cluster_contract",
    "shared_span_dup_report",
    "referential_integrity_audit",
    "event_transition_matrix",
    "throttled_event_stream",
    "join_key_skew_report",
    "seasonal_residual_anomalies",
    "join_cardinality_preflight",
    "unicode_nfc_report",
    "segment_top_spenders_with_ties",
    "revenue_pareto_curve",
    "customer_rfm_segments",
    "packing_utilization_report",
    "dow_hour_activity_matrix",
    "dedup_fingerprint_groups",
    "word_jaccard_near_dups",
    "dup_groups_connected",
    "decontamination_ngram_overlap",
    "tfidf_top_terms",
    "text_quality_features",
    "lang_id_predictions",
    "token_counts",
    "chunk_documents_sliding",
    "hll_mergeable_daily_users",
    "lineitem_stat_moments",
    "event_value_trends",
]


def _ordered(names: dict) -> list[str]:
    front = [n for n in _PRIORITY if n in names]
    return front + [n for n in names if n not in set(front)]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {n: QUERIES[n] for n in _ordered(QUERIES)}


def oracle_sql() -> dict[str, str]:
    return {n: ORACLES[n] for n in _ordered(QUERIES) if n in ORACLES}
