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
# checks the first 50 registry entries per round). Round-6 rotation
# (executes the written r5 plan): slots 1–4 are the queries NEW this
# round (graph communities/triangles, bigram LM, PMI collocations —
# no driver verdict exists); 5–7 the r6-EDITED queries (the ADVICE
# fixes: PSI negative-bucket clamp touched distribution_drift_psi,
# the non-positive-weight guard touched weighted_doc_sample, and the
# store-probe self-pair exclusion touched the bipartite candidate
# generator feeding incremental_near_dup_new_docs); 8 is
# embedding_quantization_report (its r4 judge verdict is the oldest
# standing signal in the registry); 9–12 the second r6-new block (the
# exact-KS drift test, Benford audit, entropy profile, CV-fold
# balance); 13–15 the third r6-new block (edge embeddedness, user
# burstiness, rolling-KMV sliding distinct); 16–17 the fourth (JL
# random projection, interval-union coverage); 18–19 the fifth
# (basket association rules, EWMA trend); 20–35 the 16 r5-new
# sqlsuite/containment/snapshot queries (pre-verified at sf0.01 in
# r5, no driver verdict yet); 36–46 the oldest r3-green tail by risk;
# 47–50 four of the 26-entry r3-green remainder (the other eleven
# moved just below the boundary to make room for blocks 2–5 — a
# never-checked query outranks a three-round-old green one). All 50
# pre-verified green through the exact driver gate (check_query at
# sf0.01) before commit.
#
# ROUND-7 ROTATION PLAN (for the next builder): lead with (1) any
# query round 7 edits after its last check, (2) the 22 r3-green
# remainder entries directly below the boundary (verdicts FOUR rounds
# old by r7 — the 11 displaced by this round's blocks 2-5 first, then
# the 11-entry block after them), (3) the r4-green block (three
# rounds old), then the r5/r6-green blocks. 22 + a few edits already
# fills half the window; the rest should be r4-green.
# tests/test_engine.py::test_priority_rotation_names_all_registered
# guards against typos silently shrinking the window.
_PRIORITY = [
    # -- round-6 window (slots 1-50) --
    "part_copurchase_communities",
    "part_copurchase_triangles",
    "bigram_surprisal_scores",
    "token_pmi_collocations",
    "distribution_drift_psi",
    "weighted_doc_sample",
    "incremental_near_dup_new_docs",
    "embedding_quantization_report",
    # r6-new block 2 (KS drift, Benford audit, entropy, CV folds)
    "distribution_drift_ks",
    "benford_price_audit",
    "categorical_entropy_report",
    "crossval_fold_balance",
    # r6-new block 3 (edge embeddedness, burstiness, rolling KMV)
    "copurchase_edge_embeddedness",
    "user_burstiness_profile",
    "rolling_7d_distinct_users",
    # r6-new block 4 (JL projection, interval-union coverage)
    "embedding_random_projection",
    "user_activity_coverage",
    # r6-new block 5 (association rules, EWMA trend)
    "basket_association_rules",
    "daily_revenue_ewma",
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
    # ---- 50-slot window boundary (round-7 plan in header) ----
    # r3-remainder displaced by the r6 block-2..5 queries: r7 front
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
    "ann_lsh_topk",
    "ann_ivf_topk",
    "merge_cdc_orders",
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
    "events_gap_filled_daily",
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
