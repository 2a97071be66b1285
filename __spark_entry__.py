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
# checks the first 50 registry entries per round). Round-4 rotation:
# the 50 slots go to the exact complement of round 3's window — every
# query whose latest green verdict is CORRECTNESS_r02 — so after this
# round no verdict in the registry is more than one round old. All 50
# were additionally pre-verified green through the exact driver gate
# (testing.check_query at sf0.01) before the round closed.
#
# ROUND-5 ROTATION PLAN (for the next builder): lead the window with
# (1) the 24 round-4 queries marked NEW below — they have tests +
# self-verification but no driver verdict yet; (2) any query whose
# code or shared helpers round 5 edits after its last check; (3) the
# oldest-verdict remainder (the r3-green tail, whose verdicts will be
# two rounds old by then). tests/test_engine.py::
# test_priority_rotation_names_all_registered guards against typos
# silently shrinking the window.
_PRIORITY = [
    # code changed in r3 after last driver check (stale-verdict hole)
    "window_trailing_1h_sum",
    "minhash_lsh_near_dups",
    "simhash_near_dups",
    "doc_fingerprint_matches",
    "incremental_rollup_hourly",
    "asof_purchase_last_view",
    "range_join_price_bands",
    "salted_join_lineitem_supplier",
    "salted_agg_event_type",
    # round 4 touches these plans (decorrelation profiling / fixes)
    "sql_late_order_priority",
    "sql_small_qty_revenue",
    # recall-contract queries re-verified manually in r3; driver-confirm
    "ann_lsh_topk",
    "ann_ivf_topk",
    # r2-green, code untouched since — oldest verdicts, by risk
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
    # ---- 50-slot window boundary: everything below is green in
    # CORRECTNESS_r03 (checked last round); r4-touched members are
    # self-verified this round and scheduled first for round 5:
    # -- NEW in round 4 (queries/scaleops.py): no driver verdict yet;
    # each verified vs its DuckDB oracle at sf0.01 this round
    # (tests/test_oracle_parity.py + tests/test_scaleops.py). These
    # MUST occupy the front of round 5's window:
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
    "incremental_near_dup_new_docs",
    "unicode_nfc_report",
    "segment_top_spenders_with_ties",
    "revenue_pareto_curve",
    "customer_rfm_segments",
    "packing_utilization_report",
    "dow_hour_activity_matrix",
    # -- green in CORRECTNESS_r03, code untouched in r4:
    "event_value_trends",
    "embedding_quantization_report",
    "gopher_repetition_rules",
    "heavy_hitter_tokens",
    "approx_top_tokens_contract",
    "chunk_documents_sliding",
    "set_intersect_orders",
    "set_except_orders",
    "distinct_user_event_types",
    "distinct_user_count",
    "rollup_lineitem_status",
    "cube_order_status_priority",
    "scalar_string_funcs",
    "scalar_date_funcs",
    "scalar_math_funcs",
    "json_extract_props",
    "tumbling_window_hourly",
    "session_window_per_user",
    "dedup_exact_keep_first",
    "dedup_fingerprint_groups",
    "word_jaccard_near_dups",
    "embedding_cosine_pairs",
    "ann_topk_bruteforce",
    "text_quality_features",
    "lang_id_predictions",
    "token_counts",
    "binary_media_metadata",
    "streaming_stateful_user_totals",
    "dup_groups_connected",
    "decontamination_ngram_overlap",
    "tfidf_top_terms",
    "approx_percentiles_contract",
    "streaming_dedup_users",
    "sql_large_volume_customers",
    "streaming_static_enrichment",
    "window_distribution_ranks",
    "pii_redaction_report",
    "embedding_label_centroids",
    "sql_balance_prospects",
    "semantic_dedup_flags",
    "sql_returned_item_report",
    "order_price_histogram",
    "profile_orders_columns",
    "fuzzy_part_name_matches",
    "impute_event_values",
    "hll_mergeable_daily_users",
    "interval_overlap_view_purchase",
    "equi_depth_price_buckets",
    "lineitem_stat_moments",
    "union_evolved_event_slices",
]


def _ordered(names: dict) -> list[str]:
    front = [n for n in _PRIORITY if n in names]
    return front + [n for n in names if n not in set(front)]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {n: QUERIES[n] for n in _ordered(QUERIES)}


def oracle_sql() -> dict[str, str]:
    return {n: ORACLES[n] for n in _ordered(QUERIES) if n in ORACLES}
