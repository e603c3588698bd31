"""Query registry backing the driver contract (``__spark_entry__``).

Every operator registers a ``(spark, sf_dir) -> DataFrame`` callable
and, when SQL-expressible, a DuckDB-runnable oracle SQL string. Column
names are aliased identically on both sides — the driver sorts columns
by name before value-hashing.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


# Queries the driver's (possibly truncated) verification pass must see
# first: anything whose implementation or oracle changed this session,
# then every query that has never received a driver verdict across the
# prior rounds' CORRECTNESS ledgers (driver samples 50/round).
# Everything else follows in registration order -- nothing is dropped,
# only reordered.
_VERIFY_FIRST = [
    # r7 rotation (round-6 verdict item 8): this round's changed
    # queries first, then every query whose latest OFFICIAL driver
    # grade predates round 6, oldest grade first — so the driver's
    # 50-query samples re-grade the stalest rows at HEAD each round.
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_lsh_bucketed",
    "ann_lsh_multiprobe",
    "activity_heatmap",
    "apply_mapping",
    "approx_distinct_users",
    "asof_join",
    "corpus_filter",
    "cube_agg",
    "dedup_events",
    "dedup_exact",
    "distinct_users",
    "funnel_conversion",
    "fuzzy_name_match",
    "join_two_tables",
    "json_extract",
    "order_size_distribution",
    "percentiles",
    "pivot_events",
    "preview_nation",
    "preview_orders",
    "q10_returned_items",
    "q14_promo_effect",
    "q18_large_volume",
    "q19_disjunctive",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "range_join",
    "repeat_purchase_interval",
    "rollup_agg",
    "scalar_subquery",
    "scd2_ranges",
    "semi_anti_join",
    "session_stats",
    "sessionize",
    "set_ops",
    "time_bucket_agg",
    "top_k_per_group",
    "activity_gini",
    "ann_recall_report",
    "audience_overlap",
    "bm25_retrieval",
    "bpe_merge_candidates",
    "brand_lift",
    "cohort_retention",
    "corpus_pipeline",
    "dataset_split",
    "dedup_components",
    "dedup_ngram_jaccard",
    "doc_chunking",
    "dup_cluster_sizes",
    "dup_span_fraction",
    "embedding_pca_variance",
    "embedding_quantization",
    "forward_fill",
    "frequent_items_sketch",
    "group_sample_topk",
    "hard_negative_mining",
    "heaps_law_fit",
    "join_size_contribution",
    "modality_profile",
    "multimodal_features",
    "near_dup_removal",
    "near_dup_review_sample",
    "ngram_novelty",
    "normalize_corpus",
    "ntile_quartiles",
    "open_order_concurrency",
    "packed_sequences",
    "pareto_revenue",
    "psi_drift",
    "redact_corpus",
    "segment_dedup",
    "sequence_packing",
    "session_window_agg",
    "ship_latency_percentiles",
    "sketch_rollup_dau",
    "span_corruption",
    "split_leakage_check",
    "token_budget_allocation",
    "tokenize_to_ids",
    "tokenizer_fertility",
    "vocab_oov_profile",
    "weighted_sample",
    "windowed_funnel",
    "bigram_lm_logprob",
    "bpe_tokenize_stats",
    "cdc_chunk_dedup",
    "cogroup_conversion_latency",
    "compression_ratio",
    "containment_dedup",
    "contamination_check",
    "cuped_lift",
    "dataset_card",
    "dedup_threshold_sweep",
    "doc_repetition",
    "domain_mix_weights",
    "dq_expectations",
    "dsir_importance_weights",
    "embedding_dim_ablation",
    "embedding_outliers",
    "export_jsonl_shards",
    "feature_hash_embedding",
    "federated_jdbc_lookup",
    "global_shuffle",
    "gopher_quality_filter",
    "histogram_rollup_percentiles",
    "key_skew_profile",
    "keyness_llr",
    "mad_outliers",
    "media_decode_profile",
    "near_dup_keep_best",
    "near_dup_source_matrix",
    "order_reconciliation",
    "perplexity_bucket_mix",
    "phrase_search",
    "pii_scan",
    "preview_customer",
    "preview_documents",
    "preview_events",
    "preview_lineitem",
    "preview_part",
    "preview_region",
    "preview_supplier",
    "quality_classifier_score",
    "quality_ensemble",
    "scd2_point_in_time_join",
    "source_overlap_matrix",
    "strip_dup_spans",
    "top_paths",
    "training_export_pipeline",
    "unigram_entropy",
    "unigram_logprob",
    "corr_stats",
    "first_last_event",
    "grouping_sets_agg",
    "lead_lag_delta",
    "ordered_string_agg",
    "q11_important_stock",
    "q12_shipmode_priority",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q16_parts_supplier",
    "q17_small_quantity",
    "q20_promo_suppliers",
    "q21_waiting_supplier",
    "q22_global_sales",
    "regression_per_type",
    "time_weighted_avg",
    "attribution_weights",
    "audio_activity_segments",
    "audio_fingerprint_dedup",
    "brand_recommendations",
    "copurchase_distance",
    "copurchase_pagerank",
    "copurchase_pagerank_weighted",
    "copurchase_trend",
    "copurchase_triangles",
    "corpus_mi_profile",
    "count_min_words",
    "cusum_changepoint",
    "dp_count_release",
    "hll_distinct_users",
    "holt_forecast",
    "holt_winters_forecast",
    "hybrid_retrieval_rrf",
    "image_dhash_dedup",
    "item_item_similarity",
    "k_anonymity_check",
    "kneser_ney_logprob",
    "mmr_diversify",
    "modality_dedup_report",
    "near_dup_edit_distance",
    "preference_pairs",
    "preview_embeddings",
    "price_elasticity",
    "q2_min_cost_supplier",
    "q4_order_priority",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "quality_decile_lift",
    "repurchase_survival",
    "rfm_segments",
    "seasonal_anomaly",
    "semantic_dedup",
    "ses_forecast",
    "strip_dup_chars",
    "temporal_split_embargo",
    "video_framehash_dedup",
    "weekday_seasonality",
    "winnowing_fingerprints",
    "winnowing_pairs",
]


def _ordered(d: dict) -> dict:
    head = {k: d[k] for k in _VERIFY_FIRST if k in d}
    return head | {k: v for k, v in d.items() if k not in head}


def all_queries() -> dict[str, QueryFn]:
    _load_modules()
    return _ordered(_QUERIES)


def all_oracles() -> dict[str, str]:
    _load_modules()
    return _ordered(_ORACLES)


def _load_modules() -> None:
    # Import for registration side effects.
    from cdk_serverless_data_lake_sandbox_spark.operators import (  # noqa: F401
        analytics,
        core,
        curation,
        dedup,
        etl,
        events,
        fingerprint,
        graph,
        multimodal,
        privacy,
        pipeline,
        quality,
        shaping,
        similarity,
        stats,
        text,
        tpch_extra,
    )
    from cdk_serverless_data_lake_sandbox_spark.sources import jdbc, kv  # noqa: F401
