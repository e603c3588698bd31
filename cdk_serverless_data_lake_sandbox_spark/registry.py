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
# first: rows whose implementation or oracle changed this round, new
# surface, then queries that have never received a driver verdict.
# Everything else follows in registration order — nothing is dropped,
# only reordered.
_VERIFY_FIRST = [
    # new this session
    "ann_recall_report",
    "windowed_funnel",
    "join_size_contribution",
    "modality_profile",
    "split_leakage_check",
    "redact_corpus",
    "tokenize_to_ids",
    "embedding_pca_variance",
    "span_corruption",
    "packed_sequences",
    "hard_negative_mining",
    "dataset_split",
    "ship_latency_percentiles",
    "near_dup_review_sample",
    "brand_lift",
    "bpe_merge_candidates",
    "audience_overlap",
    "ann_topk_arrow",
    "session_window_agg",
    "normalize_corpus",
    "bm25_retrieval",
    "containment_dedup",
    "vocab_oov_profile",
    "open_order_concurrency",
    "weighted_sample",
    "segment_dedup",
    # changed this round
    "cohort_retention",
    "frequent_items_sketch",
    "forward_fill",
    "ntile_quartiles",
    "activity_gini",
    "pareto_revenue",
    "dedup_ngram_jaccard",
    "near_dup_removal",
    "corpus_pipeline",
    "dedup_components",
    "multimodal_features",
    # new surface
    "sequence_packing",
    "doc_chunking",
    "dup_span_fraction",
    "token_budget_allocation",
    "embedding_quantization",
    "tokenizer_fertility",
    "ngram_novelty",
    "heaps_law_fit",
    "dup_cluster_sizes",
    "sketch_rollup_dau",
    "group_sample_topk",
    "ann_topk_pq",
    "psi_drift",
    "key_skew_profile",
    "scd2_point_in_time_join",
    "dq_expectations",
    "mad_outliers",
    "cogroup_conversion_latency",
    "near_dup_keep_best",
    "gopher_quality_filter",
    "source_overlap_matrix",
    "semantic_dedup",
    "unigram_logprob",
    "dsir_importance_weights",
    "pii_scan",
    "doc_repetition",
    "contamination_check",
    "domain_mix_weights",
    "federated_jdbc_lookup",
    "preview_region",
    "preview_customer",
    "preview_supplier",
    "preview_part",
    "preview_lineitem",
    "preview_events",
    "preview_documents",
    "preview_embeddings",
    # never driver-graded (r1 gate stopped at 50 entries)
    "q2_min_cost_supplier",
    "q4_order_priority",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q11_important_stock",
    "q12_shipmode_priority",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q16_parts_supplier",
    "q17_small_quantity",
    "q20_promo_suppliers",
    "q21_waiting_supplier",
    "q22_global_sales",
    "lead_lag_delta",
    "corr_stats",
    "ordered_string_agg",
    "first_last_event",
    "grouping_sets_agg",
    "regression_per_type",
    "time_weighted_avg",
    "rank_distribution",
    "unpivot_measures",
    "rolling_time_window",
    "salted_agg",
    "value_outliers",
    "mom_growth",
    "brand_affinity",
    "revenue_concentration_hhi",
    "segment_summary",
    "daily_active_users",
    "region_rollup",
    "text_quality",
    "token_count",
    "lang_id",
    "doc_fingerprint",
    "stopword_ratio",
    "reading_level",
    "char_trigram_profile",
    "dup_rate_by_source",
    "zipf_fit",
    "null_profile",
    "near_dup_embedding",
    "embedding_norm_stats",
    "label_centroid_distance",
    "ann_label_purity",
    "idf_top_terms",
    "stratified_sample",
    "bigram_collocations",
    "tfidf_doc_top_terms",
    "federated_kv_lookup",
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
        multimodal,
        pipeline,
        quality,
        shaping,
        similarity,
        stats,
        text,
        tpch_extra,
    )
    from cdk_serverless_data_lake_sandbox_spark.sources import jdbc, kv  # noqa: F401
