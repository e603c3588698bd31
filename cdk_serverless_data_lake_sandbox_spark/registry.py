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
# then the 60 queries that have never received a driver verdict across
# rounds 1-3 (driver samples 50/round; CORRECTNESS_r0{1,2,3}.json are
# the ledger). Everything else follows in registration order --
# nothing is dropped, only reordered.
_VERIFY_FIRST = [
    # new / changed this session (r5)
    "winnowing_fingerprints",
    "winnowing_pairs",
    "holt_winters_forecast",
    "copurchase_kcore",
    "k_anonymity_check",
    "dp_count_release",
    "kneser_ney_logprob",
    "copurchase_communities",
    "part_skyline",
    "burst_detection",
    "quality_decile_lift",
    "video_scene_cuts",
    "audio_activity_segments",
    "preference_pairs",
    "near_dup_edit_distance",
    "copurchase_trend",
    "attribution_weights",
    # new / changed last session (r4)
    "copurchase_pagerank",
    "brand_recommendations",
    "copurchase_triangles",
    "copurchase_distance",
    "copurchase_pagerank_weighted",
    "count_min_words",
    "hll_distinct_users",
    "corpus_mi_profile",
    "item_item_similarity",
    "temporal_split_embargo",
    "rfm_segments",
    "repurchase_survival",
    "ses_forecast",
    "cusum_changepoint",
    "price_elasticity",
    "holt_forecast",
    "weekday_seasonality",
    "seasonal_anomaly",
    "mmr_diversify",
    "ann_ivf_pq",
    "image_dhash_dedup",
    "audio_fingerprint_dedup",
    "video_framehash_dedup",
    "modality_dedup_report",
    "strip_dup_chars",
    "hybrid_retrieval_rrf",
    "semantic_dedup",
    # never driver-sampled through r3
    "preview_embeddings",
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
    "approx_quantiles",
    "quartiles_scalable",
    "priority_transitions",
    "ann_topk_bruteforce",
    "ann_lsh_bucketed",
    "ann_ivf",
    "ann_topk_vectorized",
    "kmeans_clusters",
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
