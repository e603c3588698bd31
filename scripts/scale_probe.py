"""Scaling probe: time the heavy operators at two scale factors and
report the runtime ratio vs the data ratio (10x). A near-linear
operator shows ratio << 10 locally (fixed overhead amortizes) and
bounded by ~10; a super-linear one (accidental O(n^2), single-reducer
stage) blows past it. Evidence for SURVEY §6.

Usage: python scripts/scale_probe.py [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from cdk_serverless_data_lake_sandbox_spark.registry import all_queries  # noqa: E402
from cdk_serverless_data_lake_sandbox_spark.session import get_spark  # noqa: E402

HEAVY = [
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "near_dup_removal",
    "corpus_pipeline",
    "dedup_components",
    "contamination_check",
    "ann_topk_bruteforce",
    "ann_topk_vectorized",
    "kmeans_clusters",
    "ntile_quartiles",
    "activity_gini",
    "pareto_revenue",
    "q1_pricing_summary",
    "q9_product_profit",
    "q21_waiting_supplier",
    "sessionize",
    "pii_scan",
    "doc_repetition",
    "dup_span_fraction",
    "sequence_packing",
    "doc_chunking",
    "embedding_quantization",
    "semantic_dedup",
    "segment_dedup",
    "containment_dedup",
    "bm25_retrieval",
    "bpe_merge_candidates",
    "audience_overlap",
    "open_order_concurrency",
    "ann_topk_arrow",
    "vocab_oov_profile",
    # r3 additions
    "bigram_lm_logprob",
    "quality_classifier_score",
    "perplexity_bucket_mix",
    "feature_hash_embedding",
    "embedding_outliers",
    "export_jsonl_shards",
    "training_export_pipeline",
    "dedup_threshold_sweep",
    # r3 second-session additions
    "strip_dup_spans",
    "phrase_search",
    "unigram_entropy",
    "cdc_chunk_dedup",
    "quality_ensemble",
    "global_shuffle",
    "embedding_dim_ablation",
    "compression_ratio",
    "histogram_rollup_percentiles",
    "cuped_lift",
    "dataset_card",
    "top_paths",
    "order_reconciliation",
    "keyness_llr",
]


def run(qs, name, sf_dir):
    t = time.time()
    qs[name](get_spark(), sf_dir).write.format("noop").mode("overwrite").save()
    return time.time() - t


def main() -> None:
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    names = sys.argv[1:] or HEAVY
    # warm codegen/JIT before measuring
    run(qs, "q6_forecast_revenue", "/root/testdata/sf0.01")
    print(f"{'query':30s} {'sf0.01':>8s} {'sf0.1':>8s} {'ratio':>6s}")
    for name in names:
        t_small = run(qs, name, "/root/testdata/sf0.01")
        t_big = run(qs, name, "/root/testdata/sf0.1")
        print(f"{name:30s} {t_small:8.2f} {t_big:8.2f} {t_big / t_small:6.2f}")


if __name__ == "__main__":
    main()
