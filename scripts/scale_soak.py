"""100x scale soak: time heavy operators at sf0.1 vs the synthesized
sf1 dataset (scripts/make_sf1.py) and report 10x-data runtime ratios —
the evidence behind SURVEY §6's sf1 paragraph.

Usage:
    python scripts/make_sf1.py /tmp/sfx10     # once
    python scripts/scale_soak.py [/tmp/sfx10] [query ...]

Note: dedup_ngram_jaccard / containment_dedup are excluded by default
— the synthetic corpus's 31-word vocabulary saturates the trigram
space, so their pair OUTPUT grows quadratically with corpus size (a
property of the data; see the hot_threshold guard and SURVEY §6).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

from cdk_serverless_data_lake_sandbox_spark.registry import all_queries  # noqa: E402
from cdk_serverless_data_lake_sandbox_spark.session import get_spark  # noqa: E402

DEFAULT_OPS = [
    "dedup_minhash_lsh",
    "semantic_dedup",
    "strip_dup_spans",
    "cdc_chunk_dedup",
    "bm25_retrieval",
    "sessionize",
    "unigram_entropy",
    "phrase_search",
    "histogram_rollup_percentiles",
    "global_shuffle",
    "top_paths",
    "keyness_llr",
    "quality_classifier_score",
    "dataset_card",
    "cuped_lift",
    "embedding_dim_ablation",
]


def main() -> None:
    args = sys.argv[1:]
    sf1 = args[0] if args and os.path.isdir(args[0]) else "/tmp/sfx10"
    names = args[1:] if args and os.path.isdir(args[0]) else args
    if not os.path.isdir(sf1):
        raise SystemExit(f"{sf1} missing — run scripts/make_sf1.py first")
    spark = get_spark(app_name="scale_soak")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()

    def run(name, sf):
        t = time.time()
        qs[name](spark, sf).write.format("noop").mode("overwrite").save()
        return time.time() - t

    run("q6_forecast_revenue", "/root/testdata/sf0.1")  # warm
    print(f"{'query':30s} {'sf0.1':>7s} {'sf1':>8s} {'ratio':>6s}")
    for n in names or DEFAULT_OPS:
        a = run(n, "/root/testdata/sf0.1")
        b = run(n, sf1)
        print(f"{n:30s} {a:7.2f} {b:8.2f} {b / a:6.2f}")


if __name__ == "__main__":
    main()
