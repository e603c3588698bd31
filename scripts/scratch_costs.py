"""First-invocation (build) vs repeat-invocation (serve) cost for
every query backed by a keyed-scratch artifact (r11 verdict item 7:
the bench's warm-up + best-of-2 reports steady-state serving cost, so
the build cost of each per-(application, sf_dir) materialization must
stay auditable somewhere).

One fresh session, sf0.1: each query is timed on its FIRST invocation
(which pays its keyed builders) and then best-of-2 warm (the bench's
number). Queries are ordered so shared keys are attributed to the
first query that builds them (noted in the table).

Usage: python scripts/scratch_costs.py [--sf DIR]
Prints a markdown table for SURVEY §7 plus one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")
from cdk_serverless_data_lake_sandbox_spark.registry import all_queries  # noqa: E402
from cdk_serverless_data_lake_sandbox_spark.session import get_spark  # noqa: E402

# (query, keyed artifacts its first invocation builds)
TARGETS = [
    ("dedup_ngram_jaccard", "ngram-hashed:{sf} (+hot probe)"),
    ("containment_dedup", "(shares ngram-hashed)"),
    ("cluster_balanced_sample", "kmeans-assign-fixed:{sf}"),
    ("kmeans_clusters", "(shares kmeans-assign-fixed)"),
    ("semantic_dedup", "kmeans-assign:{sf}"),
    ("unigram_lm_tokenizer", "ulm-train-counts:{sf}"),
    ("unigram_tokenize_corpus", "ulm-final-seg:{sf}"),
    ("copurchase_pagerank", "copurchase-edges + copurchase-nodes"),
    ("copurchase_triangles", "(shares copurchase-edges)"),
    ("bitext_margin_mining_lsh", "bitext-postings:{sf}"),
    ("knn_graph_nn_descent", "emb-norms:{sf} + knn-graph:{sf}"),
    ("bm25_retrieval", "bm25-tf + bm25-dl (r12)"),
    ("hybrid_retrieval_rrf", "(shares bm25-tf/dl)"),
    ("cdc_chunk_dedup", "{sf}:cdcchunks"),
]


def main() -> None:
    sf_dir = "/root/testdata/sf0.1"
    if "--sf" in sys.argv:
        sf_dir = sys.argv[sys.argv.index("--sf") + 1]
    spark = get_spark(app_name="scratch-costs")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    rows = []
    for name, keys in TARGETS:
        fn = qs[name]
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        build = time.perf_counter() - t0
        serve = None
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            serve = dt if serve is None else min(serve, dt)
        rows.append((name, keys.replace("{sf}", "{sf_dir}"), build, serve))
    print("| query | keyed artifact built | first-invocation s | warm best-of-2 s |")
    print("| --- | --- | --- | --- |")
    for name, keys, build, serve in rows:
        print(f"| {name} | {keys} | {build:.2f} | {serve:.2f} |")
    print(json.dumps({
        "metric": "scratch_build_vs_serve",
        "sf_dir": sf_dir,
        "queries": {n: {"build_s": round(b, 3), "serve_s": round(s, 3)}
                    for n, _, b, s in rows},
    }))
    spark.stop()


if __name__ == "__main__":
    main()
