"""100x scale soak: time heavy operators at sf0.1 vs the synthesized
sf1 dataset (scripts/make_sf1.py) and report 10x-data runtime ratios —
the evidence behind SURVEY §6's sf1 paragraph.

Usage:
    python scripts/make_sf1.py /tmp/sfx10     # once
    python scripts/scale_soak.py [/tmp/sfx10] [query ...]

Coverage: the ENTIRE bench.py headline set (so every benchmarked
query carries a measured 10x-data ratio) plus the non-bench heavies
the r2/r3 soaks tracked. Named exceptions, excluded by default:
dedup_ngram_jaccard / containment_dedup — the synthetic corpus's
31-word vocabulary saturates the trigram space, so their pair OUTPUT
grows quadratically with corpus size (a property of the data, not the
plan; since r4 the auto hot-posting guard makes the run memory-safe
regardless, it is merely output-bound — see SURVEY §6). The soak's
final step drives a saturated slice through the DEFAULT
(no-argument) jaccard path to prove the auto guard engages.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

from bench import HEADLINE  # noqa: E402
from cdk_serverless_data_lake_sandbox_spark.registry import all_queries  # noqa: E402
from cdk_serverless_data_lake_sandbox_spark.session import get_spark  # noqa: E402

EXCLUDED = {
    "dedup_ngram_jaccard": "pair OUTPUT quadratic on saturated synthetic vocab",
    "containment_dedup": "pair OUTPUT quadratic on saturated synthetic vocab",
}

EXTRA_OPS = [  # non-bench heavies with r2/r3 ratio history
    "brand_recommendations",
    "seasonal_anomaly",
    "unigram_entropy",
    "phrase_search",
    "global_shuffle",
    "keyness_llr",
    "quality_classifier_score",
    "dataset_card",
    "cuped_lift",
    # r5 iterative graph ops (kept out of the bench: round counts
    # dominate at bench SF; the soak is where their scaling is read)
    "copurchase_kcore",
    "copurchase_communities",
    "quality_decile_lift",
    "k_anonymity_check",
]

DEFAULT_OPS = [q for q in HEADLINE if q not in EXCLUDED] + EXTRA_OPS


def saturated_guard_check(spark, sf1: str) -> None:
    """Drive a saturated slice (postings far over the auto bound)
    through the DEFAULT ngram_jaccard path — no hot_threshold
    argument — and report pair count + runtime. Before the auto
    guard this OOM'd; green here is the guard's acceptance check."""
    from cdk_serverless_data_lake_sandbox_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    # 1/4 of sf1 keeps max posting ~3,300 — 3x over the auto bound
    # (guard must engage) at 1/16 the full corpus's quadratic pair
    # output, so the check finishes in soak time.
    docs = (
        spark.read.parquet(os.path.join(sf1, "documents.parquet"))
        .where("doc_id % 4 = 0")
        .select("doc_id", "text")
    )
    t = time.time()
    n = ngram_jaccard_pairs(docs).count()
    print(f"saturated_guard_check: {n} pairs in {time.time() - t:.1f}s (auto guard)")


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
        # warm once (bench.py's discipline): Python-boundary ops pay
        # worker-pool startup and scratch writes on first execution —
        # one-time costs that would otherwise masquerade as scaling
        qs[name](spark, sf).write.format("noop").mode("overwrite").save()
        t = time.time()
        qs[name](spark, sf).write.format("noop").mode("overwrite").save()
        return time.time() - t

    run("q6_forecast_revenue", "/root/testdata/sf0.1")  # warm
    print(f"{'query':30s} {'sf0.1':>7s} {'sf1':>8s} {'ratio':>6s}")
    for n in names or DEFAULT_OPS:
        a = run(n, "/root/testdata/sf0.1")
        b = run(n, sf1)
        print(f"{n:30s} {a:7.2f} {b:8.2f} {b / a:6.2f}", flush=True)
    if not names:
        saturated_guard_check(spark, sf1)


if __name__ == "__main__":
    main()
