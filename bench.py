"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints ONE JSON line with per-query
seconds. Execution is forced with the noop sink (full compute, no
driver collect).

The 20-query prefix is the standing numeric baseline (BASELINE.md);
check any round's output against the 2x gate mechanically with
``python scripts/baseline_check.py BENCH_rNN.json`` and adjudicate
per-query deltas with ``scripts/one_boot_probe.py`` before calling
them regressions.

CAPTURE-SIZE CONTRACT (r11): the driver records only the LAST 2000
characters of this script's stdout, and the round-10 line (67 queries,
full names) reached 2020 characters — the capture started mid-JSON and
``parsed`` came back null, breaking the mechanical gate on the
committed artifact.  The final line therefore keys the extended
headline (positions 21+) by the short aliases in ``EXT_ALIAS`` while
the shared-20 keep their full round-1 names for cross-round
comparability; ``scripts/baseline_check.py`` expands the aliases back
before gating, and ``MAX_LINE`` is asserted so a future growth of the
headline list fails HERE (in our tests) instead of producing another
truncated capture.  A full-name expansion line is printed immediately
before the final line for human readers of the raw log.
"""

from __future__ import annotations

import json
import os
import re
import time

from cdk_serverless_data_lake_sandbox_spark.registry import all_queries
from cdk_serverless_data_lake_sandbox_spark.session import get_spark

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    "q18_large_volume",
    "q21_waiting_supplier",
    "top_k_per_group",
    "join_two_tables",
    "sessionize",
    "range_join",
    "asof_join",
    "json_extract",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "ann_topk_bruteforce",
    "text_quality",
    # r2-surface heavies (added r3 so regressions get a number; the 20
    # above are unchanged for cross-round comparability)
    "containment_dedup",
    "segment_dedup",
    "bm25_retrieval",
    "semantic_dedup",
    "ann_topk_arrow",
    # r3 second-session heavies
    "strip_dup_spans",
    "cdc_chunk_dedup",
    "embedding_dim_ablation",
    "histogram_rollup_percentiles",
    "top_paths",
    # r4 additions
    "strip_dup_chars",
    "hybrid_retrieval_rrf",
    # r4 second-session additions
    "copurchase_pagerank",
    "mmr_diversify",
    "count_min_words",
    "copurchase_triangles",
    "hll_distinct_users",
    # r5 additions (copurchase_kcore/communities are tracked by the
    # scale soak instead — their iterative round counts dominate at
    # bench SF and would swamp the per-query lines)
    "winnowing_fingerprints",
    "winnowing_pairs",
    "kneser_ney_logprob",
    "part_skyline",
    "burst_detection",
    # r8 additions
    "cluster_balanced_sample",
    "decontaminate_strip",
    "vocab_coverage_curve",
    "knn_graph_nn_descent",
    "graph_ann_search",
    "skipgram_pairs",
    "cooccurrence_pmi",
    "unigram_lm_tokenizer",
    "unigram_tokenize_corpus",
    # r9 additions
    "bitext_margin_mining",
    "coreset_kcenter",
    "kcenter_assignment_profile",
    "bitext_margin_mining_lsh",
    "bootstrap_ci_doclen",
    # r10 additions
    "dhash_band_scoring",
    "afp_band_scoring",
    "framehash_jaccard_scoring",
    "theil_sen_trend",
    "source_drift_tvd",
    "ks_drift_doclen",
    "mann_whitney_latency",
    "scene_cut_scoring",
    "activity_segment_scoring",
    "supplier_hierarchy_rollup",
    "variant_props_profile",
]

# Short stdout keys for headline positions 21+ (see the capture-size
# contract in the module docstring).  COMMITTED LITERAL — never
# regenerate mechanically: the 2/sd2-style disambiguators depend on
# insertion order and the aliases are part of the artifact format.
EXT_ALIAS = {
    "containment_dedup": "cd",
    "segment_dedup": "sd",
    "bm25_retrieval": "br",
    "semantic_dedup": "sd2",
    "ann_topk_arrow": "ata",
    "strip_dup_spans": "sds",
    "cdc_chunk_dedup": "ccd",
    "embedding_dim_ablation": "eda",
    "histogram_rollup_percentiles": "hrp",
    "top_paths": "tp",
    "strip_dup_chars": "sdc",
    "hybrid_retrieval_rrf": "hrr",
    "copurchase_pagerank": "cp",
    "mmr_diversify": "md",
    "count_min_words": "cmw",
    "copurchase_triangles": "ct",
    "hll_distinct_users": "hdu",
    "winnowing_fingerprints": "wf",
    "winnowing_pairs": "wp",
    "kneser_ney_logprob": "knl",
    "part_skyline": "ps",
    "burst_detection": "bd",
    "cluster_balanced_sample": "cbs",
    "decontaminate_strip": "ds",
    "vocab_coverage_curve": "vcc",
    "knn_graph_nn_descent": "kgnd",
    "graph_ann_search": "gas",
    "skipgram_pairs": "sp",
    "cooccurrence_pmi": "cp2",
    "unigram_lm_tokenizer": "ult",
    "unigram_tokenize_corpus": "utc",
    "bitext_margin_mining": "bmm",
    "coreset_kcenter": "ck",
    "kcenter_assignment_profile": "kap",
    "bitext_margin_mining_lsh": "bmml",
    "bootstrap_ci_doclen": "bcd",
    "dhash_band_scoring": "dbs",
    "afp_band_scoring": "abs",
    "framehash_jaccard_scoring": "fjs",
    "theil_sen_trend": "tst",
    "source_drift_tvd": "sdt",
    "ks_drift_doclen": "kdd",
    "mann_whitney_latency": "mwl",
    "scene_cut_scoring": "scs",
    "activity_segment_scoring": "ass",
    "supplier_hierarchy_rollup": "shr",
    "variant_props_profile": "vpp",
}

# Hard budget for the final stdout line: the driver keeps 2000 chars,
# and the line must START inside that window (plus trailing newline
# and a little pre-line noise headroom).
MAX_LINE = 1900


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    results: dict[str, float] = {}
    for name in HEADLINE:
        if name not in qs:
            continue
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()  # warm (JIT/IO cache)
        best = None
        for _ in range(2):  # best-of-2: shields the number from GC pauses
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        results[name] = round(best, 3)
    total = round(sum(results.values()), 3)
    # the 20-query prefix is unchanged since r1 — its subtotal is the
    # cross-round comparable number; the r3 additions extend coverage.
    shared20 = round(sum(v for k, v in results.items() if k in HEADLINE[:20]), 3)
    payload = {
        "metric": "headline_total_sec",
        "value": total,
        "unit": "sec",
        "shared20_total_sec": shared20,
        "queries": {k: v for k, v in results.items() if k in HEADLINE[:20]},
        "ext": {EXT_ALIAS[k]: v for k, v in results.items() if k in EXT_ALIAS},
        "sf": sf,
    }
    # human-readable full-name expansion for raw-log readers; scrolls
    # out of the driver's 2000-char tail before the final line lands.
    print(json.dumps({"metric": "headline_full_names", "queries": results, "sf": sf}))
    line = json.dumps(payload, separators=(",", ":"))
    assert len(line) <= MAX_LINE, (
        f"final bench line is {len(line)} chars > MAX_LINE={MAX_LINE}; the "
        "driver keeps only 2000 chars of stdout — shorten EXT_ALIAS keys or "
        "trim the headline before the capture truncates again"
    )
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
