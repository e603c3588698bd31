"""A/B the STATIC shuffled-hash-join knob against AQE-threshold-only
(r11 verdict "What's wrong #2"): `preferSortMergeJoin=false` makes
plan-time SHJ selection trust size ESTIMATES, which at 100 TB can OOM
where sort-merge would spill. The AQE half
(`maxShuffledHashJoinLocalMapThreshold`) is runtime-size-bounded and
safe. If the static half adds nothing measurable over the AQE half on
the join-heavy queries it was introduced for, the safe default is
`preferSortMergeJoin=true` + AQE rewrite.

Interleaved same-boot A/B (the repo's one_boot_probe discipline):
subprocesses alternate SPARK_GRAFT_PREFER_SMJ=true/false; both keep
the AQE threshold. Usage:
    python scripts/shj_ab_probe.py [query ...]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

DEFAULT_QUERIES = [
    "copurchase_triangles",
    "containment_dedup",
    "top_paths",
    "dedup_ngram_jaccard",
    "segment_dedup",
    "q9_product_profit",
    "q18_large_volume",
]

PROBE = r"""
import json, sys, time
from cdk_serverless_data_lake_sandbox_spark.registry import all_queries
from cdk_serverless_data_lake_sandbox_spark.session import get_spark
spark = get_spark(app_name="shj-ab")
spark.sparkContext.setLogLevel("ERROR")
qs = all_queries()
out = {}
for name in sys.argv[1].split(","):
    qs[name](spark, "/root/testdata/sf0.1").write.format("noop").mode("overwrite").save()
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        qs[name](spark, "/root/testdata/sf0.1").write.format("noop").mode("overwrite").save()
        best = min(best or 9e9, time.perf_counter() - t0)
    out[name] = round(best, 3)
print("PROBE_RESULT " + json.dumps(out))
spark.stop()
"""


def run(prefer_smj: str, names: list[str]) -> dict[str, float]:
    env = dict(os.environ, SPARK_GRAFT_PREFER_SMJ=prefer_smj)
    proc = subprocess.run(
        [sys.executable, "-c", PROBE, ",".join(names)],
        capture_output=True, text=True, env=env, timeout=1200,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("PROBE_RESULT "):
            return json.loads(line[len("PROBE_RESULT "):])
    raise RuntimeError(proc.stdout[-2000:] + proc.stderr[-2000:])


def main() -> None:
    names = sys.argv[1:] or DEFAULT_QUERIES
    rounds = {"smj_true": [], "smj_false": []}
    for _ in range(2):
        rounds["smj_true"].append(run("true", names))
        rounds["smj_false"].append(run("false", names))
    result = {}
    for n in names:
        t = min(r[n] for r in rounds["smj_true"])
        f = min(r[n] for r in rounds["smj_false"])
        result[n] = {
            "aqe_only_s": t,
            "static_shj_s": f,
            "static_over_aqe": round(f / t, 3),
        }
    print(json.dumps({"queries": result}))


if __name__ == "__main__":
    main()
