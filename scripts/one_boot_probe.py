"""One-boot A/B perf probe (round-2 verdict item 9): measure a set of
queries at two git revisions back-to-back on the SAME machine session,
so cross-boot variance (the suspected cause of the r1->r2 driver
deltas on dedup_exact/dedup_minhash_lsh) cancels.

Usage: python scripts/one_boot_probe.py <rev> [query ...]
Creates a worktree for <rev>, runs the queries there and at HEAD
(separate processes, interleaved A/B/A/B), prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

PROBE = r"""
import json, sys, time
sys.path.insert(0, sys.argv[1])
import os
os.chdir(sys.argv[1])
from cdk_serverless_data_lake_sandbox_spark.registry import all_queries
from cdk_serverless_data_lake_sandbox_spark.session import get_spark
names = sys.argv[2].split(",")
spark = get_spark(app_name="one-boot-probe")
spark.sparkContext.setLogLevel("ERROR")
qs = all_queries()
out = {}
for name in names:
    qs[name](spark, "/root/testdata/sf0.1").write.format("noop").mode("overwrite").save()
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        qs[name](spark, "/root/testdata/sf0.1").write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    out[name] = round(best, 3)
print("PROBE_RESULT " + json.dumps(out))
spark.stop()
"""


def run_probe(tree: str, names: list[str]) -> dict[str, float]:
    env = dict(os.environ)
    proc = subprocess.run(
        [sys.executable, "-c", PROBE, tree, ",".join(names)],
        capture_output=True, text=True, env=env, timeout=900,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("PROBE_RESULT "):
            return json.loads(line[len("PROBE_RESULT "):])
    raise RuntimeError(f"probe failed in {tree}:\n{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}")


def main() -> None:
    rev = sys.argv[1]
    names = sys.argv[2:] or ["dedup_exact", "dedup_minhash_lsh"]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tree = f"/tmp/one_boot_{rev}"
    if not os.path.isdir(tree):
        subprocess.run(
            ["git", "-C", repo, "worktree", "add", "--detach", tree, rev],
            check=True, capture_output=True,
        )
    rounds = {"old": [], "new": []}
    for _ in range(2):  # interleave A/B/A/B so drift cancels
        rounds["old"].append(run_probe(tree, names))
        rounds["new"].append(run_probe(repo, names))
    result = {
        "rev_old": rev,
        "queries": {
            n: {
                "old": min(r[n] for r in rounds["old"]),
                "new": min(r[n] for r in rounds["new"]),
            }
            for n in names
        },
    }
    for n, v in result["queries"].items():
        v["ratio_new_over_old"] = round(v["new"] / v["old"], 3)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
