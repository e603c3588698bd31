"""Executor-loss drill (round-8 verdict item 2): the point of the
`reliable` materializer is that iterative state survives executor
loss — demonstrate it instead of asserting it.

Runs copurchase_pagerank on a REAL multi-JVM master
(``local-cluster[2,2,1024]``: standalone master + 2 workers, each
executor a separate killable JVM), under the cluster-default
materializer (``auto`` resolves local-cluster to ``reliable`` since
r8), SIGKILLs one executor JVM mid-run, and asserts the job completes
with the bit-exact result of an undisturbed local[4] baseline.

Writes LOSS_DRILL_LATEST.json (override via argv[2] — round artifacts
pass LOSS_DRILL_r{N}.json explicitly); exit 1 if no executor was
killed (the drill didn't actually drill) or the result diverged.

Usage: python scripts/loss_drill.py [sf_dir] [out_json] [op]
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import threading
import time

sys.path.insert(0, ".")

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "LOSS_DRILL_LATEST.json"
OP = sys.argv[3] if len(sys.argv) > 3 else "copurchase_pagerank"


def executor_pids() -> list[int]:
    """PIDs of standalone-executor JVMs (separate processes only on a
    real cluster master — exactly what the drill needs to exist)."""
    out = subprocess.run(
        ["ps", "-eo", "pid,args"], capture_output=True, text=True
    ).stdout
    return [
        int(line.split(None, 1)[0])
        for line in out.splitlines()
        if "CoarseGrainedExecutorBackend" in line and "java" in line
    ]


def _collect_sorted(df):
    return sorted(tuple(r) for r in df.collect())


def main() -> None:
    from pyspark.sql import SparkSession

    from cdk_serverless_data_lake_sandbox_spark.registry import all_queries

    q = all_queries()[OP]

    base = (
        SparkSession.builder.master("local[4]")
        .appName("loss-drill-baseline")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    base.sparkContext.setLogLevel("ERROR")
    expected = _collect_sorted(q(base, SF))
    base.stop()

    spark = (
        SparkSession.builder.master("local-cluster[2,2,1536]")
        .appName("loss-drill")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.executor.memory", "1g")
        # NO explicit materializer: the drill proves the DEFAULT
        # (auto -> reliable on a cluster master) is loss-safe
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    killed: dict = {}

    from cdk_serverless_data_lake_sandbox_spark.operators._helpers import (
        _SCRATCH_ROOT,
    )

    app_id = spark.sparkContext.applicationId
    scratch = os.path.join(_SCRATCH_ROOT, app_id)

    def killer() -> None:
        # kill only once the FIRST reliable-pin scratch write exists —
        # proof the iteration loop is underway, so the SIGKILL lands
        # mid-iteration, not during session/exec bring-up
        deadline = time.time() + 180
        while time.time() < deadline and not killed:
            pids = executor_pids()
            pinned = os.path.isdir(scratch) and os.listdir(scratch)
            if len(pids) >= 2 and pinned:
                os.kill(pids[0], signal.SIGKILL)
                killed["pid"] = pids[0]
                killed["at"] = time.time()
                return
            time.sleep(0.25)

    th = threading.Thread(target=killer, daemon=True)
    th.start()
    t0 = time.time()
    got = _collect_sorted(q(spark, SF))
    wall = time.time() - t0
    th.join(timeout=2)
    spark.stop()

    art = {
        "master": "local-cluster[2,2,1536]",
        "materializer": "auto (resolved: reliable)",
        "op": OP,
        "sf_dir": SF,
        "executor_killed": killed.get("pid") is not None,
        "killed_pid": killed.get("pid"),
        "killed_after_sec": (
            round(killed["at"] - t0, 1) if "at" in killed else None
        ),
        "completed": True,
        "hash_exact": got == expected,
        "rows": len(got),
        "wall_sec": round(wall, 1),
    }
    print(json.dumps(art))
    with open(OUT, "w") as fh:
        json.dump(art, fh, indent=1)
    if not art["executor_killed"] or not art["hash_exact"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
