"""Executor-loss drill for the transformWithState family (r10 verdict
item 7): E19 `tws_user_totals` keeps its running totals in a
RocksDB-backed ValueState, recovered through checkpoint + changelog
rather than the marker-file protocols the E31/E52 drills covered.
Prove THAT recovery path under a REAL executor SIGKILL.

Recipe (loss_drill_stream.py form): stream three event file-batches
through the op on a real multi-JVM master (local-cluster[2,2,1536],
RocksDB provider), SIGKILL one executor JVM after the first batch
commits, let Structured Streaming retry + state-store recover, then
read the FINAL STATE TREE back through the op's own E54 primitive
(`inspect_stream_state`, the statestore data source) and compare it
key-for-key against an undisturbed local[4] run of the same batches.

Comparison detail: `n_events` must match EXACTLY; `total_value` is
compared at 4 dp because the float64 running sum accumulates in
shuffle-arrival chunk order, which is nondeterministic between ANY two
runs (kill or no kill) — magnitudes ~1e3 vs ulp drift ~1e-12 leave
eight orders of margin.

Writes LOSS_DRILL_r11.json (override via argv[1]); exit 1 if no
executor was killed or the state trees diverge.
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import tempfile
import threading
import time

sys.path.insert(0, ".")

OUT = sys.argv[1] if len(sys.argv) > 1 else "LOSS_DRILL_r11.json"
SF = "/root/testdata/sf0.01"
ROCKSDB = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"


def executor_pids() -> list[int]:
    out = subprocess.run(
        ["ps", "-eo", "pid,args"], capture_output=True, text=True
    ).stdout
    return [
        int(line.split(None, 1)[0])
        for line in out.splitlines()
        if "CoarseGrainedExecutorBackend" in line and "java" in line
    ]


def run_tws(master: str, root: str, kill: bool) -> dict:
    """One full streamed run in a fresh SparkSession; returns the
    normalized final state tree read back from the checkpoint."""
    from pyspark.sql import SparkSession

    from cdk_serverless_data_lake_sandbox_spark.catalog import load_tables
    from cdk_serverless_data_lake_sandbox_spark.compat import ensure_protobuf
    from cdk_serverless_data_lake_sandbox_spark.streaming.jobs import (
        inspect_stream_state,
    )
    from cdk_serverless_data_lake_sandbox_spark.streaming.stateful import (
        tws_user_totals,
    )

    ensure_protobuf()  # before the gateway: TWS python workers need it
    b = (
        SparkSession.builder.master(master)
        .appName("loss-drill-tws")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.streaming.stateStore.providerClass", ROCKSDB)
        .config("spark.sql.session.timeZone", "UTC")
    )
    if master.startswith("local-cluster"):
        b = b.config("spark.executor.memory", "1g")
        # executors are separate JVMs: hand them the vendored-protobuf
        # PYTHONPATH explicitly rather than relying on env inheritance
        if os.environ.get("PYTHONPATH"):
            b = b.config("spark.executorEnv.PYTHONPATH", os.environ["PYTHONPATH"])
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    ev = load_tables(spark, SF, ("events",))["events"]
    drop = os.path.join(root, "drop")
    for k in range(3):
        (
            ev.where(f"event_id % 3 = {k}")
            .select("user_id", "value")
            .repartition(4)
            .write.mode("append")
            .parquet(drop)
        )
    ckpt = os.path.join(root, "ckpt")

    killed: dict = {}
    if kill:

        def killer() -> None:
            deadline = time.time() + 240
            while time.time() < deadline and not killed:
                pids = executor_pids()
                # batch 0 committed -> the SIGKILL lands with state
                # already persisted and more batches still ahead
                underway = os.path.exists(os.path.join(ckpt, "commits", "0"))
                if len(pids) >= 2 and underway:
                    os.kill(pids[0], signal.SIGKILL)
                    killed["pid"] = pids[0]
                    return
                time.sleep(0.1)

        threading.Thread(target=killer, daemon=True).start()

    stream = (
        spark.readStream.schema("user_id long, value double")
        .option("maxFilesPerTrigger", 4)
        .parquet(drop)
    )
    q = (
        tws_user_totals(stream)
        .writeStream.format("noop")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    deadline = time.time() + 600
    while q.isActive and time.time() < deadline:
        q.awaitTermination(5)
    if q.exception() is not None:
        raise RuntimeError(str(q.exception()))
    q.stop()

    # value struct carries stateful._STATE_SCHEMA's field names (n, v)
    state = inspect_stream_state(spark, ckpt, stateVarName="totals").collect()
    tree = sorted(
        (r.key.user_id, r.value.n, round(r.value.v, 4)) for r in state
    )
    n_batches = len(os.listdir(os.path.join(ckpt, "commits")))
    spark.stop()
    return {"tree": tree, "killed_pid": killed.get("pid"), "n_batches": n_batches}


def main() -> None:
    ref_root = tempfile.mkdtemp(prefix="ld-tws-ref-")
    drill_root = tempfile.mkdtemp(prefix="ld-tws-drill-")
    ref = run_tws("local[4]", ref_root, kill=False)
    got = run_tws("local-cluster[2,2,1536]", drill_root, kill=True)
    art = {
        "op": "tws_user_totals",
        "master": "local-cluster[2,2,1536]",
        "state_store": "RocksDBStateStoreProvider",
        "protocol": "checkpoint + RocksDB changelog recovery (no marker files)",
        "executor_killed": got["killed_pid"] is not None,
        "killed_pid": got["killed_pid"],
        "state_keys": len(got["tree"]),
        "ref_state_keys": len(ref["tree"]),
        "batches_committed": got["n_batches"],
        "state_tree_identical": got["tree"] == ref["tree"],
        "value_compare": "n (count) exact, v (sum) at 4dp (chunk-order float sum)",
    }
    print(json.dumps(art))
    prior = {}
    if os.path.exists(OUT):
        with open(OUT) as fh:
            prior = json.load(fh)
    prior["tws_user_totals"] = art
    with open(OUT, "w") as fh:
        json.dump(prior, fh, indent=1)
    ok = art["executor_killed"] and art["state_tree_identical"]
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
