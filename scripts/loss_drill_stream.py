"""Executor-loss drill for a PERSISTED-INDEX STREAMING MAINTAINER
(r9 verdict item 8): E31's `stream_minhash_dedup_gate` writes index
deltas under the marker-last replay protocol — prove the discipline
under a REAL executor SIGKILL mid-stream, not just replay simulation.

Recipe (scripts/loss_drill.py, streaming form): run the gate over
three file-batches on a real multi-JVM master
(``local-cluster[2,2,1536]``), SIGKILL one executor JVM once the
stream is underway, let Structured Streaming retry the lost tasks,
and assert the FINAL STATE — admitted output, sig/ rows, bands/ rows,
committed markers — is row-identical to an undisturbed local[4] run
of the same batches against the same starting index.

Writes LOSS_DRILL_r10.json (override via argv[1]); exit 1 if no
executor was killed or any state diverged.
"""

from __future__ import annotations

import json
import os
import shutil
import signal
import subprocess
import sys
import tempfile
import threading
import time

sys.path.insert(0, ".")

OUT = sys.argv[1] if len(sys.argv) > 1 else "LOSS_DRILL_r10.json"
SF = "/root/testdata/sf0.01"


def executor_pids() -> list[int]:
    out = subprocess.run(
        ["ps", "-eo", "pid,args"], capture_output=True, text=True
    ).stdout
    return [
        int(line.split(None, 1)[0])
        for line in out.splitlines()
        if "CoarseGrainedExecutorBackend" in line and "java" in line
    ]


def run_gate(master: str, root: str, kill: bool) -> dict:
    """One full gate run in a fresh SparkSession: corpus index build,
    three streamed batches, then a row-level snapshot of every piece
    of durable state the gate owns."""
    from pyspark.sql import SparkSession

    from cdk_serverless_data_lake_sandbox_spark.catalog import load_tables
    from cdk_serverless_data_lake_sandbox_spark.operators.dedup import (
        minhash_index_build,
    )
    from cdk_serverless_data_lake_sandbox_spark.streaming.jobs import (
        stream_minhash_dedup_gate,
    )

    b = SparkSession.builder.master(master).appName("loss-drill-stream")
    b = b.config("spark.sql.shuffle.partitions", "8")
    if master.startswith("local-cluster"):
        b = b.config("spark.executor.memory", "1g")
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_tables(spark, SF, ("documents",))["documents"]
    idx = os.path.join(root, "idx")
    out_dir = os.path.join(root, "out")
    minhash_index_build(docs.where("doc_id < 300"), idx)

    drop = os.path.join(root, "drop")
    for lo, hi in ((300, 360), (360, 420), (420, 500)):
        (
            docs.where(f"doc_id >= {lo} AND doc_id < {hi}")
            .select("doc_id", "text")
            .repartition(4)
            .write.mode("append")
            .parquet(drop)
        )

    killed: dict = {}
    if kill:
        def killer() -> None:
            deadline = time.time() + 180
            while time.time() < deadline and not killed:
                pids = executor_pids()
                # wait until the stream is genuinely underway: batch 0
                # output exists, so the SIGKILL lands mid-stream with
                # index appends still ahead of it
                underway = os.path.isdir(
                    os.path.join(out_dir, "batch_id=0")
                )
                if len(pids) >= 2 and underway:
                    os.kill(pids[0], signal.SIGKILL)
                    killed["pid"] = pids[0]
                    return
                time.sleep(0.1)

        threading.Thread(target=killer, daemon=True).start()

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 4)
        .parquet(drop)
    )
    q = (
        stream_minhash_dedup_gate(stream, idx, out_dir)
        .option("checkpointLocation", os.path.join(root, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    deadline = time.time() + 600
    while q.isActive and time.time() < deadline:
        q.awaitTermination(5)
    if q.exception() is not None:
        raise RuntimeError(str(q.exception()))
    q.stop()

    def rows(path: str) -> list:
        if not os.path.isdir(path):
            return []
        return sorted(
            tuple(r) for r in spark.read.parquet(path).collect()
        )

    state = {
        "admitted": rows(out_dir),
        "sig": rows(os.path.join(idx, "sig")),
        "bands": rows(os.path.join(idx, "bands")),
        "markers": sorted(os.listdir(os.path.join(idx, "manifest"))),
        "killed_pid": killed.get("pid"),
    }
    spark.stop()
    return state


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[2] == "semantic":
        art = drill_semantic()
        print(json.dumps(art))
        prior = {}
        if os.path.exists(OUT):
            with open(OUT) as fh:
                prior = json.load(fh)
        prior["stream_semantic_dedup_gate"] = art
        with open(OUT, "w") as fh:
            json.dump(prior, fh, indent=1)
        ok = art["executor_killed"] and all(
            art[k] for k in (
                "admitted_identical", "members_identical",
                "centroids_identical", "markers_identical",
            )
        )
        sys.exit(0 if ok else 1)
    ref_root = tempfile.mkdtemp(prefix="ld-stream-ref-")
    drill_root = tempfile.mkdtemp(prefix="ld-stream-drill-")
    try:
        ref = run_gate("local[4]", ref_root, kill=False)
        got = run_gate("local-cluster[2,2,1536]", drill_root, kill=True)
        art = {
            "op": "stream_minhash_dedup_gate",
            "master": "local-cluster[2,2,1536]",
            "protocol": "batch_id output + marker-last + append anti-join",
            "executor_killed": got["killed_pid"] is not None,
            "killed_pid": got["killed_pid"],
            "admitted_rows": len(got["admitted"]),
            "sig_rows": len(got["sig"]),
            "band_rows": len(got["bands"]),
            "markers": got["markers"],
            "admitted_identical": got["admitted"] == ref["admitted"],
            "sig_identical": got["sig"] == ref["sig"],
            "bands_identical": got["bands"] == ref["bands"],
            "markers_identical": got["markers"] == ref["markers"],
        }
        print(json.dumps(art))
        prior = {}
        if os.path.exists(OUT):
            with open(OUT) as fh:
                prior = json.load(fh)
        prior["stream_minhash_dedup_gate"] = art
        with open(OUT, "w") as fh:
            json.dump(prior, fh, indent=1)
        ok = art["executor_killed"] and all(
            art[k]
            for k in (
                "admitted_identical",
                "sig_identical",
                "bands_identical",
                "markers_identical",
            )
        )
        sys.exit(0 if ok else 1)
    finally:
        shutil.rmtree(ref_root, ignore_errors=True)
        shutil.rmtree(drill_root, ignore_errors=True)



def run_semantic_gate(master: str, root: str, kill: bool) -> dict:
    """E52 drill twin: IVF index build, three streamed embedding
    batches through stream_semantic_dedup_gate, then a row-level
    snapshot of its durable state (admitted output, members,
    centroids, markers)."""
    from pyspark.sql import SparkSession

    from cdk_serverless_data_lake_sandbox_spark.catalog import load_tables
    from cdk_serverless_data_lake_sandbox_spark.operators.similarity import (
        ivf_index_build,
    )
    from cdk_serverless_data_lake_sandbox_spark.streaming.jobs import (
        stream_semantic_dedup_gate,
    )

    b = SparkSession.builder.master(master).appName("loss-drill-sem")
    b = b.config("spark.sql.shuffle.partitions", "8")
    if master.startswith("local-cluster"):
        b = b.config("spark.executor.memory", "1g")
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    emb = load_tables(spark, SF, ("embeddings",))["embeddings"]
    idx = os.path.join(root, "ivf")
    out_dir = os.path.join(root, "out")
    # corpus index from the low vec_ids; the stream delivers the
    # rest. ivf_index_build reads via _emb(spark, sf_dir), so stage
    # the corpus slice as embeddings.parquet in its own dir.
    corpus_dir = os.path.join(root, "corpus_sf")
    os.makedirs(corpus_dir, exist_ok=True)
    (
        emb.where("vec_id < 300")
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(os.path.join(corpus_dir, "embeddings.parquet"))
    )
    ivf_index_build(spark, corpus_dir, idx)

    drop = os.path.join(root, "drop")
    for lo, hi in ((300, 370), (370, 440), (440, 500)):
        (
            emb.where(f"vec_id >= {lo} AND vec_id < {hi}")
            .select("vec_id", "embedding")
            .repartition(4)
            .write.mode("append")
            .parquet(drop)
        )

    killed: dict = {}
    if kill:
        def killer() -> None:
            deadline = time.time() + 180
            while time.time() < deadline and not killed:
                pids = executor_pids()
                underway = os.path.isdir(
                    os.path.join(out_dir, "batch_id=0")
                )
                if len(pids) >= 2 and underway:
                    os.kill(pids[0], signal.SIGKILL)
                    killed["pid"] = pids[0]
                    return
                time.sleep(0.1)

        threading.Thread(target=killer, daemon=True).start()

    stream = (
        spark.readStream.schema("vec_id long, embedding array<float>")
        .option("maxFilesPerTrigger", 4)
        .parquet(drop)
    )
    q = (
        stream_semantic_dedup_gate(stream, idx, out_dir)
        .option("checkpointLocation", os.path.join(root, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    deadline = time.time() + 600
    while q.isActive and time.time() < deadline:
        q.awaitTermination(5)
    if q.exception() is not None:
        raise RuntimeError(str(q.exception()))
    q.stop()

    def rows(path: str) -> list:
        if not os.path.isdir(path):
            return []
        return sorted(
            tuple(
                tuple(v) if isinstance(v, list) else v for v in r
            )
            for r in spark.read.parquet(path).collect()
        )

    state = {
        "admitted": rows(out_dir),
        "members": rows(os.path.join(idx, "members")),
        "centroids": rows(os.path.join(idx, "centroids")),
        "markers": sorted(os.listdir(os.path.join(idx, "manifest"))),
        "killed_pid": killed.get("pid"),
    }
    spark.stop()
    return state


def drill_semantic() -> dict:
    ref_root = tempfile.mkdtemp(prefix="ld-sem-ref-")
    drill_root = tempfile.mkdtemp(prefix="ld-sem-drill-")
    try:
        ref = run_semantic_gate("local[4]", ref_root, kill=False)
        got = run_semantic_gate(
            "local-cluster[2,2,1536]", drill_root, kill=True
        )
        return {
            "op": "stream_semantic_dedup_gate",
            "master": "local-cluster[2,2,1536]",
            "protocol": "batch_id output + marker-last + cell-pruned append anti-join",
            "executor_killed": got["killed_pid"] is not None,
            "killed_pid": got["killed_pid"],
            "admitted_rows": len(got["admitted"]),
            "member_rows": len(got["members"]),
            "markers": got["markers"],
            "admitted_identical": got["admitted"] == ref["admitted"],
            "members_identical": got["members"] == ref["members"],
            "centroids_identical": got["centroids"] == ref["centroids"],
            "markers_identical": got["markers"] == ref["markers"],
        }
    finally:
        shutil.rmtree(ref_root, ignore_errors=True)
        shutil.rmtree(drill_root, ignore_errors=True)


if __name__ == "__main__":
    main()
