"""Regression tests for the round-3 ADVICE findings: durable
streaming-gate state (atomic swaps, missing-vs-corrupt distinction,
no per-batch count probe), fresh-index bootstrap for the minhash
gate, histogram bin clamping at BOTH ends, and run_cached sidecar
validation."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from cdk_serverless_data_lake_sandbox_spark.catalog import load_tables

from tests.conftest import SF_SMALL, await_stream_done


def _run_bloom(spark, drop, out, state, ckpt):
    from cdk_serverless_data_lake_sandbox_spark.streaming.jobs import (
        DOCS_STREAM_SCHEMA,
        stream_bloom_gate,
    )

    stream = (
        spark.readStream.schema(DOCS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(drop)
    )
    q = (
        stream_bloom_gate(stream, out, state)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    await_stream_done(q)
    q.stop()


def test_stream_bloom_gate_recovers_interrupted_swap(spark, tmp_path):
    """A crash between 'move live bits aside' and 'promote staged'
    leaves state at bits_old. The next batch must RESTORE it — old
    keys stay remembered — rather than restart from empty and
    re-admit them."""
    from cdk_serverless_data_lake_sandbox_spark.streaming.jobs import (
        DOCS_STREAM_SCHEMA,
    )

    docs = load_tables(spark, SF_SMALL, ("documents",))["documents"]
    base = docs.select(*DOCS_STREAM_SCHEMA.fieldNames()).limit(100)
    drop = str(tmp_path / "drop")
    base.repartition(1).write.parquet(drop)
    out, state = str(tmp_path / "out"), str(tmp_path / "state")
    _run_bloom(spark, drop, out, state, str(tmp_path / "ckpt"))

    # simulate the mid-swap crash: live dir moved aside, promotion died
    bits = os.path.join(state, "bits")
    shutil.move(bits, bits + "_old")
    # replay the SAME keys as a new file (new batch). They were all
    # admitted before, so with recovered state every one must drop.
    base.repartition(1).write.mode("append").parquet(drop)
    _run_bloom(spark, drop, out, state, str(tmp_path / "ckpt2"))

    got = spark.read.parquet(out).toPandas()
    assert got.doc_id.is_unique, "interrupted swap lost the bloom state"
    assert os.path.isdir(bits) and not os.path.exists(bits + "_old")


def test_stream_bloom_gate_corrupt_state_raises(spark, tmp_path):
    """Unreadable (corrupt) bits must surface as a failure, not be
    treated as 'no prior state' (which would silently void the
    no-duplicate guarantee)."""
    from cdk_serverless_data_lake_sandbox_spark.streaming.jobs import (
        DOCS_STREAM_SCHEMA,
    )

    docs = load_tables(spark, SF_SMALL, ("documents",))["documents"]
    base = docs.select(*DOCS_STREAM_SCHEMA.fieldNames()).limit(50)
    drop = str(tmp_path / "drop")
    base.repartition(1).write.parquet(drop)
    out, state = str(tmp_path / "out"), str(tmp_path / "state")
    _run_bloom(spark, drop, out, state, str(tmp_path / "ckpt"))

    bits = os.path.join(state, "bits")
    for f in os.listdir(bits):
        if f.endswith(".parquet"):
            with open(os.path.join(bits, f), "wb") as fh:
                fh.write(b"not a parquet file")
    base.repartition(1).write.mode("append").parquet(drop)
    with pytest.raises(Exception):
        _run_bloom(spark, drop, out, state, str(tmp_path / "ckpt2"))


def test_stream_minhash_gate_bootstraps_fresh_index(spark, tmp_path):
    """The gate must work as the index's FIRST writer: batch 1 probes
    nothing (no bands/sig yet), admits everything, and creates the
    index; batch 2's near-copy of a batch-1 admit is then dropped."""
    from cdk_serverless_data_lake_sandbox_spark.streaming.jobs import (
        stream_minhash_dedup_gate,
    )

    novel1 = " ".join(f"aa{i}b{i * 5 % 13}" for i in range(50))
    batch1 = [(1, novel1), (2, " ".join(f"qq{i}d{i * 3 % 17}" for i in range(50)))]
    batch2 = [
        (3, novel1 + " edited end"),  # near-dup of a batch-1 admit -> drop
        (4, " ".join(f"zz{i}c{i * 7 % 11}" for i in range(50))),  # admit
    ]
    drop = str(tmp_path / "drop")
    spark.createDataFrame(batch1, "doc_id long, text string").repartition(
        1
    ).write.parquet(drop)
    spark.createDataFrame(batch2, "doc_id long, text string").repartition(
        1
    ).write.mode("append").parquet(drop)

    idx, out = str(tmp_path / "idx"), str(tmp_path / "out")
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(drop)
    )
    q = (
        stream_minhash_dedup_gate(stream, idx, out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    await_stream_done(q)
    q.stop()
    admitted = set(spark.read.parquet(out).toPandas().doc_id)
    assert admitted == {1, 2, 4}, admitted


def test_minhash_index_query_heals_interrupted_compact(spark, tmp_path):
    """minhash_index_compact's swap can crash after moving the live
    dir aside; the probe side restores the aside copy instead of
    failing on a missing path."""
    from cdk_serverless_data_lake_sandbox_spark.operators.dedup import (
        minhash_index_build,
        minhash_index_query,
    )

    docs = load_tables(spark, SF_SMALL, ("documents",))["documents"]
    corpus = docs.where("doc_id < 100")
    idx = str(tmp_path / "idx")
    minhash_index_build(corpus, idx)

    probe_doc = corpus.orderBy("doc_id").limit(1).collect()[0]
    probe = spark.createDataFrame(
        [(9001, probe_doc["text"] + " tiny tail")], "doc_id long, text string"
    )
    want = minhash_index_query(spark, idx, probe).count()
    assert want > 0

    for part in ("bands", "sig"):
        shutil.move(os.path.join(idx, part), os.path.join(idx, part + "_old"))
    got = minhash_index_query(spark, idx, probe).count()
    assert got == want
    assert os.path.isdir(os.path.join(idx, "bands"))
    assert not os.path.exists(os.path.join(idx, "bands_old"))


def test_bin_values_clamps_both_ends(spark):
    """Values below a type's baseline lo clamp to bin 0 and values
    above hi clamp to bins-1 — the [0, bins) invariant the
    rollup/decode assumes, exercised by a live stream drifting
    outside the fixed reference range."""
    from cdk_serverless_data_lake_sandbox_spark.operators.analytics import (
        bin_values,
    )

    events = spark.createDataFrame(
        [("click", -5.0), ("click", 0.0), ("click", 5.0), ("click", 99.0)],
        "event_type string, value double",
    )
    rng = spark.createDataFrame(
        [("click", 0.0, 10.0)], "event_type string, lo double, width double"
    )
    got = [
        r["bin"]
        for r in bin_values(events, rng, bins=16)
        .orderBy("bin")
        .collect()
    ]
    assert got[0] == 0 and got[-1] == 15
    assert all(0 <= b < 16 for b in got)


def test_run_cached_missing_run_dir_falls_through(spark, tmp_path):
    """A valid sidecar pointing at a deleted run dir must execute a
    fresh run, not return an unreadable cached hit."""
    from cdk_serverless_data_lake_sandbox_spark.catalog import ResultsZone

    rz = ResultsZone(spark, str(tmp_path / "results"))
    q = spark.range(10).select(F.col("id").alias("v"))
    r1, reused1 = rz.run_cached("ids", q)
    assert not reused1
    shutil.rmtree(os.path.join(str(tmp_path / "results"), "ids", f"run={r1}"))
    r2, reused2 = rz.run_cached("ids", q)
    # must execute fresh (the vacated run number may be reused — what
    # matters is that the result is real and readable again)
    assert not reused2
    assert rz.read("ids", r2).count() == 10
