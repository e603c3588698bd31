"""Observation-based monitoring: metrics must ride the frame's own
action (no second scan) and match independently computed values, in
both batch and streaming execution."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from cdk_serverless_data_lake_sandbox_spark.catalog import load_tables
from cdk_serverless_data_lake_sandbox_spark.operators.quality import (
    corpus_ingest_metrics,
    observe_metrics,
)

from tests.conftest import SF_SMALL, await_stream_done


def test_batch_observe_matches_direct_agg(spark):
    docs = load_tables(spark, SF_SMALL, ("documents",))["documents"]
    observed, obs = corpus_ingest_metrics(docs)
    observed.write.format("noop").mode("overwrite").save()
    got = obs.get
    want = docs.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_if(
            F.col("text").isNull() | (F.length(F.trim(F.col("text"))) == 0)
        ).alias("n_blank_text"),
        F.sum(F.length("text")).cast("bigint").alias("total_chars"),
        F.approx_count_distinct("source").alias("n_sources"),
    ).first()
    assert got["n_rows"] == want.n_rows
    assert got["n_blank_text"] == want.n_blank_text
    assert got["total_chars"] == want.total_chars
    assert got["n_sources"] == want.n_sources


def test_batch_observe_single_scan(spark):
    """The metrics must NOT add a scan: the observed frame's executed
    plan contains exactly the one file scan the write itself needs
    (CollectMetrics is a streaming-through node, not a branch)."""
    docs = load_tables(spark, SF_SMALL, ("documents",))["documents"]
    observed, obs = observe_metrics(
        docs, "m", {"n": F.count(F.lit(1))}
    )
    plan = observed._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1, plan
    assert "CollectMetrics" in plan, plan


def test_streaming_observe_surfaces_in_progress(spark, tmp_path):
    from cdk_serverless_data_lake_sandbox_spark.streaming.jobs import (
        observed_event_stream,
        read_event_stream,
    )

    events = load_tables(spark, SF_SMALL, ("events",))["events"]
    src = str(tmp_path / "src")
    events.limit(200).write.parquet(src)
    stream = observed_event_stream(
        read_event_stream(spark, src, max_files_per_trigger=100)
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("obs_sink")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    await_stream_done(q)
    metrics = [
        p["observedMetrics"]["ingest_metrics"]
        for p in (q.recentProgress or [])
        if p.get("observedMetrics", {}).get("ingest_metrics")
        and p["observedMetrics"]["ingest_metrics"]["n_rows"] > 0
    ]
    assert metrics, "no observed metrics in any progress event"
    total_rows = sum(m["n_rows"] for m in metrics)
    assert total_rows == 200
    want_sum = events.limit(200).agg(F.sum("value")).first()[0]
    got_sum = sum(m["value_sum"] for m in metrics)
    assert got_sum == pytest.approx(want_sum, rel=1e-9)
