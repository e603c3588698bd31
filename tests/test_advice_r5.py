"""Regression tests for the round-4 ADVICE findings fixed in round 5.

1. sorted_point_read raised TypeError for sort keys JSON serializes via
   default=str (dates/timestamps/decimals): the manifest held strings,
   and the native-compare disjunct compared str against date on every
   non-matching file.
2. sorted_export raised TypeError when the sort key contained nulls
   (null min_key in the manifest sort).
3. stream_image_dedup_gate's crash-replay could silently shrink the
   admitted set: a replayed batch N probed an index already containing
   its own (possibly partial) batch_id=N rows, so docs matched
   themselves at hamming 0 and the dynamic overwrite replaced the
   admitted partition with the reduced set.

(The fourth finding — attribution_weights rounding decimal-side in the
oracle but double-side in Spark — is covered by the parametrized
test_oracle_parity::test_parity[attribution_weights] case.)
"""

from __future__ import annotations

import datetime
import json
import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL, await_stream_done

from cdk_serverless_data_lake_sandbox_spark.catalog import load_tables


# ------------------------------------------------------------- D21 fix 1
def test_sorted_point_read_date_key(spark, tmp_path):
    """A DATE sort key round-trips through the default=str manifest:
    the point read must parse stored strings back to dates (never
    compare str against date) and return exactly the matching rows
    from a pruned file set."""
    from cdk_serverless_data_lake_sandbox_spark.operators.etl import (
        sorted_export,
        sorted_point_read,
    )

    o = load_tables(spark, SF_SMALL, ("orders",))["orders"]
    tgt = str(tmp_path / "by_date")
    sorted_export(o, tgt, ["o_orderdate"], files=6)
    with open(os.path.join(tgt, "_manifest.json")) as fh:
        manifest = json.load(fh)
    # manifest keys really are strings (the condition under test)
    assert all(isinstance(m["min_key"], str) for m in manifest)

    key = o.select(F.max("o_orderdate")).first()[0]
    assert isinstance(key, datetime.date)
    got = sorted_point_read(spark, tgt, "o_orderdate", key)
    want = o.where(F.col("o_orderdate") == key)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    # pruned: the max date lives in the last range file(s), not all of them
    scanned = {
        os.path.basename(r.f)
        for r in got.select(F.input_file_name().alias("f")).distinct().collect()
    }
    assert len(scanned) < len(manifest)


def test_sorted_point_read_timestamp_and_decimal_keys(spark, tmp_path):
    """Timestamps and decimals — the other two default=str types —
    also look up correctly (no TypeError, exact rows)."""
    import decimal

    from cdk_serverless_data_lake_sandbox_spark.operators.etl import (
        sorted_export,
        sorted_point_read,
    )

    ev = load_tables(spark, SF_SMALL, ("events",))["events"]
    tgt_ts = str(tmp_path / "by_ts")
    sorted_export(ev.select("event_id", "ts"), tgt_ts, ["ts"], files=4)
    key_ts = ev.select(F.min("ts")).first()[0]
    got = sorted_point_read(spark, tgt_ts, "ts", key_ts)
    assert got.count() == ev.where(F.col("ts") == key_ts).count() > 0

    o = load_tables(spark, SF_SMALL, ("orders",))["orders"].select(
        "o_orderkey", F.col("o_totalprice").cast("decimal(18,2)").alias("o_totalprice")
    )
    tgt_dec = str(tmp_path / "by_total")
    sorted_export(
        o.select("o_orderkey", "o_totalprice"), tgt_dec, ["o_totalprice"], files=4
    )
    key_dec = o.select(F.max("o_totalprice")).first()[0]
    assert isinstance(key_dec, decimal.Decimal)
    got = sorted_point_read(spark, tgt_dec, "o_totalprice", key_dec)
    assert (
        got.count()
        == o.where(F.col("o_totalprice") == key_dec).count()
        > 0
    )


# ------------------------------------------------------------- D21 fix 2
def test_sorted_export_null_keys(spark, tmp_path):
    """Null sort keys: export must not raise, null-range entries sort
    first in the manifest, and a point lookup still returns exact rows
    (files holding only nulls are skipped)."""
    from cdk_serverless_data_lake_sandbox_spark.operators.etl import (
        sorted_export,
        sorted_point_read,
    )

    o = load_tables(spark, SF_SMALL, ("orders",))["orders"].select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 7 == 0, F.lit(None))
        .otherwise(F.col("o_orderkey"))
        .alias("k"),
    )
    tgt = str(tmp_path / "nullable")
    sorted_export(o, tgt, ["k"], files=5)  # must not TypeError
    with open(os.path.join(tgt, "_manifest.json")) as fh:
        manifest = json.load(fh)
    assert sum(m["n_rows"] for m in manifest) == o.count()
    # any null-min entries lead the manifest; non-null tail is ascending
    mins = [m["min_key"] for m in manifest]
    nn = [m for m in mins if m is not None]
    assert mins[: len(mins) - len(nn)] == [None] * (len(mins) - len(nn))
    assert nn == sorted(nn)

    key = o.where(F.col("k").isNotNull()).select(F.max("k")).first()[0]
    got = sorted_point_read(spark, tgt, "k", key)
    want = o.where(F.col("k") == key)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


# ------------------------------------------------------------- E38 fix
def test_stream_image_gate_partial_index_replay_recovers(spark, tmp_path):
    """Crash-retry idempotence: admitted data for batch 0 was written
    but the index write was interrupted (only SOME docs' band rows
    landed). The replay must recompute the SAME admitted set — before
    the fix, the indexed docs matched their own hamming-0 rows and the
    dynamic overwrite silently dropped them from the admitted
    partition."""
    from pyspark.sql.types import (
        BinaryType,
        LongType,
        StructField,
        StructType,
    )

    from cdk_serverless_data_lake_sandbox_spark.operators.multimodal import (
        attach_image_variants,
    )
    from cdk_serverless_data_lake_sandbox_spark.streaming.jobs import (
        stream_image_dedup_gate,
    )

    docs = load_tables(spark, SF_SMALL, ("documents",))["documents"].limit(30)
    media = attach_image_variants(docs).select("doc_id", "media")
    # distinct images only (one variant per group) so nothing near-dups
    # anything but itself
    batch = media.where(F.col("doc_id") % 3 == 0)
    src = str(tmp_path / "src")
    batch.coalesce(1).write.parquet(src)
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("media", BinaryType())]
    )
    out, idx = str(tmp_path / "gate"), str(tmp_path / "idx")

    def run_once():
        q = stream_image_dedup_gate(
            spark.readStream.schema(schema).parquet(src), out, idx
        )
        await_stream_done(q)

    run_once()
    admitted_first = {
        r.doc_id for r in spark.read.parquet(out + "/admitted").collect()
    }
    assert admitted_first == {r.doc_id for r in batch.select("doc_id").collect()}

    # simulate the interrupted index write: keep only half the docs' band
    # rows in the batch_id=0 partition
    bands_dir = os.path.join(idx, "bands")
    bands = spark.read.parquet(bands_dir)
    keep_ids = sorted(admitted_first)[: len(admitted_first) // 2]
    partial = bands.where(F.col("doc_id").isin(keep_ids)).select(
        "doc_id", "dhash", "chunk", "key", "batch_id"
    )
    partial_rows = partial.collect()
    import shutil

    shutil.rmtree(bands_dir)
    spark.createDataFrame(partial_rows, partial.schema).write.partitionBy(
        "batch_id"
    ).parquet(bands_dir)

    # replay batch 0 through a fresh gate instance (fresh temp checkpoint)
    run_once()
    admitted_replay = {
        r.doc_id for r in spark.read.parquet(out + "/admitted").collect()
    }
    assert admitted_replay == admitted_first
    # and the index is healed back to every admitted doc
    healed = {
        r.doc_id
        for r in spark.read.parquet(bands_dir).select("doc_id").distinct().collect()
    }
    assert healed == admitted_first
