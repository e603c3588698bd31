"""Round-9 advice regressions.

1. `_committed_batch_dirs` must order batch deltas NUMERICALLY: with
   lexicographic order, 'batch_id=9' sorts after 'batch_id=10', so the
   E48 reservoir's "newest snapshot = dirs[-1]" pick silently folds
   from the stale batch-9 snapshot on every batch >= 11 — dropping
   batch-10+ arrivals and un-doing their evictions. Needs >= 12
   batches to trip, which the r8 tests never reached.
2. `stream_knn_insert` must anti-join re-delivered vec_ids against
   base + committed vector deltas (at-least-once source): a duplicate
   vectors_delta row makes the vec_id-keyed scoring join count that
   node twice per beam expansion.
3. `_ulm_cascade` must derive its piece-length unroll from
   `_ULM_MAXP`, not a hardcoded (1,2,3,4) tuple.
"""

from __future__ import annotations

import hashlib

from tests.conftest import SF_SMALL, await_stream_done


def test_committed_batch_dirs_numeric_order(tmp_path):
    """Double-digit batch ids order after single-digit ones."""
    import os

    from cdk_serverless_data_lake_sandbox_spark.streaming.jobs import (
        _committed_batch_dirs,
    )

    root = tmp_path / "tree"
    for bid in (0, 1, 2, 9, 10, 11, 100):
        (root / f"batch_id={bid}").mkdir(parents=True)
    (root / "_spark_metadata").mkdir()  # ignored non-batch debris
    got = _committed_batch_dirs(str(root), 101)
    assert [int(os.path.basename(p).split("=")[1]) for p in got] == [
        0, 1, 2, 9, 10, 11, 100,
    ]
    # strictly-before guard unchanged
    got = _committed_batch_dirs(str(root), 10)
    assert [int(os.path.basename(p).split("=")[1]) for p in got] == [
        0, 1, 2, 9,
    ]


def test_stream_reservoir_survives_double_digit_batches(spark, tmp_path):
    """12 single-file batches: the final reservoir must equal the
    batch-computed top-R over ALL 24 docs. Ids 21 (delivered in batch
    10) and 23 (batch 11) belong in the top-8 — under the
    lexicographic [-1] bug, batch 11 folds from the batch-9 snapshot
    and id 21 vanishes."""
    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType,
    )

    from cdk_serverless_data_lake_sandbox_spark.streaming.jobs import (
        _RES_SIZE,
        stream_reservoir_sample,
    )

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("source", StringType()),
            StructField("text", StringType()),
        ]
    )
    drop = str(tmp_path / "drop")
    for k in range(12):
        rows = [(2 * k, "srcA", f"doc {2 * k}"),
                (2 * k + 1, "srcA", f"doc {2 * k + 1}")]
        spark.createDataFrame(rows, schema).repartition(1).write.mode(
            "append"
        ).parquet(drop)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(drop)
    )
    q = (
        stream_reservoir_sample(
            stream, str(tmp_path / "state"), str(tmp_path / "out")
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    await_stream_done(q)
    q.stop()

    snaps = spark.read.parquet(str(tmp_path / "state/reservoir"))
    final_id = snaps.agg({"batch_id": "max"}).first()[0]
    assert final_id >= 11, "test must actually reach double-digit batches"
    got = sorted(
        r.doc_id for r in snaps.where(snaps.batch_id == final_id).collect()
    )
    expect = sorted(
        sorted(
            range(24),
            key=lambda i: (
                hashlib.md5(f"rsv{i}".encode()).hexdigest()[:12], i,
            ),
        )[:_RES_SIZE]
    )
    assert got == expect
    # the discriminating docs: arrivals admitted in batches 10 and 11
    assert 21 in got and 23 in got


def test_stream_knn_insert_redelivery_dedup(spark, tmp_path):
    """A vec_id re-delivered in a later batch writes NO second
    vectors_delta row and no second edge set; a genuinely new vector
    in the same batch is still processed."""
    from pyspark.sql import Row
    from pyspark.sql.types import (
        ArrayType, FloatType, LongType, StructField, StructType,
    )

    from cdk_serverless_data_lake_sandbox_spark.operators.similarity import (
        _emb,
        knn_graph_index_build,
    )
    from cdk_serverless_data_lake_sandbox_spark.streaming.jobs import (
        stream_knn_insert,
    )

    idx = str(tmp_path / "knn_idx")
    knn_graph_index_build(spark, SF_SMALL, idx)
    v0 = _emb(spark, SF_SMALL).where("vec_id = 0").first().embedding

    schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(FloatType())),
        ]
    )
    drop = str(tmp_path / "drop")
    spark.createDataFrame([Row(vec_id=1000, embedding=v0)], schema).repartition(
        1
    ).write.parquet(drop)
    # batch 2 re-delivers 1000 alongside new vector 1001 — and 1001
    # TWICE within the batch (one trigger, duplicated row): the
    # within-batch dedupe must collapse it too (review r9)
    spark.createDataFrame(
        [Row(vec_id=1000, embedding=v0), Row(vec_id=1001, embedding=v0),
         Row(vec_id=1001, embedding=v0)],
        schema,
    ).repartition(1).write.mode("append").parquet(drop)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(drop)
    )
    q = (
        stream_knn_insert(stream, idx, str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    await_stream_done(q)
    q.stop()

    vd = spark.read.parquet(str(tmp_path / "knn_idx/vectors_delta"))
    counts = {
        r.vec_id: r.n
        for r in vd.groupBy("vec_id").count().withColumnRenamed(
            "count", "n"
        ).collect()
    }
    assert counts == {1000: 1, 1001: 1}
    # search output: one result set per vec_id, none for the re-delivery
    out = spark.read.parquet(str(tmp_path / "out"))
    per_q = {
        r.query_id: r.n
        for r in out.groupBy("query_id").count().withColumnRenamed(
            "count", "n"
        ).collect()
    }
    assert set(per_q) == {1000, 1001}
    # the fresh vector still found its twins (vec 0 and insert 1000)
    top2 = {
        r.neighbor_id
        for r in out.where("query_id = 1001 and rank <= 2").collect()
    }
    assert top2 == {0, 1000}


def test_ulm_cascade_derives_from_maxp():
    """The unrolled argmax cascade is generated from _ULM_MAXP: every
    length 1.._ULM_MAXP appears exactly once as an accepted CAST index,
    first-max-wins structure (k-th WHEN has MAXP-k comparisons)."""
    from cdk_serverless_data_lake_sandbox_spark.operators.text import (
        _ULM_MAXP,
        _ulm_cascade,
    )

    sql = _ulm_cascade(lambda j: f"S{j}", "ROW")
    for j in range(1, _ULM_MAXP + 1):
        assert sql.count(f"CAST({j} AS DOUBLE)") == 1
    assert f"CAST({_ULM_MAXP + 1} AS DOUBLE)" not in sql
    # first-max-wins: the first branch compares S1 against every later
    # length with >= (ties accept the SMALLEST j)
    for j in range(2, _ULM_MAXP + 1):
        assert f"(S1) >= (S{j})" in sql
    assert sql.count("WHEN") == _ULM_MAXP - 1


def test_modality_dedup_report_planted_corpus(spark, tmp_path):
    """C111 composition pinned directly (r8 verdict item 5): on a
    PLANTED 9-doc corpus (3 media groups of 3; docs 0/1 share text)
    the report's text leg is exactly the planted dup structure, the
    three media legs equal an independent aggregation of their
    registered leg operators, and the planted PNG/GIF twins force a
    known hamming-0 image pair."""
    from pyspark.sql import functions as F

    from cdk_serverless_data_lake_sandbox_spark.operators.multimodal import (
        modality_dedup_report,
    )
    from cdk_serverless_data_lake_sandbox_spark.registry import all_queries

    qs = all_queries()
    rows = [
        (i, ("dup text" if i in (0, 1) else f"unique text {i}"),
         "en", "planted", 11)
        for i in range(9)
    ]
    sf_dir = str(tmp_path / "planted")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).repartition(1).write.parquet(f"{sf_dir}/documents.parquet")

    got = {
        r.modality: (r.n_pairs, r.n_docs_involved, r.dup_doc_rate)
        for r in modality_dedup_report(spark, sf_dir).collect()
    }
    assert set(got) == {"image", "audio", "video", "text_exact"}

    # text leg: docs 0 and 1 duplicate -> 1 pair, 2 docs, rate 2/9
    assert got["text_exact"] == (1, 2, round(2 / 9, 6))

    # media legs: equal the independent aggregation of each leg op
    for name, mod in (
        ("image_dhash_dedup", "image"),
        ("audio_fingerprint_dedup", "audio"),
        ("video_framehash_dedup", "video"),
    ):
        pairs = qs[name](spark, sf_dir).select("a", "b").collect()
        n_pairs = len(pairs)
        involved = len({d for p in pairs for d in (p.a, p.b)})
        assert got[mod] == (n_pairs, involved, round(involved / 9, 6)), mod

    # planted twins: PNG (doc 0) and GIF (doc 1) of group 0 are
    # pixel-identical -> the image leg must contain (0, 1) at hamming 0
    img = {
        (r.a, r.b): r.hamming
        for r in qs["image_dhash_dedup"](spark, sf_dir).collect()
    }
    assert img.get((0, 1)) == 0


def test_stream_domain_cap_redelivery_and_dup_guard(spark, tmp_path):
    """E46 at-least-once guards (r9): a doc re-delivered in a later
    batch is not re-admitted and does not burn a second budget slot;
    a within-batch duplicate occupies one slot."""
    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType,
    )

    from cdk_serverless_data_lake_sandbox_spark.operators.curation import _DFC_CAP
    from cdk_serverless_data_lake_sandbox_spark.streaming.jobs import (
        stream_domain_cap_gate,
    )

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("source", StringType()),
            StructField("text", StringType()),
        ]
    )
    # batch 1: 5 docs, doc 0 duplicated within the batch
    b1 = [(i, "srcA", f"doc {i}") for i in range(5)] + [(0, "srcA", "doc 0")]
    # batch 2: re-delivers docs 1 and 2, plus enough new docs to reach
    # the cap — the re-deliveries must not consume budget
    b2 = [(1, "srcA", "doc 1"), (2, "srcA", "doc 2")] + [
        (i, "srcA", f"doc {i}") for i in range(20, 28)
    ]
    drop = str(tmp_path / "drop")
    spark.createDataFrame(b1, schema).repartition(1).write.parquet(drop)
    spark.createDataFrame(b2, schema).repartition(1).write.mode(
        "append"
    ).parquet(drop)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(drop)
    )
    q = (
        stream_domain_cap_gate(
            stream, str(tmp_path / "state"), str(tmp_path / "out")
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    from tests.conftest import await_stream_done

    await_stream_done(q)
    q.stop()

    rows = spark.read.parquet(str(tmp_path / "out")).collect()
    ids = sorted(r.doc_id for r in rows)
    # every admitted doc exactly once
    assert len(ids) == len(set(ids))
    # batch 1 admitted 5 distinct; batch 2 admitted 5 more new docs
    # (cap 10), with no re-admission of 1/2
    assert len(ids) == _DFC_CAP
    assert set(range(5)) <= set(ids)
    assert len([i for i in ids if i >= 20]) == _DFC_CAP - 5


def test_stream_reservoir_within_batch_duplicate(spark, tmp_path):
    """E48: a doc_id duplicated inside ONE trigger occupies one slot."""
    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType,
    )

    from cdk_serverless_data_lake_sandbox_spark.streaming.jobs import (
        _RES_SIZE,
        stream_reservoir_sample,
    )

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("source", StringType()),
            StructField("text", StringType()),
        ]
    )
    rows = [(i, "srcA", f"doc {i}") for i in range(4)] * 3  # each x3
    drop = str(tmp_path / "drop")
    spark.createDataFrame(rows, schema).repartition(1).write.parquet(drop)

    stream = spark.readStream.schema(schema).parquet(drop)
    q = (
        stream_reservoir_sample(
            stream, str(tmp_path / "state"), str(tmp_path / "out")
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    from tests.conftest import await_stream_done

    await_stream_done(q)
    q.stop()
    snaps = spark.read.parquet(str(tmp_path / "state/reservoir"))
    final_id = snaps.agg({"batch_id": "max"}).first()[0]
    got = sorted(
        r.doc_id for r in snaps.where(snaps.batch_id == final_id).collect()
    )
    assert got == [0, 1, 2, 3]  # 4 distinct docs, one slot each
    assert len(got) <= _RES_SIZE


def test_vacuum_batch_snapshots_keeps_newest(tmp_path):
    """Numeric retention: with double-digit ids, the NEWEST snapshots
    survive (a lexicographic cut would keep batch 9 over 10/11), and
    the gate keeps working from the retained state."""
    import os

    from cdk_serverless_data_lake_sandbox_spark.streaming.jobs import (
        vacuum_batch_snapshots,
    )

    root = tmp_path / "reservoir"
    for bid in range(13):
        (root / f"batch_id={bid}").mkdir(parents=True)
    removed = vacuum_batch_snapshots(str(root), keep_last=3)
    assert removed == list(range(10))
    assert sorted(os.listdir(root)) == [
        "batch_id=10", "batch_id=11", "batch_id=12",
    ]
    # idempotent
    assert vacuum_batch_snapshots(str(root), keep_last=3) == []
