"""Multimodal plumbing tests (C13): schema contract, Arrow batch
shape, deterministic stub decode, JVM-side frame sampling."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdk_serverless_data_lake_sandbox_spark.catalog import load_tables
from cdk_serverless_data_lake_sandbox_spark.operators.multimodal import (
    _decode_bytes,
    attach_fake_media,
    decode_and_featurize,
    sample_frames,
)
from cdk_serverless_data_lake_sandbox_spark.registry import all_queries

from tests.conftest import SF_SMALL


def _media(spark):
    docs = load_tables(spark, SF_SMALL, ("documents",))["documents"]
    return attach_fake_media(docs)


def test_media_schema(spark):
    m = _media(spark)
    types = {f.name: f.dataType.simpleString() for f in m.schema.fields}
    assert types["media"] == "binary"
    assert types["meta"].startswith("struct<format:string,width:int,height:int")


def test_decode_stub_contract():
    n, mean = _decode_bytes(b"\x00\xff")
    assert (n, mean) == (2, 127.5)
    with pytest.raises(NotImplementedError):
        _decode_bytes(b"")


def test_decode_and_featurize(spark):
    out = decode_and_featurize(_media(spark))
    rows = out.orderBy("doc_id").limit(5).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.n_bytes % 16 == 0  # md5 payload multiples
        assert len(r.features) == 8
        assert abs(sum(r.features) - 1.0) < 1e-9  # normalized histogram
    # determinism: same plan twice -> same values
    again = decode_and_featurize(_media(spark)).orderBy("doc_id").limit(5).collect()
    assert [r.mean_byte for r in rows] == [r.mean_byte for r in again]


def test_sample_frames_jvm_side(spark):
    frames = sample_frames(_media(spark), every_n=2)
    r = frames.where(F.col("doc_id") == 3).collect()  # doc 3: 4x16 bytes
    assert [x.frame_idx for x in r] == [0, 2]
    assert all(len(bytes(x.frame)) == 16 for x in r)


def test_registered_query_rows(spark):
    df = all_queries()["multimodal_features"](spark, SF_SMALL)
    assert df.count() == 500


def test_resample_frames_even_budget(spark):
    from cdk_serverless_data_lake_sandbox_spark.operators.multimodal import (
        attach_fake_media,
        resample_frames,
    )

    docs = load_tables(spark, SF_SMALL, ("documents",))["documents"].limit(50)
    media = attach_fake_media(docs)
    out = resample_frames(media, target_n=4).collect()
    assert out
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, rows in by_doc.items():
        n_frames = rows[0].n_frames
        # at most the budget, every index in range, frames are full-size
        assert len(rows) <= 4
        assert all(0 <= r.frame_idx < n_frames for r in rows)
        assert all(len(r.frame) == 16 for r in rows)
        # short clips keep all frames
        if n_frames <= 4:
            assert len(rows) == min(n_frames, 4)


def test_chunked_featurize_matches_unchunked(spark):
    """Byte/row budgets re-slice batches but cannot change results."""
    m = _media(spark)
    base = {
        r.doc_id: r
        for r in decode_and_featurize(m).collect()
    }
    for kwargs in ({"rows_per_chunk": 7}, {"max_chunk_bytes": 200},
                   {"rows_per_chunk": 1}, {"max_chunk_bytes": 1}):
        got = decode_and_featurize(m, **kwargs).collect()
        assert len(got) == len(base)
        for r in got:
            b = base[r.doc_id]
            assert r.n_bytes == b.n_bytes
            assert abs(r.mean_byte - b.mean_byte) < 1e-12
            assert r.features == b.features


def test_resample_audio_lengths_and_determinism(spark):
    from cdk_serverless_data_lake_sandbox_spark.operators.multimodal import (
        resample_audio,
    )

    m = _media(spark)
    out = resample_audio(m, source_rate=16000, target_rate=8000).collect()
    src = {r.doc_id: r for r in m.select("doc_id", F.length("media").alias("n")).collect()}
    assert len(out) == len(src)
    for r in out:
        assert r.n_samples_in == src[r.doc_id].n
        assert r.n_samples_out == max(1, r.n_samples_in // 2)
        assert len(r.resampled) == r.n_samples_out
    # upsampling keeps every payload longer
    up = resample_audio(m, source_rate=8000, target_rate=16000).collect()
    for r in up:
        assert r.n_samples_out == 2 * r.n_samples_in
    # determinism: a second run is byte-identical
    again = {r.doc_id: bytes(r.resampled) for r in resample_audio(m).collect()}
    first = {r.doc_id: bytes(r.resampled) for r in out}
    assert first == again


def test_modality_profile_detects_all_signatures(spark):
    """Magic-byte sniffing must classify every synthesized payload
    to its ground-truth modality (doc_id % 3 cycle) with zero
    unknowns, and totals must cover the corpus."""
    from cdk_serverless_data_lake_sandbox_spark.registry import all_queries

    from tests.conftest import SF_SMALL

    out = {
        r.modality: r
        for r in all_queries()["modality_profile"](spark, SF_SMALL).collect()
    }
    assert "unknown" not in out
    assert set(out) == {"jpeg", "png", "wav"}
    import collections

    from cdk_serverless_data_lake_sandbox_spark.catalog import load_tables

    docs = load_tables(spark, SF_SMALL, ("documents",))["documents"]
    counts = collections.Counter(
        ("jpeg", "png", "wav")[r.doc_id % 3]
        for r in docs.select("doc_id").collect()
    )
    assert sum(r.n_payloads for r in out.values()) == sum(counts.values())
    for m, r in out.items():
        assert r.n_payloads == counts[m]
        assert r.min_bytes >= 3 + 16  # signature (3-4B) + >= one md5 body
