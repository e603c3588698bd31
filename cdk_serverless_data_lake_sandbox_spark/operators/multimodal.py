"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed in Arrow-batched Pandas UDFs.

The decode step itself is STUBBED (no image/audio libraries in this
container — see ``_decode_bytes``): payloads are deterministic fake
media synthesized from the documents table, and "decoding" parses the
fake header. Everything around the stub is real and tested: the
schema contract (binary + metadata struct), ``mapInPandas`` batch
iteration, partition-preserving feature extraction, and JVM-side
frame slicing for video-style payloads.

To use real codecs, replace ``_decode_bytes`` with PIL/ffmpeg calls —
the Spark-side plan does not change.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from cdk_serverless_data_lake_sandbox_spark.catalog import load_tables
from cdk_serverless_data_lake_sandbox_spark.registry import register

_FRAME_BYTES = 16  # fake video frame size


def attach_fake_media(docs: DataFrame) -> DataFrame:
    """Synthesize a multimodal table from documents: a binary payload
    (md5 of the text, repeated — deterministic) plus typed metadata,
    the schema a real ingest would produce."""
    payload = F.expr("repeat(unhex(md5(text)), 1 + pmod(doc_id, 4))")
    return docs.select(
        "doc_id",
        payload.cast("binary").alias("media"),
        F.struct(
            F.lit("fake/raw").alias("format"),
            (16 + F.pmod(F.col("doc_id"), F.lit(16)).cast("int")).alias("width"),
            (16 + F.pmod(F.col("doc_id") * 7, F.lit(16)).cast("int")).alias("height"),
        ).alias("meta"),
    )


def _decode_bytes(data: bytes) -> tuple[int, float]:
    """STUB decode: a real implementation would hand ``data`` to
    PIL/torchaudio/ffmpeg. Here it returns (n_bytes, mean_byte) —
    deterministic so the plumbing is testable without codecs."""
    if not data:
        raise NotImplementedError("empty media payload; real decoder not available")
    return len(data), float(sum(data)) / len(data)


_DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", IntegerType()),
        StructField("mean_byte", DoubleType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def decode_and_featurize(
    media: DataFrame,
    rows_per_chunk: int | None = None,
    max_chunk_bytes: int | None = None,
) -> DataFrame:
    """Arrow-batched decode + feature extraction over the binary
    column. One ``mapInPandas`` pass: batches arrive as pandas frames
    (no per-row Python dispatch), features are a 8-bin byte histogram
    (stand-in for an embedding model forward pass).

    The per-payload feature math is numpy over the whole batch — all
    payloads concatenate into ONE uint8 buffer, and the histogram /
    mean reduce per-payload via bincount on (payload_index * 8 |
    bucket) composite codes. This is the pattern a real decoder's
    post-processing must follow: the Python boundary is crossed once
    per Arrow batch, never per row or per byte.

    Batch-memory knobs: Spark's
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds Arrow
    batches by ROW count, but media memory is dominated by payload
    BYTES — a batch of 10k thumbnails and a batch of 10k videos differ
    by 1000x. ``rows_per_chunk`` / ``max_chunk_bytes`` re-slice each
    Arrow batch inside the worker so the decode working set (flat
    buffer + histogram codes) never exceeds the byte budget, whatever
    the session's Arrow setting. A chunk always holds >= 1 row, so an
    oversized single payload degrades to row-at-a-time rather than
    failing."""

    def _chunks(pdf: pd.DataFrame) -> Iterator[pd.DataFrame]:
        if rows_per_chunk is None and max_chunk_bytes is None:
            yield pdf
            return
        sizes = pdf["media"].map(len)
        start, rows, by = 0, 0, 0
        for i, sz in enumerate(sizes):
            over_rows = rows_per_chunk is not None and rows + 1 > rows_per_chunk
            over_bytes = max_chunk_bytes is not None and by + sz > max_chunk_bytes
            if i > start and (over_rows or over_bytes):
                yield pdf.iloc[start:i]
                start, rows, by = i, 0, 0
            rows += 1
            by += sz
        if start < len(pdf):
            yield pdf.iloc[start:]

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for arrow_batch in batches:
            yield from (_featurize_chunk(np, pdf) for pdf in _chunks(arrow_batch))

    def _featurize_chunk(np, pdf: pd.DataFrame) -> pd.DataFrame:
        payloads = [bytes(d) for d in pdf["media"]]
        for b in payloads:
            _decode_bytes(b)  # stub decode: validates non-empty
        lens = np.array([len(b) for b in payloads], dtype=np.int64)
        flat = np.frombuffer(b"".join(payloads), dtype=np.uint8)
        owner = np.repeat(np.arange(len(payloads)), lens)
        sums = np.bincount(owner, weights=flat, minlength=len(payloads))
        mean_byte = sums / lens
        codes = owner * 8 + (flat >> 5)
        hist = np.bincount(codes, minlength=len(payloads) * 8).reshape(
            len(payloads), 8
        )
        feats = hist / lens[:, None]
        return pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "width": pdf["meta"].map(lambda s: s["width"]),
                "height": pdf["meta"].map(lambda s: s["height"]),
                "n_bytes": lens.astype(np.int32),
                "mean_byte": mean_byte,
                "features": feats.tolist(),
            }
        )

    return media.mapInPandas(process, _DECODED_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Video-style frame sampling without Python: treat the payload as
    fixed-size frames, generate frame indices with ``sequence`` and
    slice bytes JVM-side. At scale this is pure codegen — the binary
    never crosses into Python."""
    n_frames = (F.length("media") / _FRAME_BYTES).cast("int")
    idx = F.explode(
        F.expr(f"filter(sequence(0, int(length(media)/{_FRAME_BYTES}) - 1),"
               f" i -> i % {every_n} = 0)")
    )
    return (
        media.select("doc_id", "media", n_frames.alias("n_frames"), idx.alias("frame_idx"))
        .select(
            "doc_id",
            "n_frames",
            "frame_idx",
            F.expr(f"substring(media, frame_idx * {_FRAME_BYTES} + 1, {_FRAME_BYTES})").alias(
                "frame"
            ),
        )
    )


@register("multimodal_features")  # binary plumbing -> rows-only check
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end multimodal pass: synthesize media from documents,
    decode + featurize in Arrow batches, return per-doc metadata and
    an aggregate over the feature vector."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    decoded = decode_and_featurize(attach_fake_media(docs))
    return decoded.select(
        "doc_id",
        "width",
        "height",
        "n_bytes",
        F.round("mean_byte", 6).alias("mean_byte"),
        F.round(F.expr("aggregate(features, 0.0d, (a, x) -> a + x)"), 6).alias("feat_sum"),
    )


def resample_frames(media: DataFrame, target_n: int = 4) -> DataFrame:
    """Uniform temporal resampling: pick ``target_n`` evenly spaced
    frames regardless of clip length (the fixed-budget sampling a
    video training pipeline applies before the expensive decode).
    Frame selection is pure JVM arithmetic — sequence over the target
    positions mapped onto source frame indices; clips shorter than
    the budget yield all their frames once."""
    n_frames = F.expr(f"int(length(media) / {_FRAME_BYTES})")
    idx_expr = f"""
    array_distinct(transform(
      sequence(0, {target_n} - 1),
      k -> int(k * int(length(media) / {_FRAME_BYTES}) / {target_n})))
    """
    return (
        media.select("doc_id", "media", n_frames.alias("n_frames"))
        .where(F.col("n_frames") > 0)
        .select(
            "doc_id",
            "media",
            "n_frames",
            F.explode(F.expr(idx_expr)).alias("frame_idx"),
        )
        .select(
            "doc_id",
            "n_frames",
            "frame_idx",
            F.expr(f"substring(media, frame_idx * {_FRAME_BYTES} + 1, {_FRAME_BYTES})").alias(
                "frame"
            ),
        )
    )



def resample_audio(
    media: DataFrame, source_rate: int = 16000, target_rate: int = 8000
) -> DataFrame:
    """Audio-style temporal resampling in Arrow batches: the payload
    is treated as a u8 sample stream (STUB — a real pipeline would
    ffmpeg-decode to PCM first; the numpy resample below is exactly
    what it would then run). Linear interpolation via ``np.interp``
    over the whole batch's concatenated buffer — one Python crossing
    per Arrow batch, vectorized math per payload, the same
    batch-shape contract as ``decode_and_featurize``. Returns the
    resampled payload as binary plus sample-count metadata."""
    out_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("n_samples_in", IntegerType()),
            StructField("n_samples_out", IntegerType()),
            StructField("resampled", BinaryType()),
        ]
    )

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        ratio = target_rate / source_rate
        for pdf in batches:
            ids, n_in, n_out, payloads = [], [], [], []
            for doc_id, raw in zip(pdf["doc_id"], pdf["media"]):
                x = np.frombuffer(bytes(raw), dtype=np.uint8).astype(np.float64)
                if not len(x):
                    raise NotImplementedError(
                        "empty media payload; real decoder not available"
                    )
                m = max(1, int(len(x) * ratio))
                # sample positions in source time: uniform grid
                pos = np.arange(m) / ratio
                y = np.interp(pos, np.arange(len(x)), x)
                ids.append(doc_id)
                n_in.append(len(x))
                n_out.append(m)
                payloads.append(np.clip(np.round(y), 0, 255).astype(np.uint8).tobytes())
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "n_samples_in": pd.array(n_in, dtype="int32"),
                    "n_samples_out": pd.array(n_out, dtype="int32"),
                    "resampled": payloads,
                }
            )

    return media.mapInPandas(process, out_schema)


# ---------------------------------------------------------------- C76
_MAGIC = {
    "jpeg": "FFD8FF",
    "png": "89504E47",
    "wav": "52494646",  # 'RIFF'
}


def attach_fake_media_mixed(docs: DataFrame) -> DataFrame:
    """Fake-media synthesis with REAL magic bytes: each doc's payload
    starts with the genuine JPEG/PNG/RIFF signature (modality cycles
    by doc_id % 3) followed by the deterministic md5 body — so
    header-sniffing code paths exercise the same byte patterns real
    ingest would see, while staying codec-free."""
    sig = (
        F.when(F.pmod("doc_id", F.lit(3)) == 0, F.unhex(F.lit(_MAGIC["jpeg"])))
        .when(F.pmod("doc_id", F.lit(3)) == 1, F.unhex(F.lit(_MAGIC["png"])))
        .otherwise(F.unhex(F.lit(_MAGIC["wav"])))
    )
    body = F.expr("repeat(unhex(md5(text)), 1 + pmod(doc_id, 4))").cast("binary")
    return docs.select(
        "doc_id", F.concat(sig, body).alias("media")
    )


@register("modality_profile")  # binary sniffing -> rows-only
def modality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What's actually in the blob column: modality detection from
    magic bytes (JPEG FFD8FF / PNG 89504E47 / RIFF-WAV 52494646 —
    the first real question against an opaque 100 TB binary column,
    answered WITHOUT decoding a single payload). Sniffing is
    hex(substring(media, 1, 4)) prefix matching — pure JVM
    expressions at scan speed — followed by one aggregation: counts,
    byte totals, and size ranges per detected modality, with
    'unknown' as the catch-all that flags corrupt or novel payloads
    for the DLQ."""
    media = attach_fake_media_mixed(
        load_tables(spark, sf_dir, ("documents",))["documents"]
    )
    head = F.hex(F.expr("substring(media, 1, 4)"))
    modality = (
        F.when(head.startswith(_MAGIC["jpeg"]), "jpeg")
        .when(head.startswith(_MAGIC["png"]), "png")
        .when(head.startswith(_MAGIC["wav"]), "wav")
        .otherwise("unknown")
    )
    return (
        media.select(modality.alias("modality"), F.length("media").alias("n_bytes"))
        .groupBy("modality")
        .agg(
            F.count("*").alias("n_payloads"),
            F.sum("n_bytes").cast("bigint").alias("total_bytes"),
            F.min("n_bytes").cast("bigint").alias("min_bytes"),
            F.max("n_bytes").cast("bigint").alias("max_bytes"),
        )
    )
