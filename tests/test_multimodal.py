"""Tests for the multimodal plumbing: schema, Arrow batch shape,
determinism, grain changes. Decode is a deterministic stub (no media
libs in the container) — the Spark-side mechanics are what's tested."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from finlogic_spark.operators.multimodal import (
    extract_features,
    make_fake_media,
    resize_images,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    return make_fake_media(spark, 30).cache()


def test_media_schema(media):
    assert dict(media.dtypes)["data"] == "binary"
    assert media.count() == 30
    assert {r["kind"] for r in media.select("kind").distinct().collect()} == {
        "image", "audio", "video",
    }


def test_extract_features_decodes_header(media):
    feats = extract_features(media, dim=16)
    rows = feats.collect()
    assert len(rows) == 30
    assert "data" not in feats.columns  # blob projected away
    by_id = {r["media_id"]: r for r in rows}
    src = {r["media_id"]: r for r in media.collect()}
    for mid, r in by_id.items():
        assert r["width"] == src[mid]["meta"]["width"]
        assert len(r["embedding"]) == 16
        assert all(-1.0 <= v <= 1.0 for v in r["embedding"])


def test_extract_features_deterministic(media):
    a = {r["media_id"]: r["embedding"] for r in extract_features(media, 8).collect()}
    b = {r["media_id"]: r["embedding"] for r in extract_features(media, 8).collect()}
    assert a == b


def test_resize_rewrites_header_only(media):
    out = resize_images(media, 32, 24)
    rows = out.collect()
    assert rows and all(r["width"] == 32 and r["height"] == 24 for r in rows)
    n_images = media.filter(F.col("kind") == "image").count()
    assert len(rows) == n_images
    # Body bytes untouched: re-extracting features gives embeddings that
    # differ from originals (header changed) but deterministically.
    assert all(bytes(r["data"])[:4] == b"FLSM" for r in rows)


def test_sample_frames_grain(media):
    frames = sample_frames(media, every_n=5)
    rows = frames.collect()
    vids = {r["media_id"]: r["meta"]["n_frames"]
            for r in media.filter(F.col("kind") == "video").collect()}
    assert set(r["media_id"] for r in rows) == set(vids)
    for mid, n in vids.items():
        got = sorted(r["frame_idx"] for r in rows if r["media_id"] == mid)
        assert got == list(range(0, n, 5))


def test_features_feed_similarity(spark, media):
    # The extracted embeddings plug straight into the similarity ops.
    from finlogic_spark.operators.similarity import cosine_topk

    feats = extract_features(media, dim=16)
    corpus = feats.select(F.col("media_id").alias("vec_id"), "embedding")
    queries = corpus.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = cosine_topk(corpus, queries, k=3)
    top1 = {r["query_id"]: r["vec_id"] for r in out.filter(F.col("rk") == 1).collect()}
    assert top1 == {0: 0, 1: 1}


def test_codec_swap_same_schema(spark, media):
    # The codec is pluggable behind one interface: a different decoder
    # must yield the SAME schema (plumbing is codec-independent), with
    # only the decoded values/embeddings differing.
    from finlogic_spark.operators.multimodal import stub_decoder

    def doubling_decoder(kind, raw):
        d = stub_decoder(kind, raw)
        return {**d, "width": d["width"] * 2, "body": d["body"][:16]}

    a = extract_features(media, dim=8)
    b = extract_features(media, dim=8, decoder=doubling_decoder)
    assert a.schema == b.schema
    ra = {r["media_id"]: r for r in a.collect()}
    rb = {r["media_id"]: r for r in b.collect()}
    assert set(ra) == set(rb)
    for mid in ra:
        assert rb[mid]["width"] == ra[mid]["width"] * 2
        assert rb[mid]["byte_len"] == ra[mid]["byte_len"]  # storage size
        assert rb[mid]["embedding"] != ra[mid]["embedding"]  # body changed


def test_pil_decoder_falls_back_on_stub_containers(media):
    # pil_decoder must pass FLSM stub payloads (and non-image kinds)
    # through to the stub path — mixed tables decode without PIL.
    from finlogic_spark.operators.multimodal import pil_decoder

    feats = extract_features(media, dim=8, decoder=pil_decoder)
    base = extract_features(media, dim=8)
    assert feats.schema == base.schema
    assert sorted(map(tuple, feats.collect())) == sorted(map(tuple, base.collect()))


def _png_chunk(ctype: bytes, payload: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(payload))
        + ctype
        + payload
        + struct.pack(">I", zlib.crc32(ctype + payload))
    )


def _make_png(w, h, color, filtered_rows) -> bytes:
    """Minimal independent PNG writer (test-side oracle): each entry of
    filtered_rows is (filter_type_byte, already-filtered scanline)."""
    import struct
    import zlib

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    raw = b"".join(bytes([ft]) + bytes(line) for ft, line in filtered_rows)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )


def test_real_png_decode_through_pipeline(spark):
    # Real-container path, hermetic: pil_decoder takes the Pillow path
    # when installed, else the pure-stdlib png_decoder — same schema,
    # real pixel dimensions either way.
    from finlogic_spark.operators.multimodal import MEDIA_SCHEMA, pil_decoder

    rows = [(0, bytes([200, 10, 10]) * 7)] * 3  # 7x3 solid RGB, filter 0
    png = _make_png(7, 3, 2, rows)
    df = spark.createDataFrame(
        [(99, "image", bytearray(png), None)], MEDIA_SCHEMA
    )
    row = extract_features(df, dim=8, decoder=pil_decoder).collect()[0]
    assert (row["width"], row["height"], row["n_frames"]) == (7, 3, 1)
    assert len(row["embedding"]) == 8


def test_png_decoder_reconstructs_all_filter_types():
    # Independent oracle: the test forward-applies each PNG filter
    # (spec definitions, written here, not the decoder's inverse) to
    # known pixels; png_decoder must reconstruct the original RGB bytes
    # exactly across filter types 0..4.
    from finlogic_spark.operators.multimodal import png_decoder

    w, h, ch = 5, 5, 3
    stride = w * ch
    pixels = [
        bytes(((x * 37 + y * 91 + c * 13) % 256) for x in range(w) for c in range(ch))
        for y in range(h)
    ]

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa <= pb and pa <= pc:
            return a
        return b if pb <= pc else c

    filtered = []
    prev = bytes(stride)
    for y, line in enumerate(pixels):
        ft = y % 5
        out = bytearray()
        for i in range(stride):
            a = line[i - ch] if i >= ch else 0
            b = prev[i]
            c = prev[i - ch] if i >= ch else 0
            if ft == 0:
                out.append(line[i])
            elif ft == 1:
                out.append((line[i] - a) & 0xFF)
            elif ft == 2:
                out.append((line[i] - b) & 0xFF)
            elif ft == 3:
                out.append((line[i] - ((a + b) >> 1)) & 0xFF)
            else:
                out.append((line[i] - paeth(a, b, c)) & 0xFF)
        filtered.append((ft, bytes(out)))
        prev = line
    png = _make_png(w, h, 2, filtered)
    d = png_decoder("image", png)
    assert (d["width"], d["height"], d["n_frames"]) == (w, h, 1)
    assert d["body"] == b"".join(pixels)


def test_png_decoder_color_conversions():
    # Gray (type 0) replicates to RGB; RGBA (type 6) drops alpha —
    # matching Pillow's convert("RGB") so the codecs interchange.
    from finlogic_spark.operators.multimodal import png_decoder

    gray = _make_png(3, 1, 0, [(0, bytes([5, 120, 250]))])
    d = png_decoder("image", gray)
    assert d["body"] == bytes([5, 5, 5, 120, 120, 120, 250, 250, 250])

    rgba_row = bytes([10, 20, 30, 255, 40, 50, 60, 128])
    rgba = _make_png(2, 1, 6, [(0, rgba_row)])
    d = png_decoder("image", rgba)
    assert d["body"] == bytes([10, 20, 30, 40, 50, 60])


def _make_wav(sr: int, samples) -> bytes:
    import io
    import struct as _struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(b"".join(_struct.pack("<h", s) for s in samples))
    return buf.getvalue()


def test_wav_features_real_pcm_parse(spark):
    """Real stdlib-wave decode path (r15: the second modality with a
    real codec): a known square wave must report exact sample counts,
    duration, RMS, and clip rate; a silent clip reports zeros."""
    import math

    # full-scale square wave: every sample clips; RMS = 32767/32768
    square = [32767, -32767] * 1000
    silent = [0] * 500
    half = [16384, -16384] * 400
    # -32768 is the int16 hard-clip floor: np.abs would overflow it back
    # to -32768 and miss it; the two-sided compare must count all 4.
    floor_clip = [-32768, -32768, 0, 0, -32768, -32768, 0, 0]
    df = spark.createDataFrame(
        [
            (1, "audio", bytearray(_make_wav(8000, square))),
            (2, "audio", bytearray(_make_wav(16000, silent))),
            (3, "audio", bytearray(_make_wav(8000, half))),
            (4, "audio", bytearray(_make_wav(8000, floor_clip))),
        ],
        "media_id long, kind string, data binary",
    )
    from finlogic_spark.operators.multimodal import wav_features

    rows = {r["media_id"]: r for r in wav_features(df).collect()}
    r1 = rows[1]
    assert (r1["sample_rate"], r1["n_channels"], r1["n_samples"]) == (
        8000, 1, 2000,
    )
    assert abs(r1["duration_s"] - 0.25) < 1e-12
    assert abs(r1["rms"] - 32767 / 32768) < 1e-9
    assert r1["clip_rate"] == 1.0
    r2 = rows[2]
    assert r2["rms"] == 0.0 and r2["clip_rate"] == 0.0
    assert abs(r2["duration_s"] - 500 / 16000) < 1e-12
    r3 = rows[3]
    assert abs(r3["rms"] - 0.5) < 1e-9 and r3["clip_rate"] == 0.0
    r4 = rows[4]
    assert r4["clip_rate"] == 0.5


def test_wav_features_rejects_non_16bit(spark):
    import io
    import wave

    import pytest

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)  # 8-bit
        w.setframerate(8000)
        w.writeframes(b"\x80" * 100)
    df = spark.createDataFrame(
        [(1, "audio", bytearray(buf.getvalue()))],
        "media_id long, kind string, data binary",
    )
    from finlogic_spark.operators.multimodal import wav_features

    with pytest.raises(Exception, match="16-bit"):
        wav_features(df).collect()
