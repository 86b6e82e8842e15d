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


def test_pil_decoder_real_png(spark):
    # Real-codec path: only runs where Pillow is installed (not in the
    # hermetic container) — same schema, real pixel dimensions.
    from finlogic_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        have_pil,
        pil_decoder,
    )

    if not have_pil():
        import pytest

        pytest.skip("Pillow not installed; real-codec path exercised elsewhere")
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (7, 3), (200, 10, 10)).save(buf, format="PNG")
    df = spark.createDataFrame(
        [(99, "image", bytearray(buf.getvalue()), None)], MEDIA_SCHEMA
    )
    row = extract_features(df, dim=8, decoder=pil_decoder).collect()[0]
    assert (row["width"], row["height"], row["n_frames"]) == (7, 3, 1)
    assert len(row["embedding"]) == 8
