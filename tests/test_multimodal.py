"""Multimodal column plumbing: schema, Arrow UDF batch shapes,
deterministic fake decoders (real codecs are import-try gated)."""

import hashlib

import numpy as np
import pytest


@pytest.fixture(scope="module")
def blobs(spark):
    from graftpark.pipeline.multimodal import attach_blobs

    docs = spark.createDataFrame(
        [(i, "x" * (10 + 7 * i) + chr(65 + i % 26)) for i in range(12)],
        "doc_id LONG, text STRING",
    )
    return attach_blobs(docs, content="text").persist()


def test_blob_schema_and_meta(blobs):
    from graftpark.pipeline.multimodal import blob_meta

    assert [f.name for f in blobs.schema.fields] == [
        "doc_id", "kind", "data", "width", "height", "sample_rate"
    ]
    meta = {r["doc_id"]: r for r in blob_meta(blobs).collect()}
    raw = {r["doc_id"]: bytes(r["data"]) for r in blobs.collect()}
    for i, data in raw.items():
        assert meta[i]["n_bytes"] == len(data)
        assert meta[i]["sha256"] == hashlib.sha256(data).hexdigest()
    assert {meta[i]["kind"] for i in meta} == {"image", "audio", "video"}


def test_image_features_deterministic(blobs):
    from graftpark.pipeline.multimodal import image_features

    a = sorted(image_features(blobs).collect())
    b = sorted(image_features(blobs).collect())
    assert a == b
    assert len(a) == blobs.where("kind = 'image'").count()
    row = a[0]
    assert 0.0 <= row["mean_pixel"] <= 255.0
    assert row["mean_pixel"] <= row["p95_pixel"] <= 255.0


def test_image_features_values_match_fake_decoder(blobs):
    from graftpark.pipeline.multimodal import _decode_pixels, image_features

    feats = {r["doc_id"]: r for r in image_features(blobs).collect()}
    for r in blobs.where("kind = 'image'").collect():
        px = _decode_pixels(bytes(r["data"]), r["width"], r["height"])
        assert abs(feats[r["doc_id"]]["mean_pixel"] - float(px.mean())) < 1e-9
        assert px.shape == (r["height"], r["width"])
        assert px.dtype == np.uint8


def test_resize_images(blobs):
    from graftpark.pipeline.multimodal import resize_images

    out = resize_images(blobs, 8, 6).collect()
    assert len(out) == blobs.where("kind = 'image'").count()
    for r in out:
        assert (r["width"], r["height"]) == (8, 6)
        assert len(bytes(r["data"])) == 8 * 6


def test_sample_frames_fanout(blobs):
    from graftpark.pipeline.multimodal import sample_frames

    frames = sample_frames(blobs, every_n_bytes=16, max_frames=3).collect()
    vids = {r["doc_id"]: bytes(r["data"]) for r in blobs.where("kind = 'video'").collect()}
    assert {r["doc_id"] for r in frames} == set(vids)
    for r in frames:
        assert 0 <= r["frame_idx"] < 3
        start = r["frame_idx"] * 16
        assert bytes(r["frame"]) == vids[r["doc_id"]][start:start + 16]


def test_audio_features(blobs):
    from graftpark.pipeline.multimodal import _decode_samples, audio_features

    feats = {r["doc_id"]: r for r in audio_features(blobs).collect()}
    for r in blobs.where("kind = 'audio'").collect():
        s = _decode_samples(bytes(r["data"]), r["sample_rate"]).astype(np.float64)
        f = feats[r["doc_id"]]
        assert f["n_samples"] == len(s)
        assert abs(f["rms"] - float(np.sqrt(np.mean(s * s)))) < 1e-9
