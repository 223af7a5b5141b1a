"""Multimodal binary-column plumbing: deterministic fake container,
feature extraction, resize, frame sampling, codec-boundary stub."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from cuckoofilter_spark.ops.multimodal import (
    decode_payload, encode_fake, extract_features, media_table,
    resize_images, sample_video_frames)


@pytest.fixture(scope="module")
def media(spark):
    return media_table(spark, 60, seed=42).persist()


def test_media_table_deterministic(spark, media):
    again = media_table(spark, 60, seed=42)
    a = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    b = {r["media_id"]: bytes(r["payload"]) for r in again.collect()}
    assert a == b
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_codec_boundary_raises_on_real_codecs():
    with pytest.raises(NotImplementedError, match="codecs are not available"):
        decode_payload(b"\xff\xd8\xff\xe0" + b"0" * 100)  # JPEG magic


def test_roundtrip_and_features(spark, media):
    feats = {r["media_id"]: r for r in extract_features(media).collect()}
    rows = media.collect()
    assert set(feats) == {r["media_id"] for r in rows}
    for r in rows:
        hdr, body = decode_payload(bytes(r["payload"]))
        assert hdr["kind"] == r["kind"]
        f = feats[r["media_id"]]
        assert f["n_bytes"] == len(bytes(r["payload"]))
        if r["kind"] == "image":
            assert len(f["features"]) == 6  # mean+std per 3 channels
            m = hdr["width"] * hdr["height"] * hdr["channels"]
            exp = body[:m].reshape(-1, 3).mean(axis=0)
            assert np.allclose(f["features"][:3], np.round(exp, 6))


def test_resize_images(spark, media):
    out = resize_images(media, 8, 8)
    for r in out.collect():
        hdr, body = decode_payload(bytes(r["payload"]))
        if r["kind"] == "image":
            assert (hdr["width"], hdr["height"]) == (8, 8)
            assert r["meta"]["width"] == 8 and r["meta"]["height"] == 8
            assert body.size == 8 * 8 * 3
        else:  # pass-through untouched
            assert hdr["width"] == r["meta"]["width"]


def test_frame_sampling(spark, media):
    frames = sample_video_frames(media, every_ms=500).collect()
    assert frames  # videos exist in the fixture
    vids = {r["media_id"]: r for r in media.where("kind = 'video'").collect()}
    assert {f["media_id"] for f in frames} == set(vids)
    for f in frames:
        hdr, body = decode_payload(bytes(vids[f["media_id"]]["payload"]))
        fbytes = hdr["width"] * hdr["height"] * hdr["channels"]
        assert len(bytes(f["frame"])) == fbytes
        # sampled frame must be the exact slice of the container
        fi = f["frame_idx"]
        assert bytes(f["frame"]) == body[fi * fbytes:(fi + 1) * fbytes].tobytes()
        assert 0 <= f["ts_ms"] < hdr["duration_ms"]
