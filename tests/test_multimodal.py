"""Multimodal plumbing: schema, Arrow batch shape, mapInPandas
signatures, determinism of the stubbed decoders."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from llogtail_spark.operators.multimodal import (
    FEATURE_DIM,
    MEDIA_SCHEMA,
    extract_features,
    media_stats,
    resize_images,
    sample_frames,
    synth_media,
)


@pytest.fixture(scope="module")
def media(spark):
    return synth_media(spark, n=30, seed=42).cache()


def test_synth_media_schema_and_determinism(spark, media):
    assert media.schema == MEDIA_SCHEMA
    a = sorted(r["media_id"] for r in media.collect())
    again = synth_media(spark, n=30, seed=42)
    assert sorted(r["media_id"] for r in again.collect()) == a
    # payloads deterministic too
    p1 = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    p2 = {r["media_id"]: bytes(r["payload"]) for r in again.collect()}
    assert p1 == p2


def test_extract_features_shape(media):
    out = extract_features(media).collect()
    assert len(out) == 30
    for r in out:
        assert len(r["features"]) == FEATURE_DIM
        assert all(0.0 <= v <= 1.0 for v in r["features"])
    assert "payload" not in extract_features(media).columns


def test_extract_features_deterministic(media):
    a = {r["media_id"]: list(r["features"]) for r in extract_features(media).collect()}
    b = {r["media_id"]: list(r["features"]) for r in extract_features(media).collect()}
    assert a == b


def test_resize_images(media):
    out = resize_images(media, out_w=8, out_h=8)
    assert out.schema == MEDIA_SCHEMA
    rows = out.filter(F.col("kind") == "image").collect()
    assert rows
    for r in rows:
        assert r["width"] == 8 and r["height"] == 8
        assert len(bytes(r["payload"])) == 8 * 8 * 3
    # non-image rows untouched
    audio = out.filter(F.col("kind") == "audio").collect()
    orig = {r["media_id"]: bytes(r["payload"])
            for r in media.filter(F.col("kind") == "audio").collect()}
    for r in audio:
        assert bytes(r["payload"]) == orig[r["media_id"]]


def test_sample_frames(media):
    out = sample_frames(media, every=8).collect()
    vids = {r["media_id"]: r["n_frames"]
            for r in media.filter(F.col("kind") == "video").collect()}
    expect = sum(len(range(0, n, 8)) for n in vids.values())
    assert len(out) == expect
    for r in out:
        assert r["frame_idx"] % 8 == 0
        assert len(bytes(r["frame_payload"])) == 32


def test_media_stats_prunes_payload(spark, media, tmp_path):
    stats = media_stats(media)
    got = {(r["kind"], r["source"]): r["n"] for r in stats.collect()}
    assert sum(got.values()) == 30
    # column pruning: a metadata-only rollup over the parquet table
    # must not read the payload column at all
    p = str(tmp_path / "media.parquet")
    media.write.parquet(p)
    slim = spark.read.parquet(p).groupBy("kind").count()
    plan = slim._jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema" in plan and "payload" not in plan


def test_frame_digest_matches_hashlib(spark):
    """The ASCII frame-suffix stub digest must equal a direct
    hashlib recompute — the property that makes the frame path
    oracle-verifiable in SQL."""
    import hashlib

    from llogtail_spark.operators.multimodal import sample_frames

    payload = "some video bytes".encode()
    media = spark.createDataFrame(
        [("m1", "video", payload, None, None, 20, None, "s")],
        MEDIA_SCHEMA)
    out = {r["frame_idx"]: bytes(r["frame_payload"])
           for r in sample_frames(media, every=8).collect()}
    assert sorted(out) == [0, 8, 16]
    for fi, digest in out.items():
        want = hashlib.sha256(payload + b"#" + str(fi).encode()).digest()
        assert digest == want
