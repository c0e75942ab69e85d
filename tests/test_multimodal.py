"""Multimodal plumbing: schema stability, batch shapes, determinism,
partition preservation. The decode kernel is a deterministic stub (no
codecs in container); everything Spark-side is real."""

import pytest
from pyspark.sql import functions as F

from tracker_trainer_spark.multimodal import (
    AUDIO_FEATURES_SCHEMA,
    DECODED_IMAGE_SCHEMA,
    FRAME_SCHEMA,
    audio_features,
    decode_images,
    image_features,
    resize_images,
    sample_frames,
    synthetic_media,
)
from tracker_trainer_spark.plans import count_shuffles


@pytest.fixture(scope="module")
def media(spark):
    df = synthetic_media(spark, n=30, partitions=3)
    df.cache().count()
    return df


def test_media_table_is_distributed_and_typed(media):
    assert media.rdd.getNumPartitions() == 3
    kinds = {r.kind for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}
    (r,) = media.where(F.col("media_id") == 0).collect()
    assert isinstance(r.content, (bytes, bytearray)) and len(r.content) == 64
    assert r.meta.sample_rate == 16000


def test_decode_images_schema_and_determinism(media):
    decoded = decode_images(media)
    assert decoded.schema == DECODED_IMAGE_SCHEMA
    a = {r.media_id: list(r.pixels)[:5] for r in decoded.collect()}
    b = {r.media_id: list(r.pixels)[:5] for r in decode_images(media).collect()}
    assert a == b  # stub decode is deterministic
    n_images = media.where(F.col("kind") == "image").count()
    assert len(a) == n_images > 0
    row = decoded.first()
    assert len(row.pixels) == row.height * row.width * row.channels


def test_decode_is_narrow_no_shuffle(media):
    assert count_shuffles(decode_images(media)) == 0


def test_resize_changes_dims_keeps_channels(media):
    resized = resize_images(decode_images(media), 4, 6)
    rows = resized.collect()
    assert all(r.height == 4 and r.width == 6 and r.channels == 3 for r in rows)
    assert all(len(r.pixels) == 4 * 6 * 3 for r in rows)


def test_image_features_shape(media):
    feats = image_features(decode_images(media)).collect()
    assert all(len(r.features) == 6 for r in feats)  # mean+std per 3 channels
    assert all(0.0 <= v <= 1.0 for r in feats for v in r.features[:3])


def test_sample_frames_stride(media):
    frames = sample_frames(media, every_n=2)
    assert frames.schema == FRAME_SCHEMA
    by_media = {}
    for r in frames.collect():
        by_media.setdefault(r.media_id, []).append(r.frame_index)
    metas = {r.media_id: r.meta.n_frames
             for r in media.where(F.col("kind") == "video").collect()}
    assert set(by_media) == set(metas)
    for mid, idxs in by_media.items():
        assert sorted(idxs) == list(range(0, metas[mid], 2))


def test_audio_features_schema_and_bounds(media):
    feats = audio_features(media)
    assert feats.schema == AUDIO_FEATURES_SCHEMA
    rows = feats.collect()
    assert len(rows) == media.where(F.col("kind") == "audio").count()
    assert all(0 < r.rms < 1 and r.peak <= 1.0 and r.zero_crossings > 0 for r in rows)
