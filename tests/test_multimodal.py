"""Multimodal plumbing: schemas/batching real, decode kernels stubbed."""

import pytest

from silk_spark.operators.multimodal import (
    FRAME_SCHEMA,
    IMAGE_FEATURE_SCHEMA,
    extract_image_features,
    resize_images,
    sample_frames,
    synthetic_media,
)


def test_synthetic_media_deterministic(spark):
    a = synthetic_media(spark, 8).collect()
    b = synthetic_media(spark, 8).collect()
    assert [bytes(r.data) for r in a] == [bytes(r.data) for r in b]
    assert all(r.width >= 1 and r.height >= 1 for r in a)


def test_feature_extraction_shapes(spark):
    media = synthetic_media(spark, 16)
    feats = extract_image_features(media)
    assert feats.schema == IMAGE_FEATURE_SCHEMA
    rows = feats.collect()
    assert len(rows) == 16
    assert all(r.feat_dim == len(r.feature) == 8 for r in rows)
    assert all(0.0 <= x <= 1.0 for r in rows for x in r.feature)


def test_frame_sampling_fanout(spark):
    media = synthetic_media(spark, 4)
    frames = sample_frames(media, every_n=10, max_frames=3)
    assert frames.schema == FRAME_SCHEMA
    rows = frames.collect()
    assert len(rows) == 12
    assert {r.frame_idx for r in rows} == {0, 10, 20}


def test_resize_is_stubbed(spark):
    media = synthetic_media(spark, 2)
    with pytest.raises(Exception) as exc:
        resize_images(media, 64, 64).collect()
    assert "NotImplementedError" in str(exc.value) or isinstance(exc.value, NotImplementedError)
