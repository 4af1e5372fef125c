"""Multimodal plumbing tests beyond the oracle check: determinism across
partitionings (a mapInPandas stage must not depend on batch boundaries) and
the stubbed real-decode contract."""

from __future__ import annotations

import pytest

from music_recommendation_service_spark.operators.multimodal import (
    decode_image,
    fake_decode_features,
    featurize_media,
    media_frame,
    sample_frames,
)
from music_recommendation_service_spark.sources.catalog import load_table


def test_featurize_partition_independent(spark, sf_dir):
    media = media_frame(load_table(spark, sf_dir, "documents"))
    def rows(df):
        return {
            (r["media_id"], r["kind"], r["n_bytes"], tuple(r["feature"]))
            for r in df.collect()
        }

    one = rows(featurize_media(media.repartition(1)))
    many = rows(featurize_media(media.repartition(8)))
    assert one == many
    assert len(one) == media.count()


def test_frame_sample_counts(spark, sf_dir):
    media = media_frame(load_table(spark, sf_dir, "documents"))
    frames = sample_frames(media)
    per_media = {r["media_id"]: r["n"] for r in frames.groupBy("media_id").count().withColumnRenamed("count", "n").collect()}
    metas = {
        r["media_id"]: r["meta"]["duration_ms"]
        for r in media.filter("kind = 'video'").select("media_id", "meta").collect()
    }
    assert set(per_media) == set(metas)
    for mid, dur in metas.items():
        assert per_media[mid] == dur // 500


def test_fake_decode_deterministic():
    a = fake_decode_features(b"payload")
    assert a == fake_decode_features(b"payload")
    assert all(0.0 <= x <= 1.0 for x in a)


def test_real_decode_is_stubbed():
    with pytest.raises((NotImplementedError, Exception)):
        decode_image(b"not-an-image")


def test_resize_media_images_only(spark, sf_dir):
    """resize_media: image rows only, dims deterministic and in range, thumb
    is the 16-byte md5 digest, independent of batch boundaries."""
    import hashlib

    from music_recommendation_service_spark.operators.multimodal import (
        fake_decode_dims,
        resize_media,
    )

    media = media_frame(load_table(spark, sf_dir, "documents"))
    n_images = media.filter("kind = 'image'").count()

    def rows(df):
        return {
            (r["media_id"], r["src_w"], r["src_h"], r["dst_w"], r["dst_h"], bytes(r["thumb"]))
            for r in df.collect()
        }

    one = rows(resize_media(media.repartition(1)))
    many = rows(resize_media(media.repartition(8)))
    assert one == many
    assert len(one) == n_images
    payloads = {r["media_id"]: bytes(r["payload"]) for r in media.filter("kind = 'image'").collect()}
    for mid, sw, sh, dw, dh, thumb in one:
        assert (sw, sh) == fake_decode_dims(payloads[mid])
        assert 16 <= sw <= 4111 and 16 <= sh <= 4111
        assert (dw, dh) == (64, 64)
        assert thumb == hashlib.md5(payloads[mid]).digest()


def test_resize_image_is_stubbed():
    from music_recommendation_service_spark.operators.multimodal import resize_image

    with pytest.raises((NotImplementedError, Exception)):
        resize_image(b"not-an-image", 64, 64)
