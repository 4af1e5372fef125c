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
