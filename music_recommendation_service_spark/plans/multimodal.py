"""Multimodal catalog queries: the ``mapInPandas`` media path (featurize,
frame-sample) driven end-to-end through the Python worker — and still
oracle-checked, because the deterministic fake decode is md5-derived and so
expressible in DuckDB SQL (operators/text.md5_word16_sql). The plumbing the
oracle pins: Arrow batch transfer, binary payload handling, output schema,
1->N expansion, partition independence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from music_recommendation_service_spark.functions import rnd, rnd_sql
from music_recommendation_service_spark.operators.multimodal import (
    FEATURE_DIM,
    FRAME_EVERY_MS,
    THUMB_H,
    THUMB_W,
    featurize_media,
    media_frame,
    resize_media,
    sample_frames,
)
from music_recommendation_service_spark.operators.text import md5_word16_sql
from music_recommendation_service_spark.plans import register
from music_recommendation_service_spark.sources.catalog import load_table as _t

_KIND_SQL = (
    "CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END"
)


# ---------------------------------------------------------------------------
# q35 — media featurization through mapInPandas (Arrow-batched Python).
# ---------------------------------------------------------------------------
_FEATS = ", ".join(
    rnd_sql(f"({md5_word16_sql('text', w)}) / 65535.0", 6) + f" AS f{w}"
    for w in range(FEATURE_DIM)
)


@register(
    "q35_media_features",
    oracle=f"""
    SELECT doc_id                        AS media_id,
           {_KIND_SQL}                   AS kind,
           CAST(length(text) AS INT)     AS n_bytes,
           {_FEATS}
    FROM documents
    """,
    doc="Binary media payloads -> feature vectors via Arrow-batched "
    "mapInPandas (deterministic fake decode; oracle reproduces it in SQL). "
    "Feature vector flattened to scalar f0..fN columns so every output cell "
    "is row-hashable (driver comparator builds Python hash tables over rows).",
    tags=("multimodal", "mapInPandas"),
)
def q35_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = media_frame(_t(spark, sf_dir, "documents"))
    feats = featurize_media(media)
    return feats.select(
        "media_id",
        "kind",
        "n_bytes",
        *[
            rnd(F.col("feature")[w], 6).alias(f"f{w}")
            for w in range(FEATURE_DIM)
        ],
    )


# ---------------------------------------------------------------------------
# q36 — video frame sampling: 1->N expansion inside mapInPandas, one row per
# FRAME_EVERY_MS of metadata duration.
# ---------------------------------------------------------------------------
@register(
    "q36_frame_sample",
    oracle=f"""
    SELECT media_id,
           CAST(i AS INT)                     AS frame_idx,
           CAST(i * {FRAME_EVERY_MS} AS INT)  AS frame_ts_ms
    FROM (
        SELECT doc_id AS media_id,
               unnest(range((1000 + (n_chars % 50) * 100) // {FRAME_EVERY_MS}))
                   AS i
        FROM documents
        WHERE doc_id % 3 = 2
    )
    """,
    doc="Per-video frame index sampling (1->N mapInPandas expansion from "
    "metadata duration).",
    tags=("multimodal", "mapInPandas", "frames"),
)
def q36_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = media_frame(_t(spark, sf_dir, "documents"))
    return sample_frames(media)


# ---------------------------------------------------------------------------
# q86 — image resize/thumbnail plumbing: decode -> read dims -> resize ->
# re-encode as a produced BINARY column through mapInPandas (the decode and
# resample are the deterministic md5 fakes; production swaps in
# operators.multimodal.resize_image). The oracle reproduces the fake dims
# from md5 16-bit words and pins the thumbnail bytes via their hex form —
# binary column production + Arrow round-trip is what's under test.
# ---------------------------------------------------------------------------
@register(
    "q86_image_resize",
    oracle=f"""
    SELECT doc_id AS media_id,
           CAST(16 + ({md5_word16_sql("text", 0)}) % 4096 AS INT) AS src_w,
           CAST(16 + ({md5_word16_sql("text", 1)}) % 4096 AS INT) AS src_h,
           CAST({THUMB_W} AS INT) AS dst_w,
           CAST({THUMB_H} AS INT) AS dst_h,
           md5(text)              AS thumb_hex
    FROM documents
    WHERE doc_id % 3 = 0
    """,
    doc="Thumbnail stage for image rows: mapInPandas decode/resize stub "
    "producing a BINARY column, dims pinned by the md5-word oracle.",
    tags=("multimodal", "mapInPandas", "resize"),
)
def q86_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = media_frame(_t(spark, sf_dir, "documents"))
    return resize_media(media).select(
        "media_id",
        "src_w",
        "src_h",
        "dst_w",
        "dst_h",
        F.lower(F.hex("thumb")).alias("thumb_hex"),
    )
