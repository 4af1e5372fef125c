"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` payload columns with a typed metadata struct;
decode / feature-extraction / frame-sampling run as Arrow-batched
``mapInPandas`` stages (the Python slow path, but vectorized per batch —
never per-row UDFs). The image/audio libraries are not present in this
container, so the *decoders* are stubs behind import guards; the Spark-side
plumbing — schema, Arrow batch shape, 1->N row expansion, partition
independence — is real and tested, and the deterministic fake decode is
md5-derived so the whole Python path has an exact SQL oracle.

Scale design
------------
- Payloads stay opaque bytes end-to-end; nothing inspects them JVM-side, so
  Tungsten moves pointers, not pixels. Featurization is a pure map: no
  shuffle, input partitioning preserved — at 100 TB this is bounded by read
  + Python pipe bandwidth, and ``spark.sql.execution.arrow.maxRecordsPerBatch``
  controls batch memory.
- Frame sampling expands 1->N inside ``mapInPandas`` (N from metadata, not
  from decoding), so the expansion happens post-scan without a shuffle.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FEATURE_DIM = 4
FRAME_EVERY_MS = 500
THUMB_W, THUMB_H = 64, 64

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", IntegerType()),
        StructField("feature", ArrayType(DoubleType())),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_ts_ms", IntegerType()),
    ]
)

RESIZE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("src_w", IntegerType()),
        StructField("src_h", IntegerType()),
        StructField("dst_w", IntegerType()),
        StructField("dst_h", IntegerType()),
        StructField("thumb", BinaryType()),
    ]
)

KINDS = ("image", "audio", "video")


def media_frame(documents: DataFrame) -> DataFrame:
    """Derive a deterministic media table from ``documents``: payload is the
    UTF-8 text bytes, kind cycles by doc_id, duration from n_chars. All
    JVM-side column expressions — this is the shape a real media lake table
    has (opaque payload + typed metadata)."""
    kind = F.element_at(F.array(*[F.lit(k) for k in KINDS]), (F.col("doc_id") % 3 + 1).cast("int"))
    return documents.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            (F.lit(1000) + (F.col("n_chars") % 50) * 100).cast("int").alias("duration_ms"),
            F.col("n_chars").cast("int").alias("n_chars"),
            F.col("source").alias("codec"),
        ).alias("meta"),
    )


# -- decoders (stubbed: libraries not in this container) ---------------------


def decode_image(payload: bytes):  # pragma: no cover - stub
    """Real image decode (PIL) — STUB: raises unless pillow is installed."""
    try:
        from PIL import Image  # type: ignore
        import io

        return Image.open(io.BytesIO(payload))
    except ImportError as e:
        raise NotImplementedError(
            "image decode requires pillow; use fake_decode_features for "
            "deterministic tests"
        ) from e


def decode_audio(payload: bytes):  # pragma: no cover - stub
    """Real audio decode (soundfile) — STUB: raises unless installed."""
    try:
        import io

        import soundfile  # type: ignore

        return soundfile.read(io.BytesIO(payload))
    except ImportError as e:
        raise NotImplementedError(
            "audio decode requires soundfile; use fake_decode_features for "
            "deterministic tests"
        ) from e


def resize_image(payload: bytes, w: int, h: int):  # pragma: no cover - stub
    """Real image resize (PIL) — STUB: raises unless pillow is installed."""
    try:
        import io

        from PIL import Image  # type: ignore

        return Image.open(io.BytesIO(payload)).resize((w, h))
    except ImportError as e:
        raise NotImplementedError(
            "image resize requires pillow; use fake_decode_dims + the md5 "
            "thumbnail stand-in for deterministic tests"
        ) from e


def fake_decode_dims(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in for decode-then-read-dimensions: md5 16-bit
    words 0/1 mapped into [16, 4111]. Exact SQL twin in q86's oracle."""
    h = hashlib.md5(payload).hexdigest()
    return 16 + int(h[0:4], 16) % 4096, 16 + int(h[4:8], 16) % 4096


def fake_decode_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in for decode+embed: 16-bit md5 words scaled to
    [0, 1]. Exact SQL twin: operators.text.md5_word16_sql."""
    h = hashlib.md5(payload).hexdigest()
    return [int(h[4 * w : 4 * w + 4], 16) / 65535.0 for w in range(dim)]


# -- mapInPandas stages ------------------------------------------------------


def featurize_media(media: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Arrow-batched feature extraction over payload bytes (decode+embed in
    production; deterministic fake here). Pure map — no shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len).astype("int32"),
                    "feature": pdf["payload"].map(
                        lambda p: fake_decode_features(bytes(p), dim)
                    ),
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def resize_media(media: DataFrame, dst: tuple[int, int] = (THUMB_W, THUMB_H)) -> DataFrame:
    """Thumbnail generation for image rows: decode -> resize -> re-encode in
    production (``resize_image``); here the decode is the deterministic fake
    (dims from md5 words, thumbnail payload = md5 digest bytes) so the Arrow
    round-trip of a produced BINARY column is itself under test. Pure map,
    image rows only — no shuffle, partitioning preserved."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            imgs = pdf[pdf["kind"] == "image"]
            if imgs.empty:
                continue
            dims = [fake_decode_dims(bytes(p)) for p in imgs["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": imgs["media_id"].to_numpy(),
                    "src_w": pd.Series([d[0] for d in dims], dtype="int32"),
                    "src_h": pd.Series([d[1] for d in dims], dtype="int32"),
                    "dst_w": pd.Series([dst[0]] * len(imgs), dtype="int32"),
                    "dst_h": pd.Series([dst[1]] * len(imgs), dtype="int32"),
                    "thumb": [hashlib.md5(bytes(p)).digest() for p in imgs["payload"]],
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(run, RESIZE_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = FRAME_EVERY_MS) -> DataFrame:
    """1->N frame sampling for video rows: one output row per ``every_ms``
    of metadata duration (indices, not decoded frames — the decode hook sits
    behind frame_idx). Non-video rows produce no output."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vids = pdf[pdf["kind"] == "video"]
            if vids.empty:
                continue
            out = {"media_id": [], "frame_idx": [], "frame_ts_ms": []}
            for mid, meta in zip(vids["media_id"], vids["meta"]):
                n = int(meta["duration_ms"]) // every_ms
                for i in range(n):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["frame_ts_ms"].append(i * every_ms)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(out["media_id"], dtype="int64"),
                    "frame_idx": pd.Series(out["frame_idx"], dtype="int32"),
                    "frame_ts_ms": pd.Series(out["frame_ts_ms"], dtype="int32"),
                }
            )

    return media.select("media_id", "kind", "meta").mapInPandas(run, FRAME_SCHEMA)
