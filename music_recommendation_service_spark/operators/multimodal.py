"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` payload columns with a typed metadata struct;
decode / feature-extraction / frame-sampling run as Arrow-batched
``mapInPandas`` stages (the Python slow path, but vectorized per batch —
never per-row UDFs). Real decoding executes jarless and library-less for
PPM/BMP images and PCM16 WAV audio via the pure-Python decoders below,
selected per payload by magic-byte sniffing; compressed formats
(JPEG/PNG/FLAC/MP4) still route through the pillow/soundfile stubs and the
synthetic oracle fixtures (text-bytes payloads, no magic) keep the
deterministic md5 fake so the whole Python path retains an exact SQL
oracle. The Spark-side plumbing — schema, Arrow batch shape, 1->N row
expansion, partition independence — is identical across all three paths.

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


# -- real pure-Python decoders (jarless, library-less) -----------------------
#
# The container has no pillow/soundfile, but two uncompressed formats need
# nothing beyond the stdlib + numpy: PPM (P6) / BMP (BITMAPINFOHEADER,
# 24bpp, BI_RGB) images and RIFF/PCM16 WAV audio. The mapInPandas stages
# below sniff payload magic bytes and run the REAL decode for real media,
# falling back to the deterministic md5 fake for the synthetic oracle
# fixtures (UTF-8 text payloads have no media magic) — so the catalog
# oracle rows are unchanged while a producer -> decode -> feature pipeline
# over real bytes executes end-to-end (tests/test_multimodal.py).


def sniff_media(payload: bytes) -> str | None:
    """Magic-byte sniff: 'ppm' | 'bmp' | 'wav' | None (unknown/synthetic)."""
    if payload[:2] == b"P6":
        return "ppm"
    if payload[:2] == b"BM" and len(payload) >= 54:
        return "bmp"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    return None


def decode_ppm(payload: bytes):
    """P6 binary PPM -> (w, h, HxWx3 uint8 ndarray). Comments/whitespace per
    the Netpbm spec; maxval must be 255 (the 1-byte-per-sample case)."""
    import numpy as np

    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    pos, fields = 2, []
    while len(fields) < 3:
        # skip whitespace and '#' comments, then read one ASCII integer
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    need = w * h * 3
    raster = payload[pos : pos + need]
    if len(raster) != need:
        raise ValueError("truncated PPM raster")
    return w, h, np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3)


def encode_ppm(arr) -> bytes:
    """HxWx3 uint8 ndarray -> P6 binary PPM bytes."""
    h, w = arr.shape[0], arr.shape[1]
    return b"P6\n%d %d\n255\n" % (w, h) + arr.astype("uint8").tobytes()


def decode_bmp(payload: bytes):
    """Uncompressed 24bpp BI_RGB BMP -> (w, h, HxWx3 uint8 ndarray, RGB
    order, top-down). Rows are stored bottom-up, padded to 4 bytes."""
    import struct

    import numpy as np

    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    (data_off,) = struct.unpack_from("<I", payload, 10)
    (hdr_size,) = struct.unpack_from("<I", payload, 14)
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    w, h = struct.unpack_from("<ii", payload, 18)
    (bpp,) = struct.unpack_from("<H", payload, 28)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP: {bpp}bpp compression={compression}")
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = []
    for r in range(h):
        off = data_off + r * stride
        row = np.frombuffer(payload, dtype=np.uint8, count=w * 3, offset=off)
        rows.append(row.reshape(w, 3)[:, ::-1])  # BGR -> RGB
    arr = np.stack(rows if top_down else rows[::-1])
    return w, h, arr


def resize_nearest(arr, dst_w: int, dst_h: int):
    """Nearest-neighbor resize of an HxWxC ndarray — pure index arithmetic,
    no library. Production would swap in a real resampler; the pipeline
    shape (decode -> resize -> re-encode) is identical."""
    import numpy as np

    h, w = arr.shape[0], arr.shape[1]
    ys = (np.arange(dst_h) * h) // dst_h
    xs = (np.arange(dst_w) * w) // dst_w
    return arr[ys][:, xs]


def decode_wav(payload: bytes):
    """RIFF/WAVE PCM -> (sample_rate, n_channels, int16 ndarray of frames).
    Walks the chunk list (fmt / data may be preceded by LIST etc.); PCM16
    only."""
    import struct

    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, n_ch, rate, _byte_rate, _align, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError(f"unsupported WAV: format={audio_format} bits={bits}")
    samples = np.frombuffer(data, dtype="<i2")
    if n_ch > 1:
        samples = samples[: len(samples) // n_ch * n_ch].reshape(-1, n_ch)
    return rate, n_ch, samples


def encode_wav(rate: int, samples) -> bytes:
    """Mono int16 ndarray -> RIFF/WAVE PCM16 bytes (test producer)."""
    import struct

    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    chunks = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def real_decode_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Decode real media bytes and extract ``dim`` summary features.

    image (ppm/bmp): [w, h, mean_luma/255, pixel_std/255]
    audio (wav):     [sample_rate, n_frames, rms/32768, zero_cross_rate]
    Padded/truncated to ``dim``.
    """
    kind = sniff_media(payload)
    if kind in ("ppm", "bmp"):
        w, h, arr = decode_ppm(payload) if kind == "ppm" else decode_bmp(payload)
        f = arr.astype("float64")
        luma = (0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]).mean()
        feats = [float(w), float(h), float(luma / 255.0), float(f.std() / 255.0)]
    elif kind == "wav":
        rate, _n_ch, samples = decode_wav(payload)
        import numpy as np

        flat = samples.reshape(-1).astype("float64")
        rms = float(np.sqrt((flat**2).mean())) if len(flat) else 0.0
        zc = (
            float(np.mean(np.signbit(flat[1:]) != np.signbit(flat[:-1])))
            if len(flat) > 1
            else 0.0
        )
        feats = [float(rate), float(len(flat)), rms / 32768.0, zc]
    else:
        raise ValueError("not a decodable media payload")
    return (feats + [0.0] * dim)[:dim]


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
    """Arrow-batched feature extraction over payload bytes. REAL media
    (PPM/BMP/WAV, detected by magic bytes) goes through the pure-Python
    decoders; synthetic payloads (no magic — the oracle fixtures) use the
    deterministic md5 fake so the SQL oracle stays exact. Pure map — no
    shuffle."""

    def feat(p) -> list[float]:
        b = bytes(p)
        if sniff_media(b) is not None:
            return real_decode_features(b, dim)
        return fake_decode_features(b, dim)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len).astype("int32"),
                    "feature": pdf["payload"].map(feat),
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def resize_media(media: DataFrame, dst: tuple[int, int] = (THUMB_W, THUMB_H)) -> DataFrame:
    """Thumbnail generation for image rows: decode -> resize -> re-encode in
    production (``resize_image``); here the decode is the deterministic fake
    (dims from md5 words, thumbnail payload = md5 digest bytes) so the Arrow
    round-trip of a produced BINARY column is itself under test. Pure map,
    image rows only — no shuffle, partitioning preserved."""

    def one(p) -> tuple[int, int, bytes]:
        b = bytes(p)
        kind = sniff_media(b)
        if kind in ("ppm", "bmp"):
            w, h, arr = decode_ppm(b) if kind == "ppm" else decode_bmp(b)
            return w, h, encode_ppm(resize_nearest(arr, dst[0], dst[1]))
        w, h = fake_decode_dims(b)
        return w, h, hashlib.md5(b).digest()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            imgs = pdf[pdf["kind"] == "image"]
            if imgs.empty:
                continue
            decoded = [one(p) for p in imgs["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": imgs["media_id"].to_numpy(),
                    "src_w": pd.Series([d[0] for d in decoded], dtype="int32"),
                    "src_h": pd.Series([d[1] for d in decoded], dtype="int32"),
                    "dst_w": pd.Series([dst[0]] * len(imgs), dtype="int32"),
                    "dst_h": pd.Series([dst[1]] * len(imgs), dtype="int32"),
                    "thumb": [d[2] for d in decoded],
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
