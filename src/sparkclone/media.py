"""Multimodal column plumbing (image/audio/video as opaque binary).

The decode kernels themselves are STUBBED (the image/audio libraries are
not in this container — each raises NotImplementedError unless the
deterministic fake is requested), but the Spark-side plumbing is real and
tested: schema contracts, Arrow batch shapes, ``mapInPandas`` signatures,
and partitioning behavior are exactly what a real decoder would plug into.

Data model: media rows are ``(media_id long, kind string, data binary,
meta map<string,string>)``; features come back as ``array<float>`` plus
typed metadata columns.
"""

from __future__ import annotations

import hashlib
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


def extract_media_features(media: DataFrame, use_fake_decoder: bool = True) -> DataFrame:
    """binary media rows -> fixed-dim feature rows via batched mapInPandas.

    With ``use_fake_decoder=False`` this raises NotImplementedError at
    execution time — the marked seam where a real decoder (PIL/ffmpeg/
    torchaudio) drops in. Batch shape contract: one output row per input
    row; Arrow transports the binary column zero-copy.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            if not use_fake_decoder:
                raise NotImplementedError(
                    "real media decoding requires PIL/ffmpeg — not available "
                    "in this environment; pass use_fake_decoder=True"
                )
            raw = [
                (d if isinstance(d, (bytes, bytearray)) else str(d).encode("utf-8"))
                for d in batch["data"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": batch["media_id"],
                    "kind": batch["kind"],
                    "n_bytes": [len(d) for d in raw],
                    "content_md5": [hashlib.md5(d).hexdigest() for d in raw],
                    "feature": [_fake_decode(d) for d in raw],
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
