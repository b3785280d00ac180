"""Real media decode kernels (media.py): BMP / netpbm / WAV parsing with
pure numpy + stdlib, the grayscale-resize / RMS-window feature pipeline,
and the skip-and-count behavior for codec-requiring formats — driven
through the Spark mapInPandas seam with a true binary column."""

from __future__ import annotations

import io
import struct
import wave

import numpy as np
import pytest


def make_bmp(px: np.ndarray) -> bytes:
    """Minimal 24-bit bottom-up BI_RGB BMP from an (H, W, 3) RGB array."""
    h, w, _ = px.shape
    stride = (w * 3 + 3) & ~3
    rows = []
    for r in range(h - 1, -1, -1):
        row = bytearray()
        for c in range(w):
            rgb = px[r, c]
            row += bytes([int(rgb[2]), int(rgb[1]), int(rgb[0])])
        row += b"\x00" * (stride - w * 3)
        rows.append(bytes(row))
    pix = b"".join(rows)
    header = b"BM" + struct.pack("<IHHI", 14 + 40 + len(pix), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pix), 2835, 2835, 0, 0)
    return header + dib + pix


def make_ppm(px: np.ndarray) -> bytes:
    h, w, _ = px.shape
    return b"P6\n# test comment\n%d %d\n255\n" % (w, h) + px.astype(np.uint8).tobytes()


def make_pgm(gray: np.ndarray) -> bytes:
    h, w = gray.shape
    return b"P5 %d %d 255 " % (w, h) + gray.astype(np.uint8).tobytes()


def make_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes((np.clip(samples, -1, 1) * 32000).astype("<i2").tobytes())
    return buf.getvalue()


@pytest.fixture()
def gradient_px():
    rng = np.random.default_rng(7)
    return rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)


def test_bmp_roundtrip(gradient_px):
    from sparkclone.media import decode_bmp

    decoded = decode_bmp(make_bmp(gradient_px))
    assert decoded.shape == (8, 8, 3)
    assert np.array_equal(decoded, gradient_px)


def test_bmp_row_padding():
    from sparkclone.media import decode_bmp

    # width 3 -> 9-byte rows padded to 12; padding must not leak into pixels
    px = np.arange(3 * 3 * 3, dtype=np.uint8).reshape(3, 3, 3)
    assert np.array_equal(decode_bmp(make_bmp(px)), px)


def test_netpbm_p6_and_p5(gradient_px):
    from sparkclone.media import decode_netpbm

    assert np.array_equal(decode_netpbm(make_ppm(gradient_px)), gradient_px)
    gray = gradient_px[:, :, 0]
    decoded = decode_netpbm(make_pgm(gray))
    assert decoded.shape == (8, 8, 3)
    assert np.array_equal(decoded[:, :, 1], gray)


def test_wav_decode_and_rms_feature():
    from sparkclone.media import audio_feature, decode_wav

    t = np.arange(1600) / 8000.0
    sine = 0.5 * np.sin(2 * np.pi * 440 * t)
    samples = decode_wav(make_wav(sine))
    assert samples.shape == (1600,)
    assert abs(samples.max() - 0.5 * 32000 / 32768) < 0.01
    feat = audio_feature(samples)
    assert feat.shape == (16,)
    # RMS of a steady sine ~ amplitude / sqrt(2) in every window
    expected = 0.5 * (32000 / 32768) / np.sqrt(2)
    assert np.allclose(feat, expected, atol=0.02)


def test_image_feature_matches_manual_resize(gradient_px):
    from sparkclone.media import decode_bmp, image_feature

    feat = image_feature(decode_bmp(make_bmp(gradient_px)))
    gray = gradient_px.astype(np.float32).mean(axis=2)
    manual = gray[::2, ::2] / 255.0  # nearest-neighbor 8->4 is every 2nd px
    assert feat.shape == (16,)
    assert np.allclose(feat, manual.ravel(), atol=1e-6)


def test_identical_images_have_identical_features(gradient_px):
    """The feature is a dedup signal: same pixels in different containers
    (BMP vs PPM) produce the same vector."""
    from sparkclone.media import decode_feature

    s1, f1 = decode_feature(make_bmp(gradient_px))
    s2, f2 = decode_feature(make_ppm(gradient_px))
    assert (s1, s2) == ("bmp", "netpbm")
    assert np.allclose(f1, f2)


def test_spark_e2e_binary_column(spark, gradient_px):
    from sparkclone.media import extract_media_features
    from sparkclone.runtime import ensure_shipped

    ensure_shipped(spark)
    rows = [
        (1, "image", bytearray(make_bmp(gradient_px))),
        (2, "image", bytearray(make_ppm(gradient_px))),
        (3, "audio", bytearray(make_wav(np.zeros(320)))),
        (4, "image", bytearray(b"\x89PNG\r\n\x1a\nrest")),
        (5, "blob", bytearray(b"just some text")),
        (6, "image", bytearray(b"BMgarbage")),
    ]
    media = spark.createDataFrame(rows, "media_id long, kind string, data binary")
    out = {r["media_id"]: r for r in extract_media_features(media).collect()}
    assert out[1]["decode_status"] == "bmp" and len(out[1]["feature"]) == 16
    assert out[2]["decode_status"] == "netpbm"
    assert np.allclose(out[1]["feature"], out[2]["feature"])
    assert out[3]["decode_status"] == "wav" and max(out[3]["feature"]) == 0.0
    assert out[4]["decode_status"] == "png:unsupported" and out[4]["feature"] is None
    assert out[5]["decode_status"] == "unknown:unsupported" and out[5]["feature"] is None
    assert out[6]["decode_status"] == "bmp:error" and out[6]["feature"] is None
