"""Perceptual fingerprint tests: PNG dHash + WAV derivative hash
(operators/multimodal.py round-5 additions)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from event_streaming_service_spark.functions import png_codec, wav_codec
from event_streaming_service_spark.operators import multimodal


def _png_df(spark, imgs):
    rows = [(i, png_codec.encode_png(a)) for i, a in enumerate(imgs)]
    return spark.createDataFrame(rows, "doc_id long, payload binary")


def test_dhash_brightness_invariant(spark):
    """dHash depends on neighbor DIFFERENCES: adding a constant to
    every pixel must not change the hash (the perceptual-dedup
    property byte hashes lack)."""
    base = np.zeros((16, 18, 3), dtype="uint8")
    base[:, :, :] = (np.arange(18) % 7 * 20)[None, :, None].astype("uint8")
    brighter = base + 30
    out = multimodal.image_dhash_png(
        _png_df(spark, [base, brighter])).collect()
    hashes = {r["doc_id"]: r["dhash"] for r in out}
    assert hashes[0] == hashes[1]
    assert len(hashes[0]) == 16  # 8 rows x 2 hex chars


def test_dhash_detects_structural_change(spark):
    flat = np.full((16, 18, 3), 50, dtype="uint8")
    ramp = np.zeros((16, 18, 3), dtype="uint8")
    ramp[:, :, :] = (np.arange(18) * 10)[None, :, None].astype("uint8")
    out = multimodal.image_dhash_png(_png_df(spark, [flat, ramp])).collect()
    hashes = {r["doc_id"]: r["dhash"] for r in out}
    assert hashes[0] == "00" * 8          # no increasing neighbors
    assert hashes[1] == "ff" * 8          # strictly increasing rows
    assert hashes[0] != hashes[1]


def test_audio_fingerprint_known_bits(spark):
    """64 frames, strictly increasing ch0 -> every derivative bit is 1:
    seven 0xff bytes plus a final 7-bit byte 0x7f."""
    up = np.arange(64, dtype="int16").reshape(-1, 1)
    rows = [(0, wav_codec.encode_wav(up, 8000))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    r = multimodal.audio_fingerprint_wav(df, n_points=64).collect()[0]
    assert r["n_frames"] == 64
    assert r["afp"] == "ff" * 7 + "7f"


def test_audio_fingerprint_level_invariant(spark):
    """Scaling amplitude preserves the sign-of-derivative pattern."""
    rng = np.random.default_rng(3)
    sig = rng.integers(-200, 200, size=128).astype("int16").reshape(-1, 1)
    scaled = (sig * 3).astype("int16")
    df = spark.createDataFrame(
        [(0, wav_codec.encode_wav(sig, 8000)),
         (1, wav_codec.encode_wav(scaled, 8000))],
        "doc_id long, payload binary")
    out = {r["doc_id"]: r["afp"]
           for r in multimodal.audio_fingerprint_wav(df).collect()}
    assert out[0] == out[1]
