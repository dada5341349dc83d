"""APNG video codec tests (functions/apng_codec.py) and the video
frame-stats / frame-sampling operators built on it."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from event_streaming_service_spark.functions import apng_codec as A
from event_streaming_service_spark.functions import png_codec
from event_streaming_service_spark.operators import multimodal as M


def _clip(n=3, h=11, w=9, seed=5) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(n, h, w, 3), dtype=np.uint8)


def test_roundtrip_random_clips():
    for n, h, w, seed in [(1, 4, 4, 0), (2, 16, 16, 1), (5, 23, 7, 2),
                          (7, 8, 40, 3)]:
        fr = _clip(n, h, w, seed)
        assert np.array_equal(A.decode_apng(A.encode_apng(fr)), fr)


def test_first_frame_is_a_valid_still_png():
    """APNG files must degrade to a still PNG of frame 0 for plain
    decoders — our plain decoder skips the animation chunks."""
    fr = _clip(4)
    assert np.array_equal(png_codec.decode_png(A.encode_apng(fr)), fr[0])


def test_every_filter_branch_runs():
    """Rows 1-3 use Sub/Average/Paeth; with h >= 5 a wrong branch in
    either direction breaks the roundtrip."""
    fr = _clip(3, h=6, w=5, seed=9)
    assert np.array_equal(A.decode_apng(A.encode_apng(fr)), fr)


def test_crc_flip_detected_everywhere():
    data = bytearray(A.encode_apng(_clip(3)))
    for off in range(20, len(data), max(1, len(data) // 17)):
        tampered = bytearray(data)
        tampered[off] ^= 0x40
        with pytest.raises(ValueError):
            A.decode_apng(bytes(tampered))


def test_sequence_number_chain_enforced():
    """Rebuild a clip with a duplicated fcTL sequence number (valid
    CRC) — the decoder must reject the broken chain."""
    fr = _clip(3, h=5, w=5)
    good = A.encode_apng(fr)
    bad = good.replace(A._fctl(1, 5, 5), A._fctl(0, 5, 5))
    assert bad != good
    with pytest.raises(ValueError, match="sequence"):
        A.decode_apng(bad)


def test_unsupported_region_and_blend_rejected():
    hdr = struct.pack(">IIBBBBB", 5, 5, 8, 2, 0, 0, 0)
    body = struct.pack(">IIIIIHHBB", 0, 3, 3, 1, 1, 1, 30, 0, 0)
    data = (A.SIGNATURE + A._chunk(b"IHDR", hdr)
            + A._chunk(b"acTL", struct.pack(">II", 1, 0))
            + A._chunk(b"fcTL", body)
            + A._chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="full canvas"):
        A.decode_apng(data)
    body2 = struct.pack(">IIIIIHHBB", 0, 5, 5, 0, 0, 1, 30, 1, 1)
    data2 = (A.SIGNATURE + A._chunk(b"IHDR", hdr)
             + A._chunk(b"acTL", struct.pack(">II", 1, 0))
             + A._chunk(b"fcTL", body2)
             + A._chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="dispose"):
        A.decode_apng(data2)


def test_actl_frame_count_mismatch_rejected():
    fr = _clip(2, h=5, w=5)
    good = A.encode_apng(fr)
    bad = good.replace(A._chunk(b"acTL", struct.pack(">II", 2, 0)),
                       A._chunk(b"acTL", struct.pack(">II", 3, 0)))
    with pytest.raises(ValueError, match="acTL declares"):
        A.decode_apng(bad)


def test_plain_png_rejected_as_video():
    still = png_codec.encode_png(_clip(1)[0])
    with pytest.raises(ValueError, match="fcTL|acTL"):
        A.decode_apng(still)


def test_frame_payloads_are_independent_zlib_streams():
    """Each frame must decompress on its own — the spec property that
    makes per-frame decode possible without carrying inflater state."""
    fr = _clip(3, h=5, w=5)
    data = A.encode_apng(fr)
    pos, fdat = 8, []
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        ctype = data[pos + 4:pos + 8]
        if ctype == b"fdAT":
            fdat.append(data[pos + 12:pos + 8 + length])
        pos += 12 + length
    assert len(fdat) == 2
    for buf in fdat:
        zlib.decompress(buf)  # raises if not self-contained


# ---- synthetic clip formula + operators -----------------------------

def test_apng_frames_formula():
    fr = M._apng_frames(63)
    w, h, n = M._apng_shape(63)
    assert fr.shape == (n, h, w, 3)
    cut = n // 2
    for f in (0, n - 1):
        for (y, x, c) in [(0, 0, 0), (h - 1, w - 1, 2), (3, 5, 1)]:
            expect = (63 % 80) + (x % 32) + (y % 32) + 10 * c + 8 * f \
                + (40 if f >= cut else 0)
            assert fr[f, y, x, c] == expect


def test_video_frame_stats_marks_exactly_one_cut(spark, sf_smoke):
    media = M.attach_apng_payload(
        spark.read.parquet(f"{sf_smoke}/documents.parquet"))
    out = M.video_frame_stats_apng(media).toPandas()
    per_doc = out.groupby("doc_id")
    for doc_id, g in per_doc:
        w, h, n = M._apng_shape(doc_id)
        assert len(g) == n
        assert int(g["is_cut"].sum()) == 1
        cut_row = g[g["is_cut"]].iloc[0]
        assert cut_row["frame_idx"] == n // 2
        # non-cut deltas are exactly 8 per pixel-channel
        drift = g[(g["frame_idx"] > 0) & ~g["is_cut"]]["diff_sum"]
        assert (drift == 8 * w * h * 3).all()
        assert (g[g["is_cut"]]["diff_sum"] == 48 * w * h * 3).all()


def test_sample_frames_apng_keeps_every_nth(spark, sf_smoke):
    media = M.attach_apng_payload(
        spark.read.parquet(f"{sf_smoke}/documents.parquet"))
    full = M.video_frame_stats_apng(media).toPandas()
    sampled = M.sample_frames_apng(media, every_nth=2).toPandas()
    assert set(zip(sampled.doc_id, sampled.frame_idx)) == {
        (d, f) for d, f in zip(full.doc_id, full.frame_idx) if f % 2 == 0}
    merged = sampled.merge(full, on=["doc_id", "frame_idx"],
                           suffixes=("", "_full"))
    assert (merged["ch0_sum"] == merged["ch0_sum_full"]).all()
    assert (merged["ch2_sum"] == merged["ch2_sum_full"]).all()
