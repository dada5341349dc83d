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
