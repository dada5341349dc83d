"""GIF/LZW codec unit tests (functions/gif_codec.py) — pure Python,
no Spark session needed. The codec is the round-8 LZW decode path
(VERDICT r7 item #8): variable-width codes, CLEAR resets, the KwKwK
corner, sub-block framing, padded non-power-of-2 color tables."""

from __future__ import annotations

import numpy as np
import pytest

from event_streaming_service_spark.functions import gif_codec as G
from event_streaming_service_spark.operators import multimodal as M


def test_roundtrip_random_images():
    rng = np.random.RandomState(11)
    for nc, h, w in [(2, 5, 7), (13, 37, 53), (16, 20, 20),
                     (255, 60, 80), (256, 33, 41)]:
        pal = rng.randint(0, 256, (nc, 3)).astype(np.uint8)
        img = rng.randint(0, nc, (h, w)).astype(np.uint8)
        frames, pal2 = G.decode_gif(G.encode_gif(img, pal))
        assert frames.shape == (1, h, w)
        assert np.array_equal(frames[0], img)
        assert np.array_equal(pal2[:nc], pal)


def test_roundtrip_animated():
    rng = np.random.RandomState(5)
    pal = rng.randint(0, 256, (9, 3)).astype(np.uint8)
    clip = rng.randint(0, 9, (6, 18, 25)).astype(np.uint8)
    frames, _ = G.decode_gif(G.encode_gif(clip, pal))
    assert np.array_equal(frames, clip)


def test_dict_full_clear_reset():
    # 200x300 of 256-color noise pushes the LZW table past 4096
    # entries several times; the roundtrip proves CLEAR resets work
    rng = np.random.RandomState(3)
    pal = rng.randint(0, 256, (256, 3)).astype(np.uint8)
    img = rng.randint(0, 256, (200, 300)).astype(np.uint8)
    data = G.encode_gif(img, pal)
    frames, _ = G.decode_gif(data)
    assert np.array_equal(frames[0], img)
    # noise is incompressible-ish: stream must carry > 1 byte/pixel
    # at 12-bit codes yet still be a valid variable-width stream
    assert len(data) > img.size


def test_kwkwk_and_constant_runs():
    # constant image: every emitted code extends the previous string
    # by one repeat — the decoder's code==len(table) branch fires
    pal = np.array([[1, 2, 3], [4, 5, 6]], np.uint8)
    img = np.zeros((64, 64), np.uint8)
    frames, _ = G.decode_gif(G.encode_gif(img, pal))
    assert np.array_equal(frames[0], img)


def test_non_power_of_two_palette_padded():
    pal = (np.arange(15, dtype=np.uint8).repeat(3).reshape(15, 3))
    img = (np.arange(60, dtype=np.uint8).reshape(6, 10)) % 15
    data = G.encode_gif(img, pal)
    # screen descriptor table-size field must round up to 16 entries
    assert 2 << (data[10] & 0x07) == 16
    frames, pal2 = G.decode_gif(data)
    assert len(pal2) == 16 and np.array_equal(pal2[:15], pal)
    assert np.array_equal(frames[0], img)


def test_corruption_detected():
    pal = np.array([[0, 0, 0], [255, 255, 255]], np.uint8)
    img = (np.arange(35, dtype=np.uint8).reshape(5, 7)) % 2
    data = bytearray(G.encode_gif(img, pal))
    with pytest.raises(ValueError, match="signature"):
        G.decode_gif(b"JIF89a" + bytes(data[6:]))
    with pytest.raises(ValueError):
        G.decode_gif(bytes(data[:-1]))  # trailer gone -> truncated
    # truncating the LZW sub-block chain mid-frame must not decode
    bad = bytes(data[:20])
    with pytest.raises((ValueError, IndexError)):
        G.decode_gif(bad)


def test_unknown_extensions_skipped():
    pal = np.array([[9, 9, 9], [1, 1, 1]], np.uint8)
    img = (np.arange(12, dtype=np.uint8).reshape(3, 4)) % 2
    data = G.encode_gif(img, pal)
    # splice a comment extension (0x21 0xFE) between table and image
    head, tail = data[:13 + 6], data[13 + 6:]
    spliced = head + bytes([0x21, 0xFE, 3]) + b"abc" + b"\x00" + tail
    frames, _ = G.decode_gif(spliced)
    assert np.array_equal(frames[0], img)


def test_fixture_formula_matches_kernel():
    # the SQL oracle's closed form vs the numpy fixture generator
    for doc_id in (0, 7, 123, 4096):
        w, h, nc, nf = M._gif_shape(doc_id)
        frames, pal = M._gif_frames(doc_id)
        assert frames.shape == (nf, h, w)
        for f, x, y in [(0, 0, 0), (nf - 1, w - 1, h - 1),
                        (1, w // 2, h // 3)]:
            idx = (doc_id + x + 3 * y + 7 * f) % nc
            assert frames[f, y, x] == idx
            assert pal[idx, 0] == (37 * idx + doc_id) % 256
            assert pal[idx, 1] == (59 * idx + 2 * doc_id) % 256
            assert pal[idx, 2] == (83 * idx + 3 * doc_id) % 256
        # encode -> decode roundtrip on the real fixture
        dec, pal2 = G.decode_gif(G.encode_gif(frames, pal))
        assert np.array_equal(dec, frames)
        assert np.array_equal(pal2[:nc], pal)


def test_final_code_width_boundary_regression():
    """sf0.1 doc 2154: the decoder appends one more entry than the
    encoder while processing the FINAL data code; when that append
    crosses 2^width the EOI must be written one bit wider. The two
    off-by-ones cancel mid-stream and this pins the tail case."""
    from event_streaming_service_spark.operators import multimodal as M

    frames, pal = M._gif_frames(2154)
    for fr in (frames[:1], frames):
        dec, _ = G.decode_gif(G.encode_gif(fr, pal))
        assert np.array_equal(dec, fr)
    # sweep a dense shape grid at one palette size to walk the table
    # size across several width boundaries at the final code
    rng = np.random.RandomState(2154)
    pal14 = rng.randint(0, 256, (14, 3)).astype(np.uint8)
    for h in range(4, 40, 3):
        for w in range(4, 60, 7):
            img = rng.randint(0, 14, (h, w)).astype(np.uint8)
            dec, _ = G.decode_gif(G.encode_gif(img, pal14))
            assert np.array_equal(dec[0], img), (h, w)
