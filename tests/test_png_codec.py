"""PNG codec (functions/png_codec.py) + real multimodal decode path.

The codec is the round-4 replacement for the decode stubs: pure-stdlib
encode/decode with every public scanline filter, CRC validation, and
nearest-neighbor resample. Tests pin byte-exactness (roundtrip over
random images), each failure mode's loud error, and the Spark kernels'
end-to-end decode correctness against locally recomputed pixels.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from event_streaming_service_spark.functions import png_codec as pc


def test_roundtrip_random_images_exercises_all_filters():
    rng = np.random.default_rng(7)
    # >= 5 rows guarantees filters 1, 3, 4 (rows 1-3) and 0/2 all run
    for h, w in [(1, 1), (2, 2), (5, 3), (16, 16), (48, 80), (33, 7)]:
        arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        assert np.array_equal(pc.decode_png(pc.encode_png(arr)), arr)


def test_roundtrip_adversarial_patterns():
    # constant, saturated, and alternating images stress the filter
    # arithmetic's mod-256 wraparound
    for arr in [
        np.zeros((6, 6, 3), np.uint8),
        np.full((6, 6, 3), 255, np.uint8),
        np.fromfunction(lambda y, x, c: (x * 255 + y * 7 + c * 13) % 256,
                        (9, 9, 3)).astype(np.uint8),
    ]:
        assert np.array_equal(pc.decode_png(pc.encode_png(arr)), arr)


def test_decode_rejects_bad_signature_and_crc_and_truncation():
    arr = np.arange(4 * 5 * 3, dtype=np.uint8).reshape(4, 5, 3)
    good = pc.encode_png(arr)
    with pytest.raises(ValueError, match="bad signature"):
        pc.decode_png(b"GIF89a" + good)
    corrupted = bytearray(good)
    corrupted[len(good) // 2] ^= 0x01
    with pytest.raises(ValueError, match="CRC mismatch|IDAT|error"):
        pc.decode_png(bytes(corrupted))
    with pytest.raises(ValueError, match="truncated"):
        pc.decode_png(good[:20])


def test_decode_rejects_unsupported_variants():
    # hand-build a grayscale (color type 0) header: supported depth,
    # wrong color type -> named error, not a garbled decode
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    def chunk(t, d):
        return (struct.pack(">I", len(d)) + t + d
                + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF))
    data = (pc.SIGNATURE + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(b"\x00\x00\x00" * 2))
            + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="unsupported PNG variant"):
        pc.decode_png(data)


def test_resize_nearest_index_map_matches_sql_formula():
    rng = np.random.default_rng(11)
    arr = rng.integers(0, 256, (48, 80, 3), dtype=np.uint8)
    out = pc.resize_nearest(arr, 24, 24)
    assert out.shape == (24, 24, 3)
    for ty in (0, 7, 23):
        for tx in (0, 11, 23):
            assert np.array_equal(
                out[ty, tx], arr[(ty * 48) // 24, (tx * 80) // 24])
    up = pc.resize_nearest(arr[:4, :4], 8, 8)  # upscale repeats pixels
    assert np.array_equal(up[0, 0], arr[0, 0])
    assert np.array_equal(up[1, 1], arr[0, 0])


def test_spark_png_pipeline_decodes_exactly(spark):
    from event_streaming_service_spark.operators import multimodal as mm

    docs = spark.range(0, 40).withColumnRenamed("id", "doc_id")
    media = mm.attach_png_payload(docs)
    feats = {r.doc_id: r for r in mm.extract_features_png(media).collect()}
    assert len(feats) == 40
    for doc_id in (0, 17, 39):
        arr = mm._png_pixels(doc_id)
        r = feats[doc_id]
        w, h = mm._png_dims(doc_id)
        assert (r.width, r.height) == (w, h)
        sums = arr.reshape(-1, 3).sum(axis=0)
        assert (r.ch0_sum, r.ch1_sum, r.ch2_sum) == tuple(int(s) for s in sums)
        assert r.px_min == int(arr.min()) and r.px_max == int(arr.max())


def test_spark_resize_png_reencodes_decodable_output(spark):
    from event_streaming_service_spark.operators import multimodal as mm

    docs = spark.range(0, 10).withColumnRenamed("id", "doc_id")
    out = {r.doc_id: r for r in
           mm.resize_png(mm.attach_png_payload(docs), 24, 24).collect()}
    for doc_id, r in out.items():
        small = pc.resize_nearest(mm._png_pixels(doc_id), 24, 24)
        sums = small.reshape(-1, 3).sum(axis=0)
        assert (r.ch0_sum, r.ch1_sum, r.ch2_sum) == tuple(int(s) for s in sums)
        assert (r.target_w, r.target_h) == (24, 24)
        assert r.out_bytes > 0  # re-encoded payload exists
