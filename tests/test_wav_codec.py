"""WAV codec (functions/wav_codec.py) + real audio decode path.

Mirrors test_png_codec.py for the audio leg: byte-exact roundtrip over
random clips, chunk-walk robustness (extra chunks, odd-size padding),
loud failures for malformed streams, and the Spark kernels'
end-to-end decode correctness against locally recomputed samples.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from event_streaming_service_spark.functions import wav_codec as wc
from event_streaming_service_spark.operators import multimodal


def test_roundtrip_random_clips():
    rng = np.random.default_rng(11)
    for n, ch, rate in [(1, 1, 8000), (7, 2, 8000), (800, 1, 44100),
                        (333, 2, 16000)]:
        arr = rng.integers(-32768, 32768, (n, ch)).astype(np.int16)
        got, got_rate = wc.decode_wav(wc.encode_wav(arr, rate))
        assert got_rate == rate
        assert np.array_equal(got, arr)


def test_mono_1d_input_and_saturated_values():
    arr = np.array([-32768, 32767, 0, -1], dtype=np.int16)
    got, _ = wc.decode_wav(wc.encode_wav(arr, 8000))
    assert np.array_equal(got[:, 0], arr)


def test_decoder_walks_extra_chunks_and_padding():
    """Real-world WAVs interleave LIST/fact chunks (including odd-sized
    ones, padded to even offsets) between fmt and data — the chunk walk
    must skip them, not assume fixed offsets."""
    arr = np.arange(10, dtype=np.int16).reshape(5, 2)
    buf = wc.encode_wav(arr, 8000)
    fmt_chunk = buf[12:12 + 8 + 16]
    data_chunk = buf[12 + 8 + 16:]
    extra_odd = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    body = fmt_chunk + extra_odd + data_chunk
    rebuilt = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    got, rate = wc.decode_wav(rebuilt)
    assert rate == 8000
    assert np.array_equal(got, arr)


def test_decoder_rejects_malformed_streams():
    arr = np.zeros((4, 1), dtype=np.int16)
    good = wc.encode_wav(arr, 8000)
    with pytest.raises(ValueError, match="RIFF"):
        wc.decode_wav(b"OggS" + good[4:])
    with pytest.raises(ValueError, match="missing fmt or data"):
        wc.decode_wav(good[:12])
    # non-PCM format tag must fail loudly, not misread
    mutated = bytearray(good)
    struct.pack_into("<H", mutated, 20, 3)  # IEEE float tag
    with pytest.raises(ValueError, match="PCM16"):
        wc.decode_wav(bytes(mutated))
    with pytest.raises(ValueError, match="int16"):
        wc.encode_wav(np.zeros((4, 1), dtype=np.float32), 8000)


def test_extract_features_wav_matches_local_recompute(spark, sf_oracle):
    from event_streaming_service_spark.sources import tables

    docs = tables.load_table(spark, sf_oracle, "documents").limit(40)
    out = multimodal.extract_features_wav(
        multimodal.attach_wav_payload(docs))
    rows = {r["doc_id"]: r for r in out.collect()}
    assert len(rows) == 40
    for doc_id, r in rows.items():
        samples = multimodal._wav_samples(doc_id).astype("int64")
        n_frames, n_ch = samples.shape
        ch0 = samples[:, 0]
        neg = ch0 < 0
        assert r["n_frames"] == n_frames and r["n_channels"] == n_ch
        assert r["sample_rate"] == multimodal.WAV_SAMPLE_RATE
        assert r["ch0_sum"] == int(ch0.sum())
        assert r["ch0_sumsq"] == int((ch0 * ch0).sum())
        assert r["n_zero_cross"] == int((neg[1:] != neg[:-1]).sum())
        if n_ch > 1:
            assert r["ch1_sum"] == int(samples[:, 1].sum())
        else:
            assert r["ch1_sum"] is None


def test_resample_wav_out_bytes_is_canonical(spark, sf_oracle):
    from event_streaming_service_spark.sources import tables

    docs = tables.load_table(spark, sf_oracle, "documents").limit(20)
    out = multimodal.resample_wav(
        multimodal.attach_wav_payload(docs), target_rate=4000).collect()
    assert len(out) == 20
    for r in out:
        assert r["out_frames"] == (r["n_frames"] * 4000) // 8000
        n_ch = 1 + r["doc_id"] % 2
        assert r["out_bytes"] == 44 + r["out_frames"] * n_ch * 2


def test_decoder_rejects_truncated_data_chunk():
    """A data chunk declaring more bytes than the file holds must fail
    loudly, not silently decode a short clip with wrong statistics."""
    arr = np.arange(40, dtype=np.int16).reshape(20, 2)
    good = wc.encode_wav(arr, 8000)
    with pytest.raises(ValueError, match="truncated"):
        wc.decode_wav(good[:-10])
