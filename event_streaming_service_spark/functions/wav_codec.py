"""Pure-stdlib WAV (RIFF/PCM16) codec.

The container has no audio libraries (ffmpeg/soundfile), but WAV's
canonical PCM form needs nothing beyond `struct`: a RIFF container
with a `fmt ` chunk describing the stream and a `data` chunk of
little-endian int16 frames. Implementing it here makes the audio leg
of the multimodal family REAL — the Spark kernels decode genuine
bytes, not a stub — while staying deterministic enough for an exact
SQL oracle (see query_defs/audio_queries.py).

Decoder behavior: validates the RIFF/WAVE magic, walks chunks (odd
sizes padded per spec, unknown chunks skipped) so files with extra
LIST/INFO chunks still parse, and rejects non-PCM or non-16-bit
streams loudly instead of misreading them.

No reference counterpart — the reference engine has no media path;
this extends SURVEY.md section 2.12's "multimodal columns" north star
to audio.
"""

from __future__ import annotations

import struct

import numpy as np

_FMT_PCM = 1


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """(n_frames, n_channels) int16 array -> canonical RIFF/PCM16 bytes."""
    if samples.ndim == 1:
        samples = samples[:, None]
    if samples.dtype != np.int16:
        raise ValueError(f"PCM16 encoder needs int16, got {samples.dtype}")
    n_frames, n_channels = samples.shape
    block_align = n_channels * 2
    byte_rate = sample_rate * block_align
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", _FMT_PCM, n_channels, sample_rate,
                      byte_rate, block_align, 16)
    riff_size = 4 + (8 + len(fmt)) + (8 + len(data))
    return b"".join([
        b"RIFF", struct.pack("<I", riff_size), b"WAVE",
        b"fmt ", struct.pack("<I", len(fmt)), fmt,
        b"data", struct.pack("<I", len(data)), data,
    ])


def decode_wav(buf: bytes) -> tuple[np.ndarray, int]:
    """RIFF/PCM16 bytes -> ((n_frames, n_channels) int16, sample_rate).

    Walks the chunk list rather than assuming fixed offsets: real-world
    WAVs carry LIST/INFO/fact chunks between fmt and data.
    """
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos, end = 12, 8 + struct.unpack_from("<I", buf, 4)[0]
    end = min(end, len(buf))
    fmt = None
    data = None
    while pos + 8 <= end:
        cid = buf[pos:pos + 4]
        size = struct.unpack_from("<I", buf, pos + 4)[0]
        if pos + 8 + size > len(buf):
            # a declared size past the buffer means a cut-off file;
            # silently decoding the partial body would yield a short
            # clip with wrong statistics instead of a loud failure
            raise ValueError(
                f"truncated {cid!r} chunk: declares {size} bytes, "
                f"{len(buf) - pos - 8} available")
        body = buf[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("fmt chunk too short")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks pad to even offsets
    if fmt is None or data is None:
        raise ValueError("missing fmt or data chunk")
    audio_format, n_channels, sample_rate, _, block_align, bits = fmt
    if audio_format != _FMT_PCM or bits != 16:
        raise ValueError(f"only PCM16 supported (format={audio_format}, "
                         f"bits={bits})")
    if n_channels < 1 or block_align != n_channels * 2:
        raise ValueError(f"inconsistent fmt: channels={n_channels}, "
                         f"block_align={block_align}")
    n_frames = len(data) // block_align
    arr = np.frombuffer(data[:n_frames * block_align], dtype="<i2")
    return arr.reshape(n_frames, n_channels).astype(np.int16), sample_rate
