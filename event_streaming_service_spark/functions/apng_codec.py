"""Pure-stdlib APNG (animated PNG) codec — the video decode path.

The container ships no video libraries (ffmpeg/PyAV), but APNG is a
video container we CAN decode for real: it is PNG plus three public
chunk types (acTL/fcTL/fdAT, from the W3C/Mozilla APNG spec that is
now part of the PNG third edition), and every frame's payload is an
independent zlib stream of PNG-filtered scanlines. Building on the
round-4 PNG codec (functions/png_codec.py — chunk CRCs, zlib, all
five scanline filters) this makes the multimodal *video* operators
REAL: frame decode, frame sampling, and scene-cut detection are
byte-exact and oracle-checkable, closing the last decode-stub family
in operators/multimodal.py (reference parity target:
/root/reference's opaque event payloads carry arbitrary media bytes;
SURVEY.md §2.12 frame-sample row).

Scope (documented, checked loudly): 8-bit RGB frames, every frame a
full-canvas region with dispose_op=APNG_DISPOSE_OP_NONE and
blend_op=APNG_BLEND_OP_SOURCE — i.e. each frame fully replaces the
canvas, so frame k's pixels are independent of compositing history.
That is exactly what the encoder emits and the common shape for
training-data clip thumbnails; any other region/dispose/blend raises
ValueError naming the field. Sequence numbers are validated to be the
strict 0..2n-2 chain the spec requires.

Scale: encode/decode run inside Arrow-batched `mapInPandas` kernels
(operators/multimodal.py), one clip per row; the sequential entropy
stream means a clip is the natural unit of parallel work, and frame
sampling filters INSIDE the kernel so only sampled frames' statistics
leave Python.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from event_streaming_service_spark.functions.png_codec import (
    SIGNATURE, _BPP, _chunk, _filter_row, _unfilter_row)

# Fixed nominal frame timing (1/30 s) — carried in fcTL, surfaced as
# metadata; timing does not affect pixel decode.
DELAY_NUM, DELAY_DEN = 1, 30


def _filtered_stream(arr: np.ndarray) -> bytes:
    """PNG-filter one (H, W, 3) frame into a raw scanline stream.

    Same filter schedule as png_codec.encode_png: rows 1-3 use the
    sequential filters (Sub/Average/Paeth) so every decoder branch is
    exercised, the rest alternate None/Up (vectorized decode)."""
    h, w, _ = arr.shape
    raw = bytearray()
    prev = np.zeros(w * _BPP, np.uint8)
    for y in range(h):
        row = arr[y].reshape(-1)
        ft = (1, 3, 4)[y - 1] if 1 <= y <= 3 else (0 if y % 2 == 0 else 2)
        raw.append(ft)
        raw += _filter_row(ft, row, prev)
        prev = row
    return bytes(raw)


def _fctl(seq: int, w: int, h: int) -> bytes:
    return _chunk(b"fcTL", struct.pack(
        ">IIIIIHHBB", seq, w, h, 0, 0, DELAY_NUM, DELAY_DEN, 0, 0))


def encode_apng(frames: np.ndarray) -> bytes:
    """Encode an (N, H, W, 3) uint8 stack as an APNG.

    Frame 0 rides in IDAT (so the file is also a valid still PNG);
    frames 1..N-1 ride in fdAT chunks, each an independent zlib
    stream. Sequence numbers interleave fcTL/fdAT exactly as the spec
    requires (0, 1, 2, ..., 2N-2)."""
    if frames.ndim != 4 or frames.shape[3] != _BPP \
            or frames.dtype != np.uint8 or frames.shape[0] < 1:
        raise ValueError("encode_apng expects (N, H, W, 3) uint8, N >= 1")
    n, h, w, _ = frames.shape
    out = bytearray(SIGNATURE)
    out += _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
    out += _chunk(b"acTL", struct.pack(">II", n, 0))
    out += _fctl(0, w, h)
    out += _chunk(b"IDAT", zlib.compress(_filtered_stream(frames[0]), 6))
    seq = 1
    for i in range(1, n):
        out += _fctl(seq, w, h)
        seq += 1
        data = zlib.compress(_filtered_stream(frames[i]), 6)
        out += _chunk(b"fdAT", struct.pack(">I", seq) + data)
        seq += 1
    out += _chunk(b"IEND", b"")
    return bytes(out)


def _unfilter_stream(stream: bytes, w: int, h: int) -> np.ndarray:
    stride = w * _BPP
    if len(stream) != h * (stride + 1):
        raise ValueError("frame stream length mismatch")
    out = np.empty((h, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    for y in range(h):
        off = y * (stride + 1)
        prev = _unfilter_row(stream[off], stream[off + 1:off + 1 + stride],
                             prev)
        out[y] = prev
    return out.reshape(h, w, _BPP)


def decode_apng(data: bytes) -> np.ndarray:
    """Decode APNG bytes to an (N, H, W, 3) uint8 frame stack.

    Validates the signature, every chunk CRC, the IHDR variant (8-bit
    RGB, no interlace), acTL frame count vs actual frames, the strict
    fcTL/fdAT sequence-number chain, and the supported full-canvas
    dispose/blend subset — malformed input fails with a precise
    ValueError, never a silently wrong frame."""
    if data[:8] != SIGNATURE:
        raise ValueError("not a PNG: bad signature")
    pos, header, actl = 8, None, None
    # per-frame: (fcTL seen, accumulated zlib bytes)
    frames: list[bytearray] = []
    expect_seq = 0
    while pos < len(data):
        if pos + 8 > len(data):
            raise ValueError("truncated chunk header")
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        ctype = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        if len(body) != length or pos + 12 + length > len(data):
            raise ValueError(f"truncated {ctype!r} chunk")
        (crc,) = struct.unpack(">I", data[pos + 8 + length:pos + 12 + length])
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {ctype!r} chunk")
        pos += 12 + length
        if ctype == b"IHDR":
            header = struct.unpack(">IIBBBBB", body)
        elif ctype == b"acTL":
            actl = struct.unpack(">II", body)
        elif ctype == b"fcTL":
            if header is None:
                raise ValueError("fcTL before IHDR")
            seq, fw, fh, x0, y0, dn, dd, dispose, blend = struct.unpack(
                ">IIIIIHHBB", body)
            if seq != expect_seq:
                raise ValueError(
                    f"fcTL sequence {seq}, expected {expect_seq}")
            expect_seq += 1
            if (fw, fh, x0, y0) != (header[0], header[1], 0, 0):
                raise ValueError(
                    "unsupported APNG subset: frame region must be the "
                    f"full canvas, got {fw}x{fh}+{x0}+{y0}")
            if dispose != 0 or blend != 0:
                raise ValueError(
                    "unsupported APNG subset: need dispose_op=0 "
                    f"blend_op=0, got dispose={dispose} blend={blend}")
            frames.append(bytearray())
        elif ctype == b"IDAT":
            if not frames:
                raise ValueError("IDAT with no preceding fcTL "
                                 "(default image outside the animation "
                                 "is not in the supported subset)")
            if len(frames) != 1:
                raise ValueError("IDAT after fdAT frames")
            frames[0] += body
        elif ctype == b"fdAT":
            (seq,) = struct.unpack(">I", body[:4])
            if seq != expect_seq:
                raise ValueError(
                    f"fdAT sequence {seq}, expected {expect_seq}")
            expect_seq += 1
            if len(frames) < 2:
                raise ValueError("fdAT before any non-first fcTL")
            frames[-1] += body[4:]
        elif ctype == b"IEND":
            break
    if header is None:
        raise ValueError("missing IHDR")
    if actl is None:
        raise ValueError("missing acTL (not an animated PNG)")
    w, h, depth, ctype_, comp, filt, interlace = header
    if (depth, ctype_, comp, filt, interlace) != (8, 2, 0, 0, 0):
        raise ValueError(
            "unsupported PNG variant (need 8-bit RGB, no interlace): "
            f"depth={depth} color={ctype_} interlace={interlace}")
    if actl[0] != len(frames):
        raise ValueError(
            f"acTL declares {actl[0]} frames, found {len(frames)}")
    out = np.empty((len(frames), h, w, _BPP), np.uint8)
    for i, buf in enumerate(frames):
        out[i] = _unfilter_stream(zlib.decompress(bytes(buf)), w, h)
    return out
