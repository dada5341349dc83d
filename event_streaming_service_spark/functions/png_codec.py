"""Pure-stdlib PNG codec (8-bit RGB) for the multimodal decode path.

The container ships no image libraries (PIL/ffmpeg), but PNG's
container format is fully decodable with `zlib` + `struct`: chunks with
CRC32 trailers, an IDAT stream of per-row filtered scanlines, and five
public filter types (None/Sub/Up/Average/Paeth). Implementing the
codec here makes the multimodal feature-extraction and resample
operators REAL — byte-exact, oracle-checkable decodes — instead of the
round-3 stubs; only formats that genuinely need external codecs
(JPEG, audio, video) remain stubbed in operators/multimodal.py.

Scope (documented, checked loudly): 8-bit/channel truecolor (color
type 2), no interlace, no palette/alpha — exactly what the synthetic
fixture payloads use and the common denominator for training-data
thumbnails. Anything else raises ValueError naming the unsupported
field.

Scale: encode/decode run inside Arrow-batched `mapInPandas` kernels
(operators/multimodal.py), one image per row; rows parallelize across
executors, so the per-image cost is the unit of work. Filters 0/2 are
vectorized numpy; the sequential filters (1/3/4) fall back to per-byte
loops, which the encoder therefore only emits on a fixed small prefix
of rows — enough to keep the decoder honest on every filter type
without making the hot path quadratic in Python.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

SIGNATURE = b"\x89PNG\r\n\x1a\n"
_BPP = 3  # bytes per pixel, RGB8


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))


def _filter_row(ft: int, row: np.ndarray, prev: np.ndarray) -> bytes:
    """Apply PNG filter `ft` to one scanline (raw -> filtered).

    Encoding every filter is vectorizable because filters are defined
    on RAW neighbor bytes (only decoding Sub/Average/Paeth is a prefix
    recurrence)."""
    r = row.astype(np.int16)
    p = prev.astype(np.int16)
    left = np.zeros_like(r)
    left[_BPP:] = r[:-_BPP]
    upleft = np.zeros_like(p)
    upleft[_BPP:] = p[:-_BPP]
    if ft == 0:
        out = r
    elif ft == 1:
        out = r - left
    elif ft == 2:
        out = r - p
    elif ft == 3:
        out = r - (left + p) // 2
    elif ft == 4:
        pa = np.abs(p - upleft)       # |p - c| estimates the 'a' branch
        pb = np.abs(left - upleft)
        pc = np.abs(left + p - 2 * upleft)
        pred = np.where((pa <= pb) & (pa <= pc), left,
                        np.where(pb <= pc, p, upleft))
        out = r - pred
    else:
        raise ValueError(f"unknown filter type {ft}")
    return (out % 256).astype(np.uint8).tobytes()


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter_row(ft: int, data: bytes, prev: np.ndarray) -> np.ndarray:
    """Invert one scanline filter (filtered -> raw uint8 array)."""
    if ft == 0:
        return np.frombuffer(data, np.uint8).copy()
    if ft == 2:
        return ((np.frombuffer(data, np.uint8).astype(np.int16)
                 + prev.astype(np.int16)) % 256).astype(np.uint8)
    # Sub/Average/Paeth reconstruct from already-reconstructed left
    # neighbors — an inherently sequential prefix recurrence
    raw = bytearray(data)
    n = len(raw)
    pv = prev
    if ft == 1:
        for i in range(_BPP, n):
            raw[i] = (raw[i] + raw[i - _BPP]) & 0xFF
    elif ft == 3:
        for i in range(n):
            left = raw[i - _BPP] if i >= _BPP else 0
            raw[i] = (raw[i] + ((left + int(pv[i])) >> 1)) & 0xFF
    elif ft == 4:
        for i in range(n):
            left = raw[i - _BPP] if i >= _BPP else 0
            ul = int(pv[i - _BPP]) if i >= _BPP else 0
            raw[i] = (raw[i] + _paeth(left, int(pv[i]), ul)) & 0xFF
    else:
        raise ValueError(f"unknown filter type {ft}")
    return np.frombuffer(bytes(raw), np.uint8)


def encode_png(arr: np.ndarray) -> bytes:
    """Encode an (H, W, 3) uint8 array as a PNG.

    Rows 1-3 use the sequential filters (Sub/Average/Paeth) so every
    decoder filter branch is exercised on real data; remaining rows
    alternate None/Up, which decode fully vectorized."""
    if arr.ndim != 3 or arr.shape[2] != _BPP or arr.dtype != np.uint8:
        raise ValueError("encode_png expects (H, W, 3) uint8")
    h, w, _ = arr.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = bytearray()
    prev = np.zeros(w * _BPP, np.uint8)
    for y in range(h):
        row = arr[y].reshape(-1)
        ft = (1, 3, 4)[y - 1] if 1 <= y <= 3 else (0 if y % 2 == 0 else 2)
        raw.append(ft)
        raw += _filter_row(ft, row, prev)
        prev = row
    return (SIGNATURE
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
            + _chunk(b"IEND", b""))


def decode_png(data: bytes) -> np.ndarray:
    """Decode PNG bytes to an (H, W, 3) uint8 array.

    Validates the signature, every chunk CRC, header fields (8-bit
    RGB, no interlace), and the decompressed stream length — malformed
    input fails with a precise ValueError, never a silent wrap."""
    if data[:8] != SIGNATURE:
        raise ValueError("not a PNG: bad signature")
    pos, idat, header = 8, bytearray(), None
    while pos < len(data):
        if pos + 8 > len(data):
            raise ValueError("truncated chunk header")
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        ctype = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        if len(body) != length or pos + 12 + length > len(data):
            raise ValueError(f"truncated {ctype!r} chunk")
        (crc,) = struct.unpack(
            ">I", data[pos + 8 + length:pos + 12 + length])
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {ctype!r} chunk")
        pos += 12 + length
        if ctype == b"IHDR":
            header = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
    if header is None:
        raise ValueError("missing IHDR")
    w, h, depth, ctype_, comp, filt, interlace = header
    if (depth, ctype_, comp, filt, interlace) != (8, 2, 0, 0, 0):
        raise ValueError(
            "unsupported PNG variant (need 8-bit RGB, no interlace): "
            f"depth={depth} color={ctype_} interlace={interlace}")
    stream = zlib.decompress(bytes(idat))
    stride = w * _BPP
    if len(stream) != h * (stride + 1):
        raise ValueError("IDAT stream length mismatch")
    out = np.empty((h, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    for y in range(h):
        off = y * (stride + 1)
        prev = _unfilter_row(stream[off], stream[off + 1:off + 1 + stride],
                             prev)
        out[y] = prev
    return out.reshape(h, w, _BPP)


def resize_nearest(arr: np.ndarray, tw: int, th: int) -> np.ndarray:
    """Nearest-neighbor resample to (th, tw): target pixel (X, Y) takes
    source pixel (X*W // tw, Y*H // th) — integer index math, exactly
    reproducible in SQL, no interpolation ulps."""
    h, w, _ = arr.shape
    xs = (np.arange(tw) * w) // tw
    ys = (np.arange(th) * h) // th
    return arr[np.ix_(ys, xs)]
