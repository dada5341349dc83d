"""Pure-stdlib GIF87a/89a codec (LZW) — the palette-image decode path.

The container ships no image libraries, but GIF is fully decodable
with `struct` + bit twiddling: a logical screen descriptor, a global
color table, and per-frame image blocks whose pixel indices are LZW-
compressed with variable-width codes (the only entropy coder in the
suite that is neither zlib nor Huffman — this closes the last
stdlib-feasible image format after PNG/APNG (zlib) and baseline/
progressive JPEG + MJPEG (Huffman), VERDICT r7 item #8).

Reference parity: /root/reference's event payloads are opaque bytes
(SURVEY.md §2.12 media rows); the decode itself is public knowledge —
GIF89a specification (CompuServe, 1990) and the Welch LZW paper
(IEEE Computer, 1984).

Scope (documented, checked loudly): global color table only, no
interlace, no transparency compositing, every frame a full-canvas
image with disposal none/overwrite — each frame fully replaces the
canvas, the same contract as the APNG codec. Multi-frame GIF89a
streams carry one Graphic Control Extension per frame; unknown
extensions are skipped by their sub-block chain (spec-conformant).
Anything outside scope raises ValueError naming the field.

LZW details exercised and tested here:
- variable code width: starts at min_code_size+1, bumps whenever the
  next dictionary slot reaches 2^width, caps at 12 bits;
- CLEAR resets the dictionary mid-stream (the encoder emits one
  whenever the table fills at 4096 entries, so large frames round-trip
  across resets);
- the KwKwK corner case (decoder receives the code it is about to
  define);
- LSB-first bit packing chopped into <=255-byte sub-blocks.

Scale: encode/decode run inside Arrow-batched `mapInPandas` kernels
(operators/multimodal.py), one image/clip per row; LZW is inherently
sequential per stream, so the image is the unit of parallel work and
rows fan out across executors.
"""

from __future__ import annotations

import struct

import numpy as np

# Fixed nominal frame timing for animated streams (2 centiseconds),
# carried in the Graphic Control Extension; timing does not affect
# pixel decode.
DELAY_CS = 2

_MAX_CODE_WIDTH = 12
_DICT_LIMIT = 1 << _MAX_CODE_WIDTH  # 4096


class _BitWriter:
    """LSB-first bit packer (GIF appendix F byte order)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def finish(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
        return bytes(self.out)


class _BitReader:
    """LSB-first bit unpacker over the reassembled data stream."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, width: int) -> int:
        while self.nbits < width:
            if self.pos >= len(self.data):
                raise ValueError("LZW stream truncated mid-code")
            self.acc |= self.data[self.pos] << self.nbits
            self.pos += 1
            self.nbits += 8
        code = self.acc & ((1 << width) - 1)
        self.acc >>= width
        self.nbits -= width
        return code


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """GIF-flavor LZW: emits CLEAR, codes, CLEAR-on-full, EOI."""
    clear = 1 << min_code_size
    eoi = clear + 1
    bw = _BitWriter()

    def reset() -> tuple[dict[bytes, int], int, int]:
        table = {bytes([i]): i for i in range(clear)}
        return table, eoi + 1, min_code_size + 1

    table, next_code, width = reset()
    bw.write(clear, width)
    prefix = b""
    for b in indices:
        trial = prefix + bytes([b])
        if trial in table:
            prefix = trial
            continue
        bw.write(table[prefix], width)
        table[trial] = next_code
        next_code += 1
        # width bump AFTER registering: codes next_code-1 needs
        # `width` bits only once next_code-1 < 2^width fails
        if next_code > (1 << width) and width < _MAX_CODE_WIDTH:
            width += 1
        if next_code >= _DICT_LIMIT:
            bw.write(clear, width)
            table, next_code, width = reset()
        prefix = bytes([b])
    if prefix:
        bw.write(table[prefix], width)
        # the decoder appends one more entry while processing this
        # final code (the encoder has no next byte, so it adds none) —
        # if that append crosses 2^width the decoder reads EOI one bit
        # wider. Mirror its check on the CURRENT next_code (== the
        # decoder's post-append table size: the decoder's first code
        # after a clear appends nothing, so its size trails next_code
        # by exactly one — the two off-by-ones cancel mid-stream and
        # must cancel here too). Found by a sf0.1 fixture image whose
        # table hit the boundary exactly at the last code (doc 2154).
        if next_code >= (1 << width) and width < _MAX_CODE_WIDTH:
            width += 1
    bw.write(eoi, width)
    return bw.finish()


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> bytes:
    """Inverse of _lzw_encode; validates EOI and the pixel count."""
    clear = 1 << min_code_size
    eoi = clear + 1
    br = _BitReader(data)
    out = bytearray()

    table: list[bytes] = []
    width = min_code_size + 1
    prev: bytes | None = None
    while True:
        code = br.read(width)
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError(f"first LZW code {code} not in table")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # KwKwK
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"LZW code {code} beyond table "
                             f"size {len(table)}")
        if prev is not None and len(table) > _DICT_LIMIT:
            raise ValueError("LZW table overflow (encoder bug)")
        out += entry
        prev = entry
        if len(table) >= (1 << width) and width < _MAX_CODE_WIDTH:
            width += 1
        if len(out) > n_pixels:
            raise ValueError(f"LZW output overruns frame: {len(out)} "
                             f"> {n_pixels}")
    if len(out) != n_pixels:
        raise ValueError(f"LZW pixel count {len(out)} != {n_pixels}")
    return bytes(out)


def _sub_blocks(data: bytes) -> bytes:
    """Chop a byte stream into <=255-byte counted sub-blocks + 0x00."""
    chunks = [data[i:i + 255] for i in range(0, len(data), 255)]
    return b"".join(bytes([len(c)]) + c for c in chunks) + b"\x00"


def _table_bits(n_colors: int) -> int:
    """Smallest b >= 1 with 2^b >= n_colors (color table size field)."""
    bits = 1
    while (1 << bits) < n_colors:
        bits += 1
    return bits


def encode_gif(frames: np.ndarray, palette: np.ndarray) -> bytes:
    """Encode (F, H, W) [or (H, W)] uint8 palette indices as GIF.

    Single frame -> plain GIF87a-shaped stream (header GIF89a for
    uniformity, no extensions). Multi frame -> one Graphic Control
    Extension per frame (delay DELAY_CS, disposal 1 = leave in place;
    frames are full-canvas so compositing never mixes frames)."""
    if frames.ndim == 2:
        frames = frames[None, :, :]
    if frames.ndim != 3 or frames.dtype != np.uint8:
        raise ValueError("encode_gif expects (F, H, W) uint8 indices")
    if palette.ndim != 2 or palette.shape[1] != 3 \
            or palette.dtype != np.uint8:
        raise ValueError("encode_gif expects (n, 3) uint8 palette")
    n_colors = len(palette)
    if n_colors < 2 or n_colors > 256:
        raise ValueError(f"palette size {n_colors} outside [2, 256]")
    if int(frames.max()) >= n_colors:
        raise ValueError("pixel index beyond palette")
    nf, h, w = frames.shape
    bits = _table_bits(n_colors)
    table = np.zeros(((1 << bits), 3), np.uint8)
    table[:n_colors] = palette
    # logical screen descriptor: global table flag, color resolution
    # field (bits-1, informational), table size field (bits-1)
    packed = 0x80 | ((bits - 1) << 4) | (bits - 1)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, packed, 0, 0)
    out += table.tobytes()
    min_code = max(2, bits)
    for fi in range(nf):
        if nf > 1:
            out += bytes([0x21, 0xF9, 4, 0x04])  # GCE, disposal=1
            out += struct.pack("<H", DELAY_CS)
            out += bytes([0, 0])  # no transparent index; terminator
        out += b"\x2C" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out += bytes([min_code])
        out += _sub_blocks(_lzw_encode(frames[fi].tobytes(), min_code))
    out += b"\x3B"
    return bytes(out)


def decode_gif(data: bytes) -> tuple[np.ndarray, np.ndarray]:
    """Decode GIF bytes -> ((F, H, W) uint8 indices, (n, 3) palette).

    Validates the signature, screen descriptor, per-frame geometry
    (full canvas, no interlace, no local color table), the LZW pixel
    count, and the trailer; unknown extensions are skipped by their
    sub-block chains."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF: bad signature")
    if len(data) < 13:
        raise ValueError("truncated GIF: short screen descriptor")
    w, h, packed, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
    if not packed & 0x80:
        raise ValueError("missing global color table")
    n_table = 2 << (packed & 0x07)
    pos = 13
    palette = np.frombuffer(
        data[pos:pos + 3 * n_table], np.uint8).reshape(n_table, 3).copy()
    pos += 3 * n_table
    frames = []
    while True:
        if pos >= len(data):
            raise ValueError("truncated GIF: missing trailer")
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-block chain
            pos += 1
            while pos < len(data) and data[pos] != 0:
                pos += 1 + data[pos]
            if pos >= len(data):
                raise ValueError("truncated GIF: unterminated extension")
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unknown block 0x{block:02x} at {pos - 1}")
        if pos + 10 > len(data):
            raise ValueError("truncated GIF: short image descriptor")
        left, top, fw, fh, fpacked = struct.unpack(
            "<HHHHB", data[pos:pos + 9])
        pos += 9
        if (left, top, fw, fh) != (0, 0, w, h):
            raise ValueError(
                f"unsupported sub-canvas frame {left},{top} {fw}x{fh} "
                f"on {w}x{h} canvas")
        if fpacked & 0x80:
            raise ValueError("unsupported local color table")
        if fpacked & 0x40:
            raise ValueError("unsupported interlaced frame")
        min_code = data[pos]
        pos += 1
        if not 2 <= min_code <= 11:
            raise ValueError(f"bad LZW min code size {min_code}")
        stream = bytearray()
        while pos < len(data) and data[pos] != 0:
            n = data[pos]
            if pos + 1 + n > len(data):
                raise ValueError("truncated GIF: short data sub-block")
            stream += data[pos + 1:pos + 1 + n]
            pos += 1 + n
        if pos >= len(data):
            raise ValueError("truncated GIF: unterminated image data")
        pos += 1
        idx = _lzw_decode(bytes(stream), min_code, w * h)
        frames.append(np.frombuffer(idx, np.uint8).reshape(h, w))
    if not frames:
        raise ValueError("GIF contains no image block")
    return np.stack(frames), palette
