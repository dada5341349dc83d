"""Pure-stdlib/numpy baseline JPEG codec (8-bit grayscale) for the
multimodal decode path — the last honest stub in the engine.

The container ships no image libraries, but baseline sequential JPEG
(ITU-T T.81 / ISO 10918-1, the public spec) needs nothing beyond
`struct` + numpy: marker segments (DQT/SOF0/DHT/SOS), canonical
Huffman codes built from the Annex K BITS/HUFFVAL tables, zigzag
run-length entropy coding of quantized 8x8 DCT blocks, and the
type-II DCT pair. Implementing both directions here upgrades the JPEG
leg of operators/multimodal.py from stub to REAL, the same way
png_codec.py / wav_codec.py did for PNG and WAV in round 4.

Scope (documented, checked loudly): baseline sequential, ONE 8-bit
component (grayscale), dimensions multiples of 8, no restart markers,
no progressive/arithmetic coding — the common denominator for
training-data thumbnails, and everything the synthetic fixtures use.
Anything else raises ValueError naming the unsupported field.

Exactness device for the SQL oracle: JPEG is lossy in general, but an
image built from CONSTANT 8x8 tiles whose level-shifted values are
EVEN survives the round trip bit-exactly — a constant block has only
a DC coefficient, DC = 8*(v-128) with the standard luminance DC
quantizer 16, so quantize/dequantize is exact whenever (v-128) is
even and the float DCT's ~1e-13 AC residue quantizes to zero. The
fixture generator emits exactly such tiles, so the oracle can
regenerate every pixel arithmetically while the engine runs the full
Huffman+IDCT pipeline — the asymmetry that proves the decode is real
(the same device as the PNG pixel-formula oracle).

Scale: encode/decode run inside Arrow-batched mapInPandas kernels,
one image per row; rows parallelize across executors. The DCT is two
numpy matmuls per block (vectorized over all blocks at once); only
the entropy coding is a Python loop, linear in coded symbols.
"""

from __future__ import annotations

import struct

import numpy as np

# Annex K (public spec) luminance quantization table, zigzag order NOT
# applied here — this is row-major natural order.
STD_QUANT = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99]], dtype=np.int32)

# Annex K standard Huffman tables (luminance DC + AC): BITS (count of
# codes per length 1..16) and HUFFVAL (symbols in code order).
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]

# zigzag scan order: ZIGZAG[k] = (row, col) of the k-th coefficient.
# Odd anti-diagonals run top-right -> bottom-left (row ascending),
# even ones bottom-left -> top-right (col ascending).
ZIGZAG = sorted(((r, c) for r in range(8) for c in range(8)),
                key=lambda rc: (rc[0] + rc[1],
                                rc[0] if (rc[0] + rc[1]) % 2 else rc[1]))

# DCT-II orthonormal basis matrix: block_dct = C @ block @ C.T
_k = np.arange(8)
_C = np.sqrt(2.0 / 8.0) * np.cos((2 * _k[None, :] + 1)
                                 * _k[:, None] * np.pi / 16.0)
_C[0, :] = np.sqrt(1.0 / 8.0)


def build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman: symbol -> (code, length)."""
    out, code, idx = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[idx]] = (code, length)
            code += 1
            idx += 1
        code <<= 1
    return out


def build_decode_map(bits: list[int], vals: list[int]
                     ) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol."""
    return {(length, code): sym
            for sym, (code, length) in build_codes(bits, vals).items()}


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            byte = (self._acc >> (self._n - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:          # byte stuffing
                self.buf.append(0x00)
            self._n -= 8
        self._acc &= (1 << self._n) - 1

    def flush(self) -> None:
        if self._n:
            pad = 8 - self._n
            self.write((1 << pad) - 1, pad)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self._acc = 0
        self._n = 0

    def read_bit(self) -> int:
        if self._n == 0:
            if self.pos >= len(self.data):
                raise ValueError("JPEG: entropy stream truncated")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.data):
                    raise ValueError("JPEG: dangling 0xFF in stream")
                marker = self.data[self.pos]
                if marker == 0x00:
                    self.pos += 1     # stuffed byte
                else:
                    raise ValueError(
                        f"JPEG: unexpected marker 0xFF{marker:02X} "
                        f"inside entropy data")
            self._acc = b
            self._n = 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _category(v: int) -> int:
    """Bit size of |v| (0 for 0)."""
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _amplitude_bits(v: int, size: int) -> int:
    """JPEG signed-amplitude encoding (ones' complement negatives)."""
    return v if v >= 0 else v + (1 << size) - 1


def _extend(bits: int, size: int) -> int:
    """Inverse of _amplitude_bits."""
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def encode_jpeg(img: np.ndarray, quant: np.ndarray = STD_QUANT) -> bytes:
    """Baseline-sequential grayscale encode. `img` is (h, w) uint8
    with h, w multiples of 8."""
    if img.ndim != 2:
        raise ValueError("encode_jpeg: grayscale (h, w) arrays only")
    h, w = img.shape
    if h % 8 or w % 8:
        raise ValueError("encode_jpeg: dimensions must be multiples of 8")

    blocks = (img.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)
              .reshape(-1, 8, 8).astype(np.float64) - 128.0)
    dct = np.einsum("ij,njk,lk->nil", _C, blocks, _C)
    q = np.floor(dct / quant[None, :, :] + 0.5).astype(np.int64)

    dc_codes = build_codes(DC_BITS, DC_VALS)
    ac_codes = build_codes(AC_BITS, AC_VALS)
    bw = _BitWriter()
    prev_dc = 0
    for blk in q:
        zz = [int(blk[r, c]) for (r, c) in ZIGZAG]
        diff = zz[0] - prev_dc
        prev_dc = zz[0]
        size = _category(diff)
        code, length = dc_codes[size]
        bw.write(code, length)
        if size:
            bw.write(_amplitude_bits(diff, size), size)
        run = 0
        last_nz = max((k for k in range(1, 64) if zz[k]), default=0)
        for k in range(1, last_nz + 1):
            v = zz[k]
            if v == 0:
                run += 1
                continue
            while run > 15:
                c, ln = ac_codes[0xF0]    # ZRL
                bw.write(c, ln)
                run -= 16
            size = _category(v)
            c, ln = ac_codes[(run << 4) | size]
            bw.write(c, ln)
            bw.write(_amplitude_bits(v, size), size)
            run = 0
        if last_nz < 63:
            c, ln = ac_codes[0x00]        # EOB
            bw.write(c, ln)
    bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    zz_quant = bytes(int(quant[r, c]) for (r, c) in ZIGZAG)
    out = b"\xFF\xD8"                                  # SOI
    out += seg(0xFFDB, b"\x00" + zz_quant)             # DQT, table 0
    out += seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 1)
               + bytes([1, 0x11, 0]))                  # SOF0, 1 comp
    out += seg(0xFFC4, b"\x00" + bytes(DC_BITS) + bytes(DC_VALS))
    out += seg(0xFFC4, b"\x10" + bytes(AC_BITS) + bytes(AC_VALS))
    out += seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))  # SOS
    out += bytes(bw.buf)
    out += b"\xFF\xD9"                                 # EOI
    return out


def decode_jpeg(data: bytes) -> np.ndarray:
    """Parse + entropy-decode + dequantize + IDCT a baseline grayscale
    JPEG produced by any conforming encoder within the documented
    scope. Returns (h, w) uint8."""
    if data[:2] != b"\xFF\xD8":
        raise ValueError("JPEG: missing SOI")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    h = w = -1
    comp_q = comp_dc = comp_ac = 0
    while True:
        if data[pos] != 0xFF:
            raise ValueError(f"JPEG: expected marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:
            raise ValueError("JPEG: EOI before SOS")
        if pos + 2 > len(data):
            raise ValueError("JPEG: truncated before segment length")
        (seglen,) = struct.unpack(">H", data[pos:pos + 2])
        payload = data[pos + 2:pos + seglen]
        if len(payload) != seglen - 2:
            raise ValueError("JPEG: truncated segment payload")
        if marker == 0xDB:
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0x0F
                if pq != 0:
                    raise ValueError("JPEG: only 8-bit quant tables")
                tbl = np.zeros((8, 8), dtype=np.int32)
                for k, (r, c) in enumerate(ZIGZAG):
                    tbl[r, c] = payload[p + 1 + k]
                quant[tq] = tbl
                p += 65
        elif marker == 0xC0:
            prec, h, w, nf = struct.unpack(">BHHB", payload[:6])
            if prec != 8 or nf != 1:
                raise ValueError(
                    f"JPEG: unsupported precision {prec} / {nf} "
                    f"components (baseline grayscale only)")
            cid, sampling, comp_q = payload[6], payload[7], payload[8]
            if sampling != 0x11:
                raise ValueError("JPEG: subsampling unsupported")
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"JPEG: non-baseline SOF 0xFF{marker:02X}")
        elif marker == 0xC4:
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 0x0F
                bits = list(payload[p + 1:p + 17])
                n = sum(bits)
                vals = list(payload[p + 17:p + 17 + n])
                dmap = build_decode_map(bits, vals)
                (huff_dc if tc == 0 else huff_ac)[th] = dmap
                p += 17 + n
        elif marker == 0xDA:
            ns = payload[0]
            if ns != 1:
                raise ValueError("JPEG: one scan component only")
            comp_dc = payload[2] >> 4
            comp_ac = payload[2] & 0x0F
            pos += seglen
            break
        elif marker == 0xDD:
            raise ValueError("JPEG: restart markers unsupported")
        pos += seglen
    if h < 0 or h % 8 or w % 8:
        raise ValueError("JPEG: dimensions must be multiples of 8")

    end = data.rfind(b"\xFF\xD9")
    if end < 0:
        raise ValueError("JPEG: missing EOI")
    br = _BitReader(data[pos:end])
    dc_map, ac_map = huff_dc[comp_dc], huff_ac[comp_ac]
    qtbl = quant[comp_q]

    def read_symbol(dmap: dict) -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | br.read_bit()
            length += 1
            sym = dmap.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("JPEG: invalid Huffman code")

    n_blocks = (h // 8) * (w // 8)
    coeffs = np.zeros((n_blocks, 8, 8), dtype=np.float64)
    prev_dc = 0
    for b in range(n_blocks):
        size = read_symbol(dc_map)
        diff = _extend(br.read_bits(size), size)
        prev_dc += diff
        coeffs[b, 0, 0] = prev_dc
        k = 1
        while k < 64:
            sym = read_symbol(ac_map)
            if sym == 0x00:           # EOB
                break
            run, size = sym >> 4, sym & 0x0F
            if sym == 0xF0:           # ZRL
                k += 16
                continue
            k += run
            if k > 63:
                raise ValueError("JPEG: AC run past block end")
            r, c = ZIGZAG[k]
            coeffs[b, r, c] = _extend(br.read_bits(size), size)
            k += 1

    deq = coeffs * qtbl[None, :, :]
    pix = np.einsum("ji,njk,kl->nil", _C, deq, _C) + 128.0
    pix = np.clip(np.floor(pix + 0.5), 0, 255).astype(np.uint8)
    return (pix.reshape(h // 8, w // 8, 8, 8).transpose(0, 2, 1, 3)
            .reshape(h, w))


# ----------------------------------------------------------- color
# Baseline YCbCr 4:2:0 (JFIF): Y at full resolution (2x2 sampling
# factors), Cb/Cr quarter resolution, MCU = 16x16 pixels = 4 Y blocks
# + 1 Cb + 1 Cr, interleaved in the single scan. Chrominance uses the
# Annex K chroma quantization + Huffman tables.

STD_QUANT_CHROMA = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99]], dtype=np.int32)

DC_BITS_CHROMA = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_VALS_CHROMA = list(range(12))
AC_BITS_CHROMA = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_VALS_CHROMA = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]


def rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    """JFIF RGB -> YCbCr, rounded half-up to uint8 (the integer
    pinning that makes the downstream pipeline arithmetic)."""
    r = img[..., 0].astype(np.float64)
    g = img[..., 1].astype(np.float64)
    b = img[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    out = np.stack([y, cb, cr], axis=-1)
    return np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8)


def ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    """JFIF YCbCr -> RGB, rounded half-up to uint8."""
    y = ycc[..., 0].astype(np.float64)
    cb = ycc[..., 1].astype(np.float64) - 128.0
    cr = ycc[..., 2].astype(np.float64) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    out = np.stack([r, g, b], axis=-1)
    return np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8)


def _blocks_of(plane: np.ndarray) -> np.ndarray:
    h, w = plane.shape
    return (plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)
            .reshape(-1, 8, 8))


def _encode_block(bw: "_BitWriter", blk: np.ndarray, prev_dc: int,
                  dc_codes: dict, ac_codes: dict) -> int:
    zz = [int(blk[r, c]) for (r, c) in ZIGZAG]
    diff = zz[0] - prev_dc
    size = _category(diff)
    code, length = dc_codes[size]
    bw.write(code, length)
    if size:
        bw.write(_amplitude_bits(diff, size), size)
    run = 0
    last_nz = max((k for k in range(1, 64) if zz[k]), default=0)
    for k in range(1, last_nz + 1):
        v = zz[k]
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_codes[0xF0]
            bw.write(c, ln)
            run -= 16
        size = _category(v)
        c, ln = ac_codes[(run << 4) | size]
        bw.write(c, ln)
        bw.write(_amplitude_bits(v, size), size)
        run = 0
    if last_nz < 63:
        c, ln = ac_codes[0x00]
        bw.write(c, ln)
    return zz[0]


def encode_jpeg_color(img: np.ndarray,
                      quant_y: np.ndarray = STD_QUANT,
                      quant_c: np.ndarray = STD_QUANT_CHROMA) -> bytes:
    """Baseline-sequential YCbCr 4:2:0 color encode. `img` is
    (h, w, 3) uint8 RGB with h, w multiples of 16 (one MCU = 16x16).
    Chroma is box-subsampled with the exact integer mean
    (sum + 2) >> 2 — deterministic, no float."""
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("encode_jpeg_color: (h, w, 3) RGB arrays only")
    h, w = img.shape[:2]
    if h % 16 or w % 16:
        raise ValueError(
            "encode_jpeg_color: dimensions must be multiples of 16")

    ycc = rgb_to_ycbcr(img).astype(np.int64)
    yp = ycc[..., 0]
    sub = ycc[:, :, 1:].reshape(h // 2, 2, w // 2, 2, 2)
    cbcr = (sub.sum(axis=(1, 3)) + 2) >> 2     # exact integer box mean
    cbp, crp = cbcr[..., 0], cbcr[..., 1]

    def quantized(plane, qt):
        blocks = _blocks_of(plane).astype(np.float64) - 128.0
        dct = np.einsum("ij,njk,lk->nil", _C, blocks, _C)
        return np.floor(dct / qt[None, :, :] + 0.5).astype(np.int64)

    qy = quantized(yp, quant_y)
    qcb = quantized(cbp, quant_c)
    qcr = quantized(crp, quant_c)

    dc_y = build_codes(DC_BITS, DC_VALS)
    ac_y = build_codes(AC_BITS, AC_VALS)
    dc_c = build_codes(DC_BITS_CHROMA, DC_VALS_CHROMA)
    ac_c = build_codes(AC_BITS_CHROMA, AC_VALS_CHROMA)

    mcu_w, mcu_h = w // 16, h // 16
    yblk_w = w // 8
    bw = _BitWriter()
    pdc = [0, 0, 0]
    for my in range(mcu_h):
        for mx in range(mcu_w):
            for by in range(2):
                for bx in range(2):
                    idx = (my * 2 + by) * yblk_w + (mx * 2 + bx)
                    pdc[0] = _encode_block(bw, qy[idx], pdc[0],
                                           dc_y, ac_y)
            cidx = my * mcu_w + mx
            pdc[1] = _encode_block(bw, qcb[cidx], pdc[1], dc_c, ac_c)
            pdc[2] = _encode_block(bw, qcr[cidx], pdc[2], dc_c, ac_c)
    bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    zq_y = bytes(int(quant_y[r, c]) for (r, c) in ZIGZAG)
    zq_c = bytes(int(quant_c[r, c]) for (r, c) in ZIGZAG)
    out = b"\xFF\xD8"
    out += seg(0xFFDB, b"\x00" + zq_y)
    out += seg(0xFFDB, b"\x01" + zq_c)
    out += seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 3)
               + bytes([1, 0x22, 0])       # Y: 2x2 sampling, qtable 0
               + bytes([2, 0x11, 1])       # Cb
               + bytes([3, 0x11, 1]))      # Cr
    out += seg(0xFFC4, b"\x00" + bytes(DC_BITS) + bytes(DC_VALS))
    out += seg(0xFFC4, b"\x10" + bytes(AC_BITS) + bytes(AC_VALS))
    out += seg(0xFFC4, b"\x01" + bytes(DC_BITS_CHROMA)
               + bytes(DC_VALS_CHROMA))
    out += seg(0xFFC4, b"\x11" + bytes(AC_BITS_CHROMA)
               + bytes(AC_VALS_CHROMA))
    out += seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    out += bytes(bw.buf)
    out += b"\xFF\xD9"
    return out


def decode_jpeg_color(data: bytes) -> np.ndarray:
    """Full baseline YCbCr 4:2:0 color decode: marker parse (two
    quant + four Huffman tables), MCU-interleaved entropy decode with
    per-component DC predictors, dequantize + IDCT per block, 2x2
    nearest-neighbor chroma upsample, integer-pinned YCbCr -> RGB.
    Returns (h, w, 3) uint8. Closes the color half of the
    multimodal.py JPEG guard (grayscale images go through
    decode_jpeg)."""
    if data[:2] != b"\xFF\xD8":
        raise ValueError("JPEG: missing SOI")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    h = w = -1
    comps: list[tuple[int, int, int]] = []     # (cid, sampling, tq)
    scan_sel: dict[int, tuple[int, int]] = {}  # cid -> (dc_id, ac_id)
    while True:
        if data[pos] != 0xFF:
            raise ValueError(f"JPEG: expected marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:
            raise ValueError("JPEG: EOI before SOS")
        (seglen,) = struct.unpack(">H", data[pos:pos + 2])
        payload = data[pos + 2:pos + seglen]
        if len(payload) != seglen - 2:
            raise ValueError("JPEG: truncated segment payload")
        if marker == 0xDB:
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0x0F
                if pq != 0:
                    raise ValueError("JPEG: only 8-bit quant tables")
                tbl = np.zeros((8, 8), dtype=np.int32)
                for k, (r, c) in enumerate(ZIGZAG):
                    tbl[r, c] = payload[p + 1 + k]
                quant[tq] = tbl
                p += 65
        elif marker == 0xC0:
            prec, h, w, nf = struct.unpack(">BHHB", payload[:6])
            if prec != 8 or nf != 3:
                raise ValueError(
                    f"JPEG: decode_jpeg_color expects 3 components, "
                    f"got {nf} (precision {prec})")
            for ci in range(3):
                cid = payload[6 + 3 * ci]
                sampling = payload[7 + 3 * ci]
                tq = payload[8 + 3 * ci]
                comps.append((cid, sampling, tq))
            if (comps[0][1] != 0x22 or comps[1][1] != 0x11
                    or comps[2][1] != 0x11):
                raise ValueError(
                    "JPEG: only 4:2:0 (Y 2x2, chroma 1x1) supported")
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"JPEG: non-baseline SOF 0xFF{marker:02X}")
        elif marker == 0xC4:
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 0x0F
                bits = list(payload[p + 1:p + 17])
                n = sum(bits)
                vals = list(payload[p + 17:p + 17 + n])
                dmap = build_decode_map(bits, vals)
                (huff_dc if tc == 0 else huff_ac)[th] = dmap
                p += 17 + n
        elif marker == 0xDA:
            ns = payload[0]
            if ns != 3:
                raise ValueError("JPEG: expected 3 scan components")
            for ci in range(3):
                cid = payload[1 + 2 * ci]
                sel = payload[2 + 2 * ci]
                scan_sel[cid] = (sel >> 4, sel & 0x0F)
            pos += seglen
            break
        elif marker == 0xDD:
            raise ValueError("JPEG: restart markers unsupported")
        pos += seglen
    if h < 0 or h % 16 or w % 16:
        raise ValueError("JPEG: dimensions must be multiples of 16")

    end = data.rfind(b"\xFF\xD9")
    if end < 0:
        raise ValueError("JPEG: missing EOI")
    br = _BitReader(data[pos:end])

    def read_symbol(dmap: dict) -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | br.read_bit()
            length += 1
            sym = dmap.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("JPEG: invalid Huffman code")

    def read_block(dmap_dc: dict, dmap_ac: dict,
                   prev_dc: int) -> tuple[np.ndarray, int]:
        blk = np.zeros((8, 8), dtype=np.float64)
        size = read_symbol(dmap_dc)
        diff = _extend(br.read_bits(size), size)
        dc = prev_dc + diff
        blk[0, 0] = dc
        k = 1
        while k < 64:
            sym = read_symbol(dmap_ac)
            if sym == 0x00:
                break
            if sym == 0xF0:
                k += 16
                continue
            run, size = sym >> 4, sym & 0x0F
            k += run
            if k > 63:
                raise ValueError("JPEG: AC run past block end")
            r, c = ZIGZAG[k]
            blk[r, c] = _extend(br.read_bits(size), size)
            k += 1
        return blk, dc

    mcu_w, mcu_h = w // 16, h // 16
    yblk_w = w // 8
    y_coeff = np.zeros(((h // 8) * (w // 8), 8, 8))
    cb_coeff = np.zeros((mcu_h * mcu_w, 8, 8))
    cr_coeff = np.zeros((mcu_h * mcu_w, 8, 8))
    sel = [scan_sel[comps[i][0]] for i in range(3)]
    pdc = [0, 0, 0]
    for my in range(mcu_h):
        for mx in range(mcu_w):
            for by in range(2):
                for bx in range(2):
                    blk, pdc[0] = read_block(huff_dc[sel[0][0]],
                                             huff_ac[sel[0][1]], pdc[0])
                    y_coeff[(my * 2 + by) * yblk_w + mx * 2 + bx] = blk
            ci = my * mcu_w + mx
            blk, pdc[1] = read_block(huff_dc[sel[1][0]],
                                     huff_ac[sel[1][1]], pdc[1])
            cb_coeff[ci] = blk
            blk, pdc[2] = read_block(huff_dc[sel[2][0]],
                                     huff_ac[sel[2][1]], pdc[2])
            cr_coeff[ci] = blk

    def to_plane(coeffs, qt, ph, pw):
        deq = coeffs * qt[None, :, :].astype(np.float64)
        pix = np.einsum("ji,njk,kl->nil", _C, deq, _C) + 128.0
        pix = np.clip(np.floor(pix + 0.5), 0, 255)
        return (pix.reshape(ph // 8, pw // 8, 8, 8)
                .transpose(0, 2, 1, 3).reshape(ph, pw))

    yp = to_plane(y_coeff, quant[comps[0][2]], h, w)
    cbp = to_plane(cb_coeff, quant[comps[1][2]], h // 2, w // 2)
    crp = to_plane(cr_coeff, quant[comps[2][2]], h // 2, w // 2)
    cb_up = np.repeat(np.repeat(cbp, 2, axis=0), 2, axis=1)
    cr_up = np.repeat(np.repeat(crp, 2, axis=0), 2, axis=1)
    ycc = np.stack([yp, cb_up, cr_up], axis=-1).astype(np.uint8)
    return ycbcr_to_rgb(ycc)


# ----------------------------------------------------- progressive
# Baseline PROGRESSIVE (SOF2, Huffman) for one 8-bit component:
# spectral selection + successive approximation per ITU-T T.81 G.1/G.2
# — multiple scans refine the same quantized coefficient array, so a
# progressive stream is a LOSSLESS re-encoding of the baseline
# quantized data: with a refinement script that reaches Al=0,
# decode(encode_progressive(img)) is pixel-identical to the baseline
# round trip (tests assert exactly that). The default scan script
# mirrors the libjpeg family: DC(Al=1) -> low AC band -> high AC band
# -> AC refine -> DC refine.

DEFAULT_PROGRESSIVE_SCANS = (
    # (Ss, Se, Ah, Al)
    (0, 0, 0, 1),     # DC first, point transform 1
    (1, 5, 0, 2),     # AC 1-5 first, Al=2
    (6, 63, 0, 2),    # AC 6-63 first, Al=2
    (1, 63, 2, 1),    # AC refine Al 2->1
    (1, 63, 1, 0),    # AC refine Al 1->0
    (0, 0, 1, 0),     # DC refine Al 1->0
)


def _quantized_blocks(img: np.ndarray,
                      quant: np.ndarray) -> np.ndarray:
    h, w = img.shape
    blocks = (img.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)
              .reshape(-1, 8, 8).astype(np.float64) - 128.0)
    dct = np.einsum("ij,njk,lk->nil", _C, blocks, _C)
    return np.floor(dct / quant[None, :, :] + 0.5).astype(np.int64)


def _pt_ac(v: int, al: int) -> int:
    """AC point transform: magnitude shift toward zero (T.81 A.4)."""
    return v >> al if v >= 0 else -((-v) >> al)


def _encode_dc_first(bw: "_BitWriter", zz: list[list[int]],
                     al: int, dc_codes: dict) -> None:
    prev = 0
    for blk in zz:
        val = blk[0] >> al          # DC point transform: arithmetic
        diff = val - prev
        prev = val
        size = _category(diff)
        c, ln = dc_codes[size]
        bw.write(c, ln)
        if size:
            bw.write(_amplitude_bits(diff, size), size)


def _encode_dc_refine(bw: "_BitWriter", zz: list[list[int]],
                      al: int) -> None:
    for blk in zz:
        bw.write((blk[0] >> al) & 1, 1)


def _encode_ac_first(bw: "_BitWriter", zz: list[list[int]],
                     ss: int, se: int, al: int,
                     ac_codes: dict) -> None:
    eobrun = 0

    def flush_eob():
        # one EOBn symbol encodes any run in [2^n, 2^(n+1)-1] via n
        # extra bits; n = bit_length-1 covers every run below 2^15
        # (the 0x7FFF cap below)
        nonlocal eobrun
        if eobrun:
            n = eobrun.bit_length() - 1
            c, ln = ac_codes[n << 4]
            bw.write(c, ln)
            if n:
                bw.write(eobrun - (1 << n), n)
            eobrun = 0

    for blk in zz:
        band = [_pt_ac(blk[k], al) for k in range(ss, se + 1)]
        if not any(band):
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
            continue
        flush_eob()
        run = 0
        last_nz = max(i for i, v in enumerate(band) if v)
        for i in range(last_nz + 1):
            v = band[i]
            if v == 0:
                run += 1
                continue
            while run > 15:
                c, ln = ac_codes[0xF0]
                bw.write(c, ln)
                run -= 16
            size = _category(v)
            c, ln = ac_codes[(run << 4) | size]
            bw.write(c, ln)
            bw.write(_amplitude_bits(v, size), size)
            run = 0
        if last_nz < se - ss:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()


def _encode_ac_refine(bw: "_BitWriter", zz: list[list[int]],
                      ss: int, se: int, ah: int, al: int,
                      ac_codes: dict) -> None:
    """G.1.2.3: newly-significant coefficients (|v| >> al == 1 while
    |v| >> ah == 0) are coded with size-1 symbols whose run counts
    ZERO-HISTORY positions; every already-significant position on the
    way emits one correction bit; EOB runs carry the pending
    correction bits of the skipped blocks."""
    eobrun = 0
    pending_eob_bits: list[int] = []

    def flush_eob():
        nonlocal eobrun, pending_eob_bits
        if eobrun:
            n = eobrun.bit_length() - 1
            c, ln = ac_codes[n << 4]
            bw.write(c, ln)
            if n:
                bw.write(eobrun - (1 << n), n)
            for b in pending_eob_bits:
                bw.write(b, 1)
            eobrun = 0
            pending_eob_bits = []

    for blk in zz:
        band = blk[ss:se + 1]
        hist = [_pt_ac(v, ah) for v in band]      # known so far
        now = [_pt_ac(v, al) for v in band]       # after this scan
        newly = [i for i in range(len(band))
                 if hist[i] == 0 and now[i] != 0]
        if not newly:
            # whole band is history-only: EOB run; corrections queue
            eobrun += 1
            for i in range(len(band)):
                if hist[i] != 0:
                    pending_eob_bits.append(abs(now[i]) & 1)
            if eobrun == 0x7FFF:
                flush_eob()
            continue
        flush_eob()
        run = 0
        correction: list[int] = []
        for i in range(len(band)):
            if hist[i] != 0:
                # already significant: one correction bit, carried
                # with the NEXT coded symbol
                correction.append(abs(now[i]) & 1)
                continue
            if now[i] == 0:
                run += 1
                continue
            # newly significant (now is +-1 by construction)
            while run > 15:
                c, ln = ac_codes[0xF0]
                bw.write(c, ln)
                for b in correction:
                    bw.write(b, 1)
                correction = []
                run -= 16
            c, ln = ac_codes[(run << 4) | 1]
            bw.write(c, ln)
            bw.write(1 if now[i] > 0 else 0, 1)   # sign bit
            for b in correction:
                bw.write(b, 1)
            correction = []
            run = 0
        if run or correction:
            # trailing zero-history run with no further significance:
            # fold into the EOB run of following blocks
            eobrun += 1
            pending_eob_bits.extend(correction)
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()


def encode_jpeg_progressive(
        img: np.ndarray, quant: np.ndarray = STD_QUANT,
        scans: tuple = DEFAULT_PROGRESSIVE_SCANS) -> bytes:
    """Progressive (SOF2) grayscale encode with the given scan script.
    The script must end with every coefficient refined to Al=0 for the
    lossless-reencoding property the tests assert."""
    if img.ndim != 2:
        raise ValueError("encode_jpeg_progressive: grayscale only")
    h, w = img.shape
    if h % 8 or w % 8:
        raise ValueError(
            "encode_jpeg_progressive: dimensions must be multiples of 8")
    q = _quantized_blocks(img, quant)
    zz = [[int(blk[r, c]) for (r, c) in ZIGZAG] for blk in q]

    dc_codes = build_codes(DC_BITS, DC_VALS)

    class _SymbolRecorder(dict):
        """Stands in for an AC code table during the dry run: records
        which symbols a scan emits (progressive scans need EOBn
        symbols the Annex K baseline AC table does not define, so
        each AC scan ships its own table — the spec's per-scan DHT
        mechanism, which the decoder accepts mid-stream)."""

        def __init__(self) -> None:
            super().__init__()
            self.used: set[int] = set()

        def __getitem__(self, k: int) -> tuple[int, int]:
            self.used.add(k)
            return (0, 0)

    def _scan_table(used: set[int]) -> tuple[list[int], list[int]]:
        """Legal canonical table: every used symbol at one fixed code
        length L with n < 2^L, keeping the all-ones codeword of any
        length reserved (T.81 C.2)."""
        syms = sorted(used)
        length = max(2, (len(syms)).bit_length())
        if len(syms) >= (1 << length):
            length += 1
        bits = [0] * 16
        bits[length - 1] = len(syms)
        return bits, syms

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    zz_quant = bytes(int(quant[r, c]) for (r, c) in ZIGZAG)
    out = b"\xFF\xD8"
    out += seg(0xFFDB, b"\x00" + zz_quant)
    out += seg(0xFFC2, struct.pack(">BHHB", 8, h, w, 1)
               + bytes([1, 0x11, 0]))              # SOF2
    out += seg(0xFFC4, b"\x00" + bytes(DC_BITS) + bytes(DC_VALS))
    for (ss, se, ah, al) in scans:
        bw = _BitWriter()
        if ss == 0:
            if se != 0:
                raise ValueError("progressive: DC scan must be Ss=Se=0")
            if ah == 0:
                _encode_dc_first(bw, zz, al, dc_codes)
            else:
                _encode_dc_refine(bw, zz, al)
            sel = 0x00
        else:
            rec = _SymbolRecorder()
            null = _BitWriter()
            if ah == 0:
                _encode_ac_first(null, zz, ss, se, al, rec)
            else:
                _encode_ac_refine(null, zz, ss, se, ah, al, rec)
            bits, vals = _scan_table(rec.used or {0x00})
            out += seg(0xFFC4, b"\x10" + bytes(bits) + bytes(vals))
            ac_codes = build_codes(bits, vals)
            if ah == 0:
                _encode_ac_first(bw, zz, ss, se, al, ac_codes)
            else:
                _encode_ac_refine(bw, zz, ss, se, ah, al, ac_codes)
            sel = 0x10
        bw.flush()
        out += seg(0xFFDA, bytes([1, 1, sel, ss, se, (ah << 4) | al]))
        out += bytes(bw.buf)
    out += b"\xFF\xD9"
    return out


def _next_marker(data: bytes, pos: int) -> int:
    """Index of the next real marker (0xFF followed by neither 0x00
    stuffing nor an RST) at/after pos."""
    while True:
        nxt = data.find(b"\xFF", pos)
        if nxt < 0 or nxt + 1 >= len(data):
            raise ValueError("JPEG: entropy stream ran off the file")
        m = data[nxt + 1]
        if m == 0x00 or 0xD0 <= m <= 0xD7:
            pos = nxt + 2
            continue
        return nxt


def decode_jpeg_progressive(data: bytes) -> np.ndarray:
    """Full progressive (SOF2, Huffman) grayscale decode: spectral
    selection AND successive approximation, per T.81 G.2 — DC
    first/refinement, AC first scans with EOBn end-of-band runs, AC
    refinement with correction bits. Accepts tables redefined between
    scans. Returns (h, w) uint8."""
    if data[:2] != b"\xFF\xD8":
        raise ValueError("JPEG: missing SOI")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    h = w = -1
    comp_q = 0
    coef = None          # (n_blocks, 64) zigzag-order coefficients
    n_blocks = 0
    dc_pred = 0

    def read_symbol(br: "_BitReader", dmap: dict) -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | br.read_bit()
            length += 1
            sym = dmap.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("JPEG: invalid Huffman code")

    while True:
        if data[pos] != 0xFF:
            raise ValueError(f"JPEG: expected marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:          # EOI
            break
        (seglen,) = struct.unpack(">H", data[pos:pos + 2])
        payload = data[pos + 2:pos + seglen]
        if len(payload) != seglen - 2:
            raise ValueError("JPEG: truncated segment payload")
        if marker == 0xDB:
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0x0F
                if pq != 0:
                    raise ValueError("JPEG: only 8-bit quant tables")
                tbl = np.zeros((8, 8), dtype=np.int32)
                for k, (r, c) in enumerate(ZIGZAG):
                    tbl[r, c] = payload[p + 1 + k]
                quant[tq] = tbl
                p += 65
        elif marker == 0xC2:
            prec, h, w, nf = struct.unpack(">BHHB", payload[:6])
            if prec != 8 or nf != 1:
                raise ValueError(
                    "JPEG: progressive decoder expects one 8-bit "
                    f"component, got {nf} (precision {prec})")
            if h % 8 or w % 8:
                raise ValueError(
                    "JPEG: dimensions must be multiples of 8")
            comp_q = payload[8]
            n_blocks = (h // 8) * (w // 8)
            coef = np.zeros((n_blocks, 64), dtype=np.int64)
        elif marker in (0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"JPEG: SOF 0xFF{marker:02X} is not progressive-"
                f"Huffman (use decode_jpeg/_color for baseline)")
        elif marker == 0xC4:
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 0x0F
                bits = list(payload[p + 1:p + 17])
                n = sum(bits)
                vals = list(payload[p + 17:p + 17 + n])
                (huff_dc if tc == 0 else huff_ac)[th] = \
                    build_decode_map(bits, vals)
                p += 17 + n
        elif marker == 0xDD:
            raise ValueError("JPEG: restart markers unsupported")
        elif marker == 0xDA:
            if coef is None:
                raise ValueError("JPEG: SOS before SOF2")
            ns = payload[0]
            if ns != 1:
                raise ValueError("JPEG: one scan component only")
            sel = payload[2]
            ss, se = payload[3], payload[4]
            ah, al = payload[5] >> 4, payload[5] & 0x0F
            scan_start = pos + seglen
            scan_end = _next_marker(data, scan_start)
            br = _BitReader(data[scan_start:scan_end])
            if ss == 0:
                if se != 0:
                    raise ValueError("JPEG: DC scan must be Ss=Se=0")
                dmap = huff_dc[sel >> 4]
                if ah == 0:
                    dc_pred = 0
                    for b in range(n_blocks):
                        size = read_symbol(br, dmap)
                        dc_pred += _extend(br.read_bits(size), size)
                        coef[b, 0] = dc_pred << al
                else:
                    for b in range(n_blocks):
                        if br.read_bit():
                            coef[b, 0] |= 1 << al
            else:
                amap = huff_ac[sel & 0x0F]
                if ah == 0:
                    eobrun = 0
                    for b in range(n_blocks):
                        if eobrun:
                            eobrun -= 1
                            continue
                        k = ss
                        while k <= se:
                            sym = read_symbol(br, amap)
                            r, sz = sym >> 4, sym & 0x0F
                            if sz == 0:
                                if r < 15:
                                    eobrun = (1 << r) - 1
                                    if r:
                                        eobrun += br.read_bits(r)
                                    break
                                k += 16          # ZRL
                            else:
                                k += r
                                if k > se:
                                    raise ValueError(
                                        "JPEG: AC run past band end")
                                coef[b, k] = _extend(
                                    br.read_bits(sz), sz) << al
                                k += 1
                else:
                    p1, m1 = 1 << al, -1 << al
                    eobrun = 0
                    for b in range(n_blocks):
                        k = ss
                        if eobrun == 0:
                            while k <= se:
                                sym = read_symbol(br, amap)
                                r, sz = sym >> 4, sym & 0x0F
                                newval = 0
                                if sz == 0:
                                    if r < 15:
                                        eobrun = 1 << r
                                        if r:
                                            eobrun += br.read_bits(r)
                                        break
                                    # ZRL: r stays 15
                                else:
                                    if sz != 1:
                                        raise ValueError(
                                            "JPEG: refinement size "
                                            "must be 1")
                                    newval = p1 if br.read_bit() \
                                        else m1
                                # advance over r zero-HISTORY coeffs,
                                # correcting nonzero ones on the way
                                while k <= se:
                                    if coef[b, k] != 0:
                                        if br.read_bit() and \
                                                not (abs(coef[b, k])
                                                     & p1):
                                            coef[b, k] += (
                                                p1 if coef[b, k] > 0
                                                else m1)
                                    else:
                                        if r == 0:
                                            break
                                        r -= 1
                                    k += 1
                                if newval and k <= se:
                                    coef[b, k] = newval
                                k += 1
                        if eobrun:
                            # end-of-band: correction bits for the
                            # rest of this block, then consume one
                            while k <= se:
                                if coef[b, k] != 0:
                                    if br.read_bit() and \
                                            not (abs(coef[b, k])
                                                 & p1):
                                        coef[b, k] += (
                                            p1 if coef[b, k] > 0
                                            else m1)
                                k += 1
                            eobrun -= 1
            pos = scan_end
            continue
        pos += seglen

    if coef is None:
        raise ValueError("JPEG: no SOF2 frame found")
    qtbl = quant[comp_q]
    full = np.zeros((n_blocks, 8, 8), dtype=np.float64)
    for k, (r, c) in enumerate(ZIGZAG):
        full[:, r, c] = coef[:, k]
    deq = full * qtbl[None, :, :]
    pix = np.einsum("ji,njk,kl->nil", _C, deq, _C) + 128.0
    pix = np.clip(np.floor(pix + 0.5), 0, 255).astype(np.uint8)
    return (pix.reshape(h // 8, w // 8, 8, 8).transpose(0, 2, 1, 3)
            .reshape(h, w))


# ------------------------------------------- progressive (color)
# Progressive YCbCr 4:2:0: DC scans are INTERLEAVED (MCU order, all
# three components, per-component predictors/tables — T.81 allows
# interleave only for DC in progressive mode); AC scans are
# non-interleaved, one component per scan in that component's own
# block raster order. Scan script mirrors the libjpeg family.

DEFAULT_PROGRESSIVE_COLOR_SCANS = (
    # (comp, Ss, Se, Ah, Al); comp=-1 => interleaved DC (all three)
    (-1, 0, 0, 0, 1),
    (0, 1, 5, 0, 2),      # Y low band
    (1, 1, 63, 0, 1),     # Cb full band
    (2, 1, 63, 0, 1),     # Cr full band
    (0, 6, 63, 0, 2),     # Y high band
    (0, 1, 63, 2, 1),     # Y refine
    (1, 1, 63, 1, 0),     # Cb refine to full precision
    (2, 1, 63, 1, 0),     # Cr refine
    (0, 1, 63, 1, 0),     # Y refine to full precision
    (-1, 0, 0, 1, 0),     # DC refine (interleaved)
)


def encode_jpeg_progressive_color(
        img: np.ndarray,
        quant_y: np.ndarray = STD_QUANT,
        quant_c: np.ndarray = STD_QUANT_CHROMA,
        scans: tuple = DEFAULT_PROGRESSIVE_COLOR_SCANS) -> bytes:
    """Progressive (SOF2) YCbCr 4:2:0 color encode — the same
    quantized planes as encode_jpeg_color re-encoded through the
    multi-scan protocol, so the decode is pixel-identical to the
    baseline color round trip (tests assert it)."""
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError(
            "encode_jpeg_progressive_color: (h, w, 3) RGB arrays only")
    h, w = img.shape[:2]
    if h % 16 or w % 16:
        raise ValueError(
            "encode_jpeg_progressive_color: dims must be multiples of 16")

    ycc = rgb_to_ycbcr(img).astype(np.int64)
    yp = ycc[..., 0]
    sub = ycc[:, :, 1:].reshape(h // 2, 2, w // 2, 2, 2)
    cbcr = (sub.sum(axis=(1, 3)) + 2) >> 2
    cbp, crp = cbcr[..., 0], cbcr[..., 1]

    def zz_of(plane, qt):
        blocks = _blocks_of(plane).astype(np.float64) - 128.0
        dct = np.einsum("ij,njk,lk->nil", _C, blocks, _C)
        q = np.floor(dct / qt[None, :, :] + 0.5).astype(np.int64)
        return [[int(b[r, c]) for (r, c) in ZIGZAG] for b in q]

    comp_zz = [zz_of(yp, quant_y), zz_of(cbp, quant_c),
               zz_of(crp, quant_c)]
    dc_tbl = [build_codes(DC_BITS, DC_VALS),
              build_codes(DC_BITS_CHROMA, DC_VALS_CHROMA)]
    mcu_w, mcu_h = w // 16, h // 16
    yblk_w = w // 8

    def mcu_walk():
        """Yield (comp, block_idx) in interleaved MCU order."""
        for my in range(mcu_h):
            for mx in range(mcu_w):
                for by in range(2):
                    for bx in range(2):
                        yield 0, (my * 2 + by) * yblk_w + mx * 2 + bx
                yield 1, my * mcu_w + mx
                yield 2, my * mcu_w + mx

    class _SymbolRecorder(dict):
        def __init__(self) -> None:
            super().__init__()
            self.used: set[int] = set()

        def __getitem__(self, k: int) -> tuple[int, int]:
            self.used.add(k)
            return (0, 0)

    def _scan_table(used: set[int]) -> tuple[list[int], list[int]]:
        syms = sorted(used)
        length = max(2, (len(syms)).bit_length())
        if len(syms) >= (1 << length):
            length += 1
        bits = [0] * 16
        bits[length - 1] = len(syms)
        return bits, syms

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    zq_y = bytes(int(quant_y[r, c]) for (r, c) in ZIGZAG)
    zq_c = bytes(int(quant_c[r, c]) for (r, c) in ZIGZAG)
    out = b"\xFF\xD8"
    out += seg(0xFFDB, b"\x00" + zq_y)
    out += seg(0xFFDB, b"\x01" + zq_c)
    out += seg(0xFFC2, struct.pack(">BHHB", 8, h, w, 3)
               + bytes([1, 0x22, 0]) + bytes([2, 0x11, 1])
               + bytes([3, 0x11, 1]))
    out += seg(0xFFC4, b"\x00" + bytes(DC_BITS) + bytes(DC_VALS))
    out += seg(0xFFC4, b"\x01" + bytes(DC_BITS_CHROMA)
               + bytes(DC_VALS_CHROMA))

    for (comp, ss, se, ah, al) in scans:
        bw = _BitWriter()
        if comp == -1:
            if (ss, se) != (0, 0):
                raise ValueError(
                    "progressive color: interleaved scan must be DC")
            if ah == 0:
                pred = [0, 0, 0]
                for ci, bi in mcu_walk():
                    val = comp_zz[ci][bi][0] >> al
                    diff = val - pred[ci]
                    pred[ci] = val
                    size = _category(diff)
                    c, ln = dc_tbl[0 if ci == 0 else 1][size]
                    bw.write(c, ln)
                    if size:
                        bw.write(_amplitude_bits(diff, size), size)
            else:
                for ci, bi in mcu_walk():
                    bw.write((comp_zz[ci][bi][0] >> al) & 1, 1)
            bw.flush()
            out += seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x10, 3, 0x10,
                                      0, 0, (ah << 4) | al]))
            out += bytes(bw.buf)
            continue
        zz = comp_zz[comp]
        rec = _SymbolRecorder()
        if ah == 0:
            _encode_ac_first(_BitWriter(), zz, ss, se, al, rec)
        else:
            _encode_ac_refine(_BitWriter(), zz, ss, se, ah, al, rec)
        bits, vals = _scan_table(rec.used or {0x00})
        out += seg(0xFFC4, b"\x12" + bytes(bits) + bytes(vals))
        ac_codes = build_codes(bits, vals)
        if ah == 0:
            _encode_ac_first(bw, zz, ss, se, al, ac_codes)
        else:
            _encode_ac_refine(bw, zz, ss, se, ah, al, ac_codes)
        bw.flush()
        out += seg(0xFFDA, bytes([1, comp + 1, 0x02, ss, se,
                                  (ah << 4) | al]))
        out += bytes(bw.buf)
    out += b"\xFF\xD9"
    return out


def decode_jpeg_progressive_color(data: bytes) -> np.ndarray:
    """Full progressive (SOF2) YCbCr 4:2:0 color decode: interleaved
    DC scans (MCU order, per-component predictors/tables) plus
    non-interleaved AC spectral/refinement scans per component, then
    the same dequant + IDCT + upsample + color conversion as the
    baseline color path. Returns (h, w, 3) uint8."""
    if data[:2] != b"\xFF\xD8":
        raise ValueError("JPEG: missing SOI")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    h = w = -1
    comp_ids: list[int] = []
    comp_tq: list[int] = []
    coef: list[np.ndarray] = []
    nblk: list[int] = []

    def read_symbol(br: "_BitReader", dmap: dict) -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | br.read_bit()
            length += 1
            sym = dmap.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("JPEG: invalid Huffman code")

    def ac_first_scan(br, amap, cf, ss, se, al):
        eobrun = 0
        for b in range(len(cf)):
            if eobrun:
                eobrun -= 1
                continue
            k = ss
            while k <= se:
                sym = read_symbol(br, amap)
                r, sz = sym >> 4, sym & 0x0F
                if sz == 0:
                    if r < 15:
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += br.read_bits(r)
                        break
                    k += 16
                else:
                    k += r
                    if k > se:
                        raise ValueError("JPEG: AC run past band end")
                    cf[b, k] = _extend(br.read_bits(sz), sz) << al
                    k += 1

    def ac_refine_scan(br, amap, cf, ss, se, al):
        p1, m1 = 1 << al, -1 << al
        eobrun = 0
        for b in range(len(cf)):
            k = ss
            if eobrun == 0:
                while k <= se:
                    sym = read_symbol(br, amap)
                    r, sz = sym >> 4, sym & 0x0F
                    newval = 0
                    if sz == 0:
                        if r < 15:
                            eobrun = 1 << r
                            if r:
                                eobrun += br.read_bits(r)
                            break
                    else:
                        if sz != 1:
                            raise ValueError(
                                "JPEG: refinement size must be 1")
                        newval = p1 if br.read_bit() else m1
                    while k <= se:
                        if cf[b, k] != 0:
                            if br.read_bit() and \
                                    not (abs(cf[b, k]) & p1):
                                cf[b, k] += p1 if cf[b, k] > 0 else m1
                        else:
                            if r == 0:
                                break
                            r -= 1
                        k += 1
                    if newval and k <= se:
                        cf[b, k] = newval
                    k += 1
            if eobrun:
                while k <= se:
                    if cf[b, k] != 0:
                        if br.read_bit() and not (abs(cf[b, k]) & p1):
                            cf[b, k] += p1 if cf[b, k] > 0 else m1
                    k += 1
                eobrun -= 1

    while True:
        if data[pos] != 0xFF:
            raise ValueError(f"JPEG: expected marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack(">H", data[pos:pos + 2])
        payload = data[pos + 2:pos + seglen]
        if len(payload) != seglen - 2:
            raise ValueError("JPEG: truncated segment payload")
        if marker == 0xDB:
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0x0F
                if pq != 0:
                    raise ValueError("JPEG: only 8-bit quant tables")
                tbl = np.zeros((8, 8), dtype=np.int32)
                for k, (r, c) in enumerate(ZIGZAG):
                    tbl[r, c] = payload[p + 1 + k]
                quant[tq] = tbl
                p += 65
        elif marker == 0xC2:
            prec, h, w, nf = struct.unpack(">BHHB", payload[:6])
            if prec != 8 or nf != 3:
                raise ValueError(
                    "JPEG: decode_jpeg_progressive_color expects 3 "
                    f"components, got {nf}")
            if h % 16 or w % 16:
                raise ValueError(
                    "JPEG: dimensions must be multiples of 16")
            samplings = []
            for ci in range(3):
                comp_ids.append(payload[6 + 3 * ci])
                samplings.append(payload[7 + 3 * ci])
                comp_tq.append(payload[8 + 3 * ci])
            if samplings != [0x22, 0x11, 0x11]:
                raise ValueError(
                    "JPEG: only 4:2:0 (Y 2x2, chroma 1x1) supported")
            nblk = [(h // 8) * (w // 8), (h // 16) * (w // 16),
                    (h // 16) * (w // 16)]
            coef = [np.zeros((n, 64), dtype=np.int64) for n in nblk]
        elif marker in (0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"JPEG: SOF 0xFF{marker:02X} is not progressive-"
                f"Huffman color")
        elif marker == 0xC4:
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 0x0F
                bits = list(payload[p + 1:p + 17])
                n = sum(bits)
                vals = list(payload[p + 17:p + 17 + n])
                (huff_dc if tc == 0 else huff_ac)[th] = \
                    build_decode_map(bits, vals)
                p += 17 + n
        elif marker == 0xDD:
            raise ValueError("JPEG: restart markers unsupported")
        elif marker == 0xDA:
            if not coef:
                raise ValueError("JPEG: SOS before SOF2")
            ns = payload[0]
            scan_comps = []
            for i in range(ns):
                cid = payload[1 + 2 * i]
                sel = payload[2 + 2 * i]
                scan_comps.append((comp_ids.index(cid), sel))
            ss, se = payload[1 + 2 * ns], payload[2 + 2 * ns]
            ahal = payload[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            scan_start = pos + seglen
            scan_end = _next_marker(data, scan_start)
            br = _BitReader(data[scan_start:scan_end])
            mcu_w, mcu_h = w // 16, h // 16
            yblk_w = w // 8
            if ns == 3:
                if (ss, se) != (0, 0):
                    raise ValueError(
                        "JPEG: interleaved progressive scan must be DC")

                def mcu_walk():
                    for my in range(mcu_h):
                        for mx in range(mcu_w):
                            for by in range(2):
                                for bx in range(2):
                                    yield 0, ((my * 2 + by) * yblk_w
                                              + mx * 2 + bx)
                            yield 1, my * mcu_w + mx
                            yield 2, my * mcu_w + mx

                if ah == 0:
                    pred = [0, 0, 0]
                    for ci, bi in mcu_walk():
                        dmap = huff_dc[scan_comps[ci][1] >> 4]
                        size = read_symbol(br, dmap)
                        pred[ci] += _extend(br.read_bits(size), size)
                        coef[ci][bi, 0] = pred[ci] << al
                else:
                    for ci, bi in mcu_walk():
                        if br.read_bit():
                            coef[ci][bi, 0] |= 1 << al
            elif ns == 1:
                ci, sel = scan_comps[0]
                if ss == 0:
                    raise ValueError(
                        "JPEG: non-interleaved DC scans unsupported "
                        "(this encoder family interleaves DC)")
                amap = huff_ac[sel & 0x0F]
                if ah == 0:
                    ac_first_scan(br, amap, coef[ci], ss, se, al)
                else:
                    ac_refine_scan(br, amap, coef[ci], ss, se, al)
            else:
                raise ValueError("JPEG: 1 or 3 scan components only")
            pos = scan_end
            continue
        pos += seglen

    if not coef:
        raise ValueError("JPEG: no SOF2 frame found")

    def to_plane(cf, qt, ph, pw):
        full = np.zeros((len(cf), 8, 8), dtype=np.float64)
        for k, (r, c) in enumerate(ZIGZAG):
            full[:, r, c] = cf[:, k]
        deq = full * qt[None, :, :].astype(np.float64)
        pix = np.einsum("ji,njk,kl->nil", _C, deq, _C) + 128.0
        pix = np.clip(np.floor(pix + 0.5), 0, 255)
        return (pix.reshape(ph // 8, pw // 8, 8, 8)
                .transpose(0, 2, 1, 3).reshape(ph, pw))

    yp = to_plane(coef[0], quant[comp_tq[0]], h, w)
    cbp = to_plane(coef[1], quant[comp_tq[1]], h // 2, w // 2)
    crp = to_plane(coef[2], quant[comp_tq[2]], h // 2, w // 2)
    cb_up = np.repeat(np.repeat(cbp, 2, axis=0), 2, axis=1)
    cr_up = np.repeat(np.repeat(crp, 2, axis=0), 2, axis=1)
    ycc = np.stack([yp, cb_up, cr_up], axis=-1).astype(np.uint8)
    return ycbcr_to_rgb(ycc)
