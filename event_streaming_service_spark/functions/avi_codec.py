"""Pure-stdlib AVI (RIFF) container codec for Motion-JPEG video —
the general-video companion to apng_codec.py: where APNG covered the
PNG-family clip format, this covers the classic `.avi` + 'MJPG'
container every capture pipeline and webcam stack still emits, using
only the public RIFF/AVI layout (MainAVIHeader / AVIStreamHeader /
BITMAPINFOHEADER, 'movi' LIST, optional 'idx1') plus the engine's own
baseline JPEG codecs for the per-frame payloads.

Scope, checked loudly: single 'vids' stream, 'MJPG' handler, frames
stored as '00dc'/'00db' chunks in one 'movi' LIST. Anything else
raises ValueError naming the field. Writer emits a spec-complete file
(headers, even-byte chunk padding, keyframe idx1) that the reader —
and any standard tool — can walk.

Scale: container parse is O(bytes); per-frame decode runs inside the
same Arrow-batched mapInPandas kernels as every other codec here.
"""

from __future__ import annotations

import struct


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(fourcc: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", fourcc + payload)


def encode_avi_mjpeg(frames: list[bytes], width: int, height: int,
                     fps: int = 10) -> bytes:
    """Write a single-stream MJPG AVI holding the given JPEG frame
    payloads (each one a complete baseline JPEG, e.g. from
    jpeg_codec.encode_jpeg_color)."""
    if not frames:
        raise ValueError("AVI: at least one frame required")
    us_per_frame = 1_000_000 // fps
    max_size = max(len(f) for f in frames)
    avih = struct.pack(
        "<14I", us_per_frame, max_size * fps, 0, 0x10,  # HASINDEX
        len(frames), 0, 1, max_size, width, height, 0, 0, 0, 0)
    strh = (b"vids" + b"MJPG"
            + struct.pack("<10I", 0, 0, 0, 1, fps, 0, len(frames),
                          max_size, 0xFFFFFFFF, 0)
            + struct.pack("<4H", 0, 0, width, height))
    strf = struct.pack("<IiiHH4sIiiII", 40, width, height, 1, 24,
                       b"MJPG", width * height * 3, 0, 0, 0, 0)
    hdrl = _list(b"hdrl", _chunk(b"avih", avih)
                 + _list(b"strl", _chunk(b"strh", strh)
                         + _chunk(b"strf", strf)))
    movi_payload = b"".join(_chunk(b"00dc", f) for f in frames)
    movi = _list(b"movi", movi_payload)
    # idx1: one keyframe entry per frame; offsets are relative to the
    # start of the 'movi' fourcc per the spec's common interpretation
    idx, off = b"", 4
    for f in frames:
        idx += b"00dc" + struct.pack("<III", 0x10, off, len(f))
        off += 8 + len(f) + (len(f) % 2)
    body = hdrl + movi + _chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(body) + 4) + b"AVI " + body


def decode_avi_mjpeg(data: bytes) -> dict:
    """Parse an MJPG AVI: validate the RIFF/AVI envelope, read the
    stream headers, and return {width, height, n_frames, fps,
    frames: [jpeg bytes, ...]} with the frame payloads in movi order.
    The JPEG payloads decode with jpeg_codec.decode_jpeg_color /
    decode_jpeg."""
    if len(data) < 12 or data[:4] != b"RIFF":
        raise ValueError("AVI: missing RIFF envelope")
    if data[8:12] != b"AVI ":
        raise ValueError("AVI: RIFF form is not 'AVI '")
    out = {"width": -1, "height": -1, "fps": 0, "frames": []}
    handler_seen = {"ok": False}

    def walk(buf: bytes, pos: int, end: int) -> None:
        while pos + 8 <= end:
            fourcc = buf[pos:pos + 4]
            (size,) = struct.unpack("<I", buf[pos + 4:pos + 8])
            body_start = pos + 8
            body_end = body_start + size
            if body_end > end or body_end > len(buf):
                raise ValueError(
                    f"AVI: chunk {fourcc!r} overruns its parent "
                    f"(truncated file?)")
            if fourcc == b"LIST":
                walk(buf, body_start + 4, body_end)
            elif fourcc == b"avih":
                (upf, _bps, _pad, _flags, _tf, _ini, streams, _sb,
                 w, h) = struct.unpack("<10I", buf[body_start:
                                                   body_start + 40])
                if streams != 1:
                    raise ValueError(
                        f"AVI: single-stream files only ({streams})")
                out["width"], out["height"] = w, h
                out["fps"] = 1_000_000 // upf if upf else 0
            elif fourcc == b"strh":
                fcc_type = buf[body_start:body_start + 4]
                fcc_handler = buf[body_start + 4:body_start + 8]
                if fcc_type != b"vids":
                    raise ValueError(
                        f"AVI: unsupported stream type {fcc_type!r}")
                if fcc_handler not in (b"MJPG", b"mjpg"):
                    raise ValueError(
                        f"AVI: handler {fcc_handler!r} unsupported "
                        f"(MJPG only)")
                handler_seen["ok"] = True
            elif fourcc in (b"00dc", b"00db"):
                out["frames"].append(buf[body_start:body_end])
            pos = body_end + (size % 2)

    walk(data, 12, 8 + struct.unpack("<I", data[4:8])[0])
    if not handler_seen["ok"]:
        raise ValueError("AVI: no MJPG video stream header found")
    if not out["frames"]:
        raise ValueError("AVI: no frame chunks in movi")
    out["n_frames"] = len(out["frames"])
    return out
