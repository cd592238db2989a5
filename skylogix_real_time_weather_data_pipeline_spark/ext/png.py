"""Minimal pure-stdlib PNG codec (zlib + struct) — real image decode for
the multimodal pipeline in environments without PIL/cv2.

Implements the public PNG specification (RFC 2083): chunk framing, IHDR,
zlib-compressed IDAT scanlines, and all five filter types (None/Sub/Up/
Average/Paeth) for 8-bit grayscale/RGB/RGBA. Good for correctness and
tests; for production throughput swap ``decode`` for PIL — the Spark-side
plumbing (ext/multimodal.py) is identical either way.
"""

from __future__ import annotations

import struct
import zlib

_SIGNATURE = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color_type -> samples/pixel


def is_png(data: bytes) -> bool:
    return data[: len(_SIGNATURE)] == _SIGNATURE


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode(width: int, height: int, pixels: bytes, channels: int = 3) -> bytes:
    """RGB(A)/gray 8-bit PNG from raw row-major ``pixels``
    (len == width*height*channels), filter 0 on every scanline."""
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    if len(pixels) != width * height * channels:
        raise ValueError("pixel buffer does not match dimensions")
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    stride = width * channels
    raw = b"".join(
        b"\x00" + pixels[y * stride : (y + 1) * stride] for y in range(height)
    )
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode(data: bytes) -> tuple[int, int, int, bytes]:
    """→ (width, height, channels, raw row-major pixel bytes).

    Supports 8-bit depth, color types 0/2/4/6, no interlace.
    """
    if not is_png(data):
        raise ValueError("not a PNG payload")
    pos, width = len(_SIGNATURE), 0
    height = depth = color_type = interlace = 0
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            width, height, depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", body
            )
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
    if depth != 8 or color_type not in _CHANNELS or interlace:
        raise ValueError(
            f"unsupported PNG variant (depth={depth}, color={color_type}, interlace={interlace})"
        )
    ch = _CHANNELS[color_type]
    stride = width * ch
    raw = zlib.decompress(bytes(idat))
    if len(raw) != (stride + 1) * height:
        raise ValueError("corrupt IDAT stream")
    out = bytearray(stride * height)
    prev = bytearray(stride)
    for y in range(height):
        f = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        if f == 1:  # Sub
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                c = prev[i - ch] if i >= ch else 0
                line[i] = (line[i] + _paeth(a, prev[i], c)) & 0xFF
        elif f != 0:
            raise ValueError(f"unknown filter type {f}")
        out[y * stride : (y + 1) * stride] = line
        prev = line
    return width, height, ch, bytes(out)


def resize_nearest(
    width: int, height: int, channels: int, pixels: bytes, new_w: int, new_h: int
) -> bytes:
    """Nearest-neighbor resample of a raw pixel buffer — deterministic and
    dependency-free (the test/fallback resize kernel)."""
    out = bytearray(new_w * new_h * channels)
    for y in range(new_h):
        sy = min(y * height // new_h, height - 1)
        row = sy * width * channels
        o = y * new_w * channels
        for x in range(new_w):
            sx = min(x * width // new_w, width - 1)
            out[o + x * channels : o + (x + 1) * channels] = pixels[
                row + sx * channels : row + (sx + 1) * channels
            ]
    return bytes(out)
