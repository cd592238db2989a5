"""Minimal baseline JPEG decoder (pure stdlib), sibling of ext/png.py.

Implements the baseline sequential DCT process from the public ITU-T T.81
spec (the one every camera JPEG uses): marker parse → Huffman entropy
decode → dequantize → 8×8 IDCT → chroma upsample → YCbCr→RGB. Supported:
8-bit precision, SOF0, 1 or 3 components, any H/V sampling factors up to
4 (4:4:4 / 4:2:2 / 4:2:0 replication upsampling), restart intervals.
Progressive (SOF2), arithmetic coding, 12-bit, and CMYK raise ValueError —
callers (ext/multimodal.py) are exception-guarded and degrade to header
probes / digest stubs, matching the 100 TB posture that some assets are
always undecodable.

Same interface as png.py: ``decode(data) -> (width, height, channels,
pixels)`` with row-major 8-bit pixels (grayscale or RGB). This is a
correctness-first reference codec for the Arrow-batched decode stage, not
a speed demon — at cluster scale you'd swap in PIL/turbojpeg via the same
``DECODERS`` seam.
"""

from __future__ import annotations

import math
import struct

__all__ = ["is_jpeg", "decode"]

#: zig-zag order: index in scan order → index in the 8x8 block (row*8+col)
_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

#: separable IDCT basis: M[x][u] = c(u)/2 * cos((2x+1)uπ/16)
_IDCT_M = [
    [
        (math.sqrt(0.125) if u == 0 else 0.5) * math.cos((2 * x + 1) * u * math.pi / 16)
        for u in range(8)
    ]
    for x in range(8)
]


def is_jpeg(data: bytes) -> bool:
    return data[:2] == b"\xff\xd8"


class _Huff:
    """Canonical Huffman table: decode one symbol from a bit reader."""

    def __init__(self, counts: bytes, symbols: bytes) -> None:
        self.lookup: dict[tuple[int, int], int] = {}
        code, k = 0, 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                self.lookup[(length, code)] = symbols[k]
                code += 1
                k += 1
            code <<= 1

    def decode(self, br: "_BitReader") -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | br.bit()
            length += 1
            sym = self.lookup.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("bad huffman code")


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment with 0xFF00
    byte-unstuffing; stops at any non-stuffing marker (RSTn handled by the
    caller via restart())."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.buf = 0
        self.nbits = 0

    def bit(self) -> int:
        if self.nbits == 0:
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1]
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:
                    # restart marker reached mid-read: pad with zeros (spec
                    # allows the final truncated byte before a marker)
                    self.buf, self.nbits = 0, 8
                    b = 0
                else:
                    self.buf, self.nbits = 0, 8
                    b = 0
            else:
                self.pos += 1
            if self.nbits == 0:
                self.buf, self.nbits = b, 8
        self.nbits -= 1
        return (self.buf >> self.nbits) & 1

    def receive_extend(self, s: int) -> int:
        if s == 0:
            return 0
        v = 0
        for _ in range(s):
            v = (v << 1) | self.bit()
        if v < (1 << (s - 1)):
            v -= (1 << s) - 1
        return v

    def restart(self) -> None:
        """Byte-align and consume an RSTn marker."""
        self.nbits = 0
        # skip any pad bytes up to the marker
        while self.data[self.pos] != 0xFF or not (0xD0 <= self.data[self.pos + 1] <= 0xD7):
            self.pos += 1
        self.pos += 2


def _idct_block(coef: list[float]) -> list[int]:
    """2-D 8×8 inverse DCT via two passes of the precomputed basis, then
    level shift (+128) and clamp."""
    m = _IDCT_M
    # rows: tmp[u_row][x_col] — transform each row of coefficients
    tmp = [[0.0] * 8 for _ in range(8)]
    for r in range(8):
        row = coef[r * 8 : r * 8 + 8]
        for x in range(8):
            mx = m[x]
            tmp[r][x] = (
                mx[0] * row[0] + mx[1] * row[1] + mx[2] * row[2] + mx[3] * row[3]
                + mx[4] * row[4] + mx[5] * row[5] + mx[6] * row[6] + mx[7] * row[7]
            )
    out = [0] * 64
    for x in range(8):
        col = [tmp[r][x] for r in range(8)]
        for y in range(8):
            my = m[y]
            v = (
                my[0] * col[0] + my[1] * col[1] + my[2] * col[2] + my[3] * col[3]
                + my[4] * col[4] + my[5] * col[5] + my[6] * col[6] + my[7] * col[7]
            )
            vi = int(round(v)) + 128
            out[y * 8 + x] = 0 if vi < 0 else 255 if vi > 255 else vi
    return out


def decode(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a baseline JPEG → (width, height, channels, pixels)."""
    if not is_jpeg(data):
        raise ValueError("not a JPEG")
    qt: dict[int, list[int]] = {}
    dc_tabs: dict[int, _Huff] = {}
    ac_tabs: dict[int, _Huff] = {}
    comps: list[dict] = []  # id, h, v, tq
    width = height = 0
    restart_interval = 0
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("bad marker stream")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        seg_len = struct.unpack(">H", data[pos + 2 : pos + 4])[0]
        body = data[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 15
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                qt[tq] = list(body[i + 1 : i + 65])
                i += 65
        elif marker == 0xC0:  # SOF0 baseline
            if body[0] != 8:
                raise ValueError("only 8-bit precision")
            height, width = struct.unpack(">HH", body[1:5])
            nf = body[5]
            if nf not in (1, 3):
                raise ValueError("only grayscale/YCbCr")
            for c in range(nf):
                cid, hv, tq = body[6 + c * 3 : 9 + c * 3]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("non-baseline SOF unsupported")
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 15
                counts = body[i + 1 : i + 17]
                n = sum(counts)
                table = _Huff(counts, body[i + 17 : i + 17 + n])
                (dc_tabs if tc == 0 else ac_tabs)[th] = table
                i += 17 + n
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = body[0]
            scan_sel = {}
            for c in range(ns):
                cs, tdta = body[1 + c * 2 : 3 + c * 2]
                scan_sel[cs] = (tdta >> 4, tdta & 15)
            return _decode_scan(
                data, pos + 2 + seg_len, width, height, comps, scan_sel,
                qt, dc_tabs, ac_tabs, restart_interval,
            )
        pos += 2 + seg_len
    raise ValueError("no SOS marker")


def _decode_scan(data, pos, width, height, comps, scan_sel, qt, dc_tabs,
                 ac_tabs, restart_interval) -> tuple[int, int, int, bytes]:
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    planes = []
    for c in comps:
        c["pw"] = mcux * c["h"] * 8
        c["ph"] = mcuy * c["v"] * 8
        planes.append(bytearray(c["pw"] * c["ph"]))

    br = _BitReader(data, pos)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                br.restart()
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                td, ta = scan_sel[c["id"]]
                dct, act, q = dc_tabs[td], ac_tabs[ta], qt[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coef = [0.0] * 64
                        t = dct.decode(br)
                        pred[ci] += br.receive_extend(t)
                        coef[0] = pred[ci] * q[0]
                        k = 1
                        while k < 64:
                            rs = act.decode(br)
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r != 15:
                                    break  # EOB
                                k += 16
                                continue
                            k += r
                            if k > 63:
                                raise ValueError("AC index overflow")
                            coef[_ZIGZAG[k]] = br.receive_extend(s) * q[k]
                            k += 1
                        block = _idct_block(coef)
                        x0 = (mx * c["h"] + bx) * 8
                        y0 = (my * c["v"] + by) * 8
                        plane, pw = planes[ci], c["pw"]
                        for yy in range(8):
                            row0 = (y0 + yy) * pw + x0
                            plane[row0 : row0 + 8] = bytes(block[yy * 8 : yy * 8 + 8])
            mcu_count += 1

    if len(comps) == 1:
        c = comps[0]
        pw = c["pw"]
        out = bytearray(width * height)
        for y in range(height):
            out[y * width : (y + 1) * width] = planes[0][y * pw : y * pw + width]
        return width, height, 1, bytes(out)

    # upsample chroma by replication and convert YCbCr → RGB (JFIF matrix)
    out = bytearray(width * height * 3)
    yc, cbc, crc = comps[0], comps[1], comps[2]
    yp, cbp, crp = planes
    for y in range(height):
        yrow = (y * yc["v"] // vmax) * yc["pw"]
        cbrow = (y * cbc["v"] // vmax) * cbc["pw"]
        crrow = (y * crc["v"] // vmax) * crc["pw"]
        o = y * width * 3
        for x in range(width):
            Y = yp[yrow + (x * yc["h"] // hmax)]
            cb = cbp[cbrow + (x * cbc["h"] // hmax)] - 128
            cr = crp[crrow + (x * crc["h"] // hmax)] - 128
            r = int(round(Y + 1.402 * cr))
            g = int(round(Y - 0.344136 * cb - 0.714136 * cr))
            b = int(round(Y + 1.772 * cb))
            out[o] = 0 if r < 0 else 255 if r > 255 else r
            out[o + 1] = 0 if g < 0 else 255 if g > 255 else g
            out[o + 2] = 0 if b < 0 else 255 if b > 255 else b
            o += 3
    return width, height, 3, bytes(out)
