"""Baseline JPEG decoder (ext/jpeg.py) against hand-constructed streams.

The fixtures are built byte-by-byte from the public ITU-T T.81 segment
layout with known quantization/Huffman tables and DC-only blocks, so the
expected pixel values are derivable in closed form:
    pixel = clamp(round(DC * q0 / 8) + 128)
(a DC-only 8×8 IDCT is flat at c(0)² · DC·q0 = DC·q0/8).
"""

from __future__ import annotations

import struct

import pytest

from skylogix_real_time_weather_data_pipeline_spark.ext import jpeg

# canonical table over 1-2 symbols: '00' → symbols[0], '010' → symbols[1]
def _dht(tc: int, th: int, *symbols: int) -> bytes:
    counts = bytes([0, 1, 1] + [0] * 13) if len(symbols) == 2 else bytes([0, 1] + [0] * 14)
    return (
        b"\xff\xc4" + struct.pack(">H", 2 + 17 + len(symbols))
        + bytes([(tc << 4) | th]) + counts + bytes(symbols)
    )


def _dqt(q: int) -> bytes:
    return b"\xff\xdb" + struct.pack(">H", 2 + 65) + b"\x00" + bytes([q] * 64)


def _sof0(w: int, h: int, comps: list[tuple[int, int, int, int]]) -> bytes:
    body = bytes([8]) + struct.pack(">HH", h, w) + bytes([len(comps)])
    for cid, hs, vs, tq in comps:
        body += bytes([cid, (hs << 4) | vs, tq])
    return b"\xff\xc0" + struct.pack(">H", 2 + len(body)) + body


def _sos(comp_ids: list[int]) -> bytes:
    body = bytes([len(comp_ids)])
    for cid in comp_ids:
        body += bytes([cid, 0x00])  # DC table 0, AC table 0
    body += bytes([0, 63, 0])
    return b"\xff\xda" + struct.pack(">H", 2 + len(body)) + body


class _BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def write(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def tobytes(self) -> bytes:
        bits = self.bits[:]
        while len(bits) % 8:
            bits.append(1)  # spec pads with 1-bits
        out = bytearray()
        for i in range(0, len(bits), 8):
            b = 0
            for bit in bits[i : i + 8]:
                b = (b << 1) | bit
            out.append(b)
        # byte-stuff any 0xFF produced by the entropy data
        return bytes(out).replace(b"\xff", b"\xff\x00")


def _dc_only_block(bw: _BitWriter, dc_diff: int, category: int,
                   second_symbol: bool = False) -> None:
    """Emit one data unit: DC huff code ('00' = first table symbol, '010' =
    second) + diff bits, then AC EOB (code '00' → symbol 0x00)."""
    if second_symbol:
        bw.write(0b010, 3)
    else:
        bw.write(0b00, 2)
    if category:
        v = dc_diff if dc_diff >= 0 else dc_diff + (1 << category) - 1
        bw.write(v, category)
    bw.write(0b00, 2)  # AC EOB


def _gray_jpeg(q: int, dc_diff: int, category: int) -> bytes:
    bw = _BitWriter()
    _dc_only_block(bw, dc_diff, category)
    return (
        b"\xff\xd8"
        + _dqt(q)
        + _sof0(8, 8, [(1, 1, 1, 0)])
        + _dht(0, 0, category)
        + _dht(1, 0, 0x00)
        + _sos([1])
        + bw.tobytes()
        + b"\xff\xd9"
    )


def test_grayscale_dc_only_block():
    # DC diff 5 (category 3), q0=16 → flat block at round(80/8)+128 = 138
    data = _gray_jpeg(16, 5, 3)
    w, h, ch, px = jpeg.decode(data)
    assert (w, h, ch) == (8, 8, 1)
    assert set(px) == {138}


def test_grayscale_negative_dc():
    # DC diff -5 → -80/8 = -10 → 118 everywhere
    data = _gray_jpeg(16, -5, 3)
    w, h, ch, px = jpeg.decode(data)
    assert set(px) == {118}


def test_color_444_dc_only_converts_ycbcr():
    # all three components flat at 138 → Cb=Cr=+10 chroma offsets:
    # R = 138 + 1.402*10 → 152, G = 138 - 0.344136*10 - 0.714136*10 → 127,
    # B = 138 + 1.772*10 → 156
    bw = _BitWriter()
    for _ in range(3):
        _dc_only_block(bw, 5, 3)
    data = (
        b"\xff\xd8"
        + _dqt(16)
        + _sof0(8, 8, [(1, 1, 1, 0), (2, 1, 1, 0), (3, 1, 1, 0)])
        + _dht(0, 0, 3)
        + _dht(1, 0, 0x00)
        + _sos([1, 2, 3])
        + bw.tobytes()
        + b"\xff\xd9"
    )
    w, h, ch, px = jpeg.decode(data)
    assert (w, h, ch) == (8, 8, 3)
    assert set(px[0::3]) == {152}
    assert set(px[1::3]) == {127}
    assert set(px[2::3]) == {156}


def test_420_subsampled_chroma_upsamples():
    """Luma 2x2 sampling, chroma 1x1 → 16×16 image from one MCU: 4 luma
    blocks with different DC values (diffs are cumulative per component),
    chroma neutral → grayscale-looking RGB where R==G==B==luma."""
    bw = _BitWriter()
    # luma blocks: DC values 5, 10, 15, 20 → diffs 5,5,5,5 (category 3)
    for _ in range(4):
        _dc_only_block(bw, 5, 3)
    # chroma Cb, Cr: DC 0 (category 0, the table's second symbol) → flat 128
    _dc_only_block(bw, 0, 0, second_symbol=True)
    _dc_only_block(bw, 0, 0, second_symbol=True)
    data = (
        b"\xff\xd8"
        + _dqt(16)
        + _sof0(16, 16, [(1, 2, 2, 0), (2, 1, 1, 0), (3, 1, 1, 0)])
        + _dht(0, 0, 3, 0)
        + _dht(1, 0, 0x00)
        + _sos([1, 2, 3])
        + bw.tobytes()
        + b"\xff\xd9"
    )
    w, h, ch, px = jpeg.decode(data)
    assert (w, h, ch) == (16, 16, 3)
    # neutral chroma → R==G==B everywhere
    assert px[0::3] == px[1::3] == px[2::3]
    lum = px[0::3]
    # expected flat values per quadrant: 128 + [10, 20, 30, 40]
    assert lum[0] == 138            # top-left block (DC 5*16/8)
    assert lum[8] == 148            # top-right (DC 10)
    assert lum[8 * 16] == 158       # bottom-left (DC 15)
    assert lum[8 * 16 + 8] == 168   # bottom-right (DC 20)


def test_rejects_progressive():
    data = _gray_jpeg(16, 5, 3).replace(b"\xff\xc0", b"\xff\xc2")
    with pytest.raises(ValueError):
        jpeg.decode(data)


def test_progressive_degrades_to_header_probe_row(spark):
    """A progressive (SOF2) payload must flow through the multimodal stage
    as a header-probe row — TRUE dimensions from the SOF2 header, no
    crash, no silent drop — and resize must degrade to the deterministic
    digest stub (the in-repo codec is baseline-only by design)."""
    from skylogix_real_time_weather_data_pipeline_spark.ext import multimodal

    prog = _gray_jpeg(16, 5, 3).replace(b"\xff\xc0", b"\xff\xc2")

    # unit level: dimension probe reads the SOF2 header (no DCT decode)
    assert multimodal._decode_image(prog) == (8, 8)

    # pipeline level: the row comes through with real dims, not dropped
    df = spark.createDataFrame(
        [(7, "image", "image/jpeg", bytearray(prog))], multimodal.ASSET_SCHEMA
    )
    rows = multimodal.extract_features(df).collect()
    assert len(rows) == 1
    assert (rows[0].width, rows[0].height) == (8, 8)
    assert rows[0].n_bytes == len(prog)

    # resize cannot pixel-decode SOF2: deterministic digest stub, twice
    out1 = multimodal._resize_one(prog, 4)
    out2 = multimodal._resize_one(prog, 4)
    assert out1 == out2 and len(out1) == 32  # sha256 digest, not a PNG
    resized = multimodal.resize_assets(df, target=4).collect()
    assert len(resized) == 1 and bytes(resized[0].payload) == out1


def test_multimodal_resize_handles_jpeg():
    """The Arrow-stage resize path decodes baseline JPEG for real now: the
    output is a valid PNG of the target size, not a digest stub."""
    from skylogix_real_time_weather_data_pipeline_spark.ext import png
    from skylogix_real_time_weather_data_pipeline_spark.ext.multimodal import _resize_one

    out = _resize_one(_gray_jpeg(16, 5, 3), 4)
    assert png.is_png(out)
    w, h, ch, px = png.decode(out)
    assert (w, h, ch) == (4, 4, 1)
    assert set(px) == {138}


def test_multimodal_dims_via_full_decode_fallback():
    from skylogix_real_time_weather_data_pipeline_spark.ext.multimodal import _decode_image

    assert _decode_image(_gray_jpeg(16, 5, 3)) == (8, 8)


def test_ac_coefficient_reconstruction():
    """Nonzero AC coefficient at zig-zag index 1 (= block position row 0,
    col 1): pins the Huffman run/size decode, zig-zag mapping and
    dequantization. Expected pixels from the closed-form single-basis
    IDCT: p(y,x) = c(0)c(1) cos((2x+1)π/16) · S + 128."""
    import math

    bw = _BitWriter()
    bw.write(0b010, 3)      # DC: category 0 (second table symbol) → DC = 0
    bw.write(0b00, 2)       # AC: (run 0, size 3) — first table symbol
    bw.write(0b101, 3)      # value +5 → coef 5*16 = 80 at zigzag[1]
    bw.write(0b010, 3)      # AC EOB (second symbol)
    data = (
        b"\xff\xd8"
        + _dqt(16)
        + _sof0(8, 8, [(1, 1, 1, 0)])
        + _dht(0, 0, 3, 0)        # DC: '00'→cat3, '010'→cat0
        + _dht(1, 0, 0x03, 0x00)  # AC: '00'→(0,3), '010'→EOB
        + _sos([1])
        + bw.tobytes()
        + b"\xff\xd9"
    )
    w, h, ch, px = jpeg.decode(data)
    assert (w, h, ch) == (8, 8, 1)
    c0 = math.sqrt(0.125)
    for x in range(8):
        expect = round(c0 * 0.5 * math.cos((2 * x + 1) * math.pi / 16) * 80) + 128
        for y in range(8):
            assert px[y * 8 + x] == max(0, min(255, expect)), (x, y)


def test_restart_interval_resets_dc_predictor():
    """DRI=1 with an RST0 between two MCUs: the second block's DC diff is
    absolute again (predictor reset). Without the reset the right half
    would decode 10 units high."""
    bw1 = _BitWriter()
    _dc_only_block(bw1, 5, 3)
    bw2 = _BitWriter()
    _dc_only_block(bw2, 5, 3)
    dri = b"\xff\xdd" + struct.pack(">H", 4) + struct.pack(">H", 1)
    data = (
        b"\xff\xd8"
        + _dqt(16)
        + dri
        + _sof0(16, 8, [(1, 1, 1, 0)])
        + _dht(0, 0, 3)
        + _dht(1, 0, 0x00)
        + _sos([1])
        + bw1.tobytes()
        + b"\xff\xd0"   # RST0
        + bw2.tobytes()
        + b"\xff\xd9"
    )
    w, h, ch, px = jpeg.decode(data)
    assert (w, h, ch) == (16, 8, 1)
    assert set(px) == {138}  # both halves 128 + 5*16/8, predictor reset
