"""PNG codec correctness (pure-stdlib, ext/png.py) and REAL image decode /
resize through the multimodal mapInPandas stages."""

from __future__ import annotations

import zlib

import pytest

from skylogix_real_time_weather_data_pipeline_spark.ext import multimodal, png


def _gradient(w, h, ch=3):
    return bytes((x * 7 + y * 13 + c * 29) % 256 for y in range(h) for x in range(w) for c in range(ch))


def test_png_round_trip_rgb():
    w, h = 5, 3
    px = _gradient(w, h)
    data = png.encode(w, h, px)
    assert png.is_png(data)
    rw, rh, ch, out = png.decode(data)
    assert (rw, rh, ch) == (w, h, 3)
    assert out == px


def test_png_round_trip_gray_and_rgba():
    for ch in (1, 4):
        px = _gradient(4, 4, ch)
        rw, rh, rch, out = png.decode(png.encode(4, 4, px, ch))
        assert (rw, rh, rch) == (4, 4, ch)
        assert out == px


def test_png_decode_all_filter_types():
    """Hand-build an IDAT using filters 1-4; decode must un-filter exactly."""
    import struct

    w, h, ch = 4, 5, 3
    px = _gradient(w, h, ch)
    stride = w * ch
    rows = [bytearray(px[y * stride : (y + 1) * stride]) for y in range(h)]
    filtered = bytearray()
    prev = bytearray(stride)
    for y, row in enumerate(rows):
        f = y % 5  # 0,1,2,3,4 — exercise every filter
        enc = bytearray(row)
        if f == 1:
            for i in range(stride - 1, ch - 1, -1):
                enc[i] = (enc[i] - row[i - ch]) & 0xFF
        elif f == 2:
            for i in range(stride):
                enc[i] = (enc[i] - prev[i]) & 0xFF
        elif f == 3:
            for i in range(stride):
                a = row[i - ch] if i >= ch else 0
                enc[i] = (enc[i] - ((a + prev[i]) >> 1)) & 0xFF
        elif f == 4:
            for i in range(stride):
                a = row[i - ch] if i >= ch else 0
                c = prev[i - ch] if i >= ch else 0
                enc[i] = (enc[i] - png._paeth(a, prev[i], c)) & 0xFF
        filtered += bytes([f]) + bytes(enc)
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    data = (
        b"\x89PNG\r\n\x1a\n"
        + png._chunk(b"IHDR", ihdr)
        + png._chunk(b"IDAT", zlib.compress(bytes(filtered)))
        + png._chunk(b"IEND", b"")
    )
    rw, rh, rch, out = png.decode(data)
    assert out == px


def test_png_rejects_garbage():
    with pytest.raises(ValueError):
        png.decode(b"not a png at all")


def test_resize_nearest_identity_and_downscale():
    px = _gradient(4, 4)
    assert png.resize_nearest(4, 4, 3, px, 4, 4) == px
    small = png.resize_nearest(4, 4, 3, px, 2, 2)
    # corner pixel (0,0) survives nearest-neighbor
    assert small[:3] == px[:3]


def test_extract_features_real_png_dimensions(spark):
    """The multimodal feature stage reports the TRUE width/height for PNG
    payloads — not the hash-derived stub values."""
    w, h = 11, 7
    payload = png.encode(w, h, _gradient(w, h))
    df = spark.createDataFrame(
        [(1, "image", "image/png", bytearray(payload))], multimodal.ASSET_SCHEMA
    )
    row = multimodal.extract_features(df).collect()[0]
    assert (row.width, row.height) == (w, h)
    assert row.n_bytes == len(payload)


def test_resize_assets_real_png(spark):
    """Resize emits a decodable PNG at the target size for PNG inputs."""
    payload = png.encode(8, 8, _gradient(8, 8))
    df = spark.createDataFrame(
        [(1, "image", "image/png", bytearray(payload))], multimodal.ASSET_SCHEMA
    )
    out = multimodal.resize_assets(df, target=4).collect()[0]
    rw, rh, ch, px = png.decode(bytes(out.payload))
    assert (rw, rh) == (4, 4)
    assert (out.width, out.height) == (4, 4)
    # nearest-neighbor: top-left corner preserved
    assert px[:3] == _gradient(8, 8)[:3]


def test_corrupt_payloads_degrade_to_stub_not_task_failure(spark):
    """Regression (r2 ADVICE): one truncated/corrupt payload previously
    raised out of the decode and killed the whole mapInPandas stage; it
    must degrade to the deterministic stub instead."""
    from skylogix_real_time_weather_data_pipeline_spark.ext import png as pngmod
    from skylogix_real_time_weather_data_pipeline_spark.ext.multimodal import (
        extract_features,
        resize_assets,
    )

    good = pngmod.encode(4, 3, bytes(range(36)), 3)
    truncated = good[:20]                      # PNG magic, unreadable body
    garbage = b"\xff\xd8\xff\xe0 not a real jpeg"
    rows = [
        (0, "image", "image/png", good),
        (1, "image", "image/png", truncated),
        (2, "image", "image/jpeg", garbage),
    ]
    df = spark.createDataFrame(
        rows, "asset_id long, modality string, mime_type string, payload binary"
    )
    feats = {r.asset_id: r for r in extract_features(df).collect()}
    assert feats[0].width == 4 and feats[0].height == 3      # real decode
    assert feats[1].width is not None                        # stub, not crash
    assert feats[2].width is not None
    resized = {r.asset_id: r for r in resize_assets(df, target=2).collect()}
    w, h, _, _ = pngmod.decode(bytes(resized[0].payload))
    assert (w, h) == (2, 2)                                  # real resize
    assert resized[1].payload is not None                    # digest stub
