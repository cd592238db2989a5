"""Uncompressed-AVI frame extraction + per-frame perceptual hashing and
video near-dup pairing."""

from __future__ import annotations

import random

from skylogix_real_time_weather_data_pipeline_spark.ext.multimodal import (
    _video_frame_hashes_one,
    video_frame_hashes,
    video_near_dup_pairs,
)


def _frame(w, h, seed, shift=0):
    """Bottom-up padded BGR24 DIB frame of a fixed 8x6 color grid."""
    rng = random.Random(seed)
    grid = [[tuple(rng.randrange(20, 200) for _ in range(3)) for _ in range(8)]
            for _ in range(6)]
    stride = ((w * 3) + 3) & ~3
    rows = []
    for y in range(h):
        row = bytearray()
        for x in range(w):
            r, g, b = grid[min(y * 6 // h, 5)][min(x * 8 // w, 7)]
            row += bytes((min(255, b + shift), min(255, g + shift), min(255, r + shift)))
        row += b"\x00" * (stride - len(row))
        rows.append(bytes(row))
    return b"".join(reversed(rows))  # DIB stores bottom-up


def _chunk(fourcc, body):
    return fourcc + len(body).to_bytes(4, "little") + body + (b"\x00" if len(body) & 1 else b"")


def _avi(w, h, frames):
    strf = (
        (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")      # BI_RGB
        + b"\x00" * 20
    )
    strl = b"strl" + _chunk(b"strf", strf)
    hdrl = b"hdrl" + b"LIST" + len(strl).to_bytes(4, "little") + strl
    movi = b"movi" + b"".join(_chunk(b"00db", f) for f in frames)
    body = (
        b"AVI "
        + b"LIST" + len(hdrl).to_bytes(4, "little") + hdrl
        + b"LIST" + len(movi).to_bytes(4, "little") + movi
    )
    return b"RIFF" + len(body).to_bytes(4, "little") + body


W, H = 64, 48


def test_frame_hashes_sample_and_match_across_brightness():
    vid = _avi(W, H, [_frame(W, H, s) for s in (1, 2, 3, 4)])
    hashes = dict(_video_frame_hashes_one(vid, every_n=2))
    assert sorted(hashes) == [0, 2]          # every-2nd sampling
    shifted = _avi(W, H, [_frame(W, H, s, shift=12) for s in (1, 2, 3, 4)])
    hashes2 = dict(_video_frame_hashes_one(shifted, every_n=2))
    assert hashes == hashes2                  # brightness-shifted re-encode
    assert _video_frame_hashes_one(b"RIFFxxxxAVI corrupt") == []
    assert _video_frame_hashes_one(b"not a riff") == []


def test_video_near_dup_pipeline(spark):
    vids = [
        (1, "video", _avi(W, H, [_frame(W, H, s) for s in (1, 2, 3, 4)])),
        (2, "video", _avi(W, H, [_frame(W, H, s, shift=10) for s in (1, 2, 3, 4)])),
        (3, "video", _avi(W, H, [_frame(W, H, s) for s in (7, 8, 9, 10)])),
        (4, "video", b"corrupt"),
        (5, "image", b"\x89PNG"),
    ]
    df = spark.createDataFrame(vids, "asset_id long, modality string, payload binary")
    fh = video_frame_hashes(df, every_n=2)
    per_asset = {r.asset_id for r in fh.collect()}
    assert per_asset == {1, 2, 3}
    pairs = {(r.id_a, r.id_b): r.n_shared_frames for r in video_near_dup_pairs(df).collect()}
    assert pairs.get((1, 2)) == 2            # both sampled frames match
    assert all(3 not in p for p in pairs)
