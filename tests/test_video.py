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


def test_synthetic_video_assets_plant_exact_clusters(spark):
    """r12: the executor-side AVI generator plants exact near-dup
    clusters — same id residue → same 4-frame grid sequence at any
    brightness shift (all sampled-frame pHashes shared); different
    residues share zero frame hashes; the pair generator recovers
    exactly C(k,2)·n_groups pairs over a dense id range."""
    from skylogix_real_time_weather_data_pipeline_spark.ext.multimodal import (
        _avi_bytes,
        _grid_frame_bgr24,
        synthetic_video_assets,
    )

    # kernel determinism + invariance (group 3 at two shifts)
    def hs(seed, shift):
        return dict(_video_frame_hashes_one(_avi_bytes(64, 48, [
            _grid_frame_bgr24(seed * 131 + f, shift) for f in range(4)])))

    assert hs(3, 0) == hs(3, 7) and len(hs(3, 0)) == 2
    # cross-group: zero shared hashes across all 5 test groups
    seen = set()
    for g in range(5):
        vals = set(hs(g, 0).values())
        assert not (vals & seen)
        seen |= vals

    # end-to-end planted count: 20 dense ids, 5 groups → C(4,2)·5 pairs
    ids = spark.range(20).withColumnRenamed("id", "doc_id")
    assets = synthetic_video_assets(ids, n_groups=5)
    pairs = video_near_dup_pairs(assets).collect()
    assert len(pairs) == 5 * (4 * 3 // 2)
    assert all(r.n_shared_frames == 2 and r.id_a % 5 == r.id_b % 5
               for r in pairs)
