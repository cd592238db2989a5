"""Perceptual image hashing: invariances, discrimination, and the
near-dup pipeline over mapInPandas."""

from __future__ import annotations

import random

from skylogix_real_time_weather_data_pipeline_spark.ext import png
from skylogix_real_time_weather_data_pipeline_spark.ext.multimodal import (
    _phash64,
    image_near_dup_pairs,
    phash_assets,
)


def _texture_png(w=64, h=48, shift=0, scale=1.0, seed=9):
    """A FIXED 8x6 logical grid of random colors rendered at any
    resolution — textured enough that the low-frequency DCT block carries
    real energy (smooth gradients leave most ACs near zero, where sign
    bits are noise), and resolution-independent so resize invariance is
    actually testable. Channel values <= 200 so shift/scale never clip."""
    rng = random.Random(seed)
    gw, gh = 8, 6
    grid = [[tuple(rng.randrange(20, 200) for _ in range(3)) for _ in range(gw)]
            for _ in range(gh)]
    px = bytearray()
    for y in range(h):
        for x in range(w):
            c = grid[min(y * gh // h, gh - 1)][min(x * gw // w, gw - 1)]
            px += bytes(min(255, max(0, int(v * scale) + shift)) for v in c)
    return png.encode(w, h, bytes(px))


def _ham(a, b):
    return bin(a ^ b).count("1")


def test_phash_invariances_and_discrimination():
    base = _phash64(_texture_png())
    assert base is not None and 0 <= base < 2 ** 63
    # uniform brightness shift only moves the DC coefficient
    assert _ham(base, _phash64(_texture_png(shift=15))) == 0
    # contrast scaling scales ACs and their median together
    assert _ham(base, _phash64(_texture_png(scale=0.85))) == 0
    # the same content at other resolutions hashes identically
    assert _ham(base, _phash64(_texture_png(w=48, h=36))) <= 2
    assert _ham(base, _phash64(_texture_png(w=128, h=96))) <= 2
    # different content is far
    assert _ham(base, _phash64(_texture_png(seed=77))) > 12


def test_phash_undecodable_is_none():
    assert _phash64(b"\x00\x01garbage") is None
    assert _phash64(b"\xff\xd8truncated jpeg") is None


def test_image_near_dup_pipeline(spark):
    rows = [
        (1, "image", _texture_png()),
        (2, "image", _texture_png(shift=10)),    # near-dup of 1
        (3, "image", _texture_png(seed=77)),     # unrelated
        (4, "image", b"corrupt"),                # degrades to NULL
        (5, "audio", b"\x00\x01"),               # non-image → NULL
    ]
    df = spark.createDataFrame(rows, "asset_id long, modality string, payload binary")
    hashed = {r.asset_id: r.phash for r in phash_assets(df).collect()}
    assert hashed[4] is None and hashed[5] is None
    assert hashed[1] is not None and hashed[3] is not None

    pairs = {(r.id_a, r.id_b): r.hamming for r in image_near_dup_pairs(df).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] <= 4
    assert all(3 not in p for p in pairs)


def test_synthetic_texture_assets_planted_clusters(spark):
    """The executor-side texture renderer must produce planted pHash
    clusters exactly: ids sharing a residue class render the same grid
    (brightness shift is pHash-invariant), so the near-dup pairs are
    precisely the within-class pairs — the determinism the rows-only
    registry row (mm_phash_near_dup) relies on."""
    from skylogix_real_time_weather_data_pipeline_spark.ext.multimodal import (
        synthetic_texture_assets,
    )

    ids = spark.range(0, 30).withColumnRenamed("id", "doc_id")
    assets = synthetic_texture_assets(ids, n_groups=5)
    rows = {r.asset_id: bytes(r.payload) for r in assets.collect()}
    assert len(rows) == 30 and all(p.startswith(b"\x89PNG") for p in rows.values())

    pairs = {(r.id_a, r.id_b) for r in image_near_dup_pairs(assets).collect()}
    want = {
        (a, b)
        for a in range(30)
        for b in range(a + 1, 30)
        if a % 5 == b % 5
    }
    assert pairs == want  # all planted pairs, nothing else

    # byte-deterministic across invocations (rows-only contract)
    again = {r.asset_id: bytes(r.payload) for r in
             synthetic_texture_assets(ids, n_groups=5).collect()}
    assert again == rows
