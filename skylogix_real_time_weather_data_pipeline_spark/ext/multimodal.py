"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video travel as ``binary`` columns with a metadata struct;
decode / feature-extract run as Arrow-batched ``mapInPandas`` stages.
Image decode and resize are REAL for PNG payloads (pure-stdlib codec,
ext/png.py; PIL is preferred automatically when installed) and baseline
JPEG (ext/jpeg.py), dimension probing is REAL for JPEG/GIF/BMP headers,
the audio path is REAL for PCM WAV (stdlib ``wave``: features + an
energy-contour fingerprint), and video frame extraction is REAL for
uncompressed DIB/BGR24 AVI (stdlib RIFF parsing + the pHash core);
compressed video/audio codecs stay STUBBED or degrade to zero rows
(deterministic sha256 fakes, honestly labeled) — the Spark-side contract
(schemas, batch iteration, partitioning) is identical either way.

Scale notes: binary payloads stay off the driver; ``mapInPandas`` streams
Arrow batches per partition; repartition by size bucket before heavy decode
so one giant file can't straggle a partition.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: metadata contract for a multimodal asset column
ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("modality", StringType()),  # image | audio | video
        StructField("mime_type", StringType()),
        StructField("payload", BinaryType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("modality", StringType()),
        StructField("n_bytes", LongType()),
        StructField("sha256", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def _decode_image_stub(payload: bytes) -> tuple[int, int]:
    """STUB decode: deterministic fake dimensions derived from the payload
    hash — the fallback for formats without an in-repo codec (JPEG etc.)."""
    h = hashlib.sha256(payload).digest()
    return 64 + h[0] % 192, 64 + h[1] % 192


def _jpeg_dims(payload: bytes) -> tuple[int, int] | None:
    """JPEG (width, height) from the SOF marker — a header scan, no DCT
    decode needed for dimension probing. Returns None if no SOF found."""
    if payload[:2] != b"\xff\xd8":
        return None
    i = 2
    while i + 9 < len(payload):
        if payload[i] != 0xFF:
            return None
        marker = payload[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:  # no-length markers
            i += 2
            continue
        seg_len = int.from_bytes(payload[i + 2:i + 4], "big")
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):  # SOF*
            h = int.from_bytes(payload[i + 5:i + 7], "big")
            w = int.from_bytes(payload[i + 7:i + 9], "big")
            return w, h
        i += 2 + seg_len
    return None


def _gif_dims(payload: bytes) -> tuple[int, int] | None:
    if payload[:6] not in (b"GIF87a", b"GIF89a") or len(payload) < 10:
        return None
    return (
        int.from_bytes(payload[6:8], "little"),
        int.from_bytes(payload[8:10], "little"),
    )


def _bmp_dims(payload: bytes) -> tuple[int, int] | None:
    if payload[:2] != b"BM" or len(payload) < 26:
        return None
    return (
        int.from_bytes(payload[18:22], "little", signed=True),
        abs(int.from_bytes(payload[22:26], "little", signed=True)),
    )


def _decode_image(payload: bytes) -> tuple[int, int]:
    """REAL image decode where possible: PIL if installed, else the
    pure-stdlib PNG codec (ext/png.py) for PNG payloads, else header-parse
    dimension probes for JPEG/GIF/BMP (dimensions are what feature
    extraction needs; pixel decode for those formats stays out of repo);
    the sha256 stub only for formats no path can read.

    Every decode path is exception-guarded: one corrupt/truncated/unusual
    payload (PIL UnidentifiedImageError, png.decode ValueError on 16-bit/
    interlaced/truncated files) must degrade to the stub, never kill the
    whole mapInPandas task — at 100 TB some assets WILL be broken.
    """
    try:
        import io

        from PIL import Image  # type: ignore

        return Image.open(io.BytesIO(payload)).size
    except ImportError:
        pass
    except Exception:
        return _decode_image_stub(payload)
    try:
        from . import jpeg, png

        if png.is_png(payload):
            w, h, _, _ = png.decode(payload)
            return w, h
        if jpeg.is_jpeg(payload):
            # header probe first (cheap); full pixel decode only as the
            # fallback for streams whose SOF the scan missed
            dims = _jpeg_dims(payload)
            if dims:
                return dims
            w, h, _, _ = jpeg.decode(payload)
            return w, h
        for probe in (_gif_dims, _bmp_dims):
            dims = probe(payload)
            if dims:
                return dims
    except Exception:
        pass
    return _decode_image_stub(payload)


def _decode_audio_stub(payload: bytes) -> tuple[int, int]:
    """STUB audio probe: fake (sample_rate, n_samples-as-height) from the
    payload hash — the fallback for compressed formats (mp3/ogg/flac) with
    no in-repo codec; replace with soundfile/librosa when present. Reuses
    the (width, height) feature slots as (sample_rate/100, duration_ds)."""
    h = hashlib.sha256(payload).digest()
    return 80 + h[2] % 100, 64 + (len(payload) % 192)


def _decode_audio(payload: bytes) -> tuple[int, int]:
    """REAL audio probe for WAV payloads (stdlib ``wave`` — PCM RIFF):
    (sample_rate // 100, duration in deciseconds) in the (width, height)
    feature slots. Exception-guarded to the digest stub so one corrupt or
    compressed payload can't fail the Spark stage."""
    try:
        if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            import io
            import wave

            with wave.open(io.BytesIO(payload)) as w:
                sr = w.getframerate()
                duration_ds = int(w.getnframes() * 10 / sr) if sr else 0
                return sr // 100, duration_ds
    except Exception:
        pass
    return _decode_audio_stub(payload)


DECODERS = {"image": _decode_image, "audio": _decode_audio}


def extract_features(assets: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas`` — each executor receives pandas batches of the binary
    column; no row-at-a-time Python, no driver collection.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [
                DECODERS.get(m, lambda p: (None, None))(bytes(p)) if p is not None else (None, None)
                for m, p in zip(pdf["modality"], pdf["payload"])
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "n_bytes": [len(bytes(p)) if p is not None else 0 for p in pdf["payload"]],
                    "sha256": [
                        hashlib.sha256(bytes(p)).hexdigest() if p is not None else None
                        for p in pdf["payload"]
                    ],
                    "width": pd.array([d[0] for d in dims], dtype="Int32"),
                    "height": pd.array([d[1] for d in dims], dtype="Int32"),
                }
            )

    return assets.mapInPandas(run, FEATURE_SCHEMA)


def _resize_one(payload: bytes, target: int) -> bytes:
    """REAL resize for PNG and baseline-JPEG payloads (decode →
    nearest-neighbor → re-encode via the stdlib codecs; JPEG input
    re-encodes as PNG since the in-repo JPEG codec is decode-only);
    deterministic digest fake for other formats so downstream
    content-addressing still works. Exception-guarded like
    ``_decode_image``: a truncated/16-bit/interlaced PNG or a
    progressive JPEG falls back to the digest stub instead of failing
    the Spark stage."""
    try:
        from . import jpeg, png

        if png.is_png(payload):
            w, h, ch, px = png.decode(payload)
        elif jpeg.is_jpeg(payload):
            w, h, ch, px = jpeg.decode(payload)
        else:
            raise ValueError("no codec")
        return png.encode(target, target, png.resize_nearest(w, h, ch, px, target, target), ch)
    except Exception:
        pass
    return hashlib.sha256(payload + target.to_bytes(4, "big")).digest()


def resize_assets(assets: DataFrame, target: int = 224) -> DataFrame:
    """Resize stage over Arrow batches: real decode/resample/re-encode for
    PNG payloads (ext/png.py), digest stub for formats without an in-repo
    codec. Payloads never touch the driver; each executor streams pandas
    batches through ``mapInPandas``."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_payload = [
                _resize_one(bytes(p), target) if p is not None else None
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "mime_type": pdf["mime_type"],
                    "payload": out_payload,
                    "width": pd.array([target] * len(pdf), dtype="Int32"),
                    "height": pd.array([target] * len(pdf), dtype="Int32"),
                }
            )

    schema = StructType(
        ASSET_SCHEMA.fields
        + [StructField("width", IntegerType()), StructField("height", IntegerType())]
    )
    return assets.mapInPandas(run, schema)


def frame_sample_plan(assets: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling *plan*: emits (asset_id, frame_index) rows for a
    downstream decode stage — pure relational fan-out, decode stays stubbed.

    Fake frame count is derived deterministically from payload size so the
    plumbing (explode fan-out, partitioning) is exercised for real.
    """
    n_frames = (F.length(F.col("payload")) / F.lit(1024)).cast("int") + 1
    return (
        assets.filter(F.col("modality") == "video")
        .select(
            "asset_id",
            F.explode(F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))).alias("frame_index"),
        )
    )


def synthetic_assets(spark, documents: DataFrame, modality: str = "image") -> DataFrame:
    """Build a deterministic asset table from the documents corpus (text →
    utf-8 bytes as payload) so the multimodal path is testable without
    binary fixtures."""
    return documents.select(
        F.col("doc_id").alias("asset_id"),
        F.lit(modality).alias("modality"),
        F.lit("application/octet-stream").alias("mime_type"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
    )


def _texture_png_bytes(seed: int, shift: int, w: int = 64, h: int = 48) -> bytes:
    """A textured PNG rendered from a FIXED 8x6 color grid seeded by
    ``seed``, with a uniform brightness ``shift`` (values capped ≤ 200 so
    the shift never clips). Same construction as the pHash invariance
    tests: two renders sharing a seed are pHash-identical regardless of
    shift (only the DC coefficient moves), two seeds are far apart —
    deterministic planted near-dup clusters with no binary fixtures."""
    import random

    from . import png

    rng = random.Random(seed)
    gw, gh = 8, 6
    grid = [
        [tuple(rng.randrange(20, 200) for _ in range(3)) for _ in range(gw)]
        for _ in range(gh)
    ]
    px = bytearray()
    for y in range(h):
        for x in range(w):
            c = grid[min(y * gh // h, gh - 1)][min(x * gw // w, gw - 1)]
            px += bytes(min(255, v + shift) for v in c)
    return png.encode(w, h, bytes(px))


def synthetic_texture_assets(ids: DataFrame, id_col: str = "doc_id",
                             n_groups: int = 25, max_shift: int = 12) -> DataFrame:
    """Deterministic textured-PNG asset table derived from an id column:
    ids in the same ``id % n_groups`` residue class render the SAME color
    grid with a per-id brightness shift (``(id // n_groups) % max_shift``)
    — each residue class is a planted pHash near-dup cluster. Rendering
    runs EXECUTOR-side over Arrow batches (``mapInPandas``); payloads
    never touch the driver, so the stage scales like any other binary
    transform in this module."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids_np = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {
                    "asset_id": ids_np,
                    "modality": ["image"] * len(pdf),
                    "mime_type": ["image/png"] * len(pdf),
                    "payload": [
                        _texture_png_bytes(int(i) % n_groups,
                                           (int(i) // n_groups) % max_shift)
                        for i in ids_np
                    ],
                }
            )

    return ids.select(id_col).mapInPandas(run, ASSET_SCHEMA)


def _grid_frame_bgr24(seed: int, shift: int, w: int = 64, h: int = 48) -> bytes:
    """Bottom-up, stride-padded BGR24 DIB frame of a fixed 8x6 color grid
    seeded by ``seed`` with a uniform brightness ``shift`` (values capped
    ≤ 200 so the shift never clips) — the video analogue of
    :func:`_texture_png_bytes`, sharing its pHash invariance argument."""
    import random

    rng = random.Random(seed)
    grid = [[tuple(rng.randrange(20, 200) for _ in range(3)) for _ in range(8)]
            for _ in range(6)]
    stride = ((w * 3) + 3) & ~3
    rows = []
    for y in range(h):
        row = bytearray()
        for x in range(w):
            r, g, b = grid[min(y * 6 // h, 5)][min(x * 8 // w, 7)]
            row += bytes((min(255, b + shift), min(255, g + shift),
                          min(255, r + shift)))
        row += b"\x00" * (stride - len(row))
        rows.append(bytes(row))
    return b"".join(reversed(rows))  # DIB stores bottom-up


def _avi_bytes(w: int, h: int, frames: list[bytes]) -> bytes:
    """Minimal uncompressed (BI_RGB 24-bit) AVI container around DIB
    frames — the exact shape :func:`_avi_raw_frames` parses back."""

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        return (fourcc + len(body).to_bytes(4, "little") + body
                + (b"\x00" if len(body) & 1 else b""))

    strf = (
        (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")      # BI_RGB
        + b"\x00" * 20
    )
    strl = b"strl" + chunk(b"strf", strf)
    hdrl = b"hdrl" + b"LIST" + len(strl).to_bytes(4, "little") + strl
    movi = b"movi" + b"".join(chunk(b"00db", f) for f in frames)
    body = (
        b"AVI "
        + b"LIST" + len(hdrl).to_bytes(4, "little") + hdrl
        + b"LIST" + len(movi).to_bytes(4, "little") + movi
    )
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def synthetic_video_assets(ids: DataFrame, id_col: str = "doc_id",
                           n_groups: int = 25, n_frames: int = 4,
                           max_shift: int = 12) -> DataFrame:
    """Deterministic uncompressed-AVI asset table derived from an id
    column: ids in the same ``id % n_groups`` residue class render the
    SAME ``n_frames``-frame grid sequence with a per-id brightness shift
    every frame's pHash is invariant to — each residue class is a
    planted video near-dup cluster (all sampled-frame hashes shared).
    Rendering runs EXECUTOR-side over Arrow batches, mirroring
    :func:`synthetic_texture_assets` / :func:`synthetic_melody_assets`."""

    def render(i: int) -> bytes:
        seed, shift = i % n_groups, (i // n_groups) % max_shift
        return _avi_bytes(64, 48, [
            _grid_frame_bgr24(seed * 131 + f, shift) for f in range(n_frames)
        ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids_np = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {
                    "asset_id": ids_np,
                    "modality": ["video"] * len(pdf),
                    "mime_type": ["video/avi"] * len(pdf),
                    "payload": [render(int(i)) for i in ids_np],
                }
            )

    return ids.select(id_col).mapInPandas(run, ASSET_SCHEMA)


def _melody_wav_bytes(seed: int, scale_step: int, n_frames: int = 64,
                      frame_len: int = 25, max_steps: int = 10) -> bytes:
    """A PCM WAV whose energy CONTOUR is a fixed random per-frame
    amplitude sequence seeded by ``seed``, played at a uniform volume
    scale picked by ``scale_step`` — the audio analogue of
    :func:`_texture_png_bytes`. Two renders sharing a seed have the same
    frame-energy ORDERING at any scale (the energy-contour fingerprint's
    exact invariance), two seeds give independent contours. Amplitudes
    are spaced ≥16 apart and scales stay ≥0.5, so int16 quantization
    (error ≤0.5 per sample) can never reorder or tie adjacent frame
    energies — the planted clusters are exact, not probabilistic."""
    import io
    import random
    import wave

    rng = random.Random(seed)
    amps = [16 * v for v in rng.sample(range(40, 750), n_frames)]
    scale = 0.5 + 0.05 * (scale_step % max_steps)
    frames = bytearray()
    for a in amps:
        v = round(a * scale)
        # alternating-sign square wave: frame energy = frame_len · v²
        for i in range(frame_len):
            frames += int(v if i % 2 == 0 else -v).to_bytes(2, "little",
                                                            signed=True)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(bytes(frames))
    return buf.getvalue()


def synthetic_melody_assets(ids: DataFrame, id_col: str = "doc_id",
                            n_groups: int = 25) -> DataFrame:
    """Deterministic WAV asset table derived from an id column: ids in
    the same ``id % n_groups`` residue class render the SAME energy
    contour with a per-id volume scale (``id // n_groups``) the
    fingerprint is invariant to — each residue class is a planted
    audio near-dup cluster. Rendering runs EXECUTOR-side over Arrow
    batches, mirroring :func:`synthetic_texture_assets`."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids_np = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {
                    "asset_id": ids_np,
                    "modality": ["audio"] * len(pdf),
                    "mime_type": ["audio/wav"] * len(pdf),
                    "payload": [
                        _melody_wav_bytes(int(i) % n_groups,
                                          int(i) // n_groups)
                        for i in ids_np
                    ],
                }
            )

    return ids.select(id_col).mapInPandas(run, ASSET_SCHEMA)


# ---------------------------------------------------------------------------
# Perceptual image hashing (pHash) — near-duplicate IMAGE detection on top
# of the in-repo codecs. DCT-based: resize to 32×32 grayscale, 2D DCT-II,
# threshold the 8×8 low-frequency block against its AC median. Robust to
# uniform brightness shifts and contrast scaling (both leave the
# bit-vs-median pattern unchanged) and to resizing; Hamming distance
# between hashes measures visual similarity.
# ---------------------------------------------------------------------------


def _decode_pixels(payload: bytes) -> tuple[int, int, int, bytes] | None:
    """Full pixel decode via the in-repo codecs; None when only a header
    probe (GIF/BMP/progressive-JPEG) or nothing is possible."""
    try:
        from . import jpeg, png

        if png.is_png(payload):
            return png.decode(payload)
        if payload[:2] == b"\xff\xd8":
            return jpeg.decode(payload)
    except Exception:
        return None
    return None


def _phash_gray(gray) -> int | None:
    """63-bit DCT hash of a 2D grayscale integer array — the shared core
    of the image pHash and the per-frame video hashes."""
    import numpy as np

    h, w = gray.shape
    if w < 2 or h < 2:
        return None
    n = 32
    ys = (np.arange(n) * h) // n
    xs = (np.arange(n) * w) // n
    g = gray[ys][:, xs].astype(np.float64)
    k = np.arange(n)
    dct = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
    dct[0, :] = np.sqrt(1.0 / n)
    d = dct @ g @ dct.T
    block = d[:8, :8].flatten()
    med = float(np.median(block[1:]))
    bits = 0
    for i, c in enumerate(block[1:]):
        if c > med:
            bits |= 1 << i
    return bits


def _rgb_to_gray(a):
    """Integer luma from an (h, w, ch) uint8-ish array."""
    if a.shape[-1] >= 3:
        return (299 * a[..., 0] + 587 * a[..., 1] + 114 * a[..., 2]) // 1000
    return a[..., 0]


def _phash64(payload: bytes) -> int | None:
    """63-bit DCT perceptual hash (bit 63 kept clear so the value stays a
    non-negative long — the pigeonhole pair generator shifts arithmetically).
    Deterministic float DCT; no SQL oracle claim (codec-dependent), so the
    contract is pinned by tests like the rest of the multimodal stack."""
    import numpy as np

    dec = _decode_pixels(payload)
    if dec is None:
        return None
    w, h, ch, data = dec
    a = np.frombuffer(data, dtype=np.uint8).reshape(h, w, ch).astype(np.int64)
    return _phash_gray(_rgb_to_gray(a))


PHASH_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("phash", LongType()),
    ]
)


def phash_assets(assets: DataFrame) -> DataFrame:
    """Arrow-batched perceptual hashing: (asset_id, phash) with NULL for
    undecodable payloads / non-image modalities — broken assets degrade,
    never kill the task. Payloads stay on executors."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes = [
                _phash64(bytes(p)) if (m == "image" and p is not None) else None
                for m, p in zip(pdf["modality"], pdf["payload"])
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "phash": pd.array(hashes, dtype="Int64"),
                }
            )

    return assets.mapInPandas(run, PHASH_SCHEMA)


def image_near_dup_pairs(assets: DataFrame, max_hamming: int = 4,
                         max_bucket_size: int = 100_000) -> DataFrame:
    """Near-duplicate image pairs: pHash + the generic pigeonhole pair
    generator (``ext.dedup.hamming_near_pairs``). Default max_hamming=4
    keeps chunk width at 12 bits (63//5) so bucket occupancy stays
    sub-quadratic at corpus scale; raising it widens recall but shrinks
    chunks — at web scale keep it ≤ 4 and verify borderline pairs with a
    pixel-space check downstream."""
    from .dedup import hamming_near_pairs

    hashed = phash_assets(assets).filter(F.col("phash").isNotNull())
    return hamming_near_pairs(
        hashed, hash_col="phash", id_col="asset_id", n_bits=63,
        max_hamming=max_hamming, max_bucket_size=max_bucket_size,
    )


# ---------------------------------------------------------------------------
# Audio features + fingerprinting — the audio analog of the pHash stack.
# WAV/PCM decodes with stdlib ``wave``; compressed formats degrade to NULL.
# Fingerprint = sign of frame-to-frame energy deltas (an echoprint-lite
# contour hash): exactly invariant to uniform volume scaling, Hamming
# distance measures contour similarity, and pairs reuse
# ``dedup.hamming_near_pairs``.
# ---------------------------------------------------------------------------


def _decode_wav_samples(payload: bytes):
    """Mono float64 sample array from a PCM WAV payload, else None."""
    import numpy as np

    try:
        if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
            return None, 0
        import io
        import wave

        with wave.open(io.BytesIO(payload)) as w:
            sr = w.getframerate()
            ch = w.getnchannels()
            width = w.getsampwidth()
            raw = w.readframes(w.getnframes())
        if width == 2:
            a = np.frombuffer(raw, dtype="<i2").astype(np.float64)
        elif width == 1:
            a = np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0
        else:
            return None, 0
        if ch > 1:
            a = a[: (len(a) // ch) * ch].reshape(-1, ch).mean(axis=1)
        return a, sr
    except Exception:
        return None, 0


def _audio_feats_from_samples(a, sr):
    """(sample_rate, n_samples, rms, zcr) from a decoded sample array."""
    import numpy as np

    if a is None or len(a) == 0:
        return None, None, None, None
    rms = float(np.sqrt(np.mean(a * a)))
    signs = np.signbit(a)
    zcr = float(np.mean(signs[1:] != signs[:-1])) if len(a) > 1 else 0.0
    return sr, len(a), round(rms, 6), round(zcr, 6)


def _audio_fp_from_samples(a, n_frames: int = 64) -> int | None:
    """63-bit energy-contour fingerprint from a decoded sample array:
    split into ``n_frames`` frames, bit i = energy(frame i+1) >
    energy(frame i). Uniform volume scaling multiplies every frame energy
    by the same factor, so the bits — and the fingerprint — are EXACTLY
    invariant. Bit 63 stays clear (long stays non-negative for the
    pigeonhole pair generator)."""
    if a is None or len(a) < n_frames:
        return None
    usable = (len(a) // n_frames) * n_frames
    frames = a[:usable].reshape(n_frames, -1)
    e = (frames * frames).sum(axis=1)
    bits = 0
    for i in range(n_frames - 1):
        if e[i + 1] > e[i]:
            bits |= 1 << i
    return bits


def _audio_analyze_one(payload: bytes, n_frames: int = 64):
    """One decode, both outputs: (sr, n, rms, zcr, afp). WAV decoding
    dominates the audio stage's cost, so features and the energy-contour
    fingerprint must derive from a SINGLE shared sample array."""
    a, sr = _decode_wav_samples(payload)
    return (*_audio_feats_from_samples(a, sr), _audio_fp_from_samples(a, n_frames))


def _audio_fingerprint_one(payload: bytes, n_frames: int = 64) -> int | None:
    """Standalone fingerprint (tests / single-purpose callers)."""
    a, _sr = _decode_wav_samples(payload)
    return _audio_fp_from_samples(a, n_frames)


AUDIO_FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("rms", DoubleType()),
        StructField("zcr", DoubleType()),
        StructField("afp", LongType()),
    ]
)


def audio_features(assets: DataFrame) -> DataFrame:
    """Arrow-batched audio analysis: per asset (sample_rate, n_samples,
    RMS energy, zero-crossing rate, energy-contour fingerprint), NULLs
    for non-audio/undecodable payloads. Payloads stay on executors."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                _audio_analyze_one(bytes(p)) if (m == "audio" and p is not None)
                else (None, None, None, None, None)
                for m, p in zip(pdf["modality"], pdf["payload"])
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "sample_rate": pd.array([r[0] for r in rows], dtype="Int32"),
                    "n_samples": pd.array([r[1] for r in rows], dtype="Int64"),
                    "rms": pd.array([r[2] for r in rows], dtype="Float64"),
                    "zcr": pd.array([r[3] for r in rows], dtype="Float64"),
                    "afp": pd.array([r[4] for r in rows], dtype="Int64"),
                }
            )

    return assets.mapInPandas(run, AUDIO_FEATURE_SCHEMA)


def audio_near_dup_pairs(assets: DataFrame, max_hamming: int = 4,
                         max_bucket_size: int = 100_000) -> DataFrame:
    """Near-duplicate audio pairs by energy-contour fingerprint — same
    pigeonhole scale shape as ``image_near_dup_pairs``."""
    from .dedup import hamming_near_pairs

    hashed = audio_features(assets).filter(F.col("afp").isNotNull())
    return hamming_near_pairs(
        hashed, hash_col="afp", id_col="asset_id", n_bits=63,
        max_hamming=max_hamming, max_bucket_size=max_bucket_size,
    )


# ---------------------------------------------------------------------------
# Video: REAL frame extraction for uncompressed (DIB/BGR24) AVI — RIFF is
# plain stdlib parsing, frames reuse the pHash core, and near-dup videos
# surface through shared sampled-frame hashes. Compressed codecs stay out
# of repo and degrade to zero rows (the honest 100 TB posture, same as
# progressive JPEG).
# ---------------------------------------------------------------------------


def _riff_chunks(data: bytes, offset: int, end: int):
    """Yield (fourcc, payload) over a RIFF chunk span; LIST chunks recurse
    with their list-type as fourcc prefix. Lenient: stops at truncation."""
    i = offset
    while i + 8 <= end:
        fourcc = data[i:i + 4]
        size = int.from_bytes(data[i + 4:i + 8], "little")
        body_end = min(i + 8 + size, end)
        if fourcc == b"LIST" and body_end >= i + 12:
            yield from _riff_chunks(data, i + 12, body_end)
        else:
            yield fourcc, data[i + 8:body_end]
        i += 8 + size + (size & 1)


def _avi_raw_frames(payload: bytes):
    """(width, height, [BGR24 frame bytes]) for an uncompressed AVI, else
    None. Dims come from the strf BITMAPINFOHEADER (bit count 24,
    compression 0 = BI_RGB); frames are the '..db' DIB chunks."""
    try:
        if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
            return None
        w = h = None
        frames = []
        for fourcc, body in _riff_chunks(payload, 12, len(payload)):
            if fourcc == b"strf" and len(body) >= 20 and w is None:
                bw = int.from_bytes(body[4:8], "little", signed=True)
                bh = int.from_bytes(body[8:12], "little", signed=True)
                bits = int.from_bytes(body[14:16], "little")
                comp = int.from_bytes(body[16:20], "little")
                if bits == 24 and comp == 0 and bw > 0:
                    w, h = bw, abs(bh)
            elif fourcc[2:4] == b"db":
                frames.append(body)
        if w is None or h is None or not frames:
            return None
        return w, h, frames
    except Exception:
        return None


def _video_frame_hashes_one(payload: bytes, every_n: int = 2):
    """[(frame_idx, phash)] for the sampled frames of one video."""
    import numpy as np

    dec = _avi_raw_frames(payload)
    if dec is None:
        return []
    w, h, frames = dec
    stride = ((w * 3) + 3) & ~3  # DIB rows pad to 4 bytes
    out = []
    for idx in range(0, len(frames), every_n):
        body = frames[idx]
        if len(body) < stride * h:
            continue
        rows = np.frombuffer(body[: stride * h], dtype=np.uint8).reshape(h, stride)
        bgr = rows[:, : w * 3].reshape(h, w, 3)[::-1]  # DIB is bottom-up
        gray = (299 * bgr[..., 2].astype(np.int64)
                + 587 * bgr[..., 1].astype(np.int64)
                + 114 * bgr[..., 0].astype(np.int64)) // 1000
        ph = _phash_gray(gray)
        if ph is not None:
            out.append((idx, ph))
    return out


VIDEO_HASH_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("phash", LongType()),
    ]
)


def video_frame_hashes(assets: DataFrame, every_n: int = 2) -> DataFrame:
    """Arrow-batched frame sampling + perceptual hashing: one row per
    SAMPLED frame (asset_id, frame_idx, phash). Non-video / compressed /
    corrupt payloads contribute zero rows — they degrade, never fail."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, hashes = [], [], []
            for aid, m, p in zip(pdf["asset_id"], pdf["modality"], pdf["payload"]):
                if m != "video" or p is None:
                    continue
                for fi, ph in _video_frame_hashes_one(bytes(p), every_n):
                    ids.append(aid)
                    idxs.append(fi)
                    hashes.append(ph)
            yield pd.DataFrame(
                {
                    "asset_id": pd.array(ids, dtype="Int64"),
                    "frame_idx": pd.array(idxs, dtype="Int32"),
                    "phash": pd.array(hashes, dtype="Int64"),
                }
            )

    return assets.mapInPandas(run, VIDEO_HASH_SCHEMA)


def video_near_dup_pairs(assets: DataFrame, every_n: int = 2,
                         min_shared: int = 2,
                         max_hash_df: int = 10_000) -> DataFrame:
    """Near-duplicate videos: pairs sharing ≥ ``min_shared`` sampled-frame
    perceptual hashes (brightness/contrast/resolution variants hash
    identically per frame, so re-encodes match EXACTLY on the hash).
    Same bucket-group fan-out as every other pair generator — distinct
    (video, hash) rows, posting lists per hash with a df cap (a black
    frame appears everywhere), no self-join."""
    from .dedup import _pairs_from_sorted_ids

    fh = video_frame_hashes(assets, every_n).select("asset_id", "phash").distinct()
    buckets = (
        fh.groupBy("phash")
        .agg(F.array_sort(F.collect_set("asset_id")).alias("ids"))
        .filter((F.size("ids") >= 2) & (F.size("ids") <= max_hash_df))
    )
    return (
        buckets.select(F.explode(_pairs_from_sorted_ids("ids")).alias("p"))
        .groupBy(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_shared_frames"))
        .filter(F.col("n_shared_frames") >= min_shared)
    )
