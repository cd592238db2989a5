"""Audio feature extraction + energy-contour fingerprinting over WAV
payloads (stdlib wave) through mapInPandas."""

from __future__ import annotations

import io
import math
import wave

from skylogix_real_time_weather_data_pipeline_spark.ext.multimodal import (
    _audio_fingerprint_one,
    audio_features,
    audio_near_dup_pairs,
)


def _wav(melody, sr=8000, dur=0.05, amp=12000, sw=2, ch=1):
    """PCM WAV of a tone sequence; ``melody`` is a list of frequencies."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(ch)
        w.setsampwidth(sw)
        w.setframerate(sr)
        frames = bytearray()
        for j, f in enumerate(melody):
            n = int(sr * dur)
            for i in range(n):
                # taper each note so the energy CONTOUR varies note-to-note
                env = 0.2 + 0.8 * abs(math.sin(math.pi * (j + 1) * i / n))
                v = int(amp * env * math.sin(2 * math.pi * f * i / sr))
                frames += int(v).to_bytes(2, "little", signed=True) * ch
        w.writeframes(bytes(frames))
    return buf.getvalue()


MELODY_A = [440, 660, 220, 880, 330, 550, 770, 110]
MELODY_B = [880, 110, 770, 220, 660, 330, 550, 440]


def _ham(a, b):
    return bin(a ^ b).count("1")


def test_fingerprint_volume_invariant_and_discriminative():
    a = _audio_fingerprint_one(_wav(MELODY_A))
    assert a is not None and 0 <= a < 2 ** 63
    quiet = _audio_fingerprint_one(_wav(MELODY_A, amp=3000))
    assert _ham(a, quiet) == 0          # uniform gain scales every frame energy
    b = _audio_fingerprint_one(_wav(MELODY_B))
    assert _ham(a, b) > 8


def test_audio_features_pipeline(spark):
    rows = [
        (1, "audio", _wav(MELODY_A)),
        (2, "audio", _wav(MELODY_A, amp=4000)),   # same content, quieter
        (3, "audio", _wav(MELODY_B)),             # different melody
        (4, "audio", b"not a wav"),
        (5, "image", b"\x89PNG"),
    ]
    df = spark.createDataFrame(rows, "asset_id long, modality string, payload binary")
    got = {r.asset_id: r for r in audio_features(df).collect()}
    assert got[1].sample_rate == 8000 and got[1].n_samples == 8 * 400
    assert got[1].rms > got[2].rms          # quieter file has lower energy
    assert 0 < got[1].zcr < 1
    assert got[4].afp is None and got[5].afp is None

    pairs = {(r.id_a, r.id_b): r.hamming for r in audio_near_dup_pairs(df).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] == 0
    assert all(3 not in p for p in pairs)


def test_synthetic_melody_assets_plant_exact_clusters(spark):
    """r12: the executor-side WAV generator plants exact near-dup
    clusters — same id residue → byte-deterministic payload family with
    one shared fingerprint across every volume scale; different residues
    are far apart in Hamming; the pair generator recovers exactly
    C(k,2)·n_groups pairs over a dense id range."""
    import itertools

    from skylogix_real_time_weather_data_pipeline_spark.ext.multimodal import (
        _melody_wav_bytes,
        synthetic_melody_assets,
    )

    # kernel-level determinism: same (seed, step) → same bytes
    assert _melody_wav_bytes(3, 5) == _melody_wav_bytes(3, 5)
    assert _melody_wav_bytes(3, 5) != _melody_wav_bytes(3, 6)

    # invariance + separation at the fingerprint level, all 5 seeds
    fps = {}
    for seed in range(5):
        vals = {_audio_fingerprint_one(_melody_wav_bytes(seed, s))
                for s in range(12)}
        assert len(vals) == 1
        fps[seed] = vals.pop()
    for a, b in itertools.combinations(fps.values(), 2):
        assert _ham(a, b) > 4  # beyond the pair generator's threshold

    # end-to-end planted count: 20 dense ids, 5 groups → C(4,2)·5 pairs
    ids = spark.range(20).withColumnRenamed("id", "doc_id")
    assets = synthetic_melody_assets(ids, n_groups=5)
    pairs = audio_near_dup_pairs(assets).collect()
    assert len(pairs) == 5 * (4 * 3 // 2)
    assert all(r.hamming == 0 and r.id_a % 5 == r.id_b % 5 for r in pairs)
