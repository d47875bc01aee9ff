"""Audio fingerprint near-dup: functions/audio.py + stages/audiofp.py.
Copies (volume-scaled, hop-shifted) must pair; unrelated audio must not."""

from __future__ import annotations

import io
import wave

import numpy as np
import pyarrow as pa
import pytest

from deduplicatr_ray.functions.audio import (
    fingerprints,
    match_offsets,
    spectrogram,
)
from deduplicatr_ray.stages.audiofp import _pair_indices

RATE = 8000


def _wav(samples: np.ndarray) -> bytes:
    pcm = np.clip(samples * 32767, -32768, 32767).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(RATE)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def _tones(freqs, dur=1.0, noise=0.01, seed=0, shift=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(RATE * dur)) / RATE
    x = sum(0.6 * np.sin(2 * np.pi * f * (t + 0.13 * k)) for k, f in enumerate(freqs))
    x = x / max(1, len(freqs)) + noise * rng.standard_normal(len(t))
    return np.concatenate([np.zeros(shift), x])


def test_spectrogram_shape_and_peak_location():
    t = np.arange(RATE) / RATE
    spec = spectrogram(np.sin(2 * np.pi * 1000 * t), n_fft=256, hop=128)
    assert spec.shape[1] == 129
    # 1 kHz at 8 kHz rate with 256-pt FFT -> bin 32
    assert (np.argmax(spec, axis=1) == 32).mean() > 0.9


def test_fingerprint_invariances():
    a = _tones([440, 1200, 2300])
    ha, ta = fingerprints(a)
    assert len(ha) > 100
    hb, tb = fingerprints(0.3 * a)  # volume scale
    assert match_offsets(ha, ta, hb, tb) == len(ha)
    hc, tc = fingerprints(_tones([440, 1200, 2300], shift=3 * 128))
    assert match_offsets(ha, ta, hc, tc) == len(ha)
    hd, td = fingerprints(_tones([600, 900, 3000], seed=5))
    assert match_offsets(ha, ta, hd, td) < 5


def test_pair_indices_vectorized():
    # segments of sizes 3, 1, 2 -> 3 + 0 + 1 pairs
    starts = np.array([0, 3, 4])
    fi, si = _pair_indices(starts, 6)
    pairs = sorted(zip(fi.tolist(), si.tolist()))
    assert pairs == [(0, 1), (0, 2), (1, 2), (4, 5)]
    fi, si = _pair_indices(np.array([0]), 1)
    assert len(fi) == 0


def test_audio_near_dups_end_to_end(ray_session):
    import ray.data as rd

    from deduplicatr_ray.stages.audiofp import audio_near_dups
    from deduplicatr_ray.stages.multimodal import MEDIA_SCHEMA, media_vec_id

    base = _tones([500, 1400, 2600], seed=1)
    rows = pa.table(
        {
            "media_id": ["orig", "scaled", "shifted", "other", "img"],
            "kind": ["audio", "audio", "audio", "audio", "image"],
            "payload": pa.array(
                [
                    _wav(base),
                    _wav(0.4 * base),
                    _wav(np.concatenate([np.zeros(2 * 128), base])),
                    _wav(_tones([700, 1900, 3300], seed=9)),
                    b"P6 not audio",
                ],
                pa.binary(),
            ),
            "meta": ["{}"] * 5,
        },
        schema=MEDIA_SCHEMA,
    )
    out = audio_near_dups(
        rd.from_arrow(rows), min_matches=32, num_partitions=4
    ).to_pandas()
    ids = {media_vec_id(m): m for m in rows["media_id"].to_pylist()}
    got = {
        tuple(sorted((ids[a], ids[b])))
        for a, b in zip(out.id_a, out.id_b)
    }
    assert got == {
        ("orig", "scaled"), ("orig", "shifted"), ("scaled", "shifted"),
    }
    assert (out.matches >= 32).all()


def test_audio_near_dups_hash_cap_drops_common_landmarks(ray_session):
    """With hash_cap=1 every landmark group is 'too common' -> no pairs."""
    import ray.data as rd

    from deduplicatr_ray.stages.audiofp import audio_near_dups
    from deduplicatr_ray.stages.multimodal import MEDIA_SCHEMA

    base = _tones([500, 1400], seed=2)
    rows = pa.table(
        {
            "media_id": ["a", "b"],
            "kind": ["audio", "audio"],
            "payload": pa.array([_wav(base), _wav(0.5 * base)], pa.binary()),
            "meta": ["{}"] * 2,
        },
        schema=MEDIA_SCHEMA,
    )
    out = audio_near_dups(
        rd.from_arrow(rows), min_matches=1, hash_cap=1, num_partitions=2
    ).to_pandas()
    assert len(out) == 0


def _y4m_clip(seed=0, nf=6, h=16, w=16, scale=1.0, prepend=0):
    """Structured moving-gradient clip (real video has structure; flat
    noise is the documented aHash degenerate case)."""
    import numpy as np

    from deduplicatr_ray.stages.multimodal import encode_y4m

    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    if seed % 2 == 0:  # distinct seeds get distinct gradient orientations
        yy = yy[::-1]
        xx = xx[:, ::-1]
    phase = int(rng.integers(0, 5))
    frames = []
    for f in range(nf):
        # smooth monotone gradients: block means are well-separated, so
        # the sign-vs-median hash survives brightness scaling + YUV
        # rounding (flat/periodic content is the documented weak case)
        # keep the range below saturation so scaling is a pure gain (a
        # clipped highlight would be a real structural change, not gain),
        # and use coprime slopes so no two block means tie — a tie AT the
        # median is the hash's documented instability
        drift = 4 * f + 2 * phase
        base = yy * 8 + xx * 3 + drift
        pix = np.stack([base, base + 10, base + 20], axis=-1)
        frames.append(
            np.clip(pix.astype(np.float32) * scale, 0, 255).astype(np.uint8)
        )
    if prepend:
        pre = [
            np.full((h, w, 3), 32 * (k + 1), np.uint8)
            for k in range(prepend)
        ]
        frames = pre + frames
    return encode_y4m(np.stack(frames), colorspace="444")


def test_video_near_dups_end_to_end(ray_session):
    import ray.data as rd

    from deduplicatr_ray.stages.audiofp import video_near_dups
    from deduplicatr_ray.stages.multimodal import MEDIA_SCHEMA, media_vec_id

    rows = pa.table(
        {
            "media_id": ["orig", "dim", "shifted", "other", "blob"],
            "kind": ["video"] * 5,
            "payload": pa.array(
                [
                    _y4m_clip(seed=3),
                    _y4m_clip(seed=3, scale=0.6),   # brightness-scaled
                    _y4m_clip(seed=3, prepend=2),   # 2 junk frames prepended
                    _y4m_clip(seed=8),              # unrelated clip
                    b"\x00opaque",                  # undecodable: skipped
                ],
                pa.binary(),
            ),
            "meta": ["{}"] * 5,
        },
        schema=MEDIA_SCHEMA,
    )
    out = video_near_dups(
        rd.from_arrow(rows), min_matches=4, num_partitions=4
    ).to_pandas()
    ids = {media_vec_id(m): m for m in rows["media_id"].to_pylist()}
    got = {
        tuple(sorted((ids[a], ids[b]))) for a, b in zip(out.id_a, out.id_b)
    }
    assert got == {
        ("dim", "orig"), ("orig", "shifted"), ("dim", "shifted"),
    }


def test_video_fingerprint_gif_matches_y4m(ray_session):
    """The same frames through y4m and animated GIF produce the same
    perceptual frame hashes (palette-exact pixels), so cross-container
    video copies pair."""
    import ray.data as rd

    from deduplicatr_ray.functions.gif import encode_gif
    from deduplicatr_ray.stages.audiofp import video_near_dups
    from deduplicatr_ray.stages.multimodal import (
        MEDIA_SCHEMA,
        encode_y4m,
        media_vec_id,
    )

    rng = np.random.default_rng(4)
    pal = rng.integers(0, 256, (64, 3), dtype=np.uint8)
    idx = rng.integers(0, 64, (5, 16, 16), dtype=np.uint8)
    frames_rgb = pal[idx]  # (5, 16, 16, 3) exact in both containers
    rows = pa.table(
        {
            "media_id": ["as_y4m", "as_gif"],
            "kind": ["video", "video"],
            "payload": pa.array(
                [
                    encode_y4m(frames_rgb, colorspace="444"),
                    encode_gif(idx, pal),
                ],
                pa.binary(),
            ),
            "meta": ["{}"] * 2,
        },
        schema=MEDIA_SCHEMA,
    )
    out = video_near_dups(
        rd.from_arrow(rows), min_matches=4, num_partitions=2
    ).to_pandas()
    ids = {media_vec_id(m): m for m in rows["media_id"].to_pylist()}
    got = {
        tuple(sorted((ids[a], ids[b]))) for a, b in zip(out.id_a, out.id_b)
    }
    assert got == {("as_gif", "as_y4m")}


def test_fingerprints_reject_overflowing_n_fft():
    # n_fft=1024 yields bin indices up to 512, overflowing the 9-bit f2
    # field into f1 — distinct landmarks would alias; must be rejected
    rng = np.random.default_rng(0)
    with pytest.raises(ValueError, match="9-bit"):
        fingerprints(rng.standard_normal(4096).astype(np.float32), n_fft=1024)
