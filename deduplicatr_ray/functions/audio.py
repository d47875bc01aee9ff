"""Audio fingerprinting — numpy FFT only, no DSP libraries.

Spectral-peak landmark fingerprints (the constellation-map scheme of
Wang's 2003 audio-search paper, simplified): hann-windowed magnitude
spectrogram -> per-band local peaks -> (f1, f2, dt) landmark hashes.
Hashes are invariant to volume change and (modulo hop alignment) to time
shifts, so re-encoded / re-leveled / padded copies of the same recording
share most hashes while unrelated audio shares almost none.

At corpus scale the near-dup match is the engine's standard key-only
shuffle: explode docs to (hash, doc, t) rows, groupby hash (int64 keys —
no samples in the all-to-all), emit candidate pairs with time-offset
votes, keep pairs whose modal offset has >= min_matches aligned hashes.
"""

from __future__ import annotations

import numpy as np


def spectrogram(
    samples: np.ndarray, *, n_fft: int = 256, hop: int = 128
) -> np.ndarray:
    """Mono float samples -> (frames, n_fft//2+1) magnitude spectrogram
    (hann window, vectorized frame extraction + one batched rfft)."""
    if len(samples) < n_fft:
        samples = np.pad(samples, (0, n_fft - len(samples)))
    n_frames = 1 + (len(samples) - n_fft) // hop
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
    frames = samples[idx] * np.hanning(n_fft)[None, :]
    return np.abs(np.fft.rfft(frames, axis=1))


def _peaks(spec: np.ndarray, *, bands: int = 8, per_frame: int = 2):
    """Per-frame spectral peaks: the strongest bin in each of ``bands``
    log-spaced bands, keeping the ``per_frame`` loudest per frame and
    dropping near-silence. Returns (frame_idx, bin_idx) int arrays —
    volume-invariant because selection is per-frame relative."""
    n_frames, n_bins = spec.shape
    edges = np.unique(
        np.geomspace(2, n_bins - 1, bands + 1).astype(np.int64)
    )
    cand_t, cand_f, cand_m = [], [], []
    for lo, hi in zip(edges[:-1], edges[1:]):
        seg = spec[:, lo:hi]
        if seg.shape[1] == 0:
            continue
        best = np.argmax(seg, axis=1)
        mag = seg[np.arange(n_frames), best]
        cand_t.append(np.arange(n_frames))
        cand_f.append(lo + best)
        cand_m.append(mag)
    t = np.concatenate(cand_t)
    f = np.concatenate(cand_f)
    m = np.concatenate(cand_m)
    # keep the per_frame loudest candidates per frame, above the noise
    # floor (1e-3 of the global max — silence yields no landmarks)
    keep = np.zeros(len(t), bool)
    floor = m.max() * 1e-3 if len(m) else 0.0
    order = np.lexsort((-m, t))
    ts = t[order]
    first = np.r_[True, ts[1:] != ts[:-1]]
    rank = np.arange(len(ts)) - np.maximum.accumulate(
        np.where(first, np.arange(len(ts)), 0)
    )
    sel = order[(rank < per_frame) & (m[order] > floor)]
    keep[sel] = True
    return t[keep], f[keep]


def fingerprints(
    samples: np.ndarray,
    *,
    n_fft: int = 256,
    hop: int = 128,
    fanout: int = 4,
    max_dt: int = 16,
) -> tuple[np.ndarray, np.ndarray]:
    """Mono samples -> (hashes int64, anchor frame times int32).

    Each peak pairs with up to ``fanout`` subsequent peaks within
    ``max_dt`` frames; hash packs (f1, f2, dt) — 9+9+5 bits, collision
    -free for n_fft <= 512 (bin index max n_fft//2 must fit 9 bits;
    at n_fft=1024 bin 512 would overflow f2 into f1's field)."""
    if n_fft > 512:
        raise ValueError(
            f"n_fft={n_fft}: bin indices exceed the 9-bit hash field; "
            "use n_fft <= 512"
        )
    spec = spectrogram(samples, n_fft=n_fft, hop=hop)
    t, f = _peaks(spec)
    order = np.lexsort((f, t))
    t, f = t[order], f[order]
    hashes, times = [], []
    n = len(t)
    for i in range(n):
        paired = 0
        for j in range(i + 1, n):
            dt = t[j] - t[i]
            if dt <= 0:
                continue
            if dt > max_dt or paired >= fanout:
                break
            h = (int(f[i]) << 14) | (int(f[j]) << 5) | int(dt)
            hashes.append(h)
            times.append(int(t[i]))
            paired += 1
    return (
        np.asarray(hashes, np.int64),
        np.asarray(times, np.int32),
    )


def match_offsets(
    ha: np.ndarray, ta: np.ndarray, hb: np.ndarray, tb: np.ndarray
) -> int:
    """Aligned-hash score between two fingerprint sets: the count of the
    modal time offset among shared hashes (vectorized join via sort +
    searchsorted). A true copy concentrates matches at one offset; chance
    collisions spread across offsets."""
    if len(ha) == 0 or len(hb) == 0:
        return 0
    oa = np.argsort(ha, kind="stable")
    ha_s, ta_s = ha[oa], ta[oa]
    ob = np.argsort(hb, kind="stable")
    hb_s, tb_s = hb[ob], tb[ob]
    lo = np.searchsorted(hb_s, ha_s, "left")
    hi = np.searchsorted(hb_s, ha_s, "right")
    cnt = hi - lo
    if cnt.sum() == 0:
        return 0
    ai = np.repeat(np.arange(len(ha_s)), cnt)
    bi = np.concatenate([np.arange(l, h) for l, h in zip(lo, hi) if h > l])
    offsets = ta_s[ai].astype(np.int64) - tb_s[bi].astype(np.int64)
    _vals, counts = np.unique(offsets, return_counts=True)
    return int(counts.max())
