"""Audio + video near-dup detection over landmark fingerprints.

``audio_fingerprint_stage`` explodes WAV rows into (vid, h, t) landmark
rows (actor pool, REAL stdlib decode + numpy FFT — see
``functions/audio.py``); ``video_fingerprint_stage`` does the same for
decodable video (per-frame perceptual hashes over real y4m / animated-GIF
frames). ``landmark_near_dups`` matches either schema with the
engine's standard key-only machinery:

1. hash-partition shuffle on the int64 landmark hash ``h`` (no samples,
   no strings in the all-to-all);
2. per-partition vectorized pair emission inside each equal-hash run
   (triangular index construction — no Python per group), with an
   ``hash_cap`` drop of overly-common landmarks (the classic constellation
   -matching practice: a hash shared by hundreds of docs carries no
   identity, only quadratic cost);
3. partial (id_a, id_b, offset) counts per partition, then one shuffle on
   the pair and a per-partition segment reduce: a pair is a near-dup when
   its MODAL time offset has >= ``min_matches`` aligned hashes — true
   copies concentrate at one offset, chance collisions spread.

Volume changes and hop-aligned time shifts (padding, trimming) preserve
the landmarks, so re-leveled / shifted copies match; unrelated audio
scores ~0 (measured in tests).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _pair_indices(starts: np.ndarray, n: int):
    """All within-segment ordered pairs (i < j), fully vectorized.
    ``starts`` are segment start offsets into a length-``n`` sorted array.
    Returns (first_idx, second_idx)."""
    seg = np.zeros(n, np.int64)
    seg[starts] = 1
    seg_id = np.cumsum(seg) - 1
    local = np.arange(n) - starts[seg_id]
    total = int(local.sum())
    if total == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    second = np.repeat(np.arange(n), local)
    before = np.cumsum(local) - local
    first = (
        np.repeat(starts[seg_id], local)
        + np.arange(total)
        - np.repeat(before, local)
    )
    return first, second


def audio_fingerprint_stage(
    media,
    *,
    n_fft: int = 256,
    hop: int = 128,
    batch_size: int = 32,
    concurrency=(1, 4),
):
    """MEDIA_SCHEMA Dataset -> (vid int64, h int64, t int32) landmark
    rows for the WAV audio rows (others and undecodable audio skipped —
    fingerprinting is a candidate generator, not an integrity gate; run
    ``media_feature_stage(on_error="quarantine")`` for that)."""

    class FpActor:
        def __init__(self) -> None:
            from ..functions.audio import fingerprints

            self._fp = fingerprints
            self.n_fft = n_fft
            self.hop = hop

        def __call__(self, batch: pa.Table) -> pa.Table:
            from ..functions.audio import spectrogram  # noqa: F401 (warm)
            from ..stages.multimodal import decode_wav, media_vec_id

            vids, hs, ts = [], [], []
            for mid, kind, p in zip(
                batch["media_id"].to_pylist(),
                batch["kind"].to_pylist(),
                batch["payload"].to_pylist(),
            ):
                if kind != "audio" or not p or p[:4] != b"RIFF":
                    continue
                try:
                    samples, _rate = decode_wav(p)
                except Exception:
                    continue
                h, t = self._fp(samples, n_fft=self.n_fft, hop=self.hop)
                if len(h) == 0:
                    continue
                vid = media_vec_id(mid)
                vids.append(np.full(len(h), vid, np.int64))
                hs.append(h)
                ts.append(t)
            if not vids:
                return pa.table(
                    {
                        "vid": pa.array([], pa.int64()),
                        "h": pa.array([], pa.int64()),
                        "t": pa.array([], pa.int32()),
                    }
                )
            return pa.table(
                {
                    "vid": pa.array(np.concatenate(vids), pa.int64()),
                    "h": pa.array(np.concatenate(hs), pa.int64()),
                    "t": pa.array(np.concatenate(ts), pa.int32()),
                }
            )

    return media.map_batches(
        FpActor,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def video_fingerprint_stage(
    media,
    *,
    max_frames: int = 64,
    batch_size: int = 32,
    concurrency=(1, 4),
):
    """MEDIA_SCHEMA Dataset -> (vid, h, t) landmark rows for the decodable
    video rows (YUV4MPEG2 / animated GIF / Motion-JPEG AVI). The landmark is a per-frame
    perceptual hash: the 16 grayscale block means of the shared pixel
    feature, range-normalized ((b - min) / (max - min): any per-frame
    gain cancels EXACTLY, and tied blocks stay tied) then quantized to 4
    levels -> a 32-bit hash, emitted on TWO half-bin-shifted quantization
    grids (a block sitting on a grid-A level boundary — the one codec
    rounding can flip — is bin-central on grid B, so a copy matches at
    least one grid per frame with high probability; grid id is packed
    into the hash so grids never cross-collide). Structure-free flat
    frames hash to level 0 on both grids and are absorbed by
    ``hash_cap``. Same schema as the audio stage, so
    ``landmark_near_dups`` matches either."""

    class VfpActor:
        def __call__(self, batch: pa.Table) -> pa.Table:
            from ..functions.gif import decode_gif
            from ..stages.multimodal import (
                _pixel_feature,
                decode_y4m,
                media_vec_id,
            )

            vids, hs, ts = [], [], []
            for mid, kind, p in zip(
                batch["media_id"].to_pylist(),
                batch["kind"].to_pylist(),
                batch["payload"].to_pylist(),
            ):
                if kind != "video" or not p:
                    continue
                try:
                    if p[:9] == b"YUV4MPEG2":
                        frames = decode_y4m(p)
                    elif p[:4] == b"GIF8":
                        frames, _alpha = decode_gif(p)
                    elif p[:4] == b"RIFF" and p[8:12] == b"AVI ":
                        from ..functions.avi import decode_avi_frames

                        frames = decode_avi_frames(p)
                    else:
                        continue
                except Exception:
                    continue
                frames = frames[:max_frames]
                if len(frames) == 0:
                    continue
                hh = np.empty(2 * len(frames), np.int64)
                tt = np.empty(2 * len(frames), np.int32)
                for t, f in enumerate(frames):
                    blocks = _pixel_feature(f.astype(np.float32))[:16]
                    rng_ = float(blocks.max() - blocks.min())
                    rel = (blocks - blocks.min()) / (rng_ + 1e-6)
                    for grid in (0, 1):
                        lv = np.minimum(
                            (rel * 4 + 0.5 * grid).astype(np.int64), 3
                        )
                        h = grid
                        for v in lv:
                            h = (h << 2) | int(v)
                        hh[2 * t + grid] = h
                        tt[2 * t + grid] = t
                vid = media_vec_id(mid)
                vids.append(np.full(len(hh), vid, np.int64))
                hs.append(hh)
                ts.append(tt)
            if not vids:
                return pa.table(
                    {
                        "vid": pa.array([], pa.int64()),
                        "h": pa.array([], pa.int64()),
                        "t": pa.array([], pa.int32()),
                    }
                )
            return pa.table(
                {
                    "vid": pa.array(np.concatenate(vids), pa.int64()),
                    "h": pa.array(np.concatenate(hs), pa.int64()),
                    "t": pa.array(np.concatenate(ts), pa.int32()),
                }
            )

    return media.map_batches(
        VfpActor,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def audio_near_dups(
    media,
    *,
    min_matches: int = 16,
    hash_cap: int = 64,
    num_partitions: int | None = None,
    fingerprints=None,
):
    """Audio near-dup pairs (id_a < id_b, ``matches`` = aligned-hash count
    at the modal offset >= ``min_matches``). ``fingerprints`` overrides
    the fingerprint Dataset (e.g. a checkpointed one); default runs
    ``audio_fingerprint_stage(media)``."""
    fps = (
        fingerprints
        if fingerprints is not None
        else audio_fingerprint_stage(media)
    )
    return landmark_near_dups(
        fps,
        min_matches=min_matches,
        hash_cap=hash_cap,
        num_partitions=num_partitions,
    )


def video_near_dups(
    media,
    *,
    min_matches: int = 3,
    hash_cap: int = 64,
    num_partitions: int | None = None,
):
    """Video near-dup pairs over per-frame perceptual-hash landmarks —
    the same modal-offset vote as audio (a true copy aligns most frames at
    one offset; brightness-scaled and frame-shifted copies still align).
    ``min_matches`` is a FRAME count (clips are short; default 3 aligned
    frames)."""
    return landmark_near_dups(
        video_fingerprint_stage(media),
        min_matches=min_matches,
        hash_cap=hash_cap,
        num_partitions=num_partitions,
    )


def landmark_near_dups(
    fps,
    *,
    min_matches: int = 16,
    hash_cap: int = 64,
    num_partitions: int | None = None,
):
    """Shared landmark matcher over (vid, h, t) rows — see module doc."""
    import pyarrow.compute as pc

    from ..functions.hashing import add_hash_part
    from .lsh import default_num_partitions

    P = num_partitions or default_num_partitions()

    def part_by_hash(b: pa.Table) -> pa.Table:
        return add_hash_part(b, ["h"], P)

    def emit_pairs(g: pa.Table) -> pa.Table:
        n = len(g)
        empty = pa.table(
            {
                "id_a": pa.array([], pa.int64()),
                "id_b": pa.array([], pa.int64()),
                "offset": pa.array([], pa.int32()),
                "cnt": pa.array([], pa.int64()),
            }
        )
        if n < 2:
            return empty
        g = g.take(
            pc.sort_indices(
                g, sort_keys=[("h", "ascending"), ("vid", "ascending")]
            )
        )
        h = g["h"].to_numpy(zero_copy_only=False)
        vid = g["vid"].to_numpy(zero_copy_only=False)
        t = g["t"].to_numpy(zero_copy_only=False)
        starts = np.concatenate(([0], np.flatnonzero(h[1:] != h[:-1]) + 1))
        sizes = np.diff(np.append(starts, n))
        # drop overly-common landmarks: no identity, quadratic cost
        keep_seg = sizes <= hash_cap
        if not keep_seg.all():
            keep_rows = np.repeat(keep_seg, sizes)
            h, vid, t = h[keep_rows], vid[keep_rows], t[keep_rows]
            n = len(h)
            if n < 2:
                return empty
            starts = np.concatenate(
                ([0], np.flatnonzero(h[1:] != h[:-1]) + 1)
            )
        fi, si = _pair_indices(starts, n)
        if len(fi) == 0:
            return empty
        a, b = vid[fi], vid[si]
        cross = a != b  # same-doc repeated landmarks are not pairs
        fi, si, a, b = fi[cross], si[cross], a[cross], b[cross]
        if len(fi) == 0:
            return empty
        # orient pairs (min vid first) and sign offsets consistently
        off = (t[fi].astype(np.int64) - t[si].astype(np.int64)).astype(
            np.int32
        )
        swap = a > b
        a2 = np.where(swap, b, a)
        b2 = np.where(swap, a, b)
        off = np.where(swap, -off, off)
        # partial count per (a, b, offset) inside this partition
        order = np.lexsort((off, b2, a2))
        a2, b2, off = a2[order], b2[order], off[order]
        neq = (
            (a2[1:] != a2[:-1]) | (b2[1:] != b2[:-1]) | (off[1:] != off[:-1])
        )
        st = np.concatenate(([0], np.flatnonzero(neq) + 1))
        cnt = np.diff(np.append(st, len(a2)))
        return pa.table(
            {
                "id_a": pa.array(a2[st], pa.int64()),
                "id_b": pa.array(b2[st], pa.int64()),
                "offset": pa.array(off[st], pa.int32()),
                "cnt": pa.array(cnt, pa.int64()),
            }
        )

    partials = (
        fps.map_batches(
            part_by_hash, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("part")
        .map_groups(emit_pairs, batch_format="pyarrow")
    )

    def part_by_pair(b: pa.Table) -> pa.Table:
        return add_hash_part(b, ["id_a", "id_b"], P)

    def reduce_pairs(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "id_a": pa.array([], pa.int64()),
                "id_b": pa.array([], pa.int64()),
                "matches": pa.array([], pa.int64()),
            }
        )
        if len(g) == 0:
            return empty
        g = g.take(
            pc.sort_indices(
                g,
                sort_keys=[
                    ("id_a", "ascending"),
                    ("id_b", "ascending"),
                    ("offset", "ascending"),
                ],
            )
        )
        a = g["id_a"].to_numpy(zero_copy_only=False)
        b = g["id_b"].to_numpy(zero_copy_only=False)
        off = g["offset"].to_numpy(zero_copy_only=False)
        cnt = g["cnt"].to_numpy(zero_copy_only=False)
        n = len(a)
        # sum partial counts per (a, b, offset)
        neq3 = (a[1:] != a[:-1]) | (b[1:] != b[:-1]) | (off[1:] != off[:-1])
        st3 = np.concatenate(([0], np.flatnonzero(neq3) + 1))
        sums = np.add.reduceat(cnt, st3)
        a3, b3 = a[st3], b[st3]
        # modal offset per (a, b): segment max of the offset sums
        neq2 = (a3[1:] != a3[:-1]) | (b3[1:] != b3[:-1])
        st2 = np.concatenate(([0], np.flatnonzero(neq2) + 1))
        best = np.maximum.reduceat(sums, st2)
        keep = best >= min_matches
        return pa.table(
            {
                "id_a": pa.array(a3[st2][keep], pa.int64()),
                "id_b": pa.array(b3[st2][keep], pa.int64()),
                "matches": pa.array(best[keep], pa.int64()),
            }
        )

    return (
        partials.map_batches(
            part_by_pair, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("part")
        .map_groups(reduce_pairs, batch_format="pyarrow")
    )
