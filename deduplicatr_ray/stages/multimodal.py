"""Multimodal column plumbing (task-brief operator family).

Image/audio/video payloads are opaque ``binary`` columns with typed metadata
(SURVEY.md data-model convention for wide binary rows). The Ray-side
plumbing — schemas, actor-pool signatures, small batch sizes for large
payloads, output layout — is real and tested; the actual codec work is
STUBBED because no image/audio libraries exist in this container:

* ``decode=\"fake\"`` (default) runs a deterministic, dependency-free stand-in
  (byte-histogram features, size/shape parsing from the sidecar metadata)
  so pipelines exercise the full data path.
* ``decode=\"real\"`` raises ``NotImplementedError`` at actor construction —
  the clearly-marked seam where PIL/ffmpeg-backed decoders plug in.
"""

from __future__ import annotations

import hashlib
import json

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.string()),
        pa.field("kind", pa.string()),      # image | audio | video
        pa.field("payload", pa.binary()),   # opaque encoded bytes
        pa.field("meta", pa.string()),      # JSON: {width,height,...} typed metadata
    ]
)

FEATURES_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.string()),
        pa.field("kind", pa.string()),
        pa.field("payload_sha1", pa.binary(20)),
        pa.field("n_bytes", pa.int64()),
        pa.field("feature", pa.list_(pa.float32(), 32)),
    ]
)


class MediaFeatureActor:
    """Actor-pool stage: decode + feature-extract media payloads.

    Batch sizes MUST stay small for large binary payloads (the caller sets
    ``batch_size``; see ``media_feature_stage``). One decoder instance per
    actor, built in ``__init__``.
    """

    def __init__(self, decode: str = "fake") -> None:
        if decode == "real":
            raise NotImplementedError(
                "real media decoding needs PIL/torchaudio/ffmpeg — not available "
                "in this container; plug the decoder in here"
            )
        if decode != "fake":
            raise ValueError(f"unknown decode mode {decode!r}")
        self.decode = decode

    def _fake_feature(self, payload: bytes) -> np.ndarray:
        """Deterministic 32-dim stand-in: normalized 32-bin byte histogram."""
        arr = np.frombuffer(payload, dtype=np.uint8)
        if len(arr) == 0:
            return np.zeros(32, dtype=np.float32)
        hist = np.bincount(arr >> 3, minlength=32).astype(np.float32)
        return hist / hist.sum()

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        feats = np.stack([self._fake_feature(p or b"") for p in payloads])
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "payload_sha1": pa.array(
                    [hashlib.sha1(p or b"").digest() for p in payloads],
                    pa.binary(20),
                ),
                "n_bytes": pa.array(
                    [len(p or b"") for p in payloads], pa.int64()
                ),
                "feature": pa.FixedSizeListArray.from_arrays(
                    pa.array(feats.reshape(-1), pa.float32()), 32
                ),
            }
        )


def media_feature_stage(
    media,
    *,
    decode: str = "fake",
    batch_size: int = 64,  # small: rows carry whole encoded payloads
    concurrency: int | tuple[int, int] = (1, 4),
):
    """MEDIA_SCHEMA Dataset -> FEATURES_SCHEMA Dataset (actor pool)."""
    return media.map_batches(
        MediaFeatureActor,
        fn_constructor_kwargs={"decode": decode},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


class MediaResizeActor:
    """Actor-pool stage: resize image payloads to (target_w, target_h).

    Real resampling needs PIL (``decode="real"`` seam, as in
    ``MediaFeatureActor``); the deterministic stand-in re-encodes the
    payload to a size proportional to the target area and rewrites the
    metadata — exercising the real Ray-side contract: binary in/out, small
    batches, meta passthrough."""

    def __init__(self, target_w: int, target_h: int, decode: str = "fake") -> None:
        if decode == "real":
            raise NotImplementedError("plug PIL-based resize in here")
        self.target_w, self.target_h = target_w, target_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        outs, metas = [], []
        for p, m in zip(batch["payload"].to_pylist(), batch["meta"].to_pylist()):
            p = p or b""
            meta = json.loads(m or "{}")
            meta["width"], meta["height"] = self.target_w, self.target_h
            # stand-in: deterministic byte stream of area-proportional length
            n_out = max(16, (self.target_w * self.target_h) // 64)
            seed_digest = hashlib.sha1(p).digest()
            reps = (n_out + 19) // 20
            outs.append((seed_digest * reps)[:n_out])
            metas.append(json.dumps(meta, sort_keys=True))
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "payload": pa.array(outs, pa.binary()),
                "meta": pa.array(metas, pa.string()),
            }
        )


def media_resize_stage(media, *, width: int = 224, height: int = 224, batch_size: int = 64):
    return media.map_batches(
        MediaResizeActor,
        fn_constructor_args=(width, height),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=(1, 4),
        num_cpus=1,
    )


def frame_sample_stage(media, *, every_n: int = 1, max_frames: int = 8, batch_size: int = 64):
    """Video rows -> one row per sampled frame (flat_map-shaped plumbing).

    The stand-in derives deterministic per-frame payload slices; a real
    ffmpeg-backed sampler replaces ``_frames`` only. Non-video rows pass
    through untouched with frame_idx = -1 (so mixed media tables keep one
    schema)."""

    def _frames(payload: bytes) -> list[bytes]:
        if not payload:
            return []
        step = max(1, len(payload) // max(1, max_frames))
        return [payload[i : i + step] for i in range(0, len(payload), step * every_n)][
            :max_frames
        ]

    def fn(batch: pa.Table) -> pa.Table:
        ids, kinds, frames, idxs, metas = [], [], [], [], []
        for mid, kind, p, m in zip(
            batch["media_id"].to_pylist(),
            batch["kind"].to_pylist(),
            batch["payload"].to_pylist(),
            batch["meta"].to_pylist(),
        ):
            if kind == "video":
                for fi, fr in enumerate(_frames(p or b"")):
                    ids.append(mid)
                    kinds.append(kind)
                    frames.append(fr)
                    idxs.append(fi)
                    metas.append(m)
            else:
                ids.append(mid)
                kinds.append(kind)
                frames.append(p or b"")
                idxs.append(-1)
                metas.append(m)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.string()),
                "kind": pa.array(kinds, pa.string()),
                "frame_idx": pa.array(idxs, pa.int32()),
                "payload": pa.array(frames, pa.binary()),
                "meta": pa.array(metas, pa.string()),
            }
        )

    return media.map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True, batch_size=batch_size
    )


def gen_fake_media(n: int, seed: int = 42):
    """Deterministic synthetic media table (no external data)."""
    rng = np.random.Generator(np.random.PCG64(seed))
    kinds = ["image", "audio", "video"]
    rows = {
        "media_id": [f"media://{i:06d}" for i in range(n)],
        "kind": [kinds[i % 3] for i in range(n)],
        "payload": [rng.bytes(int(rng.integers(128, 4096))) for i in range(n)],
        "meta": [
            json.dumps({"width": int(rng.integers(16, 512)), "height": int(rng.integers(16, 512))})
            for _ in range(n)
        ],
    }
    import ray.data as rd

    return rd.from_arrow(pa.table(rows, schema=MEDIA_SCHEMA))
