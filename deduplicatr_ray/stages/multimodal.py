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
