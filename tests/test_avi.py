"""Motion-JPEG AVI: codec roundtrip, probe metadata, stage dispatch and
cross-container video near-dup matching (functions/avi.py)."""

import numpy as np
import pyarrow as pa
import pytest

from deduplicatr_ray.functions.avi import (
    _movi_video_chunks,
    build_avi_mjpeg,
    decode_avi_frames,
)
from deduplicatr_ray.functions.containers import build_avi, probe_avi


def _gradient_frames(n=5, h=48, w=64, scale=1.0):
    """Smooth moving gradients: JPEG roundtrip error stays within ±2 and
    block means are well separated (the perceptual-hash-friendly case)."""
    base = (np.add.outer(np.arange(h) * 2, np.arange(w)) % 200).astype(
        np.float32
    )
    frames = np.stack([np.roll(base, 3 * i, axis=1) for i in range(n)])
    rgb = np.stack([frames, frames + 10, frames + 20], axis=-1)
    return np.clip(rgb * scale, 0, 255).astype(np.uint8)


def test_mjpeg_roundtrip_plain_and_rec_grouped():
    frames = _gradient_frames()
    plain = build_avi_mjpeg(frames, fps=10)
    grouped = build_avi_mjpeg(frames, fps=10, rec_groups=True)
    for payload in (plain, grouped):
        dec = decode_avi_frames(payload)
        assert dec.shape == frames.shape and dec.dtype == np.uint8
        assert np.abs(dec.astype(int) - frames.astype(int)).max() <= 2
    assert np.array_equal(decode_avi_frames(plain), decode_avi_frames(grouped))


def test_gray_frames_decode_to_three_channels():
    gray = _gradient_frames()[:, :, :, 0]  # (n, h, w)
    dec = decode_avi_frames(build_avi_mjpeg(gray))
    assert dec.shape == gray.shape + (3,)
    assert np.array_equal(dec[..., 0], dec[..., 1])


def test_probe_avi_reads_mjpg_codec_and_dims():
    frames = _gradient_frames(n=7, h=32, w=40)
    meta = probe_avi(build_avi_mjpeg(frames, fps=14))
    assert meta["container"] == "avi"
    assert meta["codec"] == "mjpg"
    assert (meta["width"], meta["height"]) == (40, 32)
    assert meta["n_frames"] == 7
    assert meta["duration_ms"] == int(round(7 * (1_000_000 // 14) / 1000))
    # the strl-less minimal fixture keeps its round-5 probe shape
    assert probe_avi(build_avi())["codec"] is None


def test_audio_chunks_skipped_and_second_stream_selectable():
    frames = _gradient_frames(n=3, h=16, w=16)
    payload = build_avi_mjpeg(frames)
    # splice a '01wb' audio chunk at the head of movi: decode must skip it
    movi_at = payload.index(b"LIST", 12)
    # find the movi LIST (walk: first LIST is hdrl)
    off = payload.index(b"movi")
    audio = b"01wb" + (4).to_bytes(4, "little") + b"\x01\x02\x03\x04"
    spliced = payload[: off + 4] + audio + payload[off + 4 :]
    # fix the two enclosing sizes (RIFF form + movi LIST)
    riff_size = int.from_bytes(spliced[4:8], "little") + len(audio)
    movi_size = int.from_bytes(spliced[off - 4 : off], "little") + len(audio)
    spliced = (
        spliced[:4]
        + riff_size.to_bytes(4, "little")
        + spliced[8 : off - 4]
        + movi_size.to_bytes(4, "little")
        + spliced[off:]
    )
    assert movi_at  # movi exists
    dec = decode_avi_frames(spliced)
    assert dec.shape == frames.shape
    kinds = [f[:4] for f, _ in _movi_video_chunks(spliced)]
    assert kinds == [b"00dc"] * 3  # the wb chunk never reaches the decoder


def test_non_mjpeg_codec_and_corrupt_riff_raise():
    frames = _gradient_frames(n=2, h=16, w=16)
    payload = build_avi_mjpeg(frames)
    # corrupt the first frame's JPEG SOI: no longer Motion-JPEG
    first = payload.index(b"00dc")
    broken = bytearray(payload)
    broken[first + 8 : first + 10] = b"\x00\x00"
    with pytest.raises(NotImplementedError, match="Motion-JPEG"):
        decode_avi_frames(bytes(broken))
    with pytest.raises(ValueError):
        decode_avi_frames(b"RIFF\xff\xff\xff\xffAVI " + b"\x00" * 8)
    with pytest.raises(NotImplementedError, match="no decodable"):
        decode_avi_frames(build_avi())  # stand-in movi has no frame chunks


def test_feature_actor_real_decode_and_quarantine():
    from deduplicatr_ray.stages.multimodal import MediaFeatureActor, avi_feature

    frames = _gradient_frames()
    payload = build_avi_mjpeg(frames)
    actor = MediaFeatureActor(decode="real", fallback=False)
    feat = actor._feature(payload)
    assert feat.shape == (32,) and feat.dtype == np.float32
    assert np.allclose(feat, avi_feature(payload))
    # truncated AVI quarantines instead of killing the batch
    batch = pa.table(
        {
            "media_id": pa.array(["ok", "bad"], pa.string()),
            "kind": pa.array(["video", "video"], pa.string()),
            "payload": pa.array([payload, payload[:40]], pa.binary()),
            "meta": pa.array(["{}", "{}"], pa.string()),
        }
    )
    q = MediaFeatureActor(decode="real", on_error="quarantine")(batch)
    ok = dict(zip(q["media_id"].to_pylist(), q["decode_ok"].to_pylist()))
    assert ok == {"ok": True, "bad": False}


def test_frame_sample_stage_real_avi_frames(ray_session):
    import ray.data as rd

    from deduplicatr_ray.stages.multimodal import (
        MEDIA_SCHEMA,
        frame_sample_stage,
    )

    frames = _gradient_frames(n=6, h=24, w=24)
    rows = pa.table(
        {
            "media_id": ["clip"],
            "kind": ["video"],
            "payload": pa.array([build_avi_mjpeg(frames)], pa.binary()),
            "meta": ["{}"],
        },
        schema=MEDIA_SCHEMA,
    )
    out = frame_sample_stage(
        rd.from_arrow(rows), decode="real", every_n=2, max_frames=3
    ).to_pandas()
    assert list(out.frame_idx) == [0, 1, 2]
    assert all(p[:8] == b"\x89PNG\r\n\x1a\n" for p in out.payload)


def test_video_near_dups_avi_matches_y4m(ray_session):
    """The same clip as YUV4MPEG2 and as Motion-JPEG AVI pairs up —
    JPEG + YUV rounding both land within the dual-grid hash tolerance on
    structured content."""
    import ray.data as rd

    from deduplicatr_ray.stages.audiofp import video_near_dups
    from deduplicatr_ray.stages.multimodal import (
        MEDIA_SCHEMA,
        encode_y4m,
        media_vec_id,
    )

    frames = _gradient_frames(n=6, h=16, w=16)
    rows = pa.table(
        {
            "media_id": ["as_y4m", "as_avi", "other"],
            "kind": ["video"] * 3,
            "payload": pa.array(
                [
                    encode_y4m(frames, colorspace="444"),
                    build_avi_mjpeg(frames, quality=95),
                    encode_y4m(
                        _gradient_frames(n=6, h=16, w=16)[:, ::-1],
                        colorspace="444",
                    ),
                ],
                pa.binary(),
            ),
            "meta": ["{}"] * 3,
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
    assert got == {("as_avi", "as_y4m")}
