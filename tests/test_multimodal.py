"""Multimodal stages: REAL stdlib decoders (WAV/PNM), resize, features,
and the actor-pool plumbing (stages/multimodal.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from deduplicatr_ray.stages.multimodal import (
    MediaFeatureActor,
    decode_pnm,
    decode_wav,
    encode_pnm,
    pnm_feature,
    resize_pnm,
    wav_feature,
    _gen_wav,
)


def test_decode_wav_sine_roundtrip():
    import io
    import wave

    rate, freq, dur = 8000, 440.0, 0.25
    t = np.arange(int(rate * dur)) / rate
    pcm = np.clip(0.5 * np.sin(2 * np.pi * freq * t) * 32767, -32768, 32767).astype(
        np.int16
    )
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm.tobytes())
    x, r = decode_wav(buf.getvalue())
    assert r == rate and len(x) == len(pcm)
    # rms of a 0.5-amplitude sine is 0.5/sqrt(2)
    assert abs(np.sqrt((x**2).mean()) - 0.5 / np.sqrt(2)) < 0.01


def test_pnm_roundtrip_and_comment_header():
    pix = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    payload = encode_pnm(pix)
    assert payload[:2] == b"P6"
    back = decode_pnm(payload)
    assert (back == pix).all()
    # header with a comment line still parses
    commented = b"P6\n# a comment\n3 2\n255\n" + pix.tobytes()
    assert (decode_pnm(commented) == pix).all()
    # grayscale P5
    g = np.arange(6, dtype=np.uint8).reshape(2, 3, 1)
    assert (decode_pnm(encode_pnm(g)) == g).all()


def test_resize_pnm_nearest_neighbor_exact():
    pix = np.array(
        [[[10], [20]],
         [[30], [40]]], np.uint8
    )
    out = decode_pnm(resize_pnm(encode_pnm(pix), 4, 4))
    assert out.shape == (4, 4, 1)
    # each source pixel maps to a 2x2 block (floor index mapping)
    assert (out[:2, :2, 0] == 10).all()
    assert (out[:2, 2:, 0] == 20).all()
    assert (out[2:, :2, 0] == 30).all()
    assert (out[2:, 2:, 0] == 40).all()


def test_features_real_shapes_and_signal():
    rng = np.random.Generator(np.random.PCG64(7))
    f_wav = wav_feature(_gen_wav(rng))
    assert f_wav.shape == (32,) and np.isfinite(f_wav).all()
    assert f_wav[0] > 0.1  # sine has substantial rms
    pix = np.full((8, 8, 3), 200, np.uint8)
    f_img = pnm_feature(encode_pnm(pix))
    assert f_img.shape == (32,) and np.isfinite(f_img).all()
    assert abs(f_img[0] - 200 / 255) < 1e-5  # block mean of a flat image


def test_real_mode_strict_raises_on_codec_blob():
    actor = MediaFeatureActor(decode="real", fallback=False)
    batch = pa.table(
        {
            "media_id": pa.array(["m"]),
            "kind": pa.array(["video"]),
            "payload": pa.array([b"\x00\x01\x02notacodec"], pa.binary()),
            "meta": pa.array(["{}"]),
        }
    )
    with pytest.raises(NotImplementedError):
        actor(batch)


def test_media_pipeline_real_end_to_end(ray_session):
    from deduplicatr_ray.stages.multimodal import (
        frame_sample_stage,
        gen_fake_media,
        media_feature_stage,
        media_resize_stage,
    )

    media = gen_fake_media(30)
    feats = media_feature_stage(media, decode="real", fallback=True).to_pandas()
    assert len(feats) == 30
    assert all(len(f) == 32 for f in feats["feature"])
    # real image decode produces block-mean features, not byte histograms:
    # a PPM gradient's first block mean differs from its histogram slot
    img = feats[feats["kind"] == "image"].iloc[0]["feature"]
    aud = feats[feats["kind"] == "audio"].iloc[0]["feature"]
    assert not np.allclose(img, aud)

    resized = media_resize_stage(
        media, width=32, height=24, decode="real", fallback=True
    ).to_pandas()
    img_rows = resized[resized["kind"] == "image"]
    pix = decode_pnm(img_rows.iloc[0]["payload"])
    assert pix.shape == (24, 32, 3)
    # non-image payloads pass through untouched
    orig = media.to_pandas()
    aud_orig = orig[orig["kind"] == "audio"].iloc[0]["payload"]
    aud_res = resized[resized["kind"] == "audio"].iloc[0]["payload"]
    assert aud_orig == aud_res

    sampled = frame_sample_stage(resized.pipe(_to_ds)).to_pandas()
    assert (sampled[sampled["kind"] == "video"]["frame_idx"] >= 0).all()


def _to_ds(df):
    import ray.data as rd

    return rd.from_pandas(df)
