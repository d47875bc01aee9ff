"""Baseline-TIFF codec (functions/tiff.py): strip decode across
byte orders / compressions, PackBits spec vector, TIFF-LZW early
change, and the media-stage wiring."""

from __future__ import annotations

import numpy as np
import pytest

from deduplicatr_ray.functions import tiff as T
from deduplicatr_ray.functions.containers import probe_tiff
from deduplicatr_ray.stages import multimodal as mm


def _grad(shape, seed=5):
    rng = np.random.Generator(np.random.PCG64(seed))
    base = np.add.outer(np.arange(shape[0]) * 3, np.arange(shape[1]))[
        ..., None
    ] % 256
    return ((base + rng.integers(0, 2, shape)) % 256).astype(np.uint8)


def test_packbits_spec_vector():
    # the worked example from the public TIFF 6.0 spec, Section 9
    enc = bytes.fromhex("FEAA0280002AFDAA0380002A22F7AA")
    exp = (
        b"\xaa" * 3
        + b"\x80\x00\x2a"
        + b"\xaa" * 4
        + b"\x80\x00\x2a\x22"
        + b"\xaa" * 10
    )
    assert T._packbits_decode(enc, len(exp)) == exp
    assert T._packbits_decode(T._packbits_encode(exp), len(exp)) == exp


def test_lzw_early_change_and_reset():
    rng = np.random.Generator(np.random.PCG64(5))
    # 66k low-entropy bytes force all three width bumps AND the 4094
    # table reset — the classic interop breakpoints
    raw = rng.integers(0, 4, 66000, dtype=np.uint8).tobytes()
    assert T._lzw_decode(T._lzw_encode(raw), len(raw)) == raw
    short = b"\x07" * 100
    assert T._lzw_decode(T._lzw_encode(short), 100) == short


@pytest.mark.parametrize("comp", ["none", "packbits", "lzw"])
@pytest.mark.parametrize("big_endian", [False, True])
def test_roundtrip_compressions_byte_orders(comp, big_endian):
    for shape, rps in [((37, 23, 3), None), ((16, 16, 1), 7), ((5, 301, 3), 2)]:
        pix = _grad(shape)
        p = T.encode_tiff(
            pix, compression=comp, big_endian=big_endian, rows_per_strip=rps
        )
        back = T.decode_tiff(p)
        assert back.shape == pix.shape
        assert (back == pix).all()
        d = probe_tiff(p)
        assert (d["width"], d["height"]) == (shape[1], shape[0])


def test_photometric_white_is_zero_inverts():
    g = np.arange(64, dtype=np.uint8).reshape(8, 8, 1)
    p = T.encode_tiff(g)
    ent = bytes([6, 1, 3, 0, 1, 0, 0, 0, 1, 0, 0, 0])  # tag 262 = 1 (LE)
    idx = p.find(ent)
    assert idx > 0
    p2 = p[:idx] + bytes([6, 1, 3, 0, 1, 0, 0, 0, 0, 0, 0, 0]) + p[idx + 12 :]
    assert (T.decode_tiff(p2) == 255 - g).all()


def test_unsupported_and_corrupt_raise_not_implemented():
    pix = _grad((8, 8, 3))
    p = T.encode_tiff(pix)
    with pytest.raises(NotImplementedError):
        T.decode_tiff(p[:20])  # truncated IFD
    with pytest.raises(NotImplementedError):
        T.decode_tiff(b"II+\x00" + p[4:])  # BigTIFF magic
    # patch compression to deflate (8): unsupported -> named error
    ent = bytes([3, 1, 3, 0, 1, 0, 0, 0, 1, 0, 0, 0])  # tag 259 = 1 (LE)
    idx = p.find(ent)
    assert idx > 0
    p2 = p[:idx] + bytes([3, 1, 3, 0, 1, 0, 0, 0, 8, 0, 0, 0]) + p[idx + 12 :]
    with pytest.raises(NotImplementedError, match="compression"):
        T.decode_tiff(p2)


def test_media_stage_wiring():
    pix = _grad((24, 31, 3), seed=9)
    p = T.encode_tiff(pix, compression="lzw", big_endian=True)
    feat = mm.tiff_feature(p)
    assert np.allclose(feat, mm._pixel_feature(pix.astype(np.float32)))
    act = mm.MediaFeatureActor(decode="real")
    assert np.allclose(act._feature(p), feat)
    r = mm.resize_tiff(p, 10, 12)
    back = T.decode_tiff(r)
    assert back.shape == (12, 10, 3)
    # nearest-neighbor mapping agrees with the shared resize rule
    ys = (np.arange(12) * 24) // 12
    xs = (np.arange(10) * 31) // 10
    assert (back == pix[ys][:, xs]).all()
