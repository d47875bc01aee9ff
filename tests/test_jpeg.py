"""Baseline-JPEG codec tests (functions/jpeg.py): hermetic roundtrips
through every decoder path (444/420 subsampling, restart markers, gray),
plus variant rejection. No Ray needed — pure codec."""

import numpy as np
import pytest

from deduplicatr_ray.functions.jpeg import (
    _UNZIGZAG,
    _ZIGZAG,
    decode_jpeg,
    encode_jpeg,
)


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            yy * 255 // max(1, h - 1),
            xx * 255 // max(1, w - 1),
            ((yy + xx) * 255) // max(1, h + w - 2),
        ],
        axis=-1,
    ).astype(np.uint8)


def test_zigzag_is_a_permutation_with_known_prefix():
    assert sorted(_ZIGZAG.tolist()) == list(range(64))
    # spec scan order starts (0,0),(0,1),(1,0),(2,0),(1,1),(0,2)
    assert _ZIGZAG[:6].tolist() == [0, 1, 8, 16, 9, 2]
    assert (_ZIGZAG[_UNZIGZAG] == np.arange(64)).all()


def test_solid_color_near_exact():
    solid = np.full((16, 24, 3), [180, 60, 120], np.uint8)
    back = decode_jpeg(encode_jpeg(solid, quality=90))
    assert back.shape == solid.shape
    assert np.abs(back.astype(int) - solid.astype(int)).max() <= 2


@pytest.mark.parametrize("sub", ["444", "420"])
@pytest.mark.parametrize("ri", [0, 3])
def test_gradient_roundtrip_all_paths(sub, ri):
    # 33x41 is a non-multiple of 16: stresses MCU padding in both modes
    grad = _gradient(33, 41)
    back = decode_jpeg(
        encode_jpeg(grad, quality=95, subsampling=sub, restart_interval=ri)
    )
    assert back.shape == grad.shape
    err = np.abs(back.astype(int) - grad.astype(int))
    assert err.mean() < 3.0 and err.max() <= (4 if sub == "444" else 12)


def test_grayscale_roundtrip():
    gray = _gradient(24, 24)[..., 0]
    back = decode_jpeg(encode_jpeg(gray, quality=95))
    assert back.shape == (24, 24, 1)
    assert np.abs(back[..., 0].astype(int) - gray.astype(int)).max() <= 2


def test_noise_bounded_error():
    rng = np.random.default_rng(0)
    noise = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    back = decode_jpeg(encode_jpeg(noise, quality=95))
    # noise is JPEG's worst case; still bounded at q95
    assert np.abs(back.astype(int) - noise.astype(int)).mean() < 8.0


def test_restart_markers_reset_predictors():
    # alternating extreme rows make DC prediction matter; restart every MCU
    img = np.zeros((8, 64, 3), np.uint8)
    img[:, ::2] = 255
    back = decode_jpeg(encode_jpeg(img, quality=90, restart_interval=1))
    assert back.shape == img.shape


def test_unsupported_variants_raise():
    with pytest.raises(NotImplementedError):
        decode_jpeg(b"not a jpeg")
    grad = _gradient(16, 16)
    payload = bytearray(encode_jpeg(grad))
    sof = payload.index(b"\xff\xc0")
    payload[sof + 1] = 0xC9  # rewrite SOF0 -> SOF9 (arithmetic coding)
    with pytest.raises(NotImplementedError, match="SOF marker"):
        decode_jpeg(bytes(payload))
    with pytest.raises(ValueError):
        encode_jpeg(grad, subsampling="422")
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((4, 4, 2), np.uint8))
    with pytest.raises(ValueError):  # progressive is 444-only, no restarts
        encode_jpeg(grad, progressive=True, subsampling="420")
    with pytest.raises(ValueError):
        encode_jpeg(grad, progressive=True, restart_interval=2)


def test_progressive_roundtrip_identical_to_baseline():
    """The progressive scan script carries the SAME quantized coefficients
    as baseline (DC split Al=1 + refine, split spectral AC bands), so the
    reconstruction must be bit-identical."""
    grad = _gradient(33, 41)
    base = decode_jpeg(encode_jpeg(grad, quality=95))
    prog = decode_jpeg(encode_jpeg(grad, quality=95, progressive=True))
    assert (base == prog).all()
    gray = grad[..., 0]
    bg = decode_jpeg(encode_jpeg(gray, quality=95))
    pg = decode_jpeg(encode_jpeg(gray, quality=95, progressive=True))
    assert (bg == pg).all()


def test_progressive_noise_roundtrip():
    # dense AC coefficients stress ZRL/EOB paths in the band scans
    rng = np.random.default_rng(1)
    noise = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(noise, quality=95))
    prog = decode_jpeg(encode_jpeg(noise, quality=95, progressive=True))
    assert (base == prog).all()


def test_decodes_progressive_system_jpegs():
    """Real libjpeg progressive streams, including AC successive
    approximation (Al=1 first scans + Ah=1 refinement scans) the hermetic
    encoder does not emit. Content is known (white stripes): the decode
    must land near-white, and a refine-path bug would produce noise."""
    import os

    path = "/usr/share/doc/nodejs/full-white-stripe.jpg"
    if not os.path.exists(path):
        pytest.skip("no progressive system fixture present")
    pix = decode_jpeg(open(path, "rb").read())
    assert pix.shape == (312, 493, 3)
    assert pix.mean() > 245
    assert (pix[150:160, 240:250] == 255).all()  # stripe interior is white
    thin = "/usr/share/doc/nodejs/thin-white-stripe.jpg"
    if os.path.exists(thin):
        pix = decode_jpeg(open(thin, "rb").read())
        assert pix.shape == (58, 493, 3)
        assert pix.mean() > 200


def test_decodes_independent_system_jpegs():
    """Cross-validate against files produced by a real libjpeg encoder
    (one 4:2:0 subsampled, one with DRI restart markers). Skipped when the
    sandbox image lacks them — the hermetic roundtrips above still cover
    both decode paths via the encoder."""
    import os

    fixtures = [
        # (path, expected shape, expected mean range)
        (
            "/usr/lib/google-cloud-sdk/platform/gsutil/third_party/"
            "requests/ext/flower-of-life.jpg",
            (161, 161, 3),
            (200, 230),
        ),
        (
            "/usr/lib/google-cloud-sdk/platform/gsutil/third_party/"
            "pyparsing/docs/_static/pyparsingClassDiagram_1.5.2.jpg",
            (1659, 1155, 3),
            (225, 250),
        ),
    ]
    found = 0
    for path, shape, (lo, hi) in fixtures:
        if not os.path.exists(path):
            continue
        pix = decode_jpeg(open(path, "rb").read())
        assert pix.shape == shape
        assert lo < pix.mean() < hi
        found += 1
    if not found:
        pytest.skip("no system JPEG fixtures present")


def test_non_integer_sampling_ratio_raises_named_error():
    # legal-per-spec 3:2 factors the np.repeat upsample can't express must
    # raise the module's NotImplementedError, not a np.stack shape crash
    from deduplicatr_ray.functions.jpeg import _reconstruct

    frame = (16, 16, [(1, 3, 3, 0), (2, 2, 2, 0), (3, 2, 2, 0)])
    store = {1: np.zeros((9, 64)), 2: np.zeros((4, 64)), 3: np.zeros((4, 64))}
    qtabs = {0: np.ones(64, np.int32)}
    with pytest.raises(NotImplementedError, match="sampling ratio"):
        _reconstruct(frame, store, qtabs)
