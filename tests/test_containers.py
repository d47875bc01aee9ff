"""Container probing: typed metadata without codec decode
(functions/containers.py + stages/multimodal.py probe_media /
media_probe_stage) — ISO-BMFF/MP4, MP3/ID3, Ogg Vorbis/Opus, plus
header-only probes of every stdlib-decodable format."""

from __future__ import annotations

import numpy as np
import pytest

from deduplicatr_ray.functions import containers as ct
from deduplicatr_ray.stages import multimodal as mm


def test_mp4_video_audio_roundtrip():
    p = ct.build_mp4(
        duration_ms=2500,
        width=640,
        height=360,
        n_frames=75,
        audio_codec=b"mp4a",
        sample_rate=48000,
        channels=2,
        mdat=b"\x42" * 100,
    )
    d = ct.probe_mp4(p)
    assert d["container"] == "mp4/isom"
    assert d["codec"] == "avc1,mp4a"
    assert (d["width"], d["height"]) == (640, 360)
    assert d["duration_ms"] == 2500
    assert d["n_frames"] == 75
    assert (d["sample_rate"], d["channels"]) == (48000, 2)
    assert d["n_streams"] == 2


def test_mp4_version1_boxes_and_audio_only():
    d = ct.probe_mp4(
        ct.build_mp4(
            duration_ms=7000, width=320, height=240, n_frames=10, version1=True
        )
    )
    assert (d["width"], d["height"], d["duration_ms"]) == (320, 240, 7000)
    a = ct.probe_mp4(
        ct.build_mp4(
            duration_ms=1500,
            audio_codec=b"mp4a",
            sample_rate=44100,
            channels=1,
        )
    )
    assert a["codec"] == "mp4a"
    assert a["width"] is None and a["n_frames"] is None
    assert (a["sample_rate"], a["channels"]) == (44100, 1)


def test_mp4_corruption_raises_value_error():
    p = ct.build_mp4(duration_ms=100, width=16, height=16, n_frames=1)
    with pytest.raises(ValueError):
        ct.probe_mp4(p[:40])  # truncated box
    with pytest.raises(ValueError):
        ct.probe_mp4(b"\x00" * 32)  # no ftyp
    # ftyp-only (no moov: a streaming fragment) is structurally valid
    # but unprobeable
    ftyp = p[: int.from_bytes(p[:4], "big")]
    with pytest.raises(ValueError, match="moov"):
        ct.probe_mp4(ftyp)


def test_mp3_cbr_walk_exact_duration():
    d = ct.probe_mp3(ct.build_mp3(n_frames=38, id3_payload=b"\x00" * 50))
    assert d["container"] == "mp3"
    assert d["n_frames"] == 38
    assert d["sample_rate"] == 44100 and d["channels"] == 2
    # 38 frames * 1152 samples / 44100 Hz = 992.6 ms
    assert d["duration_ms"] == round(38 * 1152 * 1000 / 44100)


def test_mp3_mono_low_rate_and_trailing_id3v1():
    p = ct.build_mp3(n_frames=20, bitrate_kbps=64, rate=32000, mono=True)
    d = ct.probe_mp3(p)
    assert (d["sample_rate"], d["channels"], d["n_frames"]) == (32000, 1, 20)
    # an ID3v1 tail tag must not be counted as frames
    d2 = ct.probe_mp3(p + b"TAG" + b"\x00" * 125)
    assert d2["n_frames"] == 20


def test_mp3_sync_scan_and_garbage():
    p = ct.build_mp3(n_frames=5)
    assert ct.probe_mp3(b"\x00\x01\x02" + p)["n_frames"] == 5  # junk prefix
    with pytest.raises(ValueError):
        ct.probe_mp3(b"\x00" * 4096)
    with pytest.raises(ValueError):
        ct.probe_mp3(b"ID3\x03\x00\x00\x7f\x7f\x7f\x7f")  # tag overruns


def test_ogg_vorbis_and_opus():
    v = ct.probe_ogg(
        ct.build_ogg(codec="vorbis", rate=44100, channels=2, granule=44100 * 3)
    )
    assert v["codec"] == "vorbis"
    assert (v["sample_rate"], v["channels"]) == (44100, 2)
    assert v["duration_ms"] == 3000
    o = ct.probe_ogg(
        ct.build_ogg(codec="opus", rate=48000, channels=1, granule=96000)
    )
    assert o["codec"] == "opus" and o["duration_ms"] == 2000
    with pytest.raises(ValueError):
        ct.probe_ogg(b"OggS\x01" + b"\x00" * 40)  # bad version
    with pytest.raises(ValueError):
        ct.probe_ogg(b"not ogg at all, clearly " * 2)


def test_mkv_webm_and_matroska():
    p = ct.build_mkv(
        doctype="webm",
        duration_ms=5500,
        width=1280,
        height=720,
        video_codec="V_VP9",
        audio_codec="A_OPUS",
        sample_rate=48000,
        channels=2,
        cluster=b"\x42" * 300,
    )
    d = ct.probe_mkv(p)
    assert d["container"] == "webm"
    assert d["codec"] == "V_VP9,A_OPUS"
    assert (d["width"], d["height"], d["duration_ms"]) == (1280, 720, 5500)
    assert (d["sample_rate"], d["channels"], d["n_streams"]) == (48000, 2, 2)
    m = ct.probe_mkv(
        ct.build_mkv(
            doctype="matroska",
            duration_ms=None,
            width=640,
            height=480,
            video_codec="V_MPEG4/ISO/AVC",
        )
    )
    assert m["container"] == "matroska"
    assert m["duration_ms"] is None and m["n_streams"] == 1
    # dispatch through the stage-level prober
    assert mm.probe_media(p)["container"] == "webm"
    with pytest.raises(ValueError):
        ct.probe_mkv(p[:20])  # truncated element
    with pytest.raises(ValueError):
        ct.probe_mkv(b"\x42\x45\xdf\xa3" + b"\x00" * 30)  # wrong magic


def test_probe_media_header_only_agrees_with_real_decoders():
    from deduplicatr_ray.functions.gif import encode_gif
    from deduplicatr_ray.functions.jpeg import encode_jpeg

    rng = np.random.Generator(np.random.PCG64(3))
    pix = mm._gen_pixels(rng)
    h, w = pix.shape[:2]
    q = ((pix >> 6) << 6).astype(np.uint8)
    colors, inv = np.unique(q.reshape(-1, 3), axis=0, return_inverse=True)
    idx = inv.astype(np.uint8).reshape(1, h, w)
    gif3 = encode_gif(
        np.concatenate([idx, idx, idx]), colors.astype(np.uint8)
    )
    checks = {
        "pnm": (mm.encode_pnm(pix), "p6"),
        "png": (mm.encode_png(pix, filter_type=2, interlace=True), "png8"),
        "jpeg-progressive": (
            encode_jpeg(pix, subsampling="444", progressive=True),
            "jpeg-progressive",
        ),
        "jpeg-baseline": (
            encode_jpeg(pix, subsampling="420"),
            "jpeg-baseline",
        ),
        "bmp": (mm.encode_bmp(pix), "bmp24"),
    }
    for name, (payload, codec) in checks.items():
        d = mm.probe_media(payload)
        assert d["codec"] == codec, name
        assert (d["width"], d["height"]) == (w, h), name
    g = mm.probe_media(gif3)
    assert g["n_frames"] == 3 and (g["width"], g["height"]) == (w, h)
    wav = mm._gen_wav(rng)
    samples, rate = mm.decode_wav(wav)
    dw = mm.probe_media(wav)
    assert dw["sample_rate"] == rate and dw["n_frames"] == len(samples)
    assert dw["duration_ms"] == round(len(samples) * 1000 / rate)
    y4m = mm._gen_y4m(rng)
    frames = mm.decode_y4m(y4m)
    dy = mm.probe_media(y4m)
    assert dy["n_frames"] == frames.shape[0]
    assert (dy["width"], dy["height"]) == (frames.shape[2], frames.shape[1])


def test_probe_media_rejects_unknown_and_corrupt():
    with pytest.raises(ValueError):
        mm.probe_media(b"\x01\x02\x03\x04garbage bytes here")
    # magic matches but structure is corrupt -> ValueError, never a raw
    # IndexError/struct.error escaping into the stage
    p = ct.build_mp4(duration_ms=10, width=8, height=8, n_frames=1)
    with pytest.raises(ValueError):
        mm.probe_media(p[:30])
    with pytest.raises(ValueError):
        mm.probe_media(b"GIF89a\x10\x00\x10\x00\x00\x00\x00\xff")
    with pytest.raises(ValueError):
        mm.probe_media(mm._PNG_SIG + b"\x00" * 8)
    with pytest.raises(ValueError):
        mm.probe_media(b"\xff\xd8\xff\xe0\x00\x04\x00\x00")  # no SOF


def test_media_probe_stage_end_to_end(ray_session):
    media = mm.gen_fake_media(30).union(mm.gen_container_media(12))
    out = media_probe_df(media)
    assert len(out) == 42
    bad = out[~out["probe_ok"]]
    good = out[out["probe_ok"]]
    # the only unprobeable rows are gen_fake_media's opaque random blobs
    assert all(m.startswith("media://") for m in bad["media_id"])
    assert (bad["container"].isna()).all()
    assert bad["probe_error"].str.len().gt(0).all()
    # every codec-container row probed with full typed metadata
    codec_rows = out[out["media_id"].str.startswith("codec://")]
    assert codec_rows["probe_ok"].all()
    assert codec_rows["container"].value_counts().to_dict() == {
        "mp4/isom": 2,  # 12 rows = one pass of the 12-container rotation
        "mp3": 2,
        "ogg": 2,
        "webm": 1,
        "matroska": 1,
        "webp": 1,
        "tiff": 1,
        "avi": 1,
        "ico": 1,
    }
    # probed kinds carry duration for all audio containers
    audio = codec_rows[codec_rows["kind"] == "audio"]
    assert audio["duration_ms"].gt(0).all()
    # decodable fixture rows: dims/duration populated per kind
    img = good[good["kind"] == "image"]
    assert img["width"].gt(0).all() and img["height"].gt(0).all()


def media_probe_df(media):
    import pandas as pd  # noqa: F401

    return (
        mm.media_probe_stage(media)
        .to_pandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )


def test_mp4_fragmented_dash_layout():
    # fMP4: mvhd duration 0, mvex/mehd carries it; frame count comes
    # from summing moof/traf/trun sample counts
    p = ct.build_mp4(
        duration_ms=8000,
        width=640,
        height=360,
        n_frames=0,
        fragments=[30, 30, 15],
    )
    d = ct.probe_mp4(p)
    assert d["duration_ms"] == 8000
    assert d["n_frames"] == 75
    assert (d["width"], d["height"]) == (640, 360)
    # and dispatches through the stage-level prober
    assert mm.probe_media(p)["n_frames"] == 75


def test_webp_tiff_avi_probes():
    w = ct.probe_webp(ct.build_webp(width=320, height=240))
    assert (w["codec"], w["width"], w["height"]) == ("vp8", 320, 240)
    wl = ct.probe_webp(ct.build_webp(width=100, height=50, lossless=True))
    assert (wl["codec"], wl["width"], wl["height"]) == ("vp8l", 100, 50)
    wa = ct.probe_webp(ct.build_webp(width=64, height=64, n_frames=5))
    assert wa["codec"] == "vp8x-anim" and wa["n_frames"] == 5
    t = ct.probe_tiff(ct.build_tiff(width=800, height=600, compression=5))
    assert (t["codec"], t["width"], t["height"]) == ("tiff-lzw", 800, 600)
    t3 = ct.probe_tiff(
        ct.build_tiff(width=80, height=60, pages=3, big_endian=True)
    )
    assert t3["n_frames"] == 3  # chained IFDs = multi-page
    a = ct.probe_avi(
        ct.build_avi(width=640, height=480, n_frames=120, fps=30, streams=2)
    )
    assert (a["width"], a["height"], a["n_frames"]) == (640, 480, 120)
    assert a["duration_ms"] == 4000 and a["n_streams"] == 2
    # stage dispatch: RIFF family fans out by form type; TIFF by magic
    assert mm.probe_media(ct.build_webp())["container"] == "webp"
    assert mm.probe_media(ct.build_avi())["container"] == "avi"
    assert mm.probe_media(ct.build_tiff())["container"] == "tiff"
    with pytest.raises(ValueError):
        ct.probe_webp(b"RIFF\x10\x00\x00\x00WEBPxxxxyyyyzzzz")  # no VP8*
    with pytest.raises(ValueError):
        ct.probe_tiff(b"II*\x00\xff\xff\xff\xff")  # IFD overrun
    with pytest.raises(ValueError):
        ct.probe_avi(b"RIFF\x08\x00\x00\x00AVI zzzz")  # no avih


def test_ico_probe_and_decode():
    rng = np.random.Generator(np.random.PCG64(2))
    pix = mm._gen_pixels(rng)
    h, w = pix.shape[:2]
    png_small = mm.encode_png(pix[:16, :16])
    png_full = mm.encode_png(pix)
    dib = mm.encode_ico_dib(pix)
    # mixed directory: probe + decode pick the LARGEST entry
    ico = ct.build_ico([(16, 16, png_small), (w, h, png_full)])
    d = ct.probe_ico(ico)
    assert (d["codec"], d["width"], d["height"], d["n_frames"]) == (
        "png", w, h, 2,
    )
    assert (mm.decode_ico(ico) == pix).all()
    # DIB entry: doubled-height header + AND mask handled
    ico2 = ct.build_ico([(w, h, dib)])
    assert ct.probe_ico(ico2)["codec"] == "bmp24"
    assert (mm.decode_ico(ico2) == pix).all()
    assert np.allclose(
        mm.ico_feature(ico2), mm._pixel_feature(pix.astype(np.float32))
    )
    # dispatch + actor path
    assert mm.probe_media(ico)["container"] == "ico"
    act = mm.MediaFeatureActor(decode="real")
    assert np.allclose(act._feature(ico2), mm.ico_feature(ico2))
    # corruption
    with pytest.raises(ValueError):
        ct.probe_ico(b"\x00\x00\x01\x00\x02\x00" + b"\x00" * 8)
    with pytest.raises(NotImplementedError):
        mm.decode_ico(ico[: 6 + 16 + 4])


def test_probe_media_fuzz_truncations_and_mutations():
    """Stage contract: probe_media either returns a dict or raises
    ValueError — NEVER a raw IndexError/struct.error/OverflowError that
    would escape media_probe_stage's quarantine handler and kill the
    task. Sweep every truncation prefix and seeded byte mutations of
    one valid payload per container."""
    rng = np.random.Generator(np.random.PCG64(17))
    pix = mm._gen_pixels(rng)
    h, w = pix.shape[:2]
    from deduplicatr_ray.functions.jpeg import encode_jpeg
    from deduplicatr_ray.functions.tiff import encode_tiff

    payloads = [
        ct.build_mp4(duration_ms=900, width=32, height=24, n_frames=9,
                     audio_codec=b"mp4a"),
        ct.build_mp4(duration_ms=900, width=32, height=24, n_frames=0,
                     fragments=[3, 4]),
        ct.build_mp3(n_frames=6, id3_payload=b"\x00" * 30),
        ct.build_ogg(codec="vorbis", granule=44100),
        ct.build_mkv(doctype="webm", duration_ms=700, width=64, height=48,
                     audio_codec="A_OPUS"),
        ct.build_webp(width=40, height=30),
        ct.build_webp(width=40, height=30, n_frames=3),
        ct.build_tiff(width=20, height=10, compression=5),
        ct.build_avi(width=64, height=48, n_frames=12),
        ct.build_ico([(w, h, mm.encode_ico_dib(pix))]),
        mm.encode_png(pix),
        encode_jpeg(pix),
        mm.encode_bmp(pix),
        mm.encode_pnm(pix),
        mm._gen_wav(rng),
        mm._gen_y4m(rng),
        encode_tiff(pix, compression="packbits", big_endian=True),
        ct.build_flac(total_samples=44100, n_padding_blocks=2),
        ct.build_adts(n_frames=9),
    ]
    for p in payloads:
        mm.probe_media(p)  # the intact payload must probe
        step = max(1, len(p) // 97)  # ~100 truncation points each
        for cut in range(0, len(p), step):
            try:
                mm.probe_media(p[:cut])
            except ValueError:
                pass  # the ONLY allowed failure type
        for k in range(40):  # seeded single-byte corruptions
            i = int(rng.integers(0, len(p)))
            q = bytearray(p)
            q[i] ^= int(rng.integers(1, 256))
            try:
                mm.probe_media(bytes(q))
            except ValueError:
                pass


def test_probe_flac():
    f = ct.build_flac(
        rate=48000, channels=1, bps=24, total_samples=96000
    )
    out = ct.probe_flac(f)
    assert out["container"] == "flac" and out["codec"] == "flac24"
    assert out["duration_ms"] == 2000 and out["sample_rate"] == 48000
    assert out["channels"] == 1 and out["n_frames"] == 96000
    # dispatcher routes on the fLaC magic
    assert mm.probe_media(f)["container"] == "flac"
    # no padding blocks: STREAMINFO carries the last-block flag
    solo = ct.build_flac(n_padding_blocks=0)
    assert ct.probe_flac(solo)["duration_ms"] == 2000
    # corruption
    with pytest.raises(ValueError):
        ct.probe_flac(b"fLaC" + b"\x00\x00\x00")  # truncated block header
    with pytest.raises(ValueError):
        ct.probe_flac(f[:20])  # STREAMINFO overruns
    bad = bytearray(f)
    bad[4] = 0x01  # first block not STREAMINFO
    with pytest.raises(ValueError):
        ct.probe_flac(bytes(bad))


def test_probe_adts_aac():
    a = ct.build_adts(n_frames=43, rate=22050, channels=2, profile=2)
    out = ct.probe_adts(a)
    assert out["container"] == "adts" and out["codec"] == "aac-lc"
    assert out["n_frames"] == 43 and out["sample_rate"] == 22050
    assert out["duration_ms"] == round(43 * 1024 * 1000 / 22050)
    # dispatcher: 0xFFF sync + layer 00 routes to ADTS, not MP3...
    assert mm.probe_media(a)["container"] == "adts"
    # ...while real MPEG audio (nonzero layer bits) still routes to MP3
    m = ct.build_mp3(n_frames=6)
    assert mm.probe_media(m)["container"] == "mp3"
    # truncated final frame is dropped from the walk
    out2 = ct.probe_adts(a[:-30])
    assert out2["n_frames"] == 42
    with pytest.raises(ValueError):
        ct.probe_adts(b"\xff\xf1\x00")  # truncated header
    with pytest.raises(ValueError):
        # reserved sampling index
        bad = bytearray(ct.build_adts(n_frames=2))
        bad[2] = (bad[2] & 0xC3) | (0x0F << 2)
        ct.probe_adts(bytes(bad))
