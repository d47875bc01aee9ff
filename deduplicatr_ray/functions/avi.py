"""Motion-JPEG AVI: REAL frame decode + deterministic fixture encoder.

AVI (RIFF 'AVI ') with an 'MJPG' video stream stores one complete
DCT-Huffman JPEG per '00dc' chunk — the one mainstream video container
this repo can decode end-to-end with stdlib + numpy, because every frame
routes through :func:`deduplicatr_ray.functions.jpeg.decode_jpeg`.
Codec streams this module cannot decode (H.264 in AVI, raw 'DIB ', ...)
raise ``NotImplementedError`` naming the ffmpeg seam, exactly like the
arithmetic-JPEG / MP4 branches elsewhere — the caller's quarantine /
fallback channels handle them.

Layout refresher (public AVI 1.0 spec, 'RIFF AVI ' form):

    RIFF('AVI '
      LIST('hdrl' avih(MainAVIHeader)
                  LIST('strl' strh(AVIStreamHeader) strf(BITMAPINFOHEADER)))
      LIST('movi' { '00dc'(jpeg bytes) | LIST('rec ' '00dc'(...) ...) }* )
      [idx1])

Frame chunks may sit directly in 'movi' or be grouped under 'rec '
LISTs (the interleaved-for-CD-ROM layout); both are walked. Chunk ids
are ``SSxx`` where SS is the zero-based stream number in ASCII decimal
and xx is 'dc' (compressed video), 'db' (uncompressed video — rejected
here unless the bytes are a JPEG), 'wb' (audio, skipped).
"""

from __future__ import annotations

import numpy as np

from .containers import _riff_chunks
from .jpeg import decode_jpeg, encode_jpeg

_JPEG_SOI = b"\xff\xd8"


def _movi_video_chunks(payload: bytes):
    """Yield the raw bytes of every video ('..dc'/'..db') chunk in movi
    order, descending into 'rec ' grouping LISTs."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")

    def walk(start: int, end: int):
        for fourcc, s, e in _riff_chunks(payload, start, end):
            if fourcc == b"LIST" and payload[s : s + 4] == b"rec ":
                yield from walk(s + 4, e)
            elif fourcc[2:4] in (b"dc", b"db") and fourcc[:2].isdigit():
                yield fourcc, payload[s:e]

    for fourcc, s, e in _riff_chunks(payload, 12, len(payload)):
        if fourcc == b"LIST" and payload[s : s + 4] == b"movi":
            yield from walk(s + 4, e)
            return
    raise ValueError("AVI without a movi LIST")


def decode_avi_frames(payload: bytes, *, stream: int | None = None) -> np.ndarray:
    """MJPEG AVI bytes -> (n_frames, h, w, 3) uint8 RGB pixels — REAL
    decoding: every '..dc' chunk is a complete JPEG handed to
    :func:`decode_jpeg`. ``stream`` selects one stream number; default
    takes the first video stream seen. Non-JPEG video chunks raise
    ``NotImplementedError`` (the ffmpeg seam); a structurally corrupt
    RIFF raises ``ValueError`` — both are catchable by the quarantine /
    fallback channels."""
    frames: list[np.ndarray] = []
    picked: int | None = stream
    for fourcc, chunk in _movi_video_chunks(payload):
        sno = int(fourcc[:2])
        if picked is None:
            picked = sno
        if sno != picked:
            continue
        if not chunk.startswith(_JPEG_SOI):
            raise NotImplementedError(
                "AVI video chunk is not Motion-JPEG (codec decode needs "
                "ffmpeg; stdlib-real AVI support is MJPG streams)"
            )
        px = decode_jpeg(chunk)
        if px.ndim == 2:
            px = px[..., None]
        if px.shape[2] == 1:
            px = np.repeat(px, 3, axis=2)
        frames.append(px)
    if not frames:
        raise NotImplementedError("AVI carries no decodable video frames")
    if len({f.shape for f in frames}) != 1:
        raise NotImplementedError("AVI frames change dimensions mid-stream")
    return np.stack(frames)


def build_avi_mjpeg(
    frames: np.ndarray,
    *,
    fps: int = 30,
    quality: int = 92,
    rec_groups: bool = False,
) -> bytes:
    """(n, h, w, 3) or (n, h, w) uint8 frames -> a complete MJPEG AVI
    (deterministic fixture / inverse seam of :func:`decode_avi_frames`).
    Emits a spec-shaped hdrl (avih + one 'vids'/'MJPG' strl) so
    :func:`deduplicatr_ray.functions.containers.probe_avi` reads dims,
    frame count, duration AND the codec fourcc from it. ``rec_groups``
    wraps each frame chunk in a 'rec ' LIST to exercise the interleaved
    layout."""
    frames = np.asarray(frames)
    if frames.ndim == 3:
        frames = frames[..., None]
    n, h, w, _c = frames.shape

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        return fourcc + len(body).to_bytes(4, "little") + body + b"\x00" * (len(body) & 1)

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    jpegs = [
        encode_jpeg(np.ascontiguousarray(f.squeeze(-1) if f.shape[-1] == 1 else f),
                    quality=quality)
        for f in frames
    ]
    max_bytes = max(len(j) for j in jpegs)
    avih = (
        (1_000_000 // fps).to_bytes(4, "little")        # dwMicroSecPerFrame
        + (max_bytes * fps).to_bytes(4, "little")        # dwMaxBytesPerSec
        + b"\x00" * 4                                    # dwPaddingGranularity
        + (0x10).to_bytes(4, "little")                   # dwFlags: AVIF_HASINDEX off, 0x10=WASCAPTUREFILE-ish benign
        + n.to_bytes(4, "little")                        # dwTotalFrames
        + b"\x00" * 4                                    # dwInitialFrames
        + (1).to_bytes(4, "little")                      # dwStreams
        + max_bytes.to_bytes(4, "little")                # dwSuggestedBufferSize
        + w.to_bytes(4, "little")
        + h.to_bytes(4, "little")
        + b"\x00" * 16
    )
    strh = (
        b"vids" + b"MJPG"                                # fccType, fccHandler
        + b"\x00" * 12                                   # flags, prio+lang, initial
        + (1).to_bytes(4, "little")                      # dwScale
        + fps.to_bytes(4, "little")                      # dwRate (rate/scale = fps)
        + b"\x00" * 4                                    # dwStart
        + n.to_bytes(4, "little")                        # dwLength (frames)
        + max_bytes.to_bytes(4, "little")                # dwSuggestedBufferSize
        + (0xFFFFFFFF).to_bytes(4, "little")             # dwQuality (default)
        + b"\x00" * 4                                    # dwSampleSize (0: varies)
        + (0).to_bytes(2, "little") * 2                  # rcFrame left, top
        + w.to_bytes(2, "little") + h.to_bytes(2, "little")
    )
    strf = (                                             # BITMAPINFOHEADER
        (40).to_bytes(4, "little")
        + w.to_bytes(4, "little") + h.to_bytes(4, "little")
        + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
        + b"MJPG"                                        # biCompression
        + (w * h * 3).to_bytes(4, "little")
        + b"\x00" * 16
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_body = b"".join(
        lst(b"rec ", chunk(b"00dc", j)) if rec_groups else chunk(b"00dc", j)
        for j in jpegs
    )
    body = b"AVI " + hdrl + lst(b"movi", movi_body)
    return b"RIFF" + len(body).to_bytes(4, "little") + body
