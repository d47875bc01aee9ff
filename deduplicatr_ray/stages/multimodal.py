"""Multimodal column plumbing + stdlib-real decoders (task-brief family).

Image/audio/video payloads are opaque ``binary`` columns with typed metadata
(SURVEY.md data-model convention for wide binary rows). The Ray-side
plumbing — schemas, actor-pool signatures, small batch sizes for large
payloads, output layout — is real and tested. Decode modes:

* ``decode=\"real\"``: REAL decoding for the stdlib-decodable formats —
  WAV/PCM audio (stdlib ``wave``), 8-bit PNG (stdlib ``zlib`` inflate +
  numpy unfiltering of all five scanline filters), DCT-Huffman
  JPEG, baseline AND progressive (``functions/jpeg.py``: canonical
  Huffman + vectorized IDCT, subsampling, restart markers, successive
  approximation), GIF87a/89a incl. animation (``functions/gif.py``:
  variable-width LZW, interlacing, transparency + disposal compositing),
  binary PPM/PGM images (numpy header parse),
  uncompressed 24/32-bit BMP images (struct header parse) and YUV4MPEG2
  (y4m) raw video (ASCII header + planar YUV frames, vectorized BT.601
  conversion) — producing real sample/pixel-derived features, real
  nearest-neighbor resizes and real per-frame sampling. Formats needing
  an actual external codec (arithmetic-coded JPEG/MP4...) raise
  ``NotImplementedError`` naming the needed library (``fallback=True``
  routes them to the deterministic stand-in instead, so mixed tables keep
  flowing) — but their CONTAINER metadata is still fully extracted by
  ``media_probe_stage`` (ISO-BMFF/MP4, MP3/ID3, Ogg Vorbis/Opus via
  ``functions/containers.py``), so routing/filtering never needs the
  codec.
* ``decode=\"fake\"``: deterministic, dependency-free stand-in
  (byte-histogram features, metadata-derived shapes) exercising the full
  data path.
"""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np
import pyarrow as pa


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV/PCM bytes -> (mono float32 samples in [-1, 1], sample rate).
    Stdlib ``wave`` + numpy only — real decoding, no codec libraries."""
    import io
    import wave

    with wave.open(io.BytesIO(payload)) as w:
        rate = w.getframerate()
        ch = w.getnchannels()
        sw = w.getsampwidth()
        raw = w.readframes(w.getnframes())
    if sw == 1:
        x = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128.0) / 128.0
    elif sw == 2:
        x = np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0
    elif sw == 4:
        x = np.frombuffer(raw, np.int32).astype(np.float32) / 2147483648.0
    else:
        raise NotImplementedError(f"unsupported WAV sample width {sw}")
    if ch > 1:
        x = x.reshape(-1, ch).mean(axis=1)
    return x, rate


def decode_pnm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) / PGM (P5) bytes -> (h, w, c) uint8 pixels.
    Pure-numpy header parse — real decoding, no image libraries.
    maxval > 255 streams are two-byte big-endian samples (PNM spec);
    any maxval != 255 rescales to the full 8-bit range (rounded
    v*255/maxval)."""
    if payload[:2] not in (b"P5", b"P6"):
        raise NotImplementedError("not a binary PGM/PPM payload")
    # header: magic, width, height, maxval as whitespace-separated tokens
    # (with '#' comments), then ONE whitespace byte, then raw pixel data
    tokens: list[bytes] = []
    i = 2
    while len(tokens) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        tokens.append(payload[i:j])
        i = j
    i += 1  # the single whitespace after maxval
    w, h, maxval = int(tokens[0]), int(tokens[1]), int(tokens[2])
    if not (0 < maxval < 65536):
        raise NotImplementedError(f"illegal PNM maxval {maxval}")
    c = 3 if payload[:2] == b"P6" else 1
    if maxval > 255:  # two bytes per sample, big-endian
        pix2 = np.frombuffer(payload, np.uint8, count=h * w * c * 2, offset=i)
        v = pix2.reshape(h, w, c, 2).astype(np.uint32)
        samples = (v[..., 0] << 8) | v[..., 1]
    else:
        samples = np.frombuffer(
            payload, np.uint8, count=h * w * c, offset=i
        ).reshape(h, w, c)
        if maxval == 255:
            return samples
        samples = samples.astype(np.uint32)
    # clip guards corrupt streams carrying samples above maxval
    scaled = (samples * 255 + maxval // 2) // maxval
    return np.minimum(scaled, 255).astype(np.uint8)


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed BI_RGB BMP bytes -> (h, w, 3) uint8 RGB. Pure
    struct/numpy header parse — real decoding, no image libraries.
    24/32-bit truecolor (alpha dropped) AND 1/4/8-bit palette (indices
    mapped through the BGRA color table — the favicon formats); bottom-up
    and top-down row orders both handled; RLE compression raises
    ``NotImplementedError``."""
    import struct

    if payload[:2] != b"BM":
        raise NotImplementedError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER BMP not supported")
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    comp = struct.unpack_from("<I", payload, 30)[0]
    rle = (comp, bpp) in ((1, 8), (2, 4))
    if (comp != 0 and not rle) or bpp not in (1, 4, 8, 24, 32) or w <= 0 or h == 0:
        raise NotImplementedError(
            f"only uncompressed or RLE4/RLE8 BI_RGB BMP supported "
            f"(bpp={bpp}, compression={comp})"
        )
    if rle:
        return _decode_bmp_rle(payload, w, h, bpp, data_off, hdr_size)
    if bpp in (1, 4, 8):
        return _decode_bmp_palette(payload, w, h, bpp, data_off, hdr_size)
    bottom_up = h > 0
    h = abs(h)
    nch = bpp // 8
    row_bytes = (w * nch + 3) & ~3
    buf = np.frombuffer(payload, np.uint8, count=row_bytes * h, offset=data_off)
    rows = buf.reshape(h, row_bytes)[:, : w * nch].reshape(h, w, nch)
    if bottom_up:
        rows = rows[::-1]
    return np.ascontiguousarray(rows[..., 2::-1])  # BGR(A) -> RGB


def _bmp_palette(payload: bytes, bpp: int, hdr_size: int) -> np.ndarray:
    """BGRA color-table quads right after the info header -> (n, 3) RGB."""
    import struct

    n_colors = struct.unpack_from("<I", payload, 46)[0] or (1 << bpp)
    quads = np.frombuffer(
        payload, np.uint8, count=n_colors * 4, offset=14 + hdr_size
    ).reshape(n_colors, 4)
    return quads[:, 2::-1]


def _decode_bmp_rle(
    payload: bytes, w: int, h: int, bpp: int, data_off: int, hdr_size: int
) -> np.ndarray:
    """RLE8 (compression 1) / RLE4 (compression 2) BMP body -> (h, w, 3)
    uint8 RGB: encoded runs, absolute groups (word-aligned), and the
    0/1/2 escapes (end-of-line, end-of-bitmap, delta). Rows are in file
    order (bottom-up unless height < 0); structural overruns raise the
    media-family ``NotImplementedError``."""
    bottom_up = h > 0
    h = abs(h)
    palette = _bmp_palette(payload, bpp, hdr_size)
    idx = np.zeros((h, w), np.uint8)
    i, x, y, n = data_off, 0, 0, len(payload)

    def put(vals: np.ndarray) -> None:
        nonlocal x
        if y >= h or x + len(vals) > w:
            raise NotImplementedError("BMP RLE run overruns row/bitmap")
        idx[y, x : x + len(vals)] = vals
        x += len(vals)

    while True:
        if i + 2 > n:
            raise NotImplementedError("truncated BMP RLE stream")
        cnt, b = payload[i], payload[i + 1]
        i += 2
        if cnt > 0:  # encoded run
            if bpp == 8:
                put(np.full(cnt, b, np.uint8))
            else:
                pair = np.array([b >> 4, b & 0xF], np.uint8)
                put(np.resize(pair, cnt))
        elif b == 0:  # end of line
            x, y = 0, y + 1
        elif b == 1:  # end of bitmap
            break
        elif b == 2:  # delta
            if i + 2 > n:
                raise NotImplementedError("truncated BMP RLE delta")
            x += payload[i]
            y += payload[i + 1]
            i += 2
        else:  # absolute group of b pixels, word-aligned
            nbytes = b if bpp == 8 else (b + 1) // 2
            if i + nbytes > n:
                raise NotImplementedError("truncated BMP RLE absolute run")
            raw = np.frombuffer(payload, np.uint8, count=nbytes, offset=i)
            if bpp == 8:
                put(raw)
            else:
                nib = np.empty(nbytes * 2, np.uint8)
                nib[0::2] = raw >> 4
                nib[1::2] = raw & 0xF
                put(nib[:b])
            i += nbytes + (nbytes & 1)  # pad to word boundary
    if int(idx.max(initial=0)) >= len(palette):
        raise NotImplementedError("BMP palette index out of range")
    pix = palette[idx]
    if bottom_up:
        pix = pix[::-1]
    return np.ascontiguousarray(pix)


def encode_bmp_rle(
    idx: np.ndarray, palette: np.ndarray, *, bpp: int = 8
) -> bytes:
    """(h, w) palette indices + (n, 3) RGB palette -> RLE8/RLE4 BMP
    bytes (simple run emitter, one end-of-line per row) for
    fixtures/tests."""
    import struct

    h, w = idx.shape
    comp = 1 if bpp == 8 else 2
    body = bytearray()
    rows = idx[::-1]  # file order is bottom-up
    for r in range(h):
        row = rows[r]
        x = 0
        while x < w:
            run = 1
            if bpp == 8:
                while x + run < w and run < 255 and row[x + run] == row[x]:
                    run += 1
                body += bytes([run, int(row[x])])
            else:
                a = int(row[x])
                b = int(row[x + 1]) if x + 1 < w else a
                while (
                    x + run < w
                    and run < 255
                    and int(row[x + run]) == (a if run % 2 == 0 else b)
                ):
                    run += 1
                body += bytes([run, (a << 4) | b])
            x += run
        body += b"\x00\x00"  # end of line
    body += b"\x00\x01"  # end of bitmap
    n_colors = len(palette)
    quads = np.zeros((n_colors, 4), np.uint8)
    quads[:, :3] = palette[:, ::-1]  # RGB -> BGR
    data_off = 14 + 40 + 4 * n_colors
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, bpp, comp, len(body), 2835, 2835,
        n_colors, 0,
    )
    header = (
        b"BM"
        + (data_off + len(body)).to_bytes(4, "little")
        + b"\x00" * 4
        + data_off.to_bytes(4, "little")
    )
    return header + info + quads.tobytes() + bytes(body)


def _decode_bmp_palette(
    payload: bytes, w: int, h: int, bpp: int, data_off: int, hdr_size: int
) -> np.ndarray:
    """1/4/8-bit palette BMP body -> (h, w, 3) uint8 RGB. The color table
    (BGRA quads) sits right after the info header; rows are 4-byte aligned
    and bit-packed big-endian-within-byte for the sub-byte depths."""
    import struct

    bottom_up = h > 0
    h = abs(h)
    n_colors = struct.unpack_from("<I", payload, 46)[0] or (1 << bpp)
    tbl_off = 14 + hdr_size
    quads = np.frombuffer(
        payload, np.uint8, count=n_colors * 4, offset=tbl_off
    ).reshape(n_colors, 4)
    palette = quads[:, 2::-1]  # BGRA -> RGB
    row_bytes = ((w * bpp + 7) // 8 + 3) & ~3
    buf = np.frombuffer(
        payload, np.uint8, count=row_bytes * h, offset=data_off
    ).reshape(h, row_bytes)
    if bpp == 8:
        idx = buf[:, :w]
    else:
        bits = np.unpackbits(buf, axis=1)[:, : w * bpp]
        weights = (1 << np.arange(bpp - 1, -1, -1)).astype(np.uint16)
        idx = (
            (bits.reshape(h, w, bpp) * weights)
            .sum(axis=2, dtype=np.uint16)
            .astype(np.uint8)
        )
    if int(idx.max(initial=0)) >= n_colors:
        raise NotImplementedError("BMP palette index out of range")
    pix = palette[idx]
    if bottom_up:
        pix = pix[::-1]
    return np.ascontiguousarray(pix)


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> 24-bit bottom-up BI_RGB BMP bytes
    (inverse of decode_bmp; test/fixture seam)."""
    import struct

    h, w, _ = pixels.shape
    pad = (-(w * 3)) % 4
    bgr = pixels[::-1, :, ::-1]  # bottom-up rows, RGB -> BGR
    if pad:
        body = np.zeros((h, w * 3 + pad), np.uint8)
        body[:, : w * 3] = bgr.reshape(h, w * 3)
        raw = body.tobytes()
    else:
        raw = np.ascontiguousarray(bgr).tobytes()
    hdr = (
        b"BM"
        + struct.pack("<IHHI", 54 + len(raw), 0, 0, 54)
        + struct.pack(
            "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raw), 2835, 2835, 0, 0
        )
    )
    return hdr + raw


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# channels per PNG color type (3 = palette indices, mapped via PLTE)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_unfilter(filt: np.ndarray, ftypes: np.ndarray, bpp: int) -> np.ndarray:
    """Reverse the PNG per-scanline filters (0 None, 1 Sub, 2 Up,
    3 Average, 4 Paeth). ``filt`` is (h, stride) filtered bytes, ``ftypes``
    the per-row filter ids. None/Sub/Up rows are fully vectorized (Sub is a
    mod-256 cumsum over bpp-strided lanes); Average/Paeth rows walk pixels
    left-to-right with bpp-lane numpy ops (the intra-row data dependency is
    inherent to those filters)."""
    h, stride = filt.shape
    recon = np.zeros((h, stride), np.uint8)
    prev = np.zeros(stride, np.int32)
    w = stride // bpp
    for y in range(h):
        row = filt[y].astype(np.int32)
        ft = int(ftypes[y])
        if ft == 0:
            cur = row
        elif ft == 1:  # Sub: cumsum mod 256, lag = bpp
            cur = row.reshape(w, bpp).cumsum(axis=0).reshape(stride) & 0xFF
        elif ft == 2:  # Up
            cur = (row + prev) & 0xFF
        elif ft == 3:  # Average
            cur = row
            left = np.zeros(bpp, np.int32)
            for x in range(0, stride, bpp):
                left = (row[x : x + bpp] + ((left + prev[x : x + bpp]) >> 1)) & 0xFF
                cur[x : x + bpp] = left
        elif ft == 4:  # Paeth
            cur = row
            left = np.zeros(bpp, np.int32)
            upleft = np.zeros(bpp, np.int32)
            for x in range(0, stride, bpp):
                up = prev[x : x + bpp]
                p = left + up - upleft
                pa, pb, pc = (
                    np.abs(p - left),
                    np.abs(p - up),
                    np.abs(p - upleft),
                )
                pred = np.where(
                    (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, upleft)
                )
                left = (row[x : x + bpp] + pred) & 0xFF
                cur[x : x + bpp] = left
                upleft = up
        else:
            raise NotImplementedError(f"unknown PNG filter type {ft}")
        recon[y] = cur.astype(np.uint8)
        prev = cur
    return recon


# Adam7 pass grid (PNG spec 8.2): (x0, y0, dx, dy) per pass — each pass is
# a mini non-interlaced image whose pixels scatter to canvas[y0::dy, x0::dx]
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _png_rows_decode(
    raw: np.ndarray, off: int, ph: int, pw: int, nch: int, depth: int
) -> tuple[np.ndarray, int]:
    """Unfilter + unpack one (sub)image of ``ph`` scanlines starting at byte
    ``off`` of the decompressed IDAT stream; returns ((ph, pw, nch) uint8
    samples, new offset). 16-bit samples reduce to the high byte (the
    standard 16->8 downconversion); sub-byte samples come back RAW
    (0..2^depth-1) — the caller scales gray or maps the palette."""
    rb = (pw * nch * depth + 7) // 8  # scanline bytes, excl. filter byte
    need = ph * (rb + 1)
    if off + need > len(raw):
        raise NotImplementedError("PNG scanline size mismatch")
    rows = raw[off : off + need].reshape(ph, rb + 1)
    bpp = max(1, nch * depth // 8)  # filter lag in BYTES (PNG spec 9.2)
    rec = _png_unfilter(rows[:, 1:], rows[:, 0], bpp)
    if depth == 8:
        out = rec.reshape(ph, pw, nch)
    elif depth == 16:
        out = np.ascontiguousarray(rec.reshape(ph, pw, nch, 2)[..., 0])
    else:  # 1/2/4-bit: big-endian bit packing within each scanline byte
        bits = np.unpackbits(rec, axis=1)[:, : pw * depth]
        weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint16)
        out = (
            (bits.reshape(ph, pw, depth) * weights)
            .sum(axis=2, dtype=np.uint16)
            .astype(np.uint8)[..., None]
        )
    return out, off + need


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, c) uint8 pixels — REAL decoding via stdlib
    ``zlib`` + numpy unfiltering, no image libraries. Supports grayscale
    (c=1), RGB (c=3), palette (mapped to c=3), gray+alpha (c=2) and RGBA
    (c=4) at 8-bit depth, 16-bit for the non-palette color types (samples
    reduce to the high byte, the standard 16->8 downconversion), sub-byte
    1/2/4-bit grayscale and palette, non-interlaced AND Adam7-interlaced
    (each of the 7 passes unfilters as its own mini image, then scatters
    to the canvas grid — r4 verdict item 7)."""
    import struct
    import zlib

    if payload[:8] != _PNG_SIG:
        raise NotImplementedError("not a PNG payload")
    i = 8
    idat: list[bytes] = []
    plte = None
    ihdr = None
    while i + 8 <= len(payload):
        (ln,) = struct.unpack_from(">I", payload, i)
        ctype = payload[i + 4 : i + 8]
        data = payload[i + 8 : i + 8 + ln]
        i += 12 + ln  # len + type + data + crc
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
    if ihdr is None or not idat:
        raise NotImplementedError("PNG missing IHDR/IDAT chunks")
    w, h, depth, color, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0:
        raise NotImplementedError("nonstandard PNG compression/filter method")
    if interlace not in (0, 1):
        raise NotImplementedError(f"unknown PNG interlace method {interlace}")
    if color not in _PNG_CHANNELS:
        raise NotImplementedError(f"unknown PNG color type {color}")
    legal = (8, 16, 1, 2, 4) if color in (0, 3) else (8, 16)
    if depth not in legal or (color == 3 and depth == 16):
        raise NotImplementedError(
            f"illegal PNG depth/color combination (depth={depth}, "
            f"color={color})"
        )
    nch = _PNG_CHANNELS[color]
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), np.uint8)
    if interlace == 1:
        pix = np.zeros((h, w, nch), np.uint8)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue  # empty pass contributes zero bytes
            sub, off = _png_rows_decode(raw, off, ph, pw, nch, depth)
            pix[y0::dy, x0::dx] = sub
        if off != len(raw):
            raise NotImplementedError("Adam7 PNG trailing IDAT bytes")
    else:
        pix, off = _png_rows_decode(raw, 0, h, w, nch, depth)
        if off != len(raw):
            raise NotImplementedError("PNG scanline size mismatch")
    if color == 3:
        if plte is None:
            raise NotImplementedError("palette PNG missing PLTE chunk")
        pix = plte[pix[..., 0]]
    elif depth in (1, 2, 4):  # gray: expand raw sample to full 8-bit range
        pix = pix * np.uint8(255 // ((1 << depth) - 1))
    return np.ascontiguousarray(pix)


def encode_png(
    pixels: np.ndarray,
    *,
    filter_type: int = 0,
    interlace: bool = False,
    depth: int = 8,
) -> bytes:
    """(h, w, c) samples (c in 1/2/3/4) -> PNG bytes (inverse of
    decode_png; test/fixture seam). ``filter_type`` applies one filter id
    to every scanline — filtering from known pixels is fully vectorized,
    and each id exercises the matching decode path. ``interlace=True``
    writes Adam7: each of the 7 passes is extracted from the canvas grid
    and filtered as its own mini image (pass-local Up/Paeth neighbors,
    exactly what the decoder's per-pass unfilter assumes). ``depth=16``
    takes uint16 samples; ``depth`` 1/2/4 takes raw 0..2^depth-1 samples
    (c must be 1)."""
    import struct
    import zlib

    h, w, c = pixels.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    if depth in (1, 2, 4) and c != 1:
        raise ValueError("sub-byte PNG encode is single-channel only")
    if interlace:
        parts = []
        for x0, y0, dx, dy in _ADAM7:
            sub = pixels[y0::dy, x0::dx]
            if sub.shape[0] and sub.shape[1]:
                parts.append(
                    _png_filter_body(
                        np.ascontiguousarray(sub), filter_type, depth
                    )
                )
        body_bytes = b"".join(p.tobytes() for p in parts)
        ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, 1)
        return (
            _PNG_SIG
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(body_bytes, 6))
            + _png_chunk(b"IEND", b"")
        )
    body = _png_filter_body(pixels, filter_type, depth)
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(body.tobytes(), 6))
        + _png_chunk(b"IEND", b"")
    )


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data))
    )


def _png_pack_rows(pixels: np.ndarray, depth: int) -> tuple[np.ndarray, int]:
    """(h, w, c) samples -> ((h, row_bytes) uint8 scanline bytes, filter
    lag in bytes). 8-bit passes through; 16-bit emits big-endian sample
    pairs (input uint16); sub-byte packs big-endian bits (input = raw
    0..2^depth-1 sample values, c must be 1)."""
    h, w, c = pixels.shape
    if depth == 8:
        return pixels.reshape(h, w * c).astype(np.uint8), c
    if depth == 16:
        v = pixels.astype(np.uint16)
        rows = np.empty((h, w * c, 2), np.uint8)
        rows[..., 0] = (v >> 8).reshape(h, w * c)
        rows[..., 1] = (v & 0xFF).reshape(h, w * c)
        return rows.reshape(h, w * c * 2), 2 * c
    # 1/2/4-bit single-channel: spread each sample over ``depth`` bits
    bits = (
        (pixels.reshape(h, w, 1) >> np.arange(depth - 1, -1, -1)) & 1
    ).astype(np.uint8)
    return np.packbits(bits.reshape(h, w * depth), axis=1), 1


def _png_filter_body(
    pixels: np.ndarray, filter_type: int, depth: int = 8
) -> np.ndarray:
    """(h, w, c) samples -> (h, row_bytes+1) filtered scanlines (filter
    byte + data), one filter id for every row — vectorized forward
    filtering over scanline BYTES with the spec's byte-lag ``bpp``."""
    recon, c = _png_pack_rows(pixels, depth)
    recon = recon.astype(np.int32)
    h, stride = recon.shape
    up = np.zeros_like(recon)
    up[1:] = recon[:-1]
    left = np.zeros_like(recon)
    left[:, c:] = recon[:, :-c]
    if filter_type == 0:
        filt = recon
    elif filter_type == 1:
        filt = recon - left
    elif filter_type == 2:
        filt = recon - up
    elif filter_type == 3:
        filt = recon - ((left + up) >> 1)
    elif filter_type == 4:
        upleft = np.zeros_like(recon)
        upleft[1:, c:] = recon[:-1, :-c]
        p = left + up - upleft
        pa, pb, pc = (
            np.abs(p - left),
            np.abs(p - up),
            np.abs(p - upleft),
        )
        pred = np.where(
            (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, upleft)
        )
        filt = recon - pred
    else:
        raise ValueError(f"unknown PNG filter type {filter_type}")
    body = np.empty((h, stride + 1), np.uint8)
    body[:, 0] = filter_type
    body[:, 1:] = (filt & 0xFF).astype(np.uint8)
    return body


def png_feature(payload: bytes) -> np.ndarray:
    """Real 32-dim image feature over decoded PNG pixels (alpha dropped,
    gray+alpha reduced to gray, so the shared statistic family applies)."""
    pix = decode_png(payload)
    if pix.shape[2] == 4:
        pix = pix[..., :3]
    elif pix.shape[2] == 2:
        pix = pix[..., :1]
    return _pixel_feature(pix.astype(np.float32))


def resize_png(payload: bytes, tw: int, th: int) -> bytes:
    """REAL nearest-neighbor resize of a PNG payload (pure numpy index
    mapping), re-encoded as PNG."""
    pix = decode_png(payload)
    h, w, _ = pix.shape
    ys = (np.arange(th) * h) // th
    xs = (np.arange(tw) * w) // tw
    return encode_png(np.ascontiguousarray(pix[ys][:, xs]))


_JPEG_SIG = b"\xff\xd8\xff"
_GIF_SIG = b"GIF8"


def gif_feature(payload: bytes, *, max_frames: int = 8) -> np.ndarray:
    """Real 32-dim image feature over decoded GIF pixels — still GIFs use
    the single composited frame; animated GIFs average the shared
    per-frame feature over up to ``max_frames`` frames (the y4m video
    convention)."""
    from ..functions.gif import decode_gif

    frames, _alpha = decode_gif(payload)
    step = max(1, len(frames) // max_frames)
    sampled = frames[::step][:max_frames]
    return np.mean(
        [_pixel_feature(f.astype(np.float32)) for f in sampled], axis=0
    ).astype(np.float32)


def resize_gif(payload: bytes, tw: int, th: int) -> bytes:
    """REAL nearest-neighbor resize of every composited GIF frame.
    Nearest-neighbor creates no new colors, so the union palette of the
    resized frames re-encodes as GIF when it fits 256 entries (animation
    preserved); a multi-palette composite that exceeds 256 colors falls
    back to PNG for a single frame (lossless, no palette limit) and
    raises for multi-frame (the re-quantization seam)."""
    from ..functions.gif import decode_gif, encode_gif

    frames, _alpha = decode_gif(payload)
    h, w = frames.shape[1:3]
    ys = (np.arange(th) * h) // th
    xs = (np.arange(tw) * w) // tw
    resized = frames[:, ys][:, :, xs]
    flat = resized.reshape(-1, 3)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) <= 256:
        idx = inverse.astype(np.uint8).reshape(len(frames), th, tw)
        return encode_gif(idx, colors.astype(np.uint8))
    if len(frames) == 1:
        return encode_png(np.ascontiguousarray(resized[0]))
    raise NotImplementedError(
        "animated GIF resize exceeding 256 colors needs re-quantization"
    )


def jpeg_feature(payload: bytes) -> np.ndarray:
    """Real 32-dim image feature over decoded baseline-JPEG pixels
    (``functions/jpeg.py`` stdlib+numpy codec — the same statistic family
    as the other containers)."""
    from ..functions.jpeg import decode_jpeg

    return _pixel_feature(decode_jpeg(payload).astype(np.float32))


def resize_jpeg(payload: bytes, tw: int, th: int) -> bytes:
    """REAL nearest-neighbor resize of a baseline-JPEG payload,
    re-encoded as baseline JPEG (quality 90)."""
    from ..functions.jpeg import decode_jpeg, encode_jpeg

    pix = decode_jpeg(payload)
    h, w, _ = pix.shape
    ys = (np.arange(th) * h) // th
    xs = (np.arange(tw) * w) // tw
    return encode_jpeg(np.ascontiguousarray(pix[ys][:, xs]))


_TIFF_SIGS = (b"II*\x00", b"MM\x00*")


def tiff_feature(payload: bytes) -> np.ndarray:
    """Real 32-dim image feature over decoded baseline-TIFF pixels
    (none/PackBits/LZW strips — ``functions/tiff.py``)."""
    from ..functions.tiff import decode_tiff

    return _pixel_feature(decode_tiff(payload).astype(np.float32))


def resize_tiff(payload: bytes, tw: int, th: int) -> bytes:
    """REAL nearest-neighbor resize of a baseline TIFF, re-encoded with
    the same LZW compression (the output stays a TIFF)."""
    from ..functions.tiff import decode_tiff, encode_tiff

    pix = decode_tiff(payload)
    h, w, _ = pix.shape
    ys = (np.arange(th) * h) // th
    xs = (np.arange(tw) * w) // tw
    return encode_tiff(
        np.ascontiguousarray(pix[ys][:, xs]), compression="lzw"
    )


def bmp_feature(payload: bytes) -> np.ndarray:
    """Real 32-dim image feature over decoded BMP pixels (same statistic
    family as ``pnm_feature``: block means, histogram, channel moments)."""
    return _pixel_feature(decode_bmp(payload).astype(np.float32))


def encode_pnm(pixels: np.ndarray) -> bytes:
    """(h, w, c) uint8 -> binary PPM/PGM bytes (inverse of decode_pnm)."""
    h, w, c = pixels.shape
    magic = b"P6" if c == 3 else b"P5"
    return magic + f"\n{w} {h}\n255\n".encode() + pixels.tobytes()


def wav_feature(payload: bytes) -> np.ndarray:
    """Real 32-dim audio feature: [rms, zero-crossing rate, log-duration,
    log-rate, 28 log-energy FFT bands] from decoded PCM samples."""
    x, rate = decode_wav(payload)
    if len(x) == 0:
        return np.zeros(32, np.float32)
    rms = float(np.sqrt(np.mean(x * x)))
    zcr = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
    spec = np.abs(np.fft.rfft(x))
    bands = np.array_split(spec, 28)
    e = np.array([np.log1p(b.sum()) for b in bands], np.float32)
    e = e / (e.sum() + 1e-9)
    head = np.array(
        [rms, zcr, np.log1p(len(x) / rate), np.log1p(rate) / 16.0], np.float32
    )
    return np.concatenate([head, e]).astype(np.float32)


def pnm_feature(payload: bytes) -> np.ndarray:
    """Real 32-dim image feature: 16 grayscale 4x4 block means, 8-bin
    histogram, per-channel mean+std (grayscale duplicated), h/w scale."""
    return _pixel_feature(decode_pnm(payload).astype(np.float32))


def _pixel_feature(pix: np.ndarray) -> np.ndarray:
    """(h, w, c) float32 pixels -> the 32-dim image feature (shared by the
    PNM and BMP decoders)."""
    h, w, c = pix.shape
    gray = pix.mean(axis=2)
    yb = np.round(np.linspace(0, h, 5)).astype(int)
    xb = np.round(np.linspace(0, w, 5)).astype(int)
    blocks = np.zeros(16, np.float32)
    for by in range(4):
        for bx in range(4):
            seg = gray[yb[by] : max(yb[by + 1], yb[by] + 1),
                       xb[bx] : max(xb[bx + 1], xb[bx] + 1)]
            blocks[by * 4 + bx] = seg.mean() / 255.0
    hist = np.histogram(gray, bins=8, range=(0, 256))[0].astype(np.float32)
    hist = hist / (hist.sum() + 1e-9)
    ch_mean = pix.mean(axis=(0, 1)) / 255.0
    ch_std = pix.std(axis=(0, 1)) / 255.0
    if c == 1:
        ch_mean = np.repeat(ch_mean, 3)
        ch_std = np.repeat(ch_std, 3)
    tail = np.array([h / 4096.0, w / 4096.0], np.float32)
    return np.concatenate([blocks, hist, ch_mean, ch_std, tail]).astype(np.float32)

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

    ``decode="real"`` dispatches on magic bytes: WAV (``RIFF``), 8-bit
    PNG, baseline JPEG (``FF D8 FF``), binary PPM/PGM (``P6``/``P5``),
    uncompressed BMP (``BM``) and YUV4MPEG2 video (``YUV4MPEG2``) are
    REALLY decoded (stdlib wave / zlib / struct / numpy) into
    sample- and pixel-derived features; any other format raises
    ``NotImplementedError`` naming the missing library unless
    ``fallback=True`` routes it to the deterministic stand-in (for mixed
    tables whose video rows have no stdlib codec).
    """

    def __init__(
        self,
        decode: str = "fake",
        fallback: bool = False,
        on_error: str | None = None,
    ) -> None:
        if decode not in ("fake", "real"):
            raise ValueError(f"unknown decode mode {decode!r}")
        if on_error is None:
            on_error = "fallback" if fallback else "raise"
        if on_error not in ("raise", "fallback", "quarantine"):
            raise ValueError(f"unknown on_error mode {on_error!r}")
        self.decode = decode
        self.fallback = on_error == "fallback"
        self.quarantine = on_error == "quarantine"

    def _fake_feature(self, payload: bytes) -> np.ndarray:
        """Deterministic 32-dim stand-in: normalized 32-bin byte histogram."""
        arr = np.frombuffer(payload, dtype=np.uint8)
        if len(arr) == 0:
            return np.zeros(32, dtype=np.float32)
        hist = np.bincount(arr >> 3, minlength=32).astype(np.float32)
        return hist / hist.sum()

    def _feature(self, payload: bytes) -> np.ndarray:
        if self.decode == "fake":
            return self._fake_feature(payload)
        if (
            payload[:4] == b"RIFF"
            or payload[:8] == _PNG_SIG
            or payload[:9] == _Y4M_SIG
            or payload[:3] == _JPEG_SIG
            or payload[:4] == _GIF_SIG
            or payload[:2] in (b"P5", b"P6", b"BM")
            or payload[:4] in _TIFF_SIGS
            or payload[:4] == b"\x00\x00\x01\x00"
        ):
            # dispatch is on magic bytes only — an arbitrary blob starting
            # with RIFF/PNG/Y4M/JPEG/P5/P6/BM can still fail header parsing
            # (arithmetic-coded JPEG raises here too); with fallback=True
            # rows route to the stand-in instead of crashing the actor batch
            try:
                if payload[:4] == b"RIFF":
                    if payload[8:12] == b"AVI ":
                        return avi_feature(payload)
                    return wav_feature(payload)
                if payload[:8] == _PNG_SIG:
                    return png_feature(payload)
                if payload[:9] == _Y4M_SIG:
                    return y4m_feature(payload)
                if payload[:3] == _JPEG_SIG:
                    return jpeg_feature(payload)
                if payload[:4] == _GIF_SIG:
                    return gif_feature(payload)
                if payload[:2] == b"BM":
                    return bmp_feature(payload)
                if payload[:4] in _TIFF_SIGS:
                    return tiff_feature(payload)
                if payload[:4] == b"\x00\x00\x01\x00":
                    return ico_feature(payload)
                return pnm_feature(payload)
            except Exception:
                if self.fallback:
                    return self._fake_feature(payload)
                raise
        if self.fallback:
            return self._fake_feature(payload)
        raise NotImplementedError(
            "codec-format payload (arithmetic-coded JPEG/MP4...) needs "
            "PIL/ffmpeg — not in this container; stdlib-real formats are "
            "WAV, 8-bit PNG, DCT-Huffman JPEG, GIF, binary PPM/PGM, "
            "uncompressed 24/32-bit BMP and YUV4MPEG2 video"
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        feats = np.zeros((len(payloads), 32), np.float32)
        errors: list[str | None] = [None] * len(payloads)
        for j, p in enumerate(payloads):
            if self.quarantine:
                # production semantics: a bad payload lands in the output
                # with decode_ok=False + the reason, never killing the task
                try:
                    feats[j] = self._feature(p or b"")
                except Exception as e:  # noqa: BLE001 — quarantine anything
                    errors[j] = f"{type(e).__name__}: {e}"
            else:
                feats[j] = self._feature(p or b"")
        cols = {
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
        if self.quarantine:
            cols["decode_ok"] = pa.array(
                [e is None for e in errors], pa.bool_()
            )
            cols["decode_error"] = pa.array(errors, pa.string())
        return pa.table(cols)


def media_feature_stage(
    media,
    *,
    decode: str = "fake",
    fallback: bool = False,
    on_error: str | None = None,
    batch_size: int = 64,  # small: rows carry whole encoded payloads
    concurrency: int | tuple[int, int] = (1, 4),
):
    """MEDIA_SCHEMA Dataset -> FEATURES_SCHEMA Dataset (actor pool).

    ``on_error`` (overrides ``fallback``): ``"raise"`` fails the task
    (strict), ``"fallback"`` substitutes the deterministic stand-in
    feature, ``"quarantine"`` appends ``decode_ok``/``decode_error``
    columns and zero features for bad rows — the mode a 100 TB run wants,
    where one corrupt payload must neither kill a partition nor silently
    masquerade as a real feature; filter ``decode_ok`` downstream and
    route the quarantined sliver to its own sink."""
    return media.map_batches(
        MediaFeatureActor,
        fn_constructor_kwargs={
            "decode": decode, "fallback": fallback, "on_error": on_error,
        },
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def media_vec_id(media_id: str) -> int:
    """Deterministic dense-int id for a media_id string (sha1-derived
    int62) — lets the feature table ride the embedding dedup machinery,
    which keys on int64 vec_ids; collision odds at 2^62 are negligible
    below ~2^28 rows per corpus."""
    return int.from_bytes(
        hashlib.sha1(media_id.encode()).digest()[:8], "big"
    ) & ((1 << 62) - 1)


def media_pairs_budget() -> int:
    """Row budget below which ``media_near_dups(method="auto")`` keeps the
    blocked exact-cosine path; past it the query auto-routes to the salted
    hyperplane-LSH path (env ``GRAFT_MEDIA_PAIRS_MAX``). Same budgeted-
    crossover pattern as ``semi_join_auto`` / ``components="auto"``."""
    return int(os.environ.get("GRAFT_MEDIA_PAIRS_MAX", 100_000))


def media_near_dups(
    media,
    *,
    threshold: float = 0.999,
    decode: str = "real",
    on_error: str = "quarantine",
    method: str = "auto",
):
    """Multimodal near-dup pairs: REAL-decode feature extraction ->
    cosine pairs over the 32-dim feature vectors (id_a < id_b,
    cos >= threshold). The same pixels through different containers
    (PPM vs PNG vs BMP) produce identical features, so cross-container
    duplicates surface at cos ~ 1.0; lossy JPEG re-encodes land just
    below.

    ``method``: ``"exact"`` = ``similarity.embedding_dup_pairs`` (blocked
    exact matmul — O(n^2) dot products, the verification anchor);
    ``"ann"`` = ``similarity.ann_lsh_pairs`` (salted hyperplane-LSH
    buckets + in-bucket exact-cosine verify — the sub-quadratic scale
    path); ``"auto"`` (default) = exact below ``media_pairs_budget()``
    feature rows, ANN past it. Both paths emit the identical
    ``(id_a, id_b)`` schema, and the ANN path exact-verifies every
    candidate, so precision is identical; at the default near-identity
    threshold identical vectors share every bucket deterministically
    (recall 1.0 on exact cross-container dups).

    Quarantined rows (decode failures) are excluded before pairing so
    corrupt payloads can't alias as mutual near-dups of the zero vector.
    Returns (id_a, id_b) pairs keyed by ``media_vec_id``."""
    from .similarity import ann_lsh_pairs, embedding_dup_pairs

    if method not in ("auto", "exact", "ann"):
        raise ValueError(f"media_near_dups: unknown method {method!r}")

    feats = media_feature_stage(media, decode=decode, on_error=on_error)

    def to_vecs(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if "decode_ok" in b.column_names:
            b = b.filter(pc.equal(b["decode_ok"], True))
        ids = [media_vec_id(m) for m in b["media_id"].to_pylist()]
        feats_np = np.asarray(
            b["feature"].combine_chunks().flatten(), np.float64
        ).reshape(len(b), 32)
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(feats_np.reshape(-1), pa.float64()), 32
                ),
            }
        )

    vecs = feats.map_batches(
        to_vecs, batch_format="pyarrow", zero_copy_batch=True
    )
    if method == "exact":
        return embedding_dup_pairs(vecs, threshold)
    if method == "ann":
        return ann_lsh_pairs(vecs, threshold)
    # auto: count the SKINNY projection (vec_id + 32 float64 = ~264 B/row,
    # not the media payloads) once, pin it so the expensive decode never
    # re-runs, then route on the row budget.
    vecs = vecs.materialize()
    if vecs.count() <= media_pairs_budget():
        return embedding_dup_pairs(vecs, threshold)
    return ann_lsh_pairs(vecs, threshold)


def resize_pnm(payload: bytes, tw: int, th: int) -> bytes:
    """REAL nearest-neighbor resize of a binary PPM/PGM payload (pure
    numpy index mapping), re-encoded in the same format."""
    pix = decode_pnm(payload)
    h, w, _ = pix.shape
    ys = (np.arange(th) * h) // th
    xs = (np.arange(tw) * w) // tw
    return encode_pnm(np.ascontiguousarray(pix[ys][:, xs]))


_Y4M_SIG = b"YUV4MPEG2"
# chroma subsampling factors (x, y) per y4m colorspace family
_Y4M_SUBSAMPLE = {"420": (2, 2), "422": (2, 1), "444": (1, 1)}


def _yuv_to_rgb(y: np.ndarray, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Full-range BT.601 planar YUV -> (h, w, 3) uint8 RGB, vectorized."""
    yf = y.astype(np.float32)
    uf = u.astype(np.float32) - 128.0
    vf = v.astype(np.float32) - 128.0
    rgb = np.stack(
        [
            yf + 1.402 * vf,
            yf - 0.344136 * uf - 0.714136 * vf,
            yf + 1.772 * uf,
        ],
        axis=-1,
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def decode_y4m(payload: bytes) -> np.ndarray:
    """YUV4MPEG2 bytes -> (n_frames, h, w, c) uint8 pixels — REAL decoding
    (ASCII header parse + numpy plane reshape + vectorized BT.601), no
    video libraries: y4m stores raw uncompressed planar frames. Supports
    progressive C420*/C422/C444 (c=3, chroma nearest-upsampled) and Cmono
    (c=1); interlaced streams raise ``NotImplementedError``."""
    if payload[:9] != _Y4M_SIG:
        raise NotImplementedError("not a YUV4MPEG2 payload")
    nl = payload.index(b"\n")
    w = h = 0
    cs = "420jpeg"  # spec default when no C tag is present
    for tok in payload[10:nl].split(b" "):
        if not tok:
            continue
        key, val = tok[:1], tok[1:].decode("ascii", "replace")
        if key == b"W":
            w = int(val)
        elif key == b"H":
            h = int(val)
        elif key == b"C":
            cs = val
        elif key == b"I" and val not in ("p", "?"):
            raise NotImplementedError("interlaced y4m not supported")
    if w <= 0 or h <= 0:
        raise NotImplementedError("y4m header missing W/H")
    if cs.startswith("mono"):
        sx = sy = 0  # no chroma planes
    else:
        fam = cs[:3]
        if fam not in _Y4M_SUBSAMPLE:
            raise NotImplementedError(f"unsupported y4m colorspace C{cs}")
        sx, sy = _Y4M_SUBSAMPLE[fam]
        if w % sx or h % sy:
            raise NotImplementedError(
                f"y4m C{cs} needs dimensions divisible by {sx}x{sy}"
            )
    cw, ch_ = (w // sx, h // sy) if sx else (0, 0)
    frame_bytes = w * h + 2 * cw * ch_
    frames: list[np.ndarray] = []
    i = nl + 1
    n = len(payload)
    while i < n:
        fnl = payload.index(b"\n", i)
        if payload[i : i + 5] != b"FRAME":
            raise NotImplementedError("y4m frame marker missing")
        i = fnl + 1
        if i + frame_bytes > n:
            raise NotImplementedError("truncated y4m frame")
        raw = np.frombuffer(payload, np.uint8, frame_bytes, i)
        i += frame_bytes
        yp = raw[: w * h].reshape(h, w)
        if sx == 0:
            frames.append(yp[..., None])
            continue
        up = raw[w * h : w * h + cw * ch_].reshape(ch_, cw)
        vp = raw[w * h + cw * ch_ :].reshape(ch_, cw)
        # nearest-neighbor chroma upsample to full res
        up = np.repeat(np.repeat(up, sy, axis=0), sx, axis=1)
        vp = np.repeat(np.repeat(vp, sy, axis=0), sx, axis=1)
        frames.append(_yuv_to_rgb(yp, up, vp))
    if not frames:
        raise NotImplementedError("y4m stream has no frames")
    return np.stack(frames)


def encode_y4m(frames: np.ndarray, *, colorspace: str = "444") -> bytes:
    """(n, h, w, 3) RGB or (n, h, w, 1)/(n, h, w) gray uint8 -> YUV4MPEG2
    bytes (inverse of decode_y4m; test/fixture seam). ``colorspace``:
    ``"mono"`` (gray, exact roundtrip), ``"444"`` (full chroma) or
    ``"420jpeg"`` (2x2 box-averaged chroma)."""
    if frames.ndim == 3:
        frames = frames[..., None]
    n, h, w, c = frames.shape
    if colorspace == "mono":
        if c == 3:
            raise ValueError("mono y4m needs gray input")
        planes = [f[..., 0].tobytes() for f in frames]
    else:
        fam = colorspace[:3]
        sx, sy = _Y4M_SUBSAMPLE[fam]
        r = frames[..., 0].astype(np.float32)
        g = frames[..., 1 % c].astype(np.float32)
        b = frames[..., 2 % c].astype(np.float32)
        y = np.clip(np.round(0.299 * r + 0.587 * g + 0.114 * b), 0, 255)
        u = np.clip(np.round(-0.168736 * r - 0.331264 * g + 0.5 * b + 128), 0, 255)
        v = np.clip(np.round(0.5 * r - 0.418688 * g - 0.081312 * b + 128), 0, 255)
        if sx > 1 or sy > 1:
            u = u.reshape(n, h // sy, sy, w // sx, sx).mean(axis=(2, 4))
            v = v.reshape(n, h // sy, sy, w // sx, sx).mean(axis=(2, 4))
        planes = [
            y[i].astype(np.uint8).tobytes()
            + np.round(u[i]).astype(np.uint8).tobytes()
            + np.round(v[i]).astype(np.uint8).tobytes()
            for i in range(n)
        ]
    hdr = f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C{colorspace}\n".encode()
    return hdr + b"".join(b"FRAME\n" + p for p in planes)


def y4m_feature(payload: bytes, *, max_frames: int = 8) -> np.ndarray:
    """Real 32-dim video feature: the mean of the shared per-frame pixel
    feature over up to ``max_frames`` evenly sampled decoded frames."""
    frames = decode_y4m(payload)
    step = max(1, len(frames) // max_frames)
    sampled = frames[::step][:max_frames]
    return np.mean(
        [_pixel_feature(f.astype(np.float32)) for f in sampled], axis=0
    ).astype(np.float32)


def y4m_frames_png(
    payload: bytes, *, every_n: int = 1, max_frames: int = 8
) -> list[bytes]:
    """REAL frame sampling: decode y4m, take every ``every_n``-th frame up
    to ``max_frames``, re-encode each as 8-bit PNG so downstream image
    stages (features, resize) operate on real image payloads."""
    frames = decode_y4m(payload)
    return [encode_png(f) for f in frames[::every_n][:max_frames]]


def avi_feature(payload: bytes, *, max_frames: int = 8) -> np.ndarray:
    """Real 32-dim video feature for Motion-JPEG AVI: every frame decodes
    through the stdlib+numpy JPEG codec (``functions/avi.py``), then the
    y4m convention — mean of the shared per-frame pixel feature over up
    to ``max_frames`` evenly sampled frames."""
    from ..functions.avi import decode_avi_frames

    frames = decode_avi_frames(payload)
    step = max(1, len(frames) // max_frames)
    sampled = frames[::step][:max_frames]
    return np.mean(
        [_pixel_feature(f.astype(np.float32)) for f in sampled], axis=0
    ).astype(np.float32)


def avi_frames_png(
    payload: bytes, *, every_n: int = 1, max_frames: int = 8
) -> list[bytes]:
    """REAL frame sampling for MJPEG AVI: decode every JPEG frame chunk,
    take every ``every_n``-th up to ``max_frames``, re-encode as 8-bit
    PNG (same downstream contract as ``y4m_frames_png``)."""
    from ..functions.avi import decode_avi_frames

    frames = decode_avi_frames(payload)
    return [
        encode_png(np.ascontiguousarray(f))
        for f in frames[::every_n][:max_frames]
    ]


def resize_bmp(payload: bytes, tw: int, th: int) -> bytes:
    """REAL nearest-neighbor resize of an uncompressed BMP payload,
    re-encoded as 24-bit BMP."""
    pix = decode_bmp(payload)
    h, w, _ = pix.shape
    ys = (np.arange(th) * h) // th
    xs = (np.arange(tw) * w) // tw
    return encode_bmp(np.ascontiguousarray(pix[ys][:, xs]))


class MediaResizeActor:
    """Actor-pool stage: resize image payloads to (target_w, target_h).

    ``decode="real"``: PPM/PGM, 8-bit PNG, DCT-Huffman JPEG, GIF and
    uncompressed BMP payloads get a REAL nearest-neighbor resample
    re-encoded in the same container; codec formats raise
    ``NotImplementedError`` (PIL seam) unless ``on_error="fallback"``
    routes them to the stand-in or ``on_error="quarantine"`` passes the
    payload through untouched with ``decode_ok``/``decode_error`` columns
    (the production error channel — same contract as the feature actor).
    The stand-in re-encodes the payload to a size proportional to the
    target area and rewrites the metadata — exercising the Ray-side
    contract: binary in/out, small batches, meta passthrough."""

    def __init__(
        self,
        target_w: int,
        target_h: int,
        decode: str = "fake",
        fallback: bool = False,
        on_error: str | None = None,
    ) -> None:
        if decode not in ("fake", "real"):
            raise ValueError(f"unknown decode mode {decode!r}")
        if on_error is None:
            on_error = "fallback" if fallback else "raise"
        if on_error not in ("raise", "fallback", "quarantine"):
            raise ValueError(f"unknown on_error mode {on_error!r}")
        self.decode = decode
        self.fallback = on_error == "fallback"
        self.quarantine = on_error == "quarantine"
        self.target_w, self.target_h = target_w, target_h

    def _resize(self, p: bytes) -> bytes:
        if self.decode == "real":
            try:
                if p[:2] in (b"P5", b"P6"):
                    return resize_pnm(p, self.target_w, self.target_h)
                if p[:8] == _PNG_SIG:
                    return resize_png(p, self.target_w, self.target_h)
                if p[:3] == _JPEG_SIG:
                    return resize_jpeg(p, self.target_w, self.target_h)
                if p[:4] == _GIF_SIG:
                    return resize_gif(p, self.target_w, self.target_h)
                if p[:2] == b"BM":
                    return resize_bmp(p, self.target_w, self.target_h)
                if p[:4] in _TIFF_SIGS:
                    return resize_tiff(p, self.target_w, self.target_h)
            except Exception:  # noqa: BLE001 — corrupt payloads raise
                # anything (truncated GIF -> ValueError, bad zlib stream ->
                # zlib.error, arithmetic JPEG -> NotImplementedError); in
                # fallback mode ALL of them route to the stand-in, matching
                # MediaFeatureActor._feature
                if not self.fallback:
                    raise
        if self.decode == "real" and not self.fallback:
            raise NotImplementedError(
                "codec-format resize needs PIL — stdlib-real formats are "
                "8-bit PNG, DCT-Huffman JPEG, GIF, binary PPM/PGM and "
                "uncompressed BMP"
            )
        n_out = max(16, (self.target_w * self.target_h) // 64)
        seed_digest = hashlib.sha1(p).digest()
        reps = (n_out + 19) // 20
        return (seed_digest * reps)[:n_out]

    def __call__(self, batch: pa.Table) -> pa.Table:
        outs, metas = [], []
        errors: list[str | None] = []
        for kind, p, m in zip(
            batch["kind"].to_pylist(),
            batch["payload"].to_pylist(),
            batch["meta"].to_pylist(),
        ):
            p = p or b""
            if kind != "image":  # resize transforms images; others pass through
                outs.append(p)
                metas.append(m)
                errors.append(None)
                continue
            meta = json.loads(m or "{}")
            meta["width"], meta["height"] = self.target_w, self.target_h
            if self.quarantine:
                # bad payload: pass through UNRESIZED (original meta) with
                # the reason, never a dead task or a fake payload
                try:
                    outs.append(self._resize(p))
                    metas.append(json.dumps(meta, sort_keys=True))
                    errors.append(None)
                except Exception as e:  # noqa: BLE001 — quarantine anything
                    outs.append(p)
                    metas.append(m)
                    errors.append(f"{type(e).__name__}: {e}")
            else:
                outs.append(self._resize(p))
                metas.append(json.dumps(meta, sort_keys=True))
                errors.append(None)
        cols = {
            "media_id": batch["media_id"],
            "kind": batch["kind"],
            "payload": pa.array(outs, pa.binary()),
            "meta": pa.array(metas, pa.string()),
        }
        if self.quarantine:
            cols["decode_ok"] = pa.array(
                [e is None for e in errors], pa.bool_()
            )
            cols["decode_error"] = pa.array(errors, pa.string())
        return pa.table(cols)


def media_resize_stage(
    media,
    *,
    width: int = 224,
    height: int = 224,
    batch_size: int = 64,
    decode: str = "fake",
    fallback: bool = False,
    on_error: str | None = None,
):
    return media.map_batches(
        MediaResizeActor,
        fn_constructor_args=(width, height),
        fn_constructor_kwargs={
            "decode": decode, "fallback": fallback, "on_error": on_error,
        },
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=(1, 4),
        num_cpus=1,
    )


def frame_sample_stage(
    media,
    *,
    every_n: int = 1,
    max_frames: int = 8,
    batch_size: int = 64,
    decode: str = "fake",
    fallback: bool = True,
):
    """Video rows -> one row per sampled frame (flat_map-shaped plumbing).

    ``decode="real"``: YUV4MPEG2 payloads get REAL frame extraction
    (``y4m_frames_png``) — each sampled frame re-encoded as an 8-bit PNG so
    the downstream image stages compute real features/resizes on it. Codec
    containers (MP4...) raise ``NotImplementedError`` (ffmpeg seam) unless
    ``fallback=True`` routes them to the deterministic byte-slice stand-in.
    ``decode="fake"``: every video row uses the stand-in. Non-video rows
    pass through untouched with frame_idx = -1 (so mixed media tables keep
    one schema)."""

    def _fake_frames(payload: bytes) -> list[bytes]:
        if not payload:
            return []
        step = max(1, len(payload) // max(1, max_frames))
        return [payload[i : i + step] for i in range(0, len(payload), step * every_n)][
            :max_frames
        ]

    def _frames(payload: bytes) -> list[bytes]:
        if decode == "real" and (
            payload[:9] == _Y4M_SIG
            or payload[:4] == _GIF_SIG
            or (payload[:4] == b"RIFF" and payload[8:12] == b"AVI ")
        ):
            # a truncated stream can match the magic yet raise mid-decode
            # (ValueError from a short buffer, zlib.error, ...): with
            # fallback=True every decode failure routes to the stand-in,
            # matching MediaFeatureActor._feature
            try:
                if payload[:9] == _Y4M_SIG:
                    return y4m_frames_png(
                        payload, every_n=every_n, max_frames=max_frames
                    )
                if payload[:4] == b"RIFF":
                    return avi_frames_png(
                        payload, every_n=every_n, max_frames=max_frames
                    )
                from ..functions.gif import decode_gif

                frames, _alpha = decode_gif(payload)
                return [
                    encode_png(np.ascontiguousarray(f))
                    for f in frames[::every_n][:max_frames]
                ]
            except Exception:  # noqa: BLE001 — corrupt payload
                if not fallback:
                    raise
                return _fake_frames(payload)
        if decode == "real" and not fallback:
            raise NotImplementedError(
                "codec-container frame sampling needs ffmpeg — the "
                "stdlib-real multi-frame formats are YUV4MPEG2, GIF and "
                "Motion-JPEG AVI"
            )
        return _fake_frames(payload)

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


def _gen_wav(rng, min_s: float = 0.05, max_s: float = 0.25) -> bytes:
    """Deterministic REAL 16-bit mono WAV: sine + noise via stdlib wave."""
    import io
    import wave

    rate = 8000
    dur = float(rng.uniform(min_s, max_s))
    freq = float(rng.uniform(80, 2000))
    t = np.arange(int(rate * dur)) / rate
    x = 0.7 * np.sin(2 * np.pi * freq * t) + 0.05 * rng.standard_normal(len(t))
    pcm = np.clip(x * 32767, -32768, 32767).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def _gen_pixels(rng) -> np.ndarray:
    """Deterministic (h, w, 3) uint8 pixels: smooth gradient + noise."""
    h, w = int(rng.integers(16, 64)), int(rng.integers(16, 64))
    yy, xx = np.mgrid[0:h, 0:w]
    base = (yy * 255 // max(1, h - 1))[..., None] * np.array([1, 0, 0.5])
    noise = rng.integers(0, 64, (h, w, 3))
    return np.clip(base + noise, 0, 255).astype(np.uint8)


def _gen_ppm(rng) -> bytes:
    """Deterministic REAL binary PPM: smooth gradient + noise."""
    return encode_pnm(_gen_pixels(rng))


def _gen_y4m(rng) -> bytes:
    """Deterministic REAL y4m clip: 3-6 frames of a drifting gradient
    with a PER-CLIP random orientation and channel mix (so distinct clips
    are structurally distinct, like real footage — not one shared ramp),
    rotating through the 444 / 420jpeg / mono colorspace paths."""
    nf = int(rng.integers(3, 7))
    h, w = int(rng.integers(8, 17)) * 2, int(rng.integers(8, 17)) * 2
    yy, xx = np.mgrid[0:h, 0:w]
    ky = int(rng.integers(2, 9)) * (1 if rng.integers(0, 2) else -1)
    kx = int(rng.integers(-8, 9))
    mix = rng.uniform(0.25, 1.0, 3)
    frames = []
    for f in range(nf):
        base = yy * ky + xx * kx + 9 * f
        span = max(1, int(base.max() - base.min()))
        base = (base - base.min()) * 220 // span
        pix = base[..., None] * mix[None, None, :]
        noise = rng.integers(0, 12, (h, w, 3))
        frames.append(np.clip(pix + noise, 0, 255).astype(np.uint8))
    frames = np.stack(frames)
    cs = ["444", "420jpeg", "mono"][int(rng.integers(0, 3))]
    if cs == "mono":
        frames = frames.mean(axis=3, keepdims=True).astype(np.uint8)
    return encode_y4m(frames, colorspace=cs)


def gen_fake_media(n: int, seed: int = 42):
    """Deterministic synthetic media table (no external data): REAL WAV
    audio rows, REAL image rows rotating through the five stdlib-decodable
    containers (binary PPM, 8-bit PNG with a rotating scanline filter,
    JPEG rotating 444/420 baseline and progressive, 24-bit BMP, still
    GIF), video rows rotating REAL YUV4MPEG2 clips, REAL animated GIFs
    and opaque byte blobs (the codec-container seam)."""
    from ..functions.gif import encode_gif
    from ..functions.jpeg import encode_jpeg

    def _gif_of(pix, frames=1):
        """Quantize the gradient pixels to a <=256-color palette GIF
        (coarsen the channel depth until the palette fits)."""
        for shift in (2, 3, 4, 6):  # 2-bit channels: 64 combos, always fits
            q = ((pix >> shift) << shift).astype(np.uint8)
            stack = np.stack(
                [np.roll(q, 3 * f, axis=0) for f in range(frames)]
            )
            colors, inv = np.unique(
                stack.reshape(-1, 3), axis=0, return_inverse=True
            )
            if len(colors) <= 256:
                idx = inv.astype(np.uint8).reshape(stack.shape[:3])
                return encode_gif(idx, colors.astype(np.uint8))
        raise AssertionError("unreachable: 3-bit channels fit 256 colors")

    rng = np.random.Generator(np.random.PCG64(seed))
    kinds = ["image", "audio", "video"]
    payloads: list[bytes] = []
    metas: list[str] = []
    img_i = 0
    vid_i = 0
    for i in range(n):
        kind = kinds[i % 3]
        if kind == "image":
            pix = _gen_pixels(rng)
            if img_i % 5 == 0:
                p = encode_pnm(pix)
            elif img_i % 5 == 1:
                # rotate scanline filters AND Adam7 interlacing (every
                # other PNG row is interlaced, exercising the pass-scatter
                # decode path through the whole media family)
                p = encode_png(
                    pix,
                    filter_type=(img_i // 5) % 5,
                    interlace=bool((img_i // 5) % 2),
                )
            elif img_i % 5 == 2:
                jmode = (img_i // 5) % 3  # rotate 444 / 420 / progressive
                p = encode_jpeg(
                    pix,
                    subsampling="420" if jmode == 1 else "444",
                    progressive=jmode == 2,
                )
            elif img_i % 5 == 3:
                p = encode_bmp(pix)
            else:
                p = _gif_of(pix)
            img_i += 1
            metas.append(
                json.dumps({"width": pix.shape[1], "height": pix.shape[0]})
            )
        elif kind == "audio":
            p = _gen_wav(rng)
            metas.append(json.dumps({"rate": 8000, "channels": 1}))
        elif vid_i % 3 == 0:
            p = _gen_y4m(rng)
            vid_i += 1
            frames = decode_y4m(p)
            metas.append(
                json.dumps(
                    {
                        "width": frames.shape[2],
                        "height": frames.shape[1],
                        "frames": frames.shape[0],
                    }
                )
            )
        elif vid_i % 3 == 1:
            pix = _gen_pixels(rng)
            nf = int(rng.integers(2, 5))
            p = _gif_of(pix, frames=nf)
            vid_i += 1
            metas.append(
                json.dumps(
                    {
                        "width": pix.shape[1],
                        "height": pix.shape[0],
                        "frames": nf,
                    }
                )
            )
        else:
            p = rng.bytes(int(rng.integers(128, 4096)))
            vid_i += 1
            metas.append(
                json.dumps(
                    {
                        "width": int(rng.integers(16, 512)),
                        "height": int(rng.integers(16, 512)),
                    }
                )
            )
        payloads.append(p)
    rows = {
        "media_id": [f"media://{i:06d}" for i in range(n)],
        "kind": [kinds[i % 3] for i in range(n)],
        "payload": payloads,
        "meta": metas,
    }
    import ray.data as rd

    return rd.from_arrow(pa.table(rows, schema=MEDIA_SCHEMA))


# ---------------------------------------------------------------------------
# Container probing: typed metadata WITHOUT decode (the routing front door
# for payloads whose codecs live behind the PIL/ffmpeg seam)
# ---------------------------------------------------------------------------


def _probe_wav(payload: bytes) -> dict:
    import io
    import wave

    with wave.open(io.BytesIO(payload)) as w:
        rate, nf = w.getframerate(), w.getnframes()
        return {
            "container": "wav",
            "codec": f"pcm_s{8 * w.getsampwidth()}",
            "duration_ms": int(round(nf * 1000.0 / rate)) if rate else None,
            "n_frames": nf,
            "sample_rate": rate,
            "channels": w.getnchannels(),
        }


def _probe_png(payload: bytes) -> dict:
    if payload[12:16] != b"IHDR" or len(payload) < 26:
        raise ValueError("PNG missing IHDR")
    return {
        "container": "png",
        "codec": f"png{payload[24]}",  # bit depth in the codec tag
        "width": int.from_bytes(payload[16:20], "big"),
        "height": int.from_bytes(payload[20:24], "big"),
    }


def _probe_jpeg(payload: bytes) -> dict:
    i = 2
    while i + 4 <= len(payload):
        if payload[i] != 0xFF:
            raise ValueError("JPEG marker desync")
        m = payload[i + 1]
        if m == 0xD8 or (0xD0 <= m <= 0xD7) or m == 0x01 or m == 0xFF:
            i += 2
            continue
        seglen = int.from_bytes(payload[i + 2 : i + 4], "big")
        if m in (0xC0, 0xC1, 0xC2, 0xC3, 0xC9, 0xCA, 0xCB):
            h = int.from_bytes(payload[i + 5 : i + 7], "big")
            w = int.from_bytes(payload[i + 7 : i + 9], "big")
            kind = "progressive" if m in (0xC2, 0xCA) else "baseline"
            arith = "-arith" if m in (0xC9, 0xCA, 0xCB) else ""
            return {
                "container": "jpeg",
                "codec": f"jpeg-{kind}{arith}",
                "width": w,
                "height": h,
            }
        i += 2 + seglen
    raise ValueError("JPEG without SOF header")


def _probe_gif(payload: bytes) -> dict:
    import struct

    w, h, packed, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    i = 13
    if packed & 0x80:
        i += 3 * (2 << (packed & 7))
    frames = 0
    while i < len(payload):
        block = payload[i]
        i += 1
        if block == 0x3B:
            break
        if block == 0x21:
            i += 1  # label
        elif block == 0x2C:
            frames += 1
            ipacked = payload[i + 8]
            i += 9
            if ipacked & 0x80:
                i += 3 * (2 << (ipacked & 7))
            i += 1  # LZW min code size
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        while i < len(payload) and payload[i]:  # skip data sub-blocks
            i += payload[i] + 1
        i += 1
    if frames == 0:
        raise ValueError("GIF without image descriptors")
    return {
        "container": "gif",
        "codec": "gif-lzw",
        "width": w,
        "height": h,
        "n_frames": frames,
    }


def _probe_bmp(payload: bytes) -> dict:
    import struct

    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    return {
        "container": "bmp",
        "codec": f"bmp{bpp}",
        "width": w,
        "height": abs(h),
    }


def _probe_pnm(payload: bytes) -> dict:
    toks = payload.split(None, 4)
    if len(toks) < 4:
        raise ValueError("truncated PNM header")
    return {
        "container": "pnm",
        "codec": toks[0].decode("latin-1").lower(),
        "width": int(toks[1]),
        "height": int(toks[2]),
    }


def _probe_y4m(payload: bytes) -> dict:
    nl = payload.index(b"\n")
    w = h = 0
    cs = "420jpeg"
    for tok in payload[10:nl].split(b" "):
        if tok[:1] == b"W":
            w = int(tok[1:])
        elif tok[:1] == b"H":
            h = int(tok[1:])
        elif tok[:1] == b"C":
            cs = tok[1:].decode("ascii", "replace")
    if w <= 0 or h <= 0:
        raise ValueError("y4m header missing W/H")
    if cs.startswith("mono"):
        frame_size = w * h
    else:
        sx, sy = _Y4M_SUBSAMPLE.get(cs[:3], (1, 1))
        frame_size = w * h + 2 * ((w // sx) * (h // sy))
    # walk FRAME headers exactly (raw plane bytes may contain b"FRAME")
    frames, i = 0, nl + 1
    while i < len(payload):
        if payload[i : i + 5] != b"FRAME":
            raise ValueError("y4m frame desync")
        i = payload.index(b"\n", i) + 1 + frame_size
        frames += 1
    return {
        "container": "y4m",
        "codec": f"rawvideo-{cs}",
        "width": w,
        "height": h,
        "n_frames": frames,
    }


_PROBE_FIELDS = (
    "container",
    "codec",
    "width",
    "height",
    "duration_ms",
    "n_frames",
    "sample_rate",
    "channels",
    "n_streams",
)


def probe_media(payload: bytes) -> dict:
    """Any media payload -> typed metadata dict (``_PROBE_FIELDS``,
    missing keys None) by magic-byte dispatch. Covers BOTH the
    stdlib-decodable formats (header-only reads — no pixel/sample
    decode) and the codec containers the sandbox cannot decode
    (ISO-BMFF/MP4, MP3/ID3, Ogg Vorbis/Opus via
    ``functions/containers.py``) — those get real container metadata
    instead of a blind quarantine. Raises ``ValueError`` on unknown or
    structurally corrupt payloads."""
    from ..functions import containers as _ct

    try:
        if payload[4:8] == b"ftyp":
            out = _ct.probe_mp4(payload)
        elif payload[:4] == b"\x1a\x45\xdf\xa3":
            out = _ct.probe_mkv(payload)
        elif payload[:4] == b"OggS":
            out = _ct.probe_ogg(payload)
        elif payload[:4] == b"fLaC":
            out = _ct.probe_flac(payload)
        elif (
            len(payload) >= 4
            and payload[0] == 0xFF
            and (payload[1] & 0xF6) == 0xF0
        ):
            # 0xFFF sync with layer bits 00 = ADTS AAC; MPEG audio
            # (probe_mp3) always has nonzero layer bits
            out = _ct.probe_adts(payload)
        elif payload[:3] == b"ID3" or (
            len(payload) >= 4
            and payload[0] == 0xFF
            and (payload[1] & 0xE0) == 0xE0
        ):
            out = _ct.probe_mp3(payload)
        elif payload[:4] == b"RIFF":
            form = payload[8:12]
            if form == b"WEBP":
                out = _ct.probe_webp(payload)
            elif form == b"AVI ":
                out = _ct.probe_avi(payload)
            else:
                out = _probe_wav(payload)
        elif payload[:4] in (b"II*\x00", b"MM\x00*"):
            out = _ct.probe_tiff(payload)
        elif payload[:4] == b"\x00\x00\x01\x00":
            out = _ct.probe_ico(payload)
        elif payload[:8] == _PNG_SIG:
            out = _probe_png(payload)
        elif payload[:3] == _JPEG_SIG:
            out = _probe_jpeg(payload)
        elif payload[:4] == _GIF_SIG:
            out = _probe_gif(payload)
        elif payload[:2] == b"BM":
            out = _probe_bmp(payload)
        elif payload[:2] in (b"P5", b"P6"):
            out = _probe_pnm(payload)
        elif payload[:9] == _Y4M_SIG:
            out = _probe_y4m(payload)
        else:
            raise ValueError("unrecognized media payload magic")
    except ValueError:
        raise
    except Exception as e:  # noqa: BLE001 — corrupt header arithmetic
        raise ValueError(f"{type(e).__name__}: {e}") from e
    return {k: out.get(k) for k in _PROBE_FIELDS}


def media_probe_stage(media, *, batch_size: int = 256):
    """MEDIA_SCHEMA Dataset -> one typed-metadata row per payload:
    (media_id, kind, n_bytes, container, codec, width, height,
    duration_ms, n_frames, sample_rate, channels, n_streams, probe_ok,
    probe_error).

    Probing is the routing front door of the media family at 100 TB:
    header-only parsing (bytes read ∝ header size, never payload size)
    classifies every blob BEFORE any decode pool spends CPU on it —
    dimension/duration filters, codec routing and corrupt-payload
    quarantine all come from this one cheap stage. Stateless header
    parse ⇒ plain task ``map_batches`` (no actor pool needed); larger
    batches than the decode stages since no pixels are materialized."""

    def fn(batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        rows: list[dict | None] = []
        errors: list[str | None] = []
        for p in payloads:
            try:
                rows.append(probe_media(p or b""))
                errors.append(None)
            except ValueError as e:
                rows.append(None)
                errors.append(str(e))
        cols: dict = {
            "media_id": batch["media_id"],
            "kind": batch["kind"],
            "n_bytes": pa.array(
                [len(p or b"") for p in payloads], pa.int64()
            ),
        }
        types = {
            "container": pa.string(),
            "codec": pa.string(),
            "width": pa.int32(),
            "height": pa.int32(),
            "duration_ms": pa.int64(),
            "n_frames": pa.int64(),
            "sample_rate": pa.int32(),
            "channels": pa.int32(),
            "n_streams": pa.int32(),
        }
        for f in _PROBE_FIELDS:
            cols[f] = pa.array(
                [(r[f] if r is not None else None) for r in rows], types[f]
            )
        cols["probe_ok"] = pa.array([r is not None for r in rows], pa.bool_())
        cols["probe_error"] = pa.array(errors, pa.string())
        return pa.table(cols)

    return media.map_batches(
        fn,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
    )


def gen_container_media(n: int, seed: int = 7):
    """Deterministic codec-container media table (no external data):
    rotates MP4 video (+audio track), MP4 audio-only, MP3 with ID3v2,
    bare mono MP3, Ogg Vorbis, Ogg Opus, WebM VP9+Opus video,
    Matroska H.264 video, lossy/lossless/animated WebP, multi-page LZW
    TIFF, AVI video, multi-entry ICO favicons, FLAC and ADTS AAC — all
    built by the ``functions/containers.py`` fixture builders. These payloads are
    exactly the crawl formats whose CODEC decode sits behind the
    documented seam; the probe stage still extracts their full container
    metadata."""
    from ..functions import containers as _ct

    rng = np.random.Generator(np.random.PCG64(seed))
    ids, kinds, payloads, metas = [], [], [], []
    for i in range(n):
        v = i % 14
        if v == 12:
            rate = [22050, 44100, 48000][i % 3]
            total = int(rng.integers(rate, 30 * rate))
            p = _ct.build_flac(
                rate=rate,
                channels=1 + i % 2,
                bps=[16, 24][i % 2],
                total_samples=total,
                n_padding_blocks=i % 3,
            )
            kind, meta = "audio", {"rate": rate, "channels": 1 + i % 2}
        elif v == 13:
            rate = [22050, 44100, 48000][i % 3]
            p = _ct.build_adts(
                n_frames=int(rng.integers(10, 200)),
                rate=rate,
                channels=1 + i % 2,
                profile=1 + i % 4,
            )
            kind, meta = "audio", {"rate": rate, "channels": 1 + i % 2}
        elif v == 11:
            pix = _gen_pixels(rng)
            ih, iw = pix.shape[:2]
            entry = (
                encode_png(pix)
                if i % 2
                else encode_ico_dib(pix)
            )
            small = encode_png(pix[: ih // 2, : iw // 2])
            p = _ct.build_ico(
                [(iw // 2, ih // 2, small), (iw, ih, entry)]
            )
            kind, meta = "image", {"width": iw, "height": ih}
        elif v == 8:
            w, h = int(rng.integers(16, 2048)), int(rng.integers(16, 2048))
            mode = i % 3  # rotate lossy / lossless / animated
            p = _ct.build_webp(
                width=w,
                height=h,
                lossless=mode == 1,
                n_frames=int(rng.integers(2, 9)) if mode == 2 else 0,
            )
            kind, meta = "image", {"width": w, "height": h}
        elif v == 9:
            w, h = int(rng.integers(16, 4096)), int(rng.integers(16, 4096))
            p = _ct.build_tiff(
                width=w,
                height=h,
                compression=[1, 5, 32773][i % 3],
                pages=int(rng.integers(1, 4)),
                big_endian=bool(i % 2),
            )
            kind, meta = "image", {"width": w, "height": h}
        elif v == 10:
            w, h = int(rng.integers(16, 1920)), int(rng.integers(16, 1080))
            nf = int(rng.integers(24, 720))
            p = _ct.build_avi(
                width=w, height=h, n_frames=nf, fps=[24, 25, 30][i % 3]
            )
            kind, meta = "video", {"width": w, "height": h, "frames": nf}
        elif v == 6:
            w, h = int(rng.integers(16, 1920)), int(rng.integers(16, 1080))
            dur = int(rng.integers(500, 30_000))
            p = _ct.build_mkv(
                doctype="webm",
                duration_ms=dur,
                width=w,
                height=h,
                video_codec="V_VP9",
                audio_codec="A_OPUS",
                sample_rate=48000,
                channels=2,
                cluster=rng.bytes(int(rng.integers(64, 512))),
            )
            kind, meta = "video", {"width": w, "height": h}
        elif v == 7:
            w, h = int(rng.integers(16, 1280)), int(rng.integers(16, 720))
            dur = int(rng.integers(500, 30_000))
            p = _ct.build_mkv(
                doctype="matroska",
                duration_ms=dur,
                width=w,
                height=h,
                video_codec="V_MPEG4/ISO/AVC",
                cluster=rng.bytes(int(rng.integers(64, 512))),
            )
            kind, meta = "video", {"width": w, "height": h}
        elif v == 0:
            w, h = int(rng.integers(16, 1920)), int(rng.integers(16, 1080))
            nf = int(rng.integers(24, 720))
            dur = int(rng.integers(500, 30_000))
            p = _ct.build_mp4(
                duration_ms=dur,
                width=w,
                height=h,
                n_frames=nf,
                audio_codec=b"mp4a",
                sample_rate=48000,
                channels=2,
                mdat=rng.bytes(int(rng.integers(64, 512))),
                version1=bool(i % 2),
            )
            kind, meta = "video", {"width": w, "height": h, "frames": nf}
        elif v == 1:
            dur = int(rng.integers(500, 30_000))
            p = _ct.build_mp4(
                duration_ms=dur,
                audio_codec=b"mp4a",
                sample_rate=44100,
                channels=1,
                mdat=rng.bytes(int(rng.integers(64, 512))),
            )
            kind, meta = "audio", {"rate": 44100, "channels": 1}
        elif v == 2:
            nf = int(rng.integers(10, 200))
            p = _ct.build_mp3(
                n_frames=nf, id3_payload=rng.bytes(int(rng.integers(16, 96)))
            )
            kind, meta = "audio", {"rate": 44100, "channels": 2}
        elif v == 3:
            nf = int(rng.integers(10, 200))
            p = _ct.build_mp3(
                n_frames=nf, bitrate_kbps=64, rate=32000, mono=True
            )
            kind, meta = "audio", {"rate": 32000, "channels": 1}
        elif v == 4:
            rate = [22050, 44100, 48000][i % 3]
            p = _ct.build_ogg(
                codec="vorbis",
                rate=rate,
                channels=2,
                granule=int(rng.integers(rate, 60 * rate)),
                serial=i + 1,
            )
            kind, meta = "audio", {"rate": rate, "channels": 2}
        else:
            p = _ct.build_ogg(
                codec="opus",
                rate=48000,
                channels=1,
                granule=int(rng.integers(48000, 60 * 48000)),
                serial=i + 1,
            )
            kind, meta = "audio", {"rate": 48000, "channels": 1}
        ids.append(f"codec://{i:06d}")
        kinds.append(kind)
        payloads.append(p)
        metas.append(json.dumps(meta))
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "media_id": ids,
                "kind": kinds,
                "payload": payloads,
                "meta": metas,
            },
            schema=MEDIA_SCHEMA,
        )
    )


# ---------------------------------------------------------------------------
# ICO (favicon) decode: the most common crawl image container — entries
# are PNG payloads or BMP DIBs (XOR bitmap + AND mask, doubled height)
# ---------------------------------------------------------------------------


def _dib_to_bmp(dib: bytes) -> bytes:
    """ICO DIB block (BITMAPINFOHEADER with doubled height, trailing
    AND mask) -> a synthetic .bmp file the BMP decoder accepts. The AND
    mask trails the XOR rows, so the size-bounded row read ignores it;
    32-bpp alpha is dropped by decode_bmp like any BMP alpha."""
    import struct

    if len(dib) < 40:
        raise NotImplementedError("ICO DIB too short")
    hdr_size = struct.unpack_from("<I", dib, 0)[0]
    height = struct.unpack_from("<i", dib, 8)[0]
    bpp = struct.unpack_from("<H", dib, 14)[0]
    ncolors = struct.unpack_from("<I", dib, 32)[0]
    if not ncolors and bpp <= 8:
        ncolors = 1 << bpp
    fixed = bytearray(dib)
    # ICO stores XOR+AND stacked: biHeight is doubled — halve it back
    struct.pack_into("<i", fixed, 8, height // 2)
    data_off = 14 + hdr_size + 4 * ncolors
    return (
        b"BM"
        + (14 + len(dib)).to_bytes(4, "little")
        + b"\x00" * 4
        + data_off.to_bytes(4, "little")
        + bytes(fixed)
    )


def encode_ico_dib(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> an ICO DIB block (24-bpp XOR rows + zero AND
    mask, doubled-height header) for fixtures/tests."""
    bmp = encode_bmp(pixels)  # file header 14 + info header 40 + rows
    import struct

    dib = bytearray(bmp[14:])
    h, w = pixels.shape[:2]
    struct.pack_into("<i", dib, 8, 2 * h)
    mask_row = (w + 31) // 32 * 4
    dib += b"\x00" * (mask_row * h)  # fully-opaque AND mask
    return bytes(dib)


def decode_ico(payload: bytes) -> np.ndarray:
    """ICO bytes -> (h, w, 3) uint8 pixels of the LARGEST entry (the
    one a dedup/feature pass wants); PNG entries decode via decode_png,
    DIB entries via the BMP decoder. Raises ``NotImplementedError`` on
    structural corruption (media-family contract)."""
    if payload[:4] != b"\x00\x00\x01\x00" or len(payload) < 6:
        raise NotImplementedError("not an ICO payload")
    count = int.from_bytes(payload[4:6], "little")
    if count == 0 or 6 + 16 * count > len(payload):
        raise NotImplementedError("ICO directory truncated or empty")
    best = None  # (area, img_bytes)
    for i in range(count):
        o = 6 + 16 * i
        w = payload[o] or 256
        h = payload[o + 1] or 256
        size = int.from_bytes(payload[o + 8 : o + 12], "little")
        off = int.from_bytes(payload[o + 12 : o + 16], "little")
        if off + size > len(payload):
            raise NotImplementedError("ICO entry overruns payload")
        if best is None or w * h > best[0]:
            best = (w * h, payload[off : off + size])
    img = best[1]
    if img[:8] == _PNG_SIG:
        pix = decode_png(img)
        if pix.shape[2] == 4:
            pix = pix[..., :3]
        elif pix.shape[2] == 2:
            pix = pix[..., :1]
        return np.ascontiguousarray(pix)
    return decode_bmp(_dib_to_bmp(img))


def ico_feature(payload: bytes) -> np.ndarray:
    """Real 32-dim image feature over the largest decoded ICO entry."""
    return _pixel_feature(decode_ico(payload).astype(np.float32))
