"""GIF87a/89a codec — stdlib + numpy only, no PIL.

REAL decoding of the web's indexed-color format, including animation:
logical-screen compositing (disposal methods none/keep, background,
previous), local/global palettes, transparency, interlacing, and the
variable-width LZW scheme GIF defines. ``decode_gif`` returns ALL frames
composited to the canvas, so an animated GIF behaves like a tiny video in
the media stages (real frame sampling), and a still GIF is one frame.

The encoder (global palette, one image per frame, optional transparency
pass-through) exists as the hermetic test seam: palette images roundtrip
exactly. The LZW decode is table-driven Python over numpy index arrays —
frame composition and palette mapping are vectorized.
"""

from __future__ import annotations

import struct

import numpy as np


def _lzw_decode(min_code_size: int, data: bytes, expected: int) -> np.ndarray:
    """GIF variable-width LZW -> uint8 index array of ``expected`` pixels."""
    clear = 1 << min_code_size
    end = clear + 1
    # dictionary: list of byte strings; rebuilt on CLEAR
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    width = min_code_size + 1
    out = bytearray()
    prev: bytes | None = None
    buf = 0
    nbits = 0
    pos = 0
    n = len(data)
    while len(out) < expected:
        while nbits < width:
            if pos >= n:
                raise NotImplementedError("truncated GIF LZW stream")
            buf |= data[pos] << nbits  # GIF packs LSB-first
            pos += 1
            nbits += 8
        code = buf & ((1 << width) - 1)
        buf >>= width
        nbits -= width
        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise NotImplementedError("corrupt GIF LZW code")
        out += entry
        prev = entry
        if len(table) >= (1 << width) and width < 12:
            width += 1
    return np.frombuffer(bytes(out[:expected]), np.uint8)


def _lzw_encode(min_code_size: int, indices: np.ndarray) -> bytes:
    """Inverse of ``_lzw_decode`` (greedy longest-match; test seam)."""
    clear = 1 << min_code_size
    end = clear + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    width = min_code_size + 1
    out = bytearray()
    buf = 0
    nbits = 0

    def emit(code: int) -> None:
        nonlocal buf, nbits
        buf |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(buf & 0xFF)
            buf >>= 8
            nbits -= 8

    emit(clear)
    w = b""
    for b in indices.tobytes():
        wk = w + bytes([b])
        if wk in table:
            w = wk
            continue
        emit(table[w])
        if next_code < 4096:
            table[wk] = next_code
            if next_code >= (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:  # table full: emit CLEAR and rebuild (bounded width)
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        w = bytes([b])
    if w:
        emit(table[w])
    emit(end)
    if nbits:
        out.append(buf & 0xFF)
    return bytes(out)


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(idx: np.ndarray, h: int, w: int) -> np.ndarray:
    rows = idx.reshape(h, w)
    out = np.empty_like(rows)
    src = 0
    for start, step in _INTERLACE_PASSES:
        n = len(range(start, h, step))
        out[start::step] = rows[src : src + n]
        src += n
    return out


def decode_gif(payload: bytes) -> tuple[np.ndarray, np.ndarray]:
    """GIF bytes -> ``(frames, alpha)``: (n, h, w, 3) uint8 RGB canvases
    (every frame fully composited) and (n, h, w) bool opacity. Still GIFs
    give n=1. Raises ``NotImplementedError`` on structural corruption."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise NotImplementedError("not a GIF payload")
    w, h, packed, bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    i = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 7)
        gct = (
            np.frombuffer(payload, np.uint8, 3 * n, i).reshape(n, 3).copy()
        )
        i += 3 * n
    canvas = np.zeros((h, w, 3), np.uint8)
    opaque = np.zeros((h, w), bool)
    if gct is not None:
        canvas[:] = gct[bg if bg < len(gct) else 0]
    frames: list[np.ndarray] = []
    alphas: list[np.ndarray] = []
    transparent = -1
    disposal = 0
    while i < len(payload):
        block = payload[i]
        i += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = payload[i]
            i += 1
            if label == 0xF9:  # graphic control
                sz = payload[i]
                flags = payload[i + 1]
                disposal = (flags >> 2) & 7
                transparent = payload[i + 4] if flags & 1 else -1
                i += sz + 1
            while payload[i]:  # skip (remaining) sub-blocks
                i += payload[i] + 1
            i += 1
        elif block == 0x2C:  # image descriptor
            left, top, iw, ih, ipacked = struct.unpack_from("<HHHHB", payload, i)
            i += 9
            if left + iw > w or top + ih > h:
                # structural corruption: the frame region must stay inside
                # the logical screen, else the canvas assignment below would
                # silently slice-truncate / shape-mismatch
                raise NotImplementedError(
                    f"GIF image descriptor {iw}x{ih}@({left},{top}) exceeds "
                    f"logical screen {w}x{h}"
                )
            pal = gct
            if ipacked & 0x80:
                n = 2 << (ipacked & 7)
                pal = (
                    np.frombuffer(payload, np.uint8, 3 * n, i)
                    .reshape(n, 3)
                    .copy()
                )
                i += 3 * n
            if pal is None:
                raise NotImplementedError("GIF image without any palette")
            min_code = payload[i]
            i += 1
            chunks = []
            while payload[i]:
                sz = payload[i]
                chunks.append(payload[i + 1 : i + 1 + sz])
                i += sz + 1
            i += 1
            idx = _lzw_decode(min_code, b"".join(chunks), iw * ih)
            idx = (
                _deinterlace(idx, ih, iw)
                if ipacked & 0x40
                else idx.reshape(ih, iw)
            )
            before = canvas.copy()
            before_op = opaque.copy()
            region = canvas[top : top + ih, left : left + iw]
            region_op = opaque[top : top + ih, left : left + iw]
            vis = (
                idx != transparent
                if transparent >= 0
                else np.ones_like(idx, bool)
            )
            region[vis] = pal[idx[vis] % len(pal)]
            region_op[vis] = True
            frames.append(canvas.copy())
            alphas.append(opaque.copy())
            if disposal == 2:  # restore background
                region[:] = gct[bg % len(gct)] if gct is not None else 0
                region_op[:] = False
            elif disposal == 3:  # restore previous
                canvas = before
                opaque = before_op
            disposal = 0
            transparent = -1
        else:
            raise NotImplementedError(f"unknown GIF block 0x{block:02X}")
    if not frames:
        raise NotImplementedError("GIF stream has no image data")
    return np.stack(frames), np.stack(alphas)


def encode_gif(
    frames: np.ndarray,
    palette: np.ndarray,
    *,
    interlace: bool = False,
    transparent: int = -1,
    delay_cs: int = 4,
) -> bytes:
    """(n, h, w) uint8 palette indices + (k, 3) palette -> GIF89a bytes
    (inverse seam of decode_gif; exact index roundtrip). Multi-frame input
    emits an animated stream with per-frame graphic-control blocks."""
    if frames.ndim == 2:
        frames = frames[None]
    n, h, w = frames.shape
    k = len(palette)
    bits = max(2, int(k - 1).bit_length())
    pal = np.zeros((1 << bits, 3), np.uint8)
    pal[:k] = palette
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) & 7), 0, 0)
    out += pal.tobytes()
    min_code = max(2, bits)
    for f in frames:
        if n > 1 or transparent >= 0:
            flags = (1 if transparent >= 0 else 0) | (0x04 if n > 1 else 0)
            out += b"\x21\xf9\x04" + bytes(
                [flags, delay_cs & 0xFF, delay_cs >> 8, max(transparent, 0), 0]
            )
        out += b"\x2c" + struct.pack(
            "<HHHHB", 0, 0, w, h, 0x40 if interlace else 0
        )
        rows = f
        if interlace:
            parts = [f[start::step] for start, step in _INTERLACE_PASSES]
            rows = np.concatenate(parts, axis=0)
        out.append(min_code)
        data = _lzw_encode(min_code, rows.reshape(-1))
        for j in range(0, len(data), 255):
            chunk = data[j : j + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)


def gif_frames_rgb(payload: bytes, *, max_frames: int = 0) -> np.ndarray:
    """Convenience: decode and return (n, h, w, 3) composited RGB frames
    (``max_frames`` > 0 truncates)."""
    frames, _alpha = decode_gif(payload)
    return frames[:max_frames] if max_frames > 0 else frames
