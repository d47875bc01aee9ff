"""Real baseline-TIFF decode/encode — stdlib + numpy only.

TIFF 6.0 baseline subset a crawl actually hits for thumbnails/scans:
both byte orders (II/MM), 8-bit grayscale and RGB(A), strip layout
(any RowsPerStrip), and the three baseline compressions — none (1),
PackBits (32773) and LZW (5, MSB-first code packing with the spec's
"early change" width bump). Tiled TIFFs, other bit depths and JPEG/
deflate compressions raise ``NotImplementedError`` into the media
family's quarantine/fallback channel.

The LZW here is TIFF's variant (MSB-first bit order, width increments
one code EARLY relative to GIF's LSB-first scheme) — implemented
independently of ``functions/gif.py``'s decoder because the two
bitstream layouts share no code paths worth unifying. The PackBits
decoder is validated against the worked example in the public TIFF 6.0
specification (Section 9).
"""

from __future__ import annotations

import numpy as np

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}  # BYTE ASCII SHORT LONG RATIONAL


def _ifd0(payload: bytes):
    """Parse header + IFD0 -> (tag -> list[int] values, byte order)."""
    if payload[:4] == b"II*\x00":
        bo = "little"
    elif payload[:4] == b"MM\x00*":
        bo = "big"
    else:
        raise NotImplementedError("not a TIFF payload")

    def u(s, n):
        return int.from_bytes(payload[s : s + n], bo)

    off = u(4, 4)
    if off + 2 > len(payload):
        raise NotImplementedError("TIFF IFD offset overruns payload")
    n = u(off, 2)
    if off + 2 + 12 * n > len(payload):
        raise NotImplementedError("TIFF IFD entries overrun payload")
    tags: dict[int, list[int]] = {}
    for i in range(n):
        o = off + 2 + 12 * i
        tag, typ, cnt = u(o, 2), u(o + 2, 2), u(o + 4, 4)
        size = _TYPE_SIZE.get(typ)
        if size is None or typ == 5:
            continue  # RATIONAL / unknown types are irrelevant here
        total = size * cnt
        vo = o + 8 if total <= 4 else u(o + 8, 4)
        if vo + total > len(payload):
            raise NotImplementedError(f"TIFF tag {tag} values overrun")
        tags[tag] = [u(vo + j * size, size) for j in range(cnt)]
    return tags, bo


def _packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expected:
        n = data[i]
        i += 1
        if n < 128:  # n+1 literal bytes
            out += data[i : i + n + 1]
            i += n + 1
        elif n > 128:  # repeat next byte 257-n times
            out += data[i : i + 1] * (257 - n)
            i += 1
        # n == 128: noop
    if len(out) != expected:
        raise NotImplementedError("PackBits strip size mismatch")
    return bytes(out)


def _packbits_encode(raw: bytes) -> bytes:
    """Spec-shaped encoder: RLE for runs >= 3, literal groups otherwise."""
    out = bytearray()
    i, n = 0, len(raw)
    while i < n:
        run = 1
        while i + run < n and run < 128 and raw[i + run] == raw[i]:
            run += 1
        if run >= 3:
            out += bytes([257 - run, raw[i]])
            i += run
            continue
        lit = i
        while i < n and i - lit < 128:
            run = 1
            while i + run < n and run < 3 and raw[i + run] == raw[i]:
                run += 1
            if run >= 3:
                break
            i += 1
        out += bytes([i - lit - 1]) + raw[lit:i]
    return bytes(out)


def _lzw_decode(data: bytes, expected: int) -> bytes:
    """TIFF-variant LZW: MSB-first code packing, Clear=256, EOI=257,
    9->12-bit widths with the early-change bump at 2**w - 1 entries."""
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width = 9
    acc = nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (acc >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == 256:  # Clear
                table = table[:258]
                width = 9
                prev = None
                continue
            if code == 257:  # EOI
                if len(out) != expected:
                    raise NotImplementedError("LZW strip size mismatch")
                return bytes(out)
            if prev is None:
                if code >= len(table):
                    raise NotImplementedError("LZW code out of range")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise NotImplementedError("LZW code out of range")
            out += entry
            prev = entry
            # early change: the decoder's table lags the encoder's by
            # one entry, so it bumps at 2**w - 2 where the encoder (which
            # has already added the next entry) bumps at 2**w - 1
            if len(table) == (1 << width) - 2 and width < 12:
                width += 1
    raise NotImplementedError("LZW strip without EOI")


def _lzw_encode(raw: bytes) -> bytes:
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, width: int):
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    nxt, width = 258, 9
    emit(256, width)
    cur = b""
    for b in raw:
        cand = cur + bytes([b])
        if cand in table:
            cur = cand
            continue
        emit(table[cur], width)
        table[cand] = nxt
        nxt += 1
        if nxt == (1 << width) - 1 and width < 12:
            width += 1  # mirror the decoder's early change
        elif nxt == 4094:  # table nearly full: reset
            emit(256, width)
            table = {bytes([i]): i for i in range(256)}
            nxt, width = 258, 9
        cur = bytes([b])
    if cur:
        emit(table[cur], width)
    emit(257, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def decode_tiff(payload: bytes) -> np.ndarray:
    """Baseline TIFF bytes -> (h, w, c) uint8 pixels (c = 1 gray or
    3 RGB; alpha dropped). Strip-organized, 8-bit, compressions
    none/PackBits/LZW; anything else raises ``NotImplementedError``."""
    tags, _bo = _ifd0(payload)

    def one(tag, default=None):
        v = tags.get(tag)
        if v is None:
            if default is None:
                raise NotImplementedError(f"TIFF missing required tag {tag}")
            return default
        return v[0]

    w, h = one(256), one(257)
    comp = one(259, 1)
    photometric = one(262, 1)
    spp = one(277, 1)
    bits = tags.get(258, [8])
    if any(b != 8 for b in bits):
        raise NotImplementedError(f"only 8-bit TIFF supported (bits={bits})")
    if one(284, 1) != 1:
        raise NotImplementedError("planar TIFF not supported")
    if 322 in tags or 324 in tags:
        raise NotImplementedError("tiled TIFF not supported")
    if photometric not in (0, 1, 2):
        raise NotImplementedError(
            f"unsupported TIFF photometric {photometric}"
        )
    offsets = tags.get(273)
    counts = tags.get(279)
    if not offsets or not counts or len(offsets) != len(counts):
        raise NotImplementedError("TIFF without usable strip tables")
    rps = one(278, h)
    row_bytes = w * spp
    chunks: list[bytes] = []
    remaining = h
    for k, (so, sc) in enumerate(zip(offsets, counts)):
        if so + sc > len(payload):
            raise NotImplementedError("TIFF strip overruns payload")
        rows = min(rps, remaining)
        remaining -= rows
        raw = payload[so : so + sc]
        expected = rows * row_bytes
        if comp == 1:
            if len(raw) < expected:
                raise NotImplementedError("TIFF strip shorter than rows")
            chunks.append(raw[:expected])
        elif comp == 32773:
            chunks.append(_packbits_decode(raw, expected))
        elif comp == 5:
            chunks.append(_lzw_decode(raw, expected))
        else:
            raise NotImplementedError(
                f"unsupported TIFF compression {comp}"
            )
    pix = np.frombuffer(b"".join(chunks), np.uint8).reshape(h, w, spp)
    if photometric == 0:  # WhiteIsZero: invert to the usual polarity
        pix = 255 - pix
    if spp == 4:
        pix = pix[..., :3]
    elif spp == 2:
        pix = pix[..., :1]
    return np.ascontiguousarray(pix)


_COMP_IDS = {"none": 1, "lzw": 5, "packbits": 32773}


def encode_tiff(
    pixels: np.ndarray,
    *,
    compression: str = "none",
    big_endian: bool = False,
    rows_per_strip: int | None = None,
) -> bytes:
    """(h, w, c) uint8 -> baseline TIFF bytes (gray c=1 or RGB c=3;
    strip-organized with the chosen compression)."""
    if pixels.ndim == 2:
        pixels = pixels[..., None]
    h, w, c = pixels.shape
    if c not in (1, 3):
        raise ValueError("encode_tiff wants gray or RGB pixels")
    comp = _COMP_IDS[compression]
    bo = "big" if big_endian else "little"
    rps = rows_per_strip or h
    raw = np.ascontiguousarray(pixels).tobytes()
    row_bytes = w * c
    strips = []
    for y0 in range(0, h, rps):
        rows = min(rps, h - y0)
        s = raw[y0 * row_bytes : (y0 + rows) * row_bytes]
        if comp == 32773:
            s = _packbits_encode(s)
        elif comp == 5:
            s = _lzw_encode(s)
        strips.append(s)

    entries: list[tuple[int, int, list[int]]] = []  # (tag, type, values)
    entries.append((256, 4, [w]))
    entries.append((257, 4, [h]))
    entries.append((258, 3, [8] * c))
    entries.append((259, 3, [comp]))
    entries.append((262, 3, [2 if c == 3 else 1]))
    entries.append((277, 3, [c]))
    entries.append((278, 4, [rps]))
    # strip offsets filled after layout
    n_entries = len(entries) + 2
    ifd_off = 8
    data_off = ifd_off + 2 + 12 * n_entries + 4

    # out-of-line value arrays (bits-per-sample for RGB, strip tables)
    extra = bytearray()

    def place(typ: int, values: list[int]) -> tuple[int, int]:
        """Return (count, value-or-offset) laying long arrays in extra."""
        size = _TYPE_SIZE[typ]
        total = size * len(values)
        if total <= 4:
            packed = 0
            for j, v in enumerate(values):
                packed |= v << (
                    8 * size * j if bo == "little" else 8 * size * (
                        (4 // size - 1) - j
                    )
                )
            return len(values), packed
        off = data_off + len(extra)
        for v in values:
            extra.extend(v.to_bytes(size, bo))
        return len(values), off

    strip_sizes = [len(s) for s in strips]
    # lay out extra arrays first (so strip offsets are known afterwards)
    placed = [(tag, typ, *place(typ, vals)) for tag, typ, vals in entries]
    counts_placed = place(4, strip_sizes)
    # the strip-offsets array itself may be out-of-line; account for it
    # before computing where strip data starts
    offs: list[int] = []
    if 4 * len(strips) <= 4:
        cursor = data_off + len(extra)
    else:
        cursor = data_off + len(extra) + 4 * len(strips)
    for s in strips:
        offs.append(cursor)
        cursor += len(s)
    offsets_placed = place(4, offs)
    placed.append((273, 4, *offsets_placed))
    placed.append((279, 4, *counts_placed))
    placed.sort(key=lambda e: e[0])

    out = bytearray()
    out += (b"MM\x00*" if big_endian else b"II*\x00")
    out += ifd_off.to_bytes(4, bo)
    out += n_entries.to_bytes(2, bo)
    for tag, typ, cnt, val in placed:
        out += tag.to_bytes(2, bo)
        out += typ.to_bytes(2, bo)
        out += cnt.to_bytes(4, bo)
        out += val.to_bytes(4, bo)
    out += (0).to_bytes(4, bo)  # no next IFD
    out += extra
    for s in strips:
        out += s
    return bytes(out)
