"""Baseline-sequential JPEG codec — stdlib + numpy only, no PIL/libjpeg.

REAL decoding for the single most common web-image codec, so a multimodal
corpus of actual JPEG payloads runs through the media stages without the
deterministic fallback. Scope: baseline DCT sequential (SOF0) AND progressive (SOF2, spectral
selection + successive approximation), 8-bit, 1- or 3-component
(grayscale / YCbCr), integer-ratio sampling factors, restart markers
(DRI/RSTn) supported. Arithmetic coding, 12-bit and hierarchical modes
raise ``NotImplementedError`` naming the variant — the dispatch
contract the media actors rely on.

The entropy decode is table-driven Python (inherently bit-serial); the
numeric heavy lifting — dezigzag, dequantize, 2-D IDCT over all blocks at
once, chroma upsample, YCbCr->RGB — is vectorized numpy. At corpus scale
this runs inside ``map_batches`` actor pools, so per-payload decode cost
parallelizes across the cluster like any other stateful stage.

The encoder (quality-scaled spec Annex K quantization tables + spec
Annex K Huffman tables, 4:4:4 sampling) exists as the test/fixture seam:
decode(encode(x)) bounds reconstruction error in tests and generates
deterministic synthetic JPEG corpora without external data.
"""

from __future__ import annotations

import struct

import numpy as np


def _zigzag_order() -> np.ndarray:
    """Row-major index of each coefficient in zigzag scan order (derived,
    not a pasted table): even anti-diagonals walk bottom-left -> top-right,
    odd ones top-right -> bottom-left."""
    out = []
    for s in range(15):
        if s % 2:
            ij = [(i, s - i) for i in range(max(0, s - 7), min(8, s + 1))]
        else:
            ij = [(s - j, j) for j in range(max(0, s - 7), min(8, s + 1))]
        out += ij
    return np.array([i * 8 + j for i, j in out], np.int64)


_ZIGZAG = _zigzag_order()          # scan position -> row-major position
_UNZIGZAG = np.argsort(_ZIGZAG)    # row-major position -> scan position


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II basis: row k = c_k * cos((2n+1)k*pi/16)."""
    k = np.arange(8)[:, None].astype(np.float64)
    n = np.arange(8)[None, :].astype(np.float64)
    m = np.cos((2 * n + 1) * k * np.pi / 16) * np.sqrt(2 / 8)
    m[0] /= np.sqrt(2)
    return m


_DCT = _dct_matrix()


def _idct_blocks(coef: np.ndarray) -> np.ndarray:
    """(N, 8, 8) dequantized coefficients -> (N, 8, 8) spatial samples
    (one einsum pair over every block at once)."""
    return np.einsum("ij,njk,kl->nil", _DCT.T, coef, _DCT)


def _dct_blocks(spatial: np.ndarray) -> np.ndarray:
    """(N, 8, 8) level-shifted samples -> (N, 8, 8) DCT coefficients."""
    return np.einsum("ij,njk,kl->nil", _DCT, spatial, _DCT.T)


# JPEG spec Annex K.1 reference quantization tables (public spec data),
# stored in zigzag scan order as the spec lists them.
_Q_LUMA = np.array(
    [16, 11, 12, 14, 12, 10, 16, 14, 13, 14, 18, 17, 16, 19, 24, 40,
     26, 24, 22, 22, 24, 49, 35, 37, 29, 40, 58, 51, 61, 60, 57, 51,
     56, 55, 64, 72, 92, 78, 64, 68, 87, 69, 55, 56, 80, 109, 81, 87,
     95, 98, 103, 104, 103, 62, 77, 113, 121, 112, 100, 120, 92, 101,
     103, 99], np.int32)
_Q_CHROMA = np.array(
    [17, 18, 18, 24, 21, 24, 47, 26, 26, 47, 99, 66, 56, 66, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99],
    np.int32)

# Spec Annex K.3 typical Huffman tables: (bits[1..16] counts, symbol list).
_HUFF_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HUFF_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
_HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """DHT (bits, vals) -> {(code_length, code): symbol} canonical map."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            table[(ln, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _encode_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """DHT (bits, vals) -> {symbol: (code, code_length)} for the encoder."""
    return {
        sym: (code, ln) for (ln, code), sym in _canonical_codes(bits, vals).items()
    }


class _BitReader:
    """MSB-first bit reader over a destuffed entropy segment."""

    __slots__ = ("data", "pos", "buf", "nbits")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.buf = 0
        self.nbits = 0

    def read(self, n: int) -> int:
        while self.nbits < n:
            b = self.data[self.pos] if self.pos < len(self.data) else 0
            self.pos += 1
            self.buf = (self.buf << 8) | b
            self.nbits += 8
        self.nbits -= n
        out = (self.buf >> self.nbits) & ((1 << n) - 1)
        self.buf &= (1 << self.nbits) - 1
        return out

    def decode(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | self.read(1)
            sym = table.get((ln, code))
            if sym is not None:
                return sym
        raise NotImplementedError("invalid JPEG Huffman code")


def _extend(val: int, size: int) -> int:
    """JPEG signed-magnitude EXTEND: a ``size``-bit value with a 0 MSB is
    negative, offset by -(2^size - 1)."""
    if size == 0:
        return 0
    return val if val >= (1 << (size - 1)) else val - (1 << size) + 1


def _split_entropy(payload: bytes, start: int) -> tuple[list[bytes], int]:
    """Slice the entropy-coded segment starting at ``start`` into restart
    intervals: destuff 0xFF00, split at RSTn, stop at any other marker.
    Returns (intervals, index of the terminating marker's 0xFF)."""
    out: list[bytes] = []
    cur = bytearray()
    i = start
    n = len(payload)
    while i < n:
        b = payload[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        m = payload[i + 1] if i + 1 < n else 0xD9
        if m == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:
            out.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:
            break
    out.append(bytes(cur))
    return out, i


def _geometry(frame):
    """Per-frame block geometry: MCU grid + per-component padded block
    grid (bw, bh) and tight (data-bearing) block grid (twt, tht)."""
    h, w, comps = frame
    maxh = max(c[1] for c in comps)
    maxv = max(c[2] for c in comps)
    mcux = -(-w // (8 * maxh))
    mcuy = -(-h // (8 * maxv))
    geo = {}
    for cid, hf, vf, _qid in comps:
        cw = -(-(w * hf) // maxh)
        ch_ = -(-(h * vf) // maxv)
        geo[cid] = (mcux * hf, mcuy * vf, -(-cw // 8), -(-ch_ // 8))
    return maxh, maxv, mcux, mcuy, geo


def decode_jpeg(payload: bytes) -> np.ndarray:
    """JPEG bytes -> (h, w, c) uint8 pixels (c = 1 grayscale or 3 RGB) —
    REAL DCT-Huffman decoding, stdlib + numpy only. Baseline sequential
    (SOF0/1, any sampling factors, DRI/RSTn) and progressive (SOF2,
    spectral selection + successive approximation) are both supported;
    arithmetic-coded / lossless / hierarchical / 12-bit streams raise
    ``NotImplementedError``."""
    if payload[:2] != b"\xff\xd8":
        raise NotImplementedError("not a JPEG payload (missing SOI)")
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None        # (h, w, [(comp_id, hf, vf, qid), ...])
    store: dict[int, np.ndarray] = {}  # cid -> (nblocks, 64) zigzag coefs
    restart_interval = 0
    saw_scan = False
    i = 2
    n = len(payload)
    while i < n:
        if payload[i] != 0xFF:
            raise NotImplementedError("JPEG marker desync")
        marker = payload[i + 1]
        i += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        (seg_len,) = struct.unpack_from(">H", payload, i)
        seg = payload[i + 2 : i + seg_len]
        i += seg_len
        if marker == 0xDB:  # DQT
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit JPEG quant table")
                qtabs[tq] = np.frombuffer(
                    seg, np.uint8, 64, j + 1
                ).astype(np.int32)
                j += 65
        elif marker == 0xC4:  # DHT
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 0xF
                bits = list(seg[j + 1 : j + 17])
                cnt = sum(bits)
                vals = list(seg[j + 17 : j + 17 + cnt])
                htabs[(tc, th)] = _canonical_codes(bits, vals)
                j += 17 + cnt
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 prog
            prec, h, w, nc = seg[0], *struct.unpack_from(">HH", seg, 1), seg[5]
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG not supported")
            comps = []
            for c in range(nc):
                cid, hv, qid = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0xF, qid))
            frame = (h, w, comps)
            _, _, _, _, geo = _geometry(frame)
            store = {
                cid: np.zeros((bw * bh, 64), np.int32)
                for cid, (bw, bh, _t, _u) in geo.items()
            }
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline (SOF0/SOF1) and progressive (SOF2) JPEG "
                f"are supported (found SOF marker 0xFF{marker:02X})"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS: scan header then entropy data
            if frame is None:
                raise NotImplementedError("JPEG SOS before SOF")
            ns = seg[0]
            scan = []  # (comp_id, dc_table, ac_table) in SOS order
            for c in range(ns):
                cid, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                scan.append((cid, tt >> 4, tt & 0xF))
            ss, se, a = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            intervals, i = _split_entropy(payload, i)
            _decode_sos(
                frame, scan, ss, se, a >> 4, a & 0xF,
                store, htabs, intervals, restart_interval,
            )
            saw_scan = True
        # APPn/COM/other segments: skipped
    if not saw_scan:
        raise NotImplementedError("JPEG stream ended without a scan")
    return _reconstruct(frame, store, qtabs)


def _scan_mcus(frame, scan):
    """Yield the block visit order of one scan: lists of (cid, blk_index)
    per restart-countable MCU. Interleaved scans (ns > 1) walk the MCU
    grid with hf x vf blocks per component; single-component scans walk
    the component's TIGHT block grid (one block per MCU), using the padded
    grid's row stride for indexing."""
    _maxh, _maxv, mcux, mcuy, geo = _geometry(frame)
    comps = {c[0]: c for c in frame[2]}
    if len(scan) == 1:
        cid = scan[0][0]
        bw, _bh, twt, tht = geo[cid]
        for r in range(tht):
            for c in range(twt):
                yield [(cid, r * bw + c)]
        return
    for my in range(mcuy):
        for mx in range(mcux):
            group = []
            for cid, _dc, _ac in scan:
                _, hf, vf, _qid = comps[cid]
                bw = geo[cid][0]
                for by in range(vf):
                    for bx in range(hf):
                        group.append(
                            (cid, (my * vf + by) * bw + (mx * hf + bx))
                        )
            yield group


def _refine_ac(rdr, ac_t, row, ss, se, al, eobrun):
    """Successive-approximation AC refinement for one block (spec
    G.1.2.3; the correction-bit walk libjpeg's jdphuff implements).
    Returns the remaining EOB run."""
    p1, m1 = 1 << al, -(1 << al)
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = rdr.decode(ac_t)
            r, s = rs >> 4, rs & 0xF
            val = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += rdr.read(r)
                    break
                # ZRL: skip 16 zero-history coefficients below
            else:
                if s != 1:
                    raise NotImplementedError("invalid JPEG AC refine size")
                val = p1 if rdr.read(1) else m1
            while k <= se:
                if row[k] != 0:
                    if rdr.read(1) and (row[k] & p1) == 0:
                        row[k] += p1 if row[k] >= 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                row[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            if row[k] != 0:
                if rdr.read(1) and (row[k] & p1) == 0:
                    row[k] += p1 if row[k] >= 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _decode_sos(frame, scan, ss, se, ah, al, store, htabs, intervals, ri):
    """Decode one entropy-coded scan into the zigzag coefficient store.
    Baseline is the ss=0, se=63, ah=al=0 special case; progressive scans
    carry a spectral band + successive-approximation bit position."""
    if ss > 0 and len(scan) > 1:
        raise NotImplementedError("interleaved JPEG AC scan")
    tabs = {}
    for cid, dc_id, ac_id in scan:
        dc_t = htabs.get((0, dc_id))
        ac_t = htabs.get((1, ac_id))
        if (ss == 0 and ah == 0 and dc_t is None) or (se > 0 and ac_t is None):
            raise NotImplementedError("JPEG scan references missing DHT")
        tabs[cid] = (dc_t, ac_t)
    pred = {c[0]: 0 for c in scan}
    eobrun = 0
    rdr = _BitReader(intervals[0])
    seg_idx = 0
    for m, group in enumerate(_scan_mcus(frame, scan)):
        if ri and m and m % ri == 0:
            seg_idx += 1
            if seg_idx >= len(intervals):
                raise NotImplementedError("JPEG missing restart interval data")
            rdr = _BitReader(intervals[seg_idx])
            pred = {c[0]: 0 for c in scan}
            eobrun = 0
        for cid, blk in group:
            row = store[cid][blk]
            dc_t, ac_t = tabs[cid]
            if ss == 0:
                if ah == 0:  # DC first (baseline, or progressive Al-shifted)
                    size = rdr.decode(dc_t)
                    pred[cid] += _extend(rdr.read(size), size)
                    row[0] = pred[cid] << al
                elif rdr.read(1):  # DC refinement: one raw bit per block
                    row[0] |= 1 << al
            kstart = max(ss, 1)
            if se < kstart:
                continue
            if ah != 0:
                eobrun = _refine_ac(rdr, ac_t, row, kstart, se, al, eobrun)
                continue
            if eobrun:
                eobrun -= 1
                continue
            k = kstart
            while k <= se:
                rs = rdr.decode(ac_t)
                r, s = rs >> 4, rs & 0xF
                if s == 0:
                    if r != 15:  # EOB run of 2^r (+ appended bits) blocks
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += rdr.read(r)
                        break
                    k += 16  # ZRL
                    continue
                k += r
                if k > se:
                    raise NotImplementedError("JPEG AC run overflow")
                row[k] = _extend(rdr.read(s), s) << al
                k += 1


def _reconstruct(frame, store, qtabs):
    """Zigzag coefficient store -> pixels: dequantize, vectorized IDCT over
    every block at once, plane assembly, chroma upsample, YCbCr->RGB."""
    h, w, comps = frame
    maxh, maxv, _mcux, _mcuy, geo = _geometry(frame)
    planes = []
    for cid, hf, vf, qid in comps:
        bw, bh, _twt, _tht = geo[cid]
        if qid not in qtabs:
            raise NotImplementedError("JPEG frame references missing DQT")
        dq = store[cid] * qtabs[qid][None, :]
        blocks = _idct_blocks(
            dq[:, _UNZIGZAG].reshape(-1, 8, 8).astype(np.float64)
        )
        px = np.clip(np.round(blocks) + 128, 0, 255).astype(np.uint8)
        # store is raster-ordered over the padded (bh, bw) block grid
        plane = px.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3).reshape(
            bh * 8, bw * 8
        )
        # upsample to full luma grid, crop to image size
        if maxv % vf or maxh % hf:
            # e.g. 3:2 factors — legal per spec but the np.repeat
            # integer-ratio upsample below can't express it
            raise NotImplementedError(
                f"JPEG non-integer sampling ratio {maxh}:{hf} x {maxv}:{vf}"
            )
        plane = np.repeat(np.repeat(plane, maxv // vf, 0), maxh // hf, 1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        return planes[0][..., None]
    y, cb, cr = (p.astype(np.float32) for p in planes)
    rgb = np.stack(
        [
            y + 1.402 * (cr - 128),
            y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128),
            y + 1.772 * (cb - 128),
        ],
        axis=-1,
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


class _BitWriter:
    __slots__ = ("out", "buf", "nbits")

    def __init__(self) -> None:
        self.out = bytearray()
        self.buf = 0
        self.nbits = 0

    def write(self, code: int, n: int) -> None:
        self.buf = (self.buf << n) | (code & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.buf >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)
        self.buf &= (1 << self.nbits) - 1

    def pad(self) -> None:
        """1-pad to a byte boundary (before a restart marker or EOI)."""
        if self.nbits:
            self.write(0x7F, 8 - self.nbits)

    def marker(self, m: int) -> None:
        """Emit a raw marker (not byte-stuffed) at a byte boundary."""
        self.pad()
        self.out += bytes([0xFF, m])

    def flush(self) -> bytes:
        self.pad()
        return bytes(self.out)


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """IJG-style quality scaling of the Annex K tables (public formula)."""
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    ql = np.clip((_Q_LUMA * scale + 50) // 100, 1, 255)
    qc = np.clip((_Q_CHROMA * scale + 50) // 100, 1, 255)
    return ql.astype(np.int32), qc.astype(np.int32)


def _encode_dc(wtr, dcval, pred, dc_codes) -> int:
    """Huffman-encode one DPCM DC value; returns the new predictor."""
    diff = int(dcval) - pred
    size = int(diff != 0 and int(abs(diff)).bit_length())
    code, ln = dc_codes[size]
    wtr.write(code, ln)
    if size:
        wtr.write(diff if diff > 0 else diff + (1 << size) - 1, size)
    return int(dcval)


def _encode_ac_band(wtr, zz, ac_codes, kstart: int = 1, kend: int = 63) -> None:
    """Huffman-encode the AC band [kstart, kend] of one zigzag block
    (baseline full band, or a progressive spectral-selection band; the
    trailing EOB doubles as a progressive EOB run of one)."""
    nz = kstart + np.nonzero(zz[kstart : kend + 1])[0]
    last = kstart
    for idx in nz:
        run = int(idx) - last
        last = int(idx) + 1
        while run > 15:
            code, ln = ac_codes[0xF0]
            wtr.write(code, ln)
            run -= 16
        v = int(zz[idx])
        s = int(abs(v)).bit_length()
        code, ln = ac_codes[(run << 4) | s]
        wtr.write(code, ln)
        wtr.write(v if v > 0 else v + (1 << s) - 1, s)
    if last <= kend:
        code, ln = ac_codes[0x00]  # EOB
        wtr.write(code, ln)


def _encode_block(wtr, zz, pred, dc_codes, ac_codes) -> int:
    """Huffman-encode one zigzag block; returns the new DC predictor."""
    pred = _encode_dc(wtr, zz[0], pred, dc_codes)
    _encode_ac_band(wtr, zz, ac_codes)
    return pred


def encode_jpeg(
    pixels: np.ndarray,
    *,
    quality: int = 90,
    subsampling: str = "444",
    restart_interval: int = 0,
    progressive: bool = False,
) -> bytes:
    """(h, w, 3) RGB or (h, w, 1)/(h, w) gray uint8 -> JPEG bytes
    (spec Annex K Huffman tables; inverse seam of decode_jpeg).
    ``subsampling``: ``"444"`` or ``"420"`` (2x2 box-averaged chroma,
    interleaved 4-Y-block MCUs). ``restart_interval`` > 0 emits DRI + RSTn
    markers every that many MCUs. ``progressive`` emits an SOF2 stream
    (interleaved Al=1 DC scan, per-component spectral AC scans, DC
    refinement scan — hermetic coverage of the progressive decode paths;
    444 only). Together these exercise every decoder path."""
    if pixels.ndim == 2:
        pixels = pixels[..., None]
    h, w, c = pixels.shape
    if c not in (1, 3):
        raise ValueError("encode_jpeg takes 1- or 3-channel pixels")
    if subsampling not in ("444", "420"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    if progressive and (subsampling != "444" or restart_interval):
        raise ValueError("progressive encoding supports 444 without restarts")
    ql, qc = _quality_tables(quality)
    sub = 2 if (subsampling == "420" and c == 3) else 1
    if c == 3:
        r, g, b = (pixels[..., k].astype(np.float32) for k in range(3))
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128,
        ]
        if sub == 2:
            # box-average 2x2 chroma (pad odd dims by edge replication first)
            ch2, cw2 = -(-h // 2) * 2, -(-w // 2) * 2
            for k in (1, 2):
                p = np.pad(planes[k], ((0, ch2 - h), (0, cw2 - w)), mode="edge")
                planes[k] = p.reshape(ch2 // 2, 2, cw2 // 2, 2).mean(axis=(1, 3))
        qids = [0, 1, 1]
        tids = [0, 1, 1]
        factors = [(sub, sub), (1, 1), (1, 1)]
    else:
        planes = [pixels[..., 0].astype(np.float32)]
        qids = [0]
        tids = [0]
        factors = [(1, 1)]
    maxh = max(f[0] for f in factors)
    maxv = max(f[1] for f in factors)
    mcux = -(-w // (8 * maxh))
    mcuy = -(-h // (8 * maxv))
    dc_enc = [_encode_codes(*_HUFF_DC_LUMA), _encode_codes(*_HUFF_DC_CHROMA)]
    ac_enc = [_encode_codes(*_HUFF_AC_LUMA), _encode_codes(*_HUFF_AC_CHROMA)]
    qts = [ql, qc]
    # quantized zigzag blocks per component, MCU-major (my, mx, by, bx) —
    # the scan visit order the decoder walks (edge-replicated padding);
    # with 1x1 factors this equals the component's raster block order
    comp_zz = []
    for plane, qid, (hf, vf) in zip(planes, qids, factors):
        th_, tw_ = mcuy * vf * 8, mcux * hf * 8
        pad = np.pad(
            plane,
            ((0, th_ - plane.shape[0]), (0, tw_ - plane.shape[1])),
            mode="edge",
        )
        blocks = (
            pad.reshape(mcuy, vf, 8, mcux, hf, 8)
            .transpose(0, 3, 1, 4, 2, 5)
            .reshape(-1, 8, 8)
        )
        coefs = _dct_blocks(blocks - 128.0).reshape(-1, 64)[:, _ZIGZAG]
        q = qts[qid][None, :].astype(np.float64)
        comp_zz.append(np.round(coefs / q).astype(np.int32))

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    def sos_seg(comp_ids: list[int], ss: int, se: int, ah: int, al: int) -> bytes:
        body = bytes([len(comp_ids)])
        for ci in comp_ids:
            body += bytes([ci + 1, tids[ci] << 4 | tids[ci]])
        return seg(0xDA, body + bytes([ss, se, ah << 4 | al]))

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0x00]) + bytes(ql.astype(np.uint8)))
    if c == 3:
        out += seg(0xDB, bytes([0x01]) + bytes(qc.astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, c)
    for ci, (hf, vf) in enumerate(factors):
        sof += bytes([ci + 1, hf << 4 | vf, qids[ci]])
    out += seg(0xC2 if progressive else 0xC0, sof)
    tables = [((0, 0), _HUFF_DC_LUMA), ((1, 0), _HUFF_AC_LUMA)]
    if c == 3:
        tables += [((0, 1), _HUFF_DC_CHROMA), ((1, 1), _HUFF_AC_CHROMA)]
    for (tc, th), (bits, vals) in tables:
        out += seg(0xC4, bytes([tc << 4 | th]) + bytes(bits) + bytes(vals))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))

    n_blocks = mcux * mcuy  # per component in 444/gray (1x1 factors)
    if progressive:
        # scan 1: interleaved DC first at Al=1 (arithmetic >> keeps sign)
        wtr = _BitWriter()
        preds = [0] * c
        for bi in range(n_blocks):
            for ci in range(c):
                preds[ci] = _encode_dc(
                    wtr, int(comp_zz[ci][bi][0]) >> 1, preds[ci],
                    dc_enc[tids[ci]],
                )
        out += sos_seg(list(range(c)), 0, 0, 0, 1)
        out += wtr.flush()
        # per-component spectral AC scans (split band for the luma, the
        # same shape libjpeg's default progression uses)
        bands = [(1, 8), (9, 63)] if c == 3 else [(1, 63)]
        for ci in range(c):
            for ss, se in bands if ci == 0 else [(1, 63)]:
                wtr = _BitWriter()
                for bi in range(n_blocks):
                    _encode_ac_band(
                        wtr, comp_zz[ci][bi], ac_enc[tids[ci]], ss, se
                    )
                out += sos_seg([ci], ss, se, 0, 0)
                out += wtr.flush()
        # final scan: interleaved DC refinement (the Al=1 scan's low bit)
        wtr = _BitWriter()
        for bi in range(n_blocks):
            for ci in range(c):
                wtr.write(int(comp_zz[ci][bi][0]) & 1, 1)
        out += sos_seg(list(range(c)), 0, 0, 1, 0)
        out += wtr.flush()
    else:
        wtr = _BitWriter()
        preds = [0] * c
        rst = 0
        for m in range(mcux * mcuy):
            if restart_interval and m and m % restart_interval == 0:
                wtr.marker(0xD0 + rst % 8)
                rst += 1
                preds = [0] * c
            for ci, (hf, vf) in enumerate(factors):
                base = m * hf * vf
                for b in range(hf * vf):
                    preds[ci] = _encode_block(
                        wtr,
                        comp_zz[ci][base + b],
                        preds[ci],
                        dc_enc[tids[ci]],
                        ac_enc[tids[ci]],
                    )
        out += sos_seg(list(range(c)), 0, 63, 0, 0)
        out += wtr.flush()
    out += b"\xff\xd9"
    return bytes(out)
