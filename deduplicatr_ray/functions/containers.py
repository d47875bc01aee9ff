"""Media container probing: typed metadata from opaque binary payloads
WITHOUT codec decode — ISO-BMFF/MP4, MPEG audio (MP3) incl. ID3v2, Ogg
(Vorbis/Opus), Matroska/WebM, WebP, TIFF, AVI, ICO, FLAC and ADTS AAC.

A 100 TB crawl's most common media containers carry codecs no
stdlib-only sandbox can decode (H.264, AAC, MP3 bitstreams, Vorbis),
but the *container structure* is plain public-spec parsing: ISO/IEC
14496-12 box trees, the MPEG-1/2 audio frame header, RFC 3533 Ogg pages
plus the Vorbis I / RFC 7845 (Opus) identification headers. Probing
turns every such payload into a typed metadata row (container, codec
fourcc, dimensions, duration, sample rate, channels, stream/frame
counts) so the pipeline can route/filter/group media by real properties
while the decode itself stays behind the documented PIL/ffmpeg seam.

Each ``probe_*`` raises ``ValueError`` on structural corruption (the
probe stage routes that to ``probe_ok=False``); each ``build_*`` exists
so tests and fixtures synthesise valid payloads deterministically — no
external data enters the repo. Probes never allocate proportional to
payload size: they walk headers and fixed-size tables only.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# ISO-BMFF / MP4 (ISO/IEC 14496-12 box structure)
# ---------------------------------------------------------------------------


def _iter_boxes(buf: bytes, start: int, end: int):
    """Yield (type, body_start, body_end) for each box in [start, end).
    Handles 32-bit sizes, size==1 largesize and size==0 (to end)."""
    off = start
    while off < end:
        if off + 8 > end:
            raise ValueError("truncated box header")
        size = int.from_bytes(buf[off : off + 4], "big")
        btype = buf[off + 4 : off + 8]
        hdr = 8
        if size == 1:
            if off + 16 > end:
                raise ValueError("truncated largesize box header")
            size = int.from_bytes(buf[off + 8 : off + 16], "big")
            hdr = 16
        elif size == 0:
            size = end - off
        if size < hdr or off + size > end:
            raise ValueError(f"box {btype!r} overruns payload")
        yield btype, off + hdr, off + size
        off += size


def _find_box(buf: bytes, start: int, end: int, btype: bytes):
    for t, s, e in _iter_boxes(buf, start, end):
        if t == btype:
            return s, e
    return None


def _fixed_16_16(b: bytes) -> float:
    return int.from_bytes(b, "big") / 65536.0


def probe_mp4(payload: bytes) -> dict:
    """ISO-BMFF/MP4 payload -> typed metadata dict (no codec decode).

    Walks ftyp + moov (mvhd, per-trak tkhd/mdhd/hdlr/stsd/stsz):
    returns container/brand, per-track codec fourccs, movie duration,
    video dimensions + sample (frame) count, audio sample rate +
    channel count, and the stream count. mdat is never touched."""
    if len(payload) < 12 or payload[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF payload (no leading ftyp)")
    out: dict = {
        "container": "mp4",
        "codec": None,
        "width": None,
        "height": None,
        "duration_ms": None,
        "n_frames": None,
        "sample_rate": None,
        "channels": None,
        "n_streams": 0,
    }
    codecs: list[str] = []
    moov = None
    moofs: list[tuple[int, int]] = []
    for btype, s, e in _iter_boxes(payload, 0, len(payload)):
        if btype == b"ftyp":
            if e - s < 8:
                raise ValueError("truncated ftyp")
            brand = payload[s : s + 4].decode("latin-1").strip()
            out["container"] = f"mp4/{brand}"
        elif btype == b"moov":
            moov = (s, e)
        elif btype == b"moof":
            moofs.append((s, e))
    if moov is None:
        raise ValueError("no moov box (streaming-only fragment?)")
    ms, me = moov
    tscale = 0
    mvhd = _find_box(payload, ms, me, b"mvhd")
    if mvhd is not None:
        s, e = mvhd
        ver = payload[s]
        if ver == 1:
            tscale = int.from_bytes(payload[s + 20 : s + 24], "big")
            dur = int.from_bytes(payload[s + 24 : s + 32], "big")
        else:
            tscale = int.from_bytes(payload[s + 12 : s + 16], "big")
            dur = int.from_bytes(payload[s + 16 : s + 20], "big")
        if tscale and dur:
            out["duration_ms"] = int(round(dur * 1000.0 / tscale))
    if out["duration_ms"] is None and tscale:
        # fragmented MP4: mvhd duration is 0; mvex/mehd carries the
        # whole-movie fragment duration when the muxer knows it
        mvex = _find_box(payload, ms, me, b"mvex")
        mehd = _find_box(payload, *mvex, b"mehd") if mvex else None
        if mehd is not None:
            s, e = mehd
            dur = int.from_bytes(
                payload[s + 4 : s + 12 if payload[s] == 1 else s + 8],
                "big",
            )
            out["duration_ms"] = int(round(dur * 1000.0 / tscale))
    for btype, ts, te in _iter_boxes(payload, ms, me):
        if btype != b"trak":
            continue
        out["n_streams"] += 1
        handler = None
        mdia = _find_box(payload, ts, te, b"mdia")
        if mdia is None:
            continue
        hdlr = _find_box(payload, mdia[0], mdia[1], b"hdlr")
        if hdlr is not None:
            handler = payload[hdlr[0] + 8 : hdlr[0] + 12]
        tkhd = _find_box(payload, ts, te, b"tkhd")
        if handler == b"vide" and tkhd is not None:
            s, e = tkhd
            woff = s + (88 if payload[s] == 1 else 76)
            if e - woff >= 8:
                out["width"] = int(_fixed_16_16(payload[woff : woff + 4]))
                out["height"] = int(
                    _fixed_16_16(payload[woff + 4 : woff + 8])
                )
        minf = _find_box(payload, mdia[0], mdia[1], b"minf")
        stbl = (
            _find_box(payload, minf[0], minf[1], b"stbl") if minf else None
        )
        if stbl is None:
            continue
        stsd = _find_box(payload, stbl[0], stbl[1], b"stsd")
        if stsd is not None and stsd[1] - stsd[0] >= 16:
            s = stsd[0]
            n_entries = int.from_bytes(payload[s + 4 : s + 8], "big")
            if n_entries >= 1:
                entry = s + 8
                fourcc = (
                    payload[entry + 4 : entry + 8]
                    .decode("latin-1")
                    .strip()
                )
                codecs.append(fourcc)
                if handler == b"soun" and stsd[1] - entry >= 36:
                    out["channels"] = int.from_bytes(
                        payload[entry + 24 : entry + 26], "big"
                    )
                    out["sample_rate"] = int.from_bytes(
                        payload[entry + 32 : entry + 34], "big"
                    )
        stsz = _find_box(payload, stbl[0], stbl[1], b"stsz")
        if handler == b"vide" and stsz is not None:
            s = stsz[0]
            out["n_frames"] = int.from_bytes(payload[s + 8 : s + 12], "big")
    if moofs and not out["n_frames"]:
        # fragmented MP4: sample counts live in moof/traf/trun, one
        # fragment per moof — sum them for the stream's frame count
        total = 0
        for fs, fe in moofs:
            for b2, s2, e2 in _iter_boxes(payload, fs, fe):
                if b2 != b"traf":
                    continue
                for b3, s3, e3 in _iter_boxes(payload, s2, e2):
                    if b3 == b"trun" and e3 - s3 >= 8:
                        total += int.from_bytes(
                            payload[s3 + 4 : s3 + 8], "big"
                        )
        out["n_frames"] = total or None
    out["codec"] = ",".join(codecs) if codecs else None
    return out


def _box(btype: bytes, body: bytes) -> bytes:
    return (8 + len(body)).to_bytes(4, "big") + btype + body


def _full(btype: bytes, ver: int, body: bytes) -> bytes:
    return _box(btype, bytes([ver, 0, 0, 0]) + body)


def build_mp4(
    *,
    duration_ms: int = 2000,
    width: int = 0,
    height: int = 0,
    n_frames: int = 0,
    video_codec: bytes = b"avc1",
    audio_codec: bytes | None = None,
    sample_rate: int = 44100,
    channels: int = 2,
    mdat: bytes = b"",
    version1: bool = False,
    fragments: list[int] | None = None,
) -> bytes:
    """Deterministic minimal-but-valid ISO-BMFF file for fixtures/tests:
    ftyp + moov (mvhd, one video and/or one audio trak with tkhd/mdhd/
    hdlr/stbl) + mdat. The mdat bytes stand in for the coded stream.

    ``fragments=[n1, n2, ...]`` builds the fragmented (DASH/streaming)
    layout instead: mvhd duration 0, moov/mvex/mehd carrying
    ``duration_ms``, then one moof (mfhd + traf/tfhd + trun with that
    sample count) + mdat pair per entry."""
    ftyp = _box(b"ftyp", b"isom" + (0).to_bytes(4, "big") + b"isommp42")
    tscale = 1000
    movie_dur = 0 if fragments is not None else duration_ms
    duration_ms, real_dur = movie_dur, duration_ms
    if version1:
        mvhd = _full(
            b"mvhd",
            1,
            (0).to_bytes(8, "big") * 2
            + tscale.to_bytes(4, "big")
            + duration_ms.to_bytes(8, "big")
            + b"\x00" * 80,
        )
    else:
        mvhd = _full(
            b"mvhd",
            0,
            (0).to_bytes(4, "big") * 2
            + tscale.to_bytes(4, "big")
            + duration_ms.to_bytes(4, "big")
            + b"\x00" * 76,
        )
    traks = []

    def _trak(handler: bytes, entry: bytes, n_samples: int, track_id: int):
        if version1:
            tkhd = _full(
                b"tkhd",
                1,
                (0).to_bytes(8, "big") * 2
                + track_id.to_bytes(4, "big")
                + (0).to_bytes(4, "big")
                + duration_ms.to_bytes(8, "big")
                + b"\x00" * 52
                + (width << 16).to_bytes(4, "big")
                + (height << 16).to_bytes(4, "big"),
            )
        else:
            tkhd = _full(
                b"tkhd",
                0,
                (0).to_bytes(4, "big") * 2
                + track_id.to_bytes(4, "big")
                + (0).to_bytes(4, "big")
                + duration_ms.to_bytes(4, "big")
                + b"\x00" * 52
                + (width << 16).to_bytes(4, "big")
                + (height << 16).to_bytes(4, "big"),
            )
        mdhd = _full(
            b"mdhd",
            0,
            (0).to_bytes(4, "big") * 2
            + tscale.to_bytes(4, "big")
            + duration_ms.to_bytes(4, "big")
            + b"\x55\xc4\x00\x00",
        )
        hdlr = _full(
            b"hdlr", 0, (0).to_bytes(4, "big") + handler + b"\x00" * 13
        )
        stsd = _full(b"stsd", 0, (1).to_bytes(4, "big") + entry)
        stts = _full(b"stts", 0, (0).to_bytes(4, "big"))
        stsc = _full(b"stsc", 0, (0).to_bytes(4, "big"))
        stsz = _full(
            b"stsz",
            0,
            (0).to_bytes(4, "big") + n_samples.to_bytes(4, "big"),
        )
        stco = _full(b"stco", 0, (0).to_bytes(4, "big"))
        stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
        minf = _box(b"minf", stbl)
        mdia = _box(b"mdia", mdhd + hdlr + minf)
        return _box(b"trak", tkhd + mdia)

    if width and height:
        ventry = _box(
            video_codec,
            b"\x00" * 6
            + (1).to_bytes(2, "big")  # data_reference_index
            + b"\x00" * 16  # pre_defined/reserved
            + width.to_bytes(2, "big")
            + height.to_bytes(2, "big")
            + b"\x00" * 46,
        )
        traks.append(_trak(b"vide", ventry, n_frames, 1))
    if audio_codec is not None:
        aentry = _box(
            audio_codec,
            b"\x00" * 6
            + (1).to_bytes(2, "big")
            + b"\x00" * 8  # reserved
            + channels.to_bytes(2, "big")
            + (16).to_bytes(2, "big")  # samplesize
            + b"\x00" * 4  # pre_defined + reserved
            + (sample_rate << 16).to_bytes(4, "big"),
        )
        traks.append(_trak(b"soun", aentry, 0, 2))
    if fragments is None:
        moov = _box(b"moov", mvhd + b"".join(traks))
        return ftyp + moov + _box(b"mdat", mdat)
    mvex = _box(
        b"mvex", _full(b"mehd", 0, real_dur.to_bytes(4, "big"))
    )
    moov = _box(b"moov", mvhd + b"".join(traks) + mvex)
    frags = b""
    for seq, count in enumerate(fragments, start=1):
        traf = _box(
            b"traf",
            _full(b"tfhd", 0, (1).to_bytes(4, "big"))
            + _full(b"trun", 0, count.to_bytes(4, "big")),
        )
        frags += _box(
            b"moof", _full(b"mfhd", 0, seq.to_bytes(4, "big")) + traf
        ) + _box(b"mdat", mdat or b"\x00" * 16)
    return ftyp + moov + frags


# ---------------------------------------------------------------------------
# MPEG audio (MP3) frame headers + ID3v2 (public header layouts)
# ---------------------------------------------------------------------------

# kbit/s by (version-group, layer): index 0 is "free format" (unsupported)
_MP3_BITRATES = {
    ("1", 3): [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
    ("1", 2): [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
    ("1", 1): [0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    ("2", 3): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    ("2", 2): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    ("2", 1): [0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256],
}
_MP3_RATES = {
    "1": [44100, 48000, 32000],
    "2": [22050, 24000, 16000],
    "2.5": [11025, 12000, 8000],
}


def _mp3_frame(buf: bytes, off: int):
    """Parse one MPEG audio frame header at ``off``; returns
    (frame_len, samples_per_frame, rate_hz, bitrate_kbps, channels,
    layer) or raises ValueError."""
    if off + 4 > len(buf):
        raise ValueError("truncated MPEG frame header")
    b1, b2, b3 = buf[off + 1], buf[off + 2], buf[off + 3]
    if buf[off] != 0xFF or (b1 & 0xE0) != 0xE0:
        raise ValueError("no MPEG frame sync")
    vbits = (b1 >> 3) & 0x3
    version = {0: "2.5", 2: "2", 3: "1"}.get(vbits)
    if version is None:
        raise ValueError("reserved MPEG version")
    layer = {1: 3, 2: 2, 3: 1}.get((b1 >> 1) & 0x3)  # bits -> layer number
    if layer is None:
        raise ValueError("reserved MPEG layer")
    bidx = (b2 >> 4) & 0xF
    ridx = (b2 >> 2) & 0x3
    if bidx in (0, 15) or ridx == 3:
        raise ValueError("free-format/reserved bitrate or rate")
    group = "1" if version == "1" else "2"
    bitrate = _MP3_BITRATES[(group, layer)][bidx]
    rate = _MP3_RATES[version][ridx]
    padding = (b2 >> 1) & 0x1
    channels = 1 if ((b3 >> 6) & 0x3) == 3 else 2
    if layer == 1:
        spf = 384
        flen = (12 * bitrate * 1000 // rate + padding) * 4
    else:
        spf = 1152 if (layer == 2 or version == "1") else 576
        flen = spf // 8 * bitrate * 1000 // rate + padding
    if flen < 4:
        raise ValueError("degenerate MPEG frame length")
    return flen, spf, rate, bitrate, channels, layer


def _syncsafe(b: bytes) -> int:
    if any(x & 0x80 for x in b):
        raise ValueError("non-syncsafe ID3v2 size byte")
    return (b[0] << 21) | (b[1] << 14) | (b[2] << 7) | b[3]


def probe_mp3(payload: bytes, *, max_sync_scan: int = 2048) -> dict:
    """MPEG audio payload -> typed metadata (no bitstream decode).

    Skips a leading ID3v2 tag (syncsafe size, optional footer), locates
    the first frame sync within ``max_sync_scan`` junk bytes, then walks
    the CBR/VBR frame chain header-by-header (4 bytes read per frame —
    never the coded payload) counting frames for an exact duration."""
    off = 0
    if payload[:3] == b"ID3":
        if len(payload) < 10:
            raise ValueError("truncated ID3v2 header")
        size = _syncsafe(payload[6:10])
        off = 10 + size + (10 if payload[5] & 0x10 else 0)
        if off > len(payload):
            raise ValueError("ID3v2 tag overruns payload")
    sync = None
    for j in range(off, min(len(payload) - 3, off + max_sync_scan)):
        if payload[j] == 0xFF and (payload[j + 1] & 0xE0) == 0xE0:
            try:
                _mp3_frame(payload, j)
            except ValueError:
                continue
            sync = j
            break
    if sync is None:
        raise ValueError("no MPEG audio frame sync found")
    flen, spf, rate, bitrate, channels, layer = _mp3_frame(payload, sync)
    n_frames, samples, pos = 0, 0, sync
    while pos + 4 <= len(payload):
        try:
            flen, spf, rate2, _, _, _ = _mp3_frame(payload, pos)
        except ValueError:
            break  # trailing tag (ID3v1/APE) or truncated final frame
        n_frames += 1
        samples += spf
        pos += flen
    if n_frames == 0:
        raise ValueError("no complete MPEG audio frame")
    return {
        "container": "mp3" if layer == 3 else f"mpeg-l{layer}",
        "codec": f"mpeg-layer{layer}",
        "width": None,
        "height": None,
        "duration_ms": int(round(samples * 1000.0 / rate)),
        "n_frames": n_frames,
        "sample_rate": rate,
        "channels": channels,
        "n_streams": 1,
    }


def build_mp3(
    *,
    n_frames: int = 38,
    bitrate_kbps: int = 128,
    rate: int = 44100,
    mono: bool = False,
    id3_payload: bytes | None = None,
) -> bytes:
    """Deterministic MPEG-1 Layer III CBR stream for fixtures: optional
    ID3v2.3 tag + ``n_frames`` valid frame headers with zeroed coded
    payloads (the probe never reads them)."""
    bidx = _MP3_BITRATES[("1", 3)].index(bitrate_kbps)
    ridx = _MP3_RATES["1"].index(rate)
    out = bytearray()
    if id3_payload is not None:
        n = len(id3_payload)
        out += b"ID3\x03\x00\x00" + bytes(
            [(n >> 21) & 0x7F, (n >> 14) & 0x7F, (n >> 7) & 0x7F, n & 0x7F]
        )
        out += id3_payload
    hdr = bytes(
        [
            0xFF,
            0xFB,  # MPEG-1, Layer III, no CRC
            (bidx << 4) | (ridx << 2),  # no padding
            0xC0 if mono else 0x00,  # mode bits
        ]
    )
    flen = 1152 // 8 * bitrate_kbps * 1000 // rate
    frame = hdr + b"\x00" * (flen - 4)
    out += frame * n_frames
    return bytes(out)


# ---------------------------------------------------------------------------
# Ogg (RFC 3533) + Vorbis I / Opus (RFC 7845) identification headers
# ---------------------------------------------------------------------------


def probe_ogg(payload: bytes) -> dict:
    """Ogg payload -> typed metadata: codec from the BOS identification
    packet (Vorbis I ``\\x01vorbis`` / Opus ``OpusHead``), duration from
    the last page's granule position (PCM sample count for Vorbis;
    48 kHz units for Opus). Page CRCs are not validated — probing is a
    routing step, not an integrity check."""
    if payload[:4] != b"OggS" or len(payload) < 28:
        raise ValueError("not an Ogg payload")
    if payload[4] != 0:
        raise ValueError(f"unknown Ogg stream structure v{payload[4]}")
    nsegs = payload[26]
    body = 27 + nsegs
    if body >= len(payload):
        raise ValueError("truncated first Ogg page")
    pkt = payload[body : body + 64]
    out: dict = {
        "container": "ogg",
        "codec": None,
        "width": None,
        "height": None,
        "duration_ms": None,
        "n_frames": None,
        "sample_rate": None,
        "channels": None,
        "n_streams": 1,
    }
    gran_rate = None
    if pkt[:7] == b"\x01vorbis":
        if len(pkt) < 16:
            raise ValueError("truncated Vorbis identification header")
        out["codec"] = "vorbis"
        out["channels"] = pkt[11]
        out["sample_rate"] = int.from_bytes(pkt[12:16], "little")
        gran_rate = out["sample_rate"]
    elif pkt[:8] == b"OpusHead":
        if len(pkt) < 14:
            raise ValueError("truncated OpusHead")
        out["codec"] = "opus"
        out["channels"] = pkt[9]
        out["sample_rate"] = int.from_bytes(pkt[12:16], "little") or 48000
        gran_rate = 48000  # Opus granules are always 48 kHz units
    else:
        raise ValueError("unrecognized Ogg BOS packet (not Vorbis/Opus)")
    last = payload.rfind(b"OggS")
    if last >= 0 and last + 14 <= len(payload) and gran_rate:
        granule = int.from_bytes(payload[last + 6 : last + 14], "little")
        if granule != 0xFFFFFFFFFFFFFFFF:
            out["duration_ms"] = int(round(granule * 1000.0 / gran_rate))
    return out


def _ogg_page(
    serial: int, seq: int, header_type: int, granule: int, packet: bytes
) -> bytes:
    if len(packet) >= 255 * 255:
        raise ValueError("fixture packet too large for one page")
    segs = [255] * (len(packet) // 255) + [len(packet) % 255]
    return (
        b"OggS\x00"
        + bytes([header_type])
        + granule.to_bytes(8, "little")
        + serial.to_bytes(4, "little")
        + seq.to_bytes(4, "little")
        + b"\x00" * 4  # CRC zeroed: probe routes, it does not verify
        + bytes([len(segs)])
        + bytes(segs)
        + packet
    )


def build_ogg(
    *,
    codec: str = "vorbis",
    rate: int = 44100,
    channels: int = 2,
    granule: int = 44100 * 3,
    serial: int = 0x1D,
) -> bytes:
    """Deterministic two-page Ogg stream (BOS identification packet +
    EOS data page) for fixtures. CRCs are zeroed (see probe_ogg)."""
    if codec == "vorbis":
        ident = (
            b"\x01vorbis"
            + (0).to_bytes(4, "little")
            + bytes([channels])
            + rate.to_bytes(4, "little")
            + b"\x00" * 16
            + b"\x01"
        )
    elif codec == "opus":
        ident = (
            b"OpusHead\x01"
            + bytes([channels])
            + (312).to_bytes(2, "little")  # pre-skip
            + rate.to_bytes(4, "little")
            + b"\x00" * 3
        )
    else:
        raise ValueError(f"unknown fixture codec {codec!r}")
    rng = np.random.Generator(np.random.PCG64(serial))
    data = rng.bytes(200)
    return _ogg_page(serial, 0, 0x02, 0, ident) + _ogg_page(
        serial, 1, 0x04, granule, data
    )


# ---------------------------------------------------------------------------
# Matroska / WebM (EBML structure per RFC 8794 + the public Matroska IDs)
# ---------------------------------------------------------------------------

_EBML_HEADER = 0x1A45DFA3
_MKV_SEGMENT = 0x18538067
_MKV_INFO = 0x1549A966
_MKV_TRACKS = 0x1654AE6B
_MKV_TRACK_ENTRY = 0xAE
_MKV_DOCTYPE = 0x4282
_MKV_TIMESCALE = 0x2AD7B1
_MKV_DURATION = 0x4489
_MKV_TRACK_TYPE = 0x83
_MKV_CODEC_ID = 0x86
_MKV_VIDEO = 0xE0
_MKV_AUDIO = 0xE1
_MKV_PIXEL_W = 0xB0
_MKV_PIXEL_H = 0xBA
_MKV_SAMPLE_FREQ = 0xB5
_MKV_CHANNELS = 0x9F


def _ebml_vint(buf: bytes, off: int, end: int, *, is_id: bool):
    """Read one EBML variable-length integer at ``off``; returns
    (value, next_offset). IDs keep the length-marker bit; sizes clear
    it. An all-value-bits-set size means "unknown" -> returns None."""
    if off >= end:
        raise ValueError("truncated EBML vint")
    b0 = buf[off]
    if b0 == 0:
        raise ValueError("EBML vint longer than 8 bytes")
    n = 8 - b0.bit_length() + 1
    if off + n > end:
        raise ValueError("truncated EBML vint body")
    raw = int.from_bytes(buf[off : off + n], "big")
    if is_id:
        return raw, off + n
    val = raw & ~(1 << (7 * n))
    if val == (1 << (7 * n)) - 1:
        return None, off + n  # unknown size
    return val, off + n


def _ebml_elements(buf: bytes, start: int, end: int):
    """Yield (element_id, body_start, body_end) across [start, end)."""
    off = start
    while off < end:
        eid, off = _ebml_vint(buf, off, end, is_id=True)
        size, off = _ebml_vint(buf, off, end, is_id=False)
        body_end = end if size is None else off + size
        if body_end > end:
            raise ValueError(f"EBML element 0x{eid:x} overruns payload")
        yield eid, off, body_end
        off = body_end


def _ebml_uint(buf: bytes, s: int, e: int) -> int:
    return int.from_bytes(buf[s:e], "big")


def _ebml_float(buf: bytes, s: int, e: int) -> float:
    import struct

    if e - s == 4:
        return struct.unpack(">f", buf[s:e])[0]
    if e - s == 8:
        return struct.unpack(">d", buf[s:e])[0]
    raise ValueError(f"EBML float of width {e - s}")


def probe_mkv(payload: bytes) -> dict:
    """Matroska/WebM payload -> typed metadata (no codec decode):
    DocType, Segment Info duration (TimestampScale x Duration), per
    TrackEntry the CodecID, video PixelWidth/PixelHeight and audio
    SamplingFrequency/Channels. Cluster bodies are never walked."""
    elems = _ebml_elements(payload, 0, len(payload))
    try:
        first = next(elems)
    except StopIteration:
        raise ValueError("empty EBML stream") from None
    if first[0] != _EBML_HEADER:
        raise ValueError("not an EBML/Matroska payload")
    doctype = "matroska"
    for eid, s, e in _ebml_elements(payload, first[1], first[2]):
        if eid == _MKV_DOCTYPE:
            doctype = payload[s:e].decode("latin-1").rstrip("\x00")
    out: dict = {
        "container": doctype,
        "codec": None,
        "width": None,
        "height": None,
        "duration_ms": None,
        "n_frames": None,
        "sample_rate": None,
        "channels": None,
        "n_streams": 0,
    }
    codecs: list[str] = []
    segment = None
    for eid, s, e in elems:
        if eid == _MKV_SEGMENT:
            segment = (s, e)
            break
    if segment is None:
        raise ValueError("Matroska payload without Segment")
    tscale_ns, duration_ticks = 1_000_000, None
    for eid, s, e in _ebml_elements(payload, segment[0], segment[1]):
        if eid == _MKV_INFO:
            for i2, s2, e2 in _ebml_elements(payload, s, e):
                if i2 == _MKV_TIMESCALE:
                    tscale_ns = _ebml_uint(payload, s2, e2)
                elif i2 == _MKV_DURATION:
                    duration_ticks = _ebml_float(payload, s2, e2)
        elif eid == _MKV_TRACKS:
            for i2, s2, e2 in _ebml_elements(payload, s, e):
                if i2 != _MKV_TRACK_ENTRY:
                    continue
                out["n_streams"] += 1
                for i3, s3, e3 in _ebml_elements(payload, s2, e2):
                    if i3 == _MKV_CODEC_ID:
                        codecs.append(
                            payload[s3:e3].decode("latin-1").rstrip("\x00")
                        )
                    elif i3 == _MKV_VIDEO:
                        for i4, s4, e4 in _ebml_elements(payload, s3, e3):
                            if i4 == _MKV_PIXEL_W:
                                out["width"] = _ebml_uint(payload, s4, e4)
                            elif i4 == _MKV_PIXEL_H:
                                out["height"] = _ebml_uint(payload, s4, e4)
                    elif i3 == _MKV_AUDIO:
                        for i4, s4, e4 in _ebml_elements(payload, s3, e3):
                            if i4 == _MKV_SAMPLE_FREQ:
                                out["sample_rate"] = int(
                                    _ebml_float(payload, s4, e4)
                                )
                            elif i4 == _MKV_CHANNELS:
                                out["channels"] = _ebml_uint(
                                    payload, s4, e4
                                )
    if duration_ticks is not None:
        out["duration_ms"] = int(
            round(duration_ticks * tscale_ns / 1_000_000.0)
        )
    out["codec"] = ",".join(codecs) if codecs else None
    return out


def _ebml_el(eid: int, body: bytes) -> bytes:
    idb = eid.to_bytes((eid.bit_length() + 7) // 8, "big")
    n = len(body)
    for w in range(1, 9):  # smallest size width that fits n with marker
        if n < (1 << (7 * w)) - 1:
            return idb + (n | (1 << (7 * w))).to_bytes(w, "big") + body
    raise ValueError("fixture element too large")


def build_mkv(
    *,
    doctype: str = "webm",
    duration_ms: int | None = 4000,
    width: int = 0,
    height: int = 0,
    video_codec: str = "V_VP9",
    audio_codec: str | None = None,
    sample_rate: int = 48000,
    channels: int = 2,
    cluster: bytes = b"",
) -> bytes:
    """Deterministic minimal Matroska/WebM fixture: EBML header
    (DocType) + Segment (Info with TimestampScale/Duration, Tracks with
    video and/or audio TrackEntry, one opaque Cluster blob)."""
    import struct

    header = _ebml_el(
        _EBML_HEADER, _ebml_el(_MKV_DOCTYPE, doctype.encode())
    )
    info = _ebml_el(_MKV_TIMESCALE, (1_000_000).to_bytes(3, "big"))
    if duration_ms is not None:
        info += _ebml_el(_MKV_DURATION, struct.pack(">d", float(duration_ms)))
    tracks = b""
    if width and height:
        tracks += _ebml_el(
            _MKV_TRACK_ENTRY,
            _ebml_el(_MKV_TRACK_TYPE, b"\x01")
            + _ebml_el(_MKV_CODEC_ID, video_codec.encode())
            + _ebml_el(
                _MKV_VIDEO,
                _ebml_el(_MKV_PIXEL_W, width.to_bytes(2, "big"))
                + _ebml_el(_MKV_PIXEL_H, height.to_bytes(2, "big")),
            ),
        )
    if audio_codec is not None:
        tracks += _ebml_el(
            _MKV_TRACK_ENTRY,
            _ebml_el(_MKV_TRACK_TYPE, b"\x02")
            + _ebml_el(_MKV_CODEC_ID, audio_codec.encode())
            + _ebml_el(
                _MKV_AUDIO,
                _ebml_el(_MKV_SAMPLE_FREQ, struct.pack(">f", sample_rate))
                + _ebml_el(_MKV_CHANNELS, bytes([channels])),
            ),
        )
    segment = _ebml_el(
        _MKV_SEGMENT,
        _ebml_el(_MKV_INFO, info)
        + _ebml_el(_MKV_TRACKS, tracks)
        + _ebml_el(0x1F43B675, cluster),  # Cluster: opaque to the probe
    )
    return header + segment


# ---------------------------------------------------------------------------
# WebP (RIFF container; VP8 lossy / VP8L lossless / VP8X extended headers)
# ---------------------------------------------------------------------------


def _riff_chunks(buf: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_end) over a RIFF chunk run;
    chunk bodies are padded to even length."""
    off = start
    while off + 8 <= end:
        fourcc = buf[off : off + 4]
        size = int.from_bytes(buf[off + 4 : off + 8], "little")
        body = off + 8
        if body + size > end:
            raise ValueError(f"RIFF chunk {fourcc!r} overruns payload")
        yield fourcc, body, body + size
        off = body + size + (size & 1)


def probe_webp(payload: bytes) -> dict:
    """WebP payload -> typed metadata: dims from the VP8 (lossy key
    frame header), VP8L (lossless signature bits) or VP8X (extended
    canvas) chunk; animation frame count from ANMF chunks."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a WebP payload")
    out: dict = {
        "container": "webp",
        "codec": None,
        "width": None,
        "height": None,
        "n_frames": None,
        "n_streams": 1,
    }
    n_anmf = 0
    for fourcc, s, e in _riff_chunks(payload, 12, len(payload)):
        if fourcc == b"VP8 " and e - s >= 10:
            if payload[s + 3 : s + 6] != b"\x9d\x01\x2a":
                raise ValueError("VP8 key frame start code missing")
            out["codec"] = "vp8"
            out["width"] = (
                int.from_bytes(payload[s + 6 : s + 8], "little") & 0x3FFF
            )
            out["height"] = (
                int.from_bytes(payload[s + 8 : s + 10], "little") & 0x3FFF
            )
        elif fourcc == b"VP8L" and e - s >= 5:
            if payload[s] != 0x2F:
                raise ValueError("VP8L signature byte missing")
            bits = int.from_bytes(payload[s + 1 : s + 5], "little")
            out["codec"] = "vp8l"
            out["width"] = (bits & 0x3FFF) + 1
            out["height"] = ((bits >> 14) & 0x3FFF) + 1
        elif fourcc == b"VP8X" and e - s >= 10:
            out["codec"] = out["codec"] or "vp8x"
            out["width"] = (
                int.from_bytes(payload[s + 4 : s + 7], "little") + 1
            )
            out["height"] = (
                int.from_bytes(payload[s + 7 : s + 10], "little") + 1
            )
        elif fourcc == b"ANMF":
            n_anmf += 1
    if out["codec"] is None:
        raise ValueError("WebP without VP8/VP8L/VP8X chunk")
    if n_anmf:
        out["n_frames"] = n_anmf
        out["codec"] += "-anim"
    return out


def build_webp(
    *, width: int = 320, height: int = 240, lossless: bool = False,
    n_frames: int = 0,
) -> bytes:
    """Deterministic minimal WebP fixture (headers only — the coded
    stream is stand-in bytes the probe never reads)."""
    chunks = b""
    if n_frames:
        vp8x = (
            b"\x02\x00\x00\x00"  # animation flag
            + (width - 1).to_bytes(3, "little")
            + (height - 1).to_bytes(3, "little")
        )
        chunks += b"VP8X" + len(vp8x).to_bytes(4, "little") + vp8x
        for i in range(n_frames):
            body = bytes(16) + b"\x00" * 8
            chunks += b"ANMF" + len(body).to_bytes(4, "little") + body
    elif lossless:
        bits = (width - 1) | ((height - 1) << 14)
        body = b"\x2f" + bits.to_bytes(4, "little") + b"\x00" * 8
        chunks += b"VP8L" + len(body).to_bytes(4, "little") + body
    else:
        body = (
            b"\x00\x00\x00"  # frame tag
            + b"\x9d\x01\x2a"
            + (width & 0x3FFF).to_bytes(2, "little")
            + (height & 0x3FFF).to_bytes(2, "little")
            + b"\x00" * 8
        )
        chunks += b"VP8 " + len(body).to_bytes(4, "little") + body
    riff = b"WEBP" + chunks
    return b"RIFF" + len(riff).to_bytes(4, "little") + riff


# ---------------------------------------------------------------------------
# TIFF (classic 6.0 IFD structure)
# ---------------------------------------------------------------------------

_TIFF_COMPRESSION = {
    1: "none", 2: "ccitt-g3", 5: "lzw", 6: "ojpeg", 7: "jpeg",
    8: "deflate", 32773: "packbits",
}


def probe_tiff(payload: bytes) -> dict:
    """TIFF payload -> typed metadata from IFD0: ImageWidth/Length,
    Compression, SamplesPerPixel; IFD count = n_frames (multi-page)."""
    if payload[:4] == b"II*\x00":
        bo = "little"
    elif payload[:4] == b"MM\x00*":
        bo = "big"
    else:
        raise ValueError("not a TIFF payload")

    def u(s, e):
        return int.from_bytes(payload[s:e], bo)

    out: dict = {
        "container": "tiff",
        "codec": "tiff-none",
        "width": None,
        "height": None,
        "n_frames": 0,
        "n_streams": 1,
        "channels": None,
    }
    ifd_off = u(4, 8)
    first = True
    while ifd_off:
        if ifd_off + 2 > len(payload):
            raise ValueError("TIFF IFD offset overruns payload")
        n = u(ifd_off, ifd_off + 2)
        end = ifd_off + 2 + 12 * n
        if end + 4 > len(payload):
            raise ValueError("TIFF IFD entries overrun payload")
        out["n_frames"] += 1
        if first:
            for i in range(n):
                o = ifd_off + 2 + 12 * i
                tag, typ = u(o, o + 2), u(o + 2, o + 4)
                # inline SHORT/LONG values only (count 1)
                val = u(o + 8, o + 10) if typ == 3 else u(o + 8, o + 12)
                if tag == 256:
                    out["width"] = val
                elif tag == 257:
                    out["height"] = val
                elif tag == 259:
                    out["codec"] = (
                        f"tiff-{_TIFF_COMPRESSION.get(val, val)}"
                    )
                elif tag == 277:
                    out["channels"] = val
            first = False
        ifd_off = u(end, end + 4)
    if out["width"] is None or out["height"] is None:
        raise ValueError("TIFF IFD0 without ImageWidth/ImageLength")
    return out


def build_tiff(
    *, width: int = 320, height: int = 240, compression: int = 1,
    pages: int = 1, big_endian: bool = False,
) -> bytes:
    """Deterministic minimal TIFF fixture: ``pages`` chained IFDs with
    ImageWidth/Length/Compression/SamplesPerPixel entries."""
    bo = "big" if big_endian else "little"

    def ent(tag, typ, val):
        v = val.to_bytes(2, bo) + b"\x00\x00" if typ == 3 else val.to_bytes(4, bo)
        return tag.to_bytes(2, bo) + typ.to_bytes(2, bo) + (1).to_bytes(4, bo) + v

    hdr = (b"MM\x00*" if big_endian else b"II*\x00") + (8).to_bytes(4, bo)
    out = bytearray(hdr)
    off = 8
    for p in range(pages):
        entries = (
            ent(256, 4, width)
            + ent(257, 4, height)
            + ent(259, 3, compression)
            + ent(277, 3, 3)
        )
        n = 4
        nxt = off + 2 + 12 * n + 4
        out += n.to_bytes(2, bo) + entries
        out += (nxt if p + 1 < pages else 0).to_bytes(4, bo)
        off = nxt
    return bytes(out)


# ---------------------------------------------------------------------------
# AVI (RIFF container; avih main header)
# ---------------------------------------------------------------------------


def probe_avi(payload: bytes) -> dict:
    """AVI payload -> typed metadata from the avih main header (dims,
    total frames, duration = MicroSecPerFrame x TotalFrames, stream
    count) plus the first video stream's codec fourcc from its strl
    (strh handler, falling back to strf biCompression). Codec stream
    DATA is never read."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    meta = None
    codec = None
    for fourcc, s, e in _riff_chunks(payload, 12, len(payload)):
        if fourcc != b"LIST" or payload[s : s + 4] != b"hdrl":
            continue
        for f2, s2, e2 in _riff_chunks(payload, s + 4, e):
            if f2 == b"avih" and e2 - s2 >= 40:
                us_per_frame = int.from_bytes(payload[s2 : s2 + 4], "little")
                total = int.from_bytes(payload[s2 + 16 : s2 + 20], "little")
                streams = int.from_bytes(payload[s2 + 24 : s2 + 28], "little")
                w = int.from_bytes(payload[s2 + 32 : s2 + 36], "little")
                h = int.from_bytes(payload[s2 + 36 : s2 + 40], "little")
                meta = {
                    "container": "avi",
                    "codec": None,
                    "width": w,
                    "height": h,
                    "duration_ms": int(round(us_per_frame * total / 1000.0))
                    if us_per_frame and total
                    else None,
                    "n_frames": total or None,
                    "n_streams": streams or 1,
                }
            elif (
                f2 == b"LIST"
                and payload[s2 : s2 + 4] == b"strl"
                and codec is None
            ):
                for f3, s3, e3 in _riff_chunks(payload, s2 + 4, e2):
                    if f3 == b"strh" and e3 - s3 >= 8:
                        if payload[s3 : s3 + 4] != b"vids":
                            break  # audio/text stream: skip this strl
                        handler = payload[s3 + 4 : s3 + 8].strip(b"\x00 ")
                        if handler:
                            codec = handler.decode("latin-1").lower()
                    elif f3 == b"strf" and codec is None and e3 - s3 >= 20:
                        comp = payload[s3 + 16 : s3 + 20].strip(b"\x00 ")
                        if comp:
                            codec = comp.decode("latin-1").lower()
        if meta is not None:
            meta["codec"] = codec
            return meta
    raise ValueError("AVI without hdrl/avih header")


def build_avi(
    *, width: int = 640, height: int = 480, n_frames: int = 120,
    fps: int = 30, streams: int = 1,
) -> bytes:
    """Deterministic minimal AVI fixture: hdrl LIST with an avih chunk
    (+ a stand-in movi LIST)."""
    avih = (
        (1_000_000 // fps).to_bytes(4, "little")
        + b"\x00" * 12
        + n_frames.to_bytes(4, "little")
        + b"\x00" * 4
        + streams.to_bytes(4, "little")
        + b"\x00" * 4
        + width.to_bytes(4, "little")
        + height.to_bytes(4, "little")
        + b"\x00" * 16
    )
    hdrl = b"hdrl" + b"avih" + len(avih).to_bytes(4, "little") + avih
    movi = b"movi" + b"\x00" * 16
    body = (
        b"AVI "
        + b"LIST" + len(hdrl).to_bytes(4, "little") + hdrl
        + b"LIST" + len(movi).to_bytes(4, "little") + movi
    )
    return b"RIFF" + len(body).to_bytes(4, "little") + body


# ---------------------------------------------------------------------------
# ICO (favicon) directory structure
# ---------------------------------------------------------------------------


def probe_ico(payload: bytes) -> dict:
    """ICO payload -> typed metadata: entry count (n_frames), the
    largest entry's dimensions and payload kind (PNG or DIB bpp)."""
    if payload[:4] != b"\x00\x00\x01\x00" or len(payload) < 6:
        raise ValueError("not an ICO payload")
    count = int.from_bytes(payload[4:6], "little")
    if count == 0 or 6 + 16 * count > len(payload):
        raise ValueError("ICO directory truncated or empty")
    best = None  # (area, w, h, codec)
    for i in range(count):
        o = 6 + 16 * i
        w = payload[o] or 256
        h = payload[o + 1] or 256
        size = int.from_bytes(payload[o + 8 : o + 12], "little")
        off = int.from_bytes(payload[o + 12 : o + 16], "little")
        if off + size > len(payload):
            raise ValueError("ICO entry overruns payload")
        img = payload[off : off + size]
        if img[:8] == b"\x89PNG\r\n\x1a\n":
            codec = "png"
        else:
            bpp = int.from_bytes(img[14:16], "little") if len(img) >= 16 else 0
            codec = f"bmp{bpp}"
        if best is None or w * h > best[0]:
            best = (w * h, w, h, codec)
    return {
        "container": "ico",
        "codec": best[3],
        "width": best[1],
        "height": best[2],
        "n_frames": count,
        "n_streams": 1,
    }


def build_ico(images: list[tuple[int, int, bytes]]) -> bytes:
    """Deterministic ICO fixture from ``(width, height, image_bytes)``
    entries (image bytes = a PNG payload or a DIB block)."""
    count = len(images)
    hdr = b"\x00\x00\x01\x00" + count.to_bytes(2, "little")
    dirs = bytearray()
    data = bytearray()
    off = 6 + 16 * count
    for w, h, img in images:
        dirs += bytes([w % 256, h % 256, 0, 0])
        dirs += (1).to_bytes(2, "little") + (32).to_bytes(2, "little")
        dirs += len(img).to_bytes(4, "little") + off.to_bytes(4, "little")
        data += img
        off += len(img)
    return bytes(hdr + dirs + data)


# ---------------------------------------------------------------------------
# FLAC (free lossless audio codec container — metadata block chain)
# ---------------------------------------------------------------------------

def probe_flac(payload: bytes) -> dict:
    """FLAC payload -> typed metadata from the STREAMINFO block (the
    mandatory first metadata block): sample rate, channels, bit depth,
    exact duration from the 36-bit total-samples field. Walks the
    metadata block chain only — never the coded frames."""
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC payload")
    off = 4
    streaminfo = None
    n_blocks = 0
    while True:
        if off + 4 > len(payload):
            raise ValueError("truncated FLAC metadata block header")
        hdr = payload[off]
        btype = hdr & 0x7F
        blen = int.from_bytes(payload[off + 1 : off + 4], "big")
        if btype == 127:
            raise ValueError("invalid FLAC metadata block type 127")
        body_start = off + 4
        if body_start + blen > len(payload):
            raise ValueError("FLAC metadata block overruns payload")
        if n_blocks == 0 and btype != 0:
            raise ValueError("first FLAC metadata block is not STREAMINFO")
        if btype == 0:
            if blen != 34:
                raise ValueError(f"STREAMINFO length {blen} != 34")
            streaminfo = payload[body_start : body_start + 34]
        n_blocks += 1
        off = body_start + blen
        if hdr & 0x80:  # last-metadata-block flag
            break
    # STREAMINFO bit layout after the four 16/16/24/24-bit size fields
    # (10 bytes): 20 bits rate | 3 bits channels-1 | 5 bits bps-1 |
    # 36 bits total samples
    b = streaminfo
    rate = (b[10] << 12) | (b[11] << 4) | (b[12] >> 4)
    channels = ((b[12] >> 1) & 0x07) + 1
    bps = (((b[12] & 0x01) << 4) | (b[13] >> 4)) + 1
    total = ((b[13] & 0x0F) << 32) | int.from_bytes(b[14:18], "big")
    if rate == 0:
        raise ValueError("FLAC STREAMINFO sample rate 0")
    return {
        "container": "flac",
        "codec": f"flac{bps}",
        "width": None,
        "height": None,
        "duration_ms": int(round(total * 1000.0 / rate)),
        "n_frames": total,  # total samples (frame count isn't in headers)
        "sample_rate": rate,
        "channels": channels,
        "n_streams": 1,
    }


def build_flac(
    *,
    rate: int = 44100,
    channels: int = 2,
    bps: int = 16,
    total_samples: int = 88200,
    n_padding_blocks: int = 1,
) -> bytes:
    """Deterministic FLAC fixture: STREAMINFO + optional padding blocks
    + a fake coded-frame region (opaque to the probe)."""
    si = bytearray()
    si += (4096).to_bytes(2, "big") * 2  # min/max blocksize
    si += (1024).to_bytes(3, "big") * 2  # min/max framesize
    si.append((rate >> 12) & 0xFF)
    si.append((rate >> 4) & 0xFF)
    si.append(((rate & 0x0F) << 4) | ((channels - 1) << 1) | ((bps - 1) >> 4))
    si.append((((bps - 1) & 0x0F) << 4) | ((total_samples >> 32) & 0x0F))
    si += (total_samples & 0xFFFFFFFF).to_bytes(4, "big")
    si += bytes(16)  # MD5 of unencoded audio: zeros (unset)
    assert len(si) == 34
    blocks = []
    for i in range(n_padding_blocks):
        blocks.append((1, bytes(8)))  # PADDING
    out = bytearray(b"fLaC")
    out.append(0x00 if blocks else 0x80)  # STREAMINFO header
    out += (34).to_bytes(3, "big")
    out += si
    for j, (btype, body) in enumerate(blocks):
        last = 0x80 if j == len(blocks) - 1 else 0x00
        out.append(last | btype)
        out += len(body).to_bytes(3, "big")
        out += body
    out += b"\xff\xf8" + bytes(40)  # fake frame region
    return bytes(out)


# ---------------------------------------------------------------------------
# ADTS AAC (ISO/IEC 14496-3 audio data transport stream framing)
# ---------------------------------------------------------------------------

_ADTS_RATES = (
    96000, 88200, 64000, 48000, 44100, 32000,
    24000, 22050, 16000, 12000, 11025, 8000, 7350,
)


def _adts_frame(buf: bytes, off: int) -> tuple[int, int, int, int, int]:
    """Parse one ADTS header at ``off`` -> (frame_len, samples, rate,
    channels, profile). Raises ``ValueError`` on a bad header."""
    if off + 7 > len(buf):
        raise ValueError("truncated ADTS header")
    if buf[off] != 0xFF or (buf[off + 1] & 0xF6) != 0xF0:
        raise ValueError("bad ADTS sync/layer")
    profile = (buf[off + 2] >> 6) + 1  # 1=Main 2=LC 3=SSR 4=LTP
    rate_idx = (buf[off + 2] >> 2) & 0x0F
    if rate_idx >= len(_ADTS_RATES):
        raise ValueError(f"reserved ADTS sampling index {rate_idx}")
    channels = ((buf[off + 2] & 0x01) << 2) | (buf[off + 3] >> 6)
    flen = ((buf[off + 3] & 0x03) << 11) | (buf[off + 4] << 3) | (
        buf[off + 5] >> 5
    )
    hdr_len = 7 if (buf[off + 1] & 0x01) else 9  # CRC adds 2 bytes
    if flen < hdr_len:
        raise ValueError("ADTS frame length smaller than header")
    blocks = (buf[off + 6] & 0x03) + 1
    return flen, blocks * 1024, _ADTS_RATES[rate_idx], channels, profile


def probe_adts(payload: bytes) -> dict:
    """ADTS AAC payload -> typed metadata: frame-walk (7-9 header bytes
    per frame, never the coded payload) for an exact duration, like the
    MP3 probe. 1024 samples per raw data block."""
    try:
        flen, _, rate, channels, profile = _adts_frame(payload, 0)
    except ValueError:
        raise ValueError("not an ADTS AAC payload") from None
    n_frames, samples, pos = 0, 0, 0
    while pos + 7 <= len(payload):
        try:
            flen, spf, rate2, _, _ = _adts_frame(payload, pos)
        except ValueError:
            break  # trailing junk or truncated final frame
        if pos + flen > len(payload):
            break
        n_frames += 1
        samples += spf
        pos += flen
    if n_frames == 0:
        raise ValueError("no complete ADTS frame")
    return {
        "container": "adts",
        "codec": f"aac-{('main','lc','ssr','ltp')[profile-1]}",
        "width": None,
        "height": None,
        "duration_ms": int(round(samples * 1000.0 / rate)),
        "n_frames": n_frames,
        "sample_rate": rate,
        "channels": channels,
        "n_streams": 1,
    }


def build_adts(
    *,
    n_frames: int = 43,
    rate: int = 44100,
    channels: int = 2,
    profile: int = 2,
    payload_bytes: int = 64,
) -> bytes:
    """Deterministic ADTS AAC fixture: ``n_frames`` headers with opaque
    coded payloads."""
    rate_idx = _ADTS_RATES.index(rate)
    out = bytearray()
    flen = 7 + payload_bytes
    for i in range(n_frames):
        h = bytearray(7)
        h[0] = 0xFF
        h[1] = 0xF1  # MPEG-4, layer 00, no CRC
        h[2] = ((profile - 1) << 6) | (rate_idx << 2) | ((channels >> 2) & 1)
        h[3] = ((channels & 0x03) << 6) | ((flen >> 11) & 0x03)
        h[4] = (flen >> 3) & 0xFF
        h[5] = ((flen & 0x07) << 5) | 0x1F
        h[6] = 0xFC  # buffer fullness low bits + 1 raw data block
        out += h + bytes((i + j) % 251 for j in range(payload_bytes))
    return bytes(out)
