"""Web charset sniffing + UTF-8 transcoding (WHATWG-style, stdlib codecs).

Real Common-Crawl HTML arrives in dozens of legacy encodings
(windows-125x, Shift_JIS, GBK, EUC-KR, Big5, KOI8-R, ...). The frozen
extractor (`functions/textnorm.py`) decodes utf-8-with-latin-1-fallback —
byte-identical and never failing, but mojibake for legacy pages. This
module is the OPT-IN repair step a production crawl runs ahead of it:
sniff the encoding the way browsers do (public WHATWG Encoding spec
order — BOM, then transport Content-Type, then a meta/XML-decl prescan
of the head, then UTF-8 validity, then windows-1252 (cp1252)), transcode the
payload to clean UTF-8 once at ingest, and let every downstream stage
assume UTF-8. Sniffing reads ≤ ``_PRESCAN`` bytes; decoding is C-speed
stdlib codecs — the stage stays row-local with zero shuffle.
"""

from __future__ import annotations

import codecs
import re

_PRESCAN = 1024  # WHATWG prescan window

# WHATWG label -> Python codec for the aliases Python doesn't already
# resolve the browser way. Notably iso-8859-1/latin1/ascii mean
# windows-1252 on the web (the spec folds them), gb2312 means GBK, and
# tis-620/iso-8859-11 mean windows-874.
_WHATWG = {
    "iso-8859-1": "cp1252",
    "latin1": "cp1252",
    "latin-1": "cp1252",
    "l1": "cp1252",
    "ascii": "cp1252",
    "us-ascii": "cp1252",
    "iso-8859-9": "cp1254",
    "latin5": "cp1254",
    "iso-8859-11": "cp874",
    "tis-620": "cp874",
    "dos-874": "cp874",
    "windows-874": "cp874",
    "gb2312": "gbk",
    "gb_2312": "gbk",
    "gb_2312-80": "gbk",
    "csgb2312": "gbk",
    "chinese": "gbk",
    "x-gbk": "gbk",
    "sjis": "shift_jis",
    "x-sjis": "shift_jis",
    "ms_kanji": "shift_jis",
    "windows-31j": "shift_jis",
    "ks_c_5601-1987": "euc-kr",
    "ks_c_5601-1989": "euc-kr",
    "ksc_5601": "euc-kr",
    "korean": "euc-kr",
    "windows-949": "euc-kr",
    "csksc56011987": "euc-kr",
    "macintosh": "mac-roman",
    "x-mac-roman": "mac-roman",
    "unicode": "utf-16-le",  # legacy IE label
    "ucs-2": "utf-16-le",
}

_CHARSET_RE = re.compile(
    rb"""charset\s*=\s*["']?\s*([A-Za-z0-9._:-]+)""", re.IGNORECASE
)
_META_CHARSET_RE = re.compile(
    rb"""<meta[^>]{0,200}?charset\s*=\s*["']?\s*([A-Za-z0-9._:-]+)""",
    re.IGNORECASE | re.DOTALL,
)
_XML_DECL_RE = re.compile(
    rb"""^<\?xml[^>]{0,200}?encoding\s*=\s*["']([A-Za-z0-9._:-]+)["']""",
    re.IGNORECASE,
)


def normalize_label(label: str | bytes | None) -> str | None:
    """Charset label (HTTP/meta/XML, any case/whitespace) -> Python codec
    name, or None when the label is unknown to both the WHATWG fold and
    the stdlib codec registry."""
    if not label:
        return None
    if isinstance(label, bytes):
        label = label.decode("latin-1", "replace")
    label = label.strip().strip("\"'").lower()
    if not label:
        return None
    name = _WHATWG.get(label, label)
    try:
        return codecs.lookup(name).name
    except LookupError:
        return None


def _bom_codec(payload: bytes) -> str | None:
    if payload[:3] == b"\xef\xbb\xbf":
        return "utf-8"
    if payload[:4] == b"\xff\xfe\x00\x00":
        return "utf-32-le"
    if payload[:4] == b"\x00\x00\xfe\xff":
        return "utf-32-be"
    if payload[:2] == b"\xff\xfe":
        return "utf-16-le"
    if payload[:2] == b"\xfe\xff":
        return "utf-16-be"
    return None


def sniff_charset(payload: bytes, content_type: str | None = None) -> str:
    """HTML bytes (+ optional transport Content-Type) -> Python codec name,
    WHATWG order: BOM > HTTP charset > meta/XML prescan of the first 1 KiB
    > strict-UTF-8 validity > windows-1252. Never raises; always returns a
    decodable codec."""
    bom = _bom_codec(payload)
    if bom:
        return bom
    if content_type and "charset" in content_type.lower():
        m = _CHARSET_RE.search(content_type.encode("latin-1", "replace"))
        if m:
            c = normalize_label(m.group(1))
            if c:
                return c
    head = payload[:_PRESCAN]
    m = _META_CHARSET_RE.search(head) or _XML_DECL_RE.search(head)
    if m:
        c = normalize_label(m.group(1))
        # a meta claiming utf-16 on undecoded bytes means utf-8 per spec
        if c in ("utf-16-le", "utf-16-be", "utf-16"):
            c = "utf-8"
        if c:
            return c
    try:
        payload.decode("utf-8")
        return "utf-8"
    except UnicodeDecodeError:
        return "cp1252"


def to_utf8(
    payload: bytes, content_type: str | None = None
) -> tuple[bytes, str]:
    """HTML bytes -> (clean UTF-8 bytes, codec sniffed). Decoding uses
    errors="replace" (a truncated multi-byte tail becomes U+FFFD, never an
    exception); a leading BOM character is dropped. UTF-8 input without a
    BOM round-trips byte-identically."""
    codec = sniff_charset(payload, content_type)
    if codec == "utf-8" and not payload[:3] == b"\xef\xbb\xbf":
        try:
            payload.decode("utf-8")
            return payload, codec  # already clean: zero-copy passthrough
        except UnicodeDecodeError:
            pass
    text = payload.decode(codec, errors="replace")
    if text[:1] == "﻿":
        text = text[1:]
    return text.encode("utf-8"), codec
