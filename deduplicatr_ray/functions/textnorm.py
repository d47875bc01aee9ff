"""Frozen HTML->text extraction + normalization (M4/M5, FIXTURES.md §3).

The north_rule requires byte-identical extracted text per url vs the
reference (BASELINE.json:15). The reference mount was empty at survey time
(SURVEY.md "Provenance caveat"), so FIXTURES.md §3 IS the normative
extractor spec, pinned by golden-byte tests:

1. decode ``html`` as utf-8; on error, latin-1 (never error)
2. remove <script>...</script>, <style>...</style>, <!-- ... --> blocks
   (case-insensitive, non-greedy)
3. replace every remaining tag ``<[^>]*>`` with a single space
4. decode HTML entities (html.unescape)
5. collapse whitespace runs to one space; strip ends
6. if input ``text`` is non-null it passes through UNCHANGED (byte-identical)

Normalization for shingling (does not alter the stored text column):
NFC -> str.lower -> tokens = maximal runs of [a-z0-9]+.
"""

from __future__ import annotations

import html as _html
import re
import unicodedata

_SCRIPT_RE = re.compile(r"<script\b.*?</script\s*>", re.IGNORECASE | re.DOTALL)
_STYLE_RE = re.compile(r"<style\b.*?</style\s*>", re.IGNORECASE | re.DOTALL)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
_TAG_RE = re.compile(r"<[^>]*>")
_WS_RE = re.compile(r"\s+")
_TOKEN_RE = re.compile(r"[a-z0-9]+")


def decode_html(raw: bytes) -> str:
    """utf-8 with latin-1 fallback; never raises (FIXTURES.md §3 step 1)."""
    try:
        return raw.decode("utf-8")
    except UnicodeDecodeError:
        return raw.decode("latin-1")


def extract_text(raw_html: bytes) -> str:
    """Deterministic HTML -> text per the frozen spec (steps 1-5)."""
    s = decode_html(raw_html)
    s = _SCRIPT_RE.sub(" ", s)
    s = _STYLE_RE.sub(" ", s)
    s = _COMMENT_RE.sub(" ", s)
    s = _TAG_RE.sub(" ", s)
    s = _html.unescape(s)
    return _WS_RE.sub(" ", s).strip()


def page_text(text: str | None, raw_html: bytes | None) -> str:
    """Step 6: non-null ``text`` passes through unchanged; else extract."""
    if text is not None:
        return text
    if raw_html is None:
        return ""
    return extract_text(raw_html)


def tokenize(text: str) -> list[str]:
    """NFC -> lowercase -> maximal [a-z0-9]+ runs (FIXTURES.md §3 norm spec).

    CJK / non-latin codepoints split tokens (documented limitation; zh
    fixtures rely on exact/identical-mutation dups).
    """
    return _TOKEN_RE.findall(unicodedata.normalize("NFC", text).lower())
