"""Boilerplate removal: block-level main-content extraction.

The web-pipeline stage BETWEEN raw tag-stripping and quality filtering
(C4 stripped tags; RefinedWeb/trafilatura extract the article and drop
nav/footer/sidebar chrome). Language-free jusText/Arc90-style
heuristics:

1. split html into BLOCKS at block-level tag boundaries
2. score each block: text length, link density (chars inside ``<a>`` /
   text chars), markup density
3. keep long low-link-density blocks; then a neighborhood pass keeps
   short blocks sandwiched between kept ones (jusText's
   "good-neighbor" rule) so headings and short paragraphs inside the
   article survive

Deterministic, stdlib-only, one compiled-regex scan per page. The
FROZEN ``extract_text`` (byte-identical invariant) is untouched — this
is the opt-in alternative for template-heavy pages.
"""

from __future__ import annotations

import html as _html
import re

# tags that terminate a text block (block-level elements + breaks)
_BLOCK_SPLIT_RE = re.compile(
    rb"<\s*/?\s*(?:p|div|td|th|li|h[1-6]|article|section|header|footer|"
    rb"nav|aside|table|tr|ul|ol|dl|dd|dt|blockquote|pre|br|hr|form|"
    rb"fieldset|main|figure|figcaption)\b[^>]*>",
    re.IGNORECASE,
)
_DROP_RE = re.compile(
    rb"<\s*(script|style|noscript|template|svg|iframe)\b.*?"
    rb"<\s*/\s*\1\s*>",
    re.IGNORECASE | re.DOTALL,
)
_COMMENT_RE = re.compile(rb"<!--.*?-->", re.DOTALL)
_A_RE = re.compile(rb"<\s*a\b[^>]*>(.*?)<\s*/\s*a\s*>", re.IGNORECASE | re.DOTALL)
_TAG_RE = re.compile(rb"<[^>]*>")


def _block_stats(raw: bytes) -> tuple[str, int, int]:
    """One raw block -> (clean text, text_chars, link_chars)."""
    link_chars = 0
    for m in _A_RE.finditer(raw):
        inner = _TAG_RE.sub(b" ", m.group(1))
        link_chars += len(
            " ".join(
                _html.unescape(inner.decode("utf-8", "replace")).split()
            )
        )
    text = _TAG_RE.sub(b" ", raw).decode("utf-8", "replace")
    text = " ".join(_html.unescape(text).split())
    return text, len(text), link_chars


def page_blocks(html: bytes) -> list[tuple[str, int, int]]:
    """html -> [(text, text_chars, link_chars)] per non-empty block."""
    html = _COMMENT_RE.sub(b" ", _DROP_RE.sub(b" ", html or b""))
    out = []
    for raw in _BLOCK_SPLIT_RE.split(html):
        text, n, link = _block_stats(raw)
        if n:
            out.append((text, n, link))
    return out


def main_content(
    html: bytes,
    *,
    min_len: int = 40,
    max_link_density: float = 0.33,
    neighbor_min_len: int = 5,
) -> str:
    """Extract the article text, dropping nav/footer/sidebar chrome.

    A block is GOOD when it is long (``min_len`` chars) with link
    density <= ``max_link_density``; a short low-link-density block is
    rescued when an ADJACENT block is good (jusText's short-block
    neighborhood: headings precede articles, short sentences sit inside
    them) — isolated menu/footer items stay dropped because they are
    link-dense or have no good neighbor. Returns kept blocks joined by
    newlines ('' when nothing qualifies)."""
    blocks = page_blocks(html)
    n = len(blocks)
    good = [
        n_chars >= min_len
        and (link / n_chars if n_chars else 1.0) <= max_link_density
        for _t, n_chars, link in blocks
    ]
    keep = list(good)
    for i in range(n):
        if good[i] or blocks[i][1] < neighbor_min_len:
            continue
        prev_good = i > 0 and good[i - 1]
        next_good = i + 1 < n and good[i + 1]
        if prev_good or next_good:
            # the rescue rule still rejects link-heavy slivers
            _t, n_chars, link = blocks[i]
            if (link / n_chars if n_chars else 1.0) <= max_link_density:
                keep[i] = True
    return "\n".join(t for (t, _n, _l), k in zip(blocks, keep) if k)
