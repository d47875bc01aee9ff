"""Golden-byte tests for the frozen extractor (FIXTURES.md §3; M4/M5)."""

from __future__ import annotations

from deduplicatr_ray.functions.textnorm import (
    decode_html,
    extract_text,
    page_text,
    tokenize,
)


def test_extract_strips_script_style_comments_tags():
    html = (
        b"<html><head><title></title><STYLE>p{x:1}</STYLE>"
        b"<script type='x'>var a=1;</script></head>"
        b"<body><p>hello <b>world</b></p><!-- note --></body></html>"
    )
    assert extract_text(html) == "hello world"


def test_extract_entities_and_whitespace():
    assert extract_text(b"<p>a&amp;b   c\n\td</p>") == "a&b c d"


def test_extract_latin1_fallback():
    raw = "caf\xe9".encode("latin-1")
    assert extract_text(b"<p>" + raw + b"</p>") == "caf\xe9"


def test_decode_never_raises():
    assert decode_html(b"\xff\xfe\x00abc") == "\xff\xfe\x00abc"


def test_text_passthrough_byte_identical():
    # FIXTURES.md §3 step 6: non-null text is untouched, even if html present
    t = "  Raw   TEXT with <tags> &amp; entities  "
    assert page_text(t, b"<p>other</p>") == t
    assert page_text(None, b"<p>other</p>") == "other"
    assert page_text(None, None) == ""


def test_tokenize_nfc_lower_alnum():
    assert tokenize("Hello, WORLD-42!") == ["hello", "world", "42"]
    assert tokenize("caf\xe9 au lait") == ["caf", "au", "lait"]  # e-acute splits
    assert tokenize("") == []
    # NFC: decomposed e + combining acute folds to the same tokens as composed
    assert tokenize("café") == tokenize("caf\xe9")


def test_golden_bytes_fixture_pages():
    """Pin extractor output bytes for a canonical fixture html."""
    html = (
        "<html><head><title></title><style>body{color:red}</style></head>"
        "<body><p>lorem ipsum dolor</p><!-- crawl --></body></html>"
    ).encode("utf-8")
    assert extract_text(html).encode("utf-8") == b"lorem ipsum dolor"
