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


# --- boilerplate removal (functions/boilerplate.py) ------------------------


def test_main_content_drops_chrome_keeps_article():
    from deduplicatr_ray.functions.boilerplate import main_content

    page = b"""<html><head><title>T</title><style>.x{color:red}</style>
    <script>var x = "<p>not content</p>";</script></head><body>
    <nav><a href="/">Home</a> <a href="/a">About</a> <a href="/c">Contact</a></nav>
    <div class="sidebar"><ul><li><a href="/1">Related one</a></li>
    <li><a href="/2">Related two</a></li></ul></div>
    <article>
    <h1>Short title</h1>
    <p>This is the first real paragraph of the article, long enough to
    pass the length gate easily and with no links at all.</p>
    <p>See <a href="/ref">one reference</a> inside a long paragraph that
    stays below the link-density threshold because the prose around the
    single anchor is much longer than the anchor text itself.</p>
    </article>
    <footer>Copyright 2026 <a href="/terms">Terms</a>
    <a href="/privacy">Privacy</a></footer>
    </body></html>"""
    out = main_content(page)
    assert "first real paragraph" in out
    assert "one reference inside a long paragraph" in out.replace("\n", " ")
    assert "Short title" in out  # heading rescued next to good block
    for chrome in ("Home", "Related one", "Copyright", "not content"):
        assert chrome not in out
    # a pure link farm yields nothing
    farm = b"".join(
        b'<div><a href="/%d">Some link text here</a></div>' % i
        for i in range(30)
    )
    assert main_content(farm) == ""
    assert main_content(b"") == ""


def test_main_content_stage_passthrough_and_extract(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from deduplicatr_ray.stages.extract import main_content_stage

    body = (
        "An article paragraph that is comfortably longer than the "
        "forty-character gate used by the stage."
    )
    pages = rd.from_arrow(
        pa.table(
            {
                "url": ["http://a.example/1", "http://a.example/wet"],
                "html": pa.array(
                    [
                        (
                            '<nav><a href="/">Home</a> <a href="/b">B</a></nav>'
                            f"<p>{body}</p>"
                            '<footer><a href="/t">Terms</a> c 2026</footer>'
                        ).encode(),
                        None,
                    ],
                    pa.binary(),
                ),
                "text": ["ignored", "wet text passes through"],
            }
        )
    )
    df = main_content_stage(pages).to_pandas().set_index("url")
    assert df.loc["http://a.example/1", "main_text"] == body
    assert (
        df.loc["http://a.example/wet", "main_text"]
        == "wet text passes through"
    )
