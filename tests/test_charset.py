"""Charset sniffing + UTF-8 transcoding (functions/charset.py,
stages/extract.py transcode_stage, WARC transcode=True ingest)."""

import pyarrow as pa
import pytest

from deduplicatr_ray.functions.charset import (
    normalize_label,
    sniff_charset,
    to_utf8,
)

# (label as served, python codec, sample text that exercises the codec)
_CASES = [
    ("Shift_JIS", "shift_jis", "日本語のページです。東京."),
    ("x-sjis", "shift_jis", "テスト 漢字"),
    ("GB2312", "gbk", "简体中文网页内容。"),
    ("gbk", "gbk", "北京 上海 广州"),
    ("EUC-KR", "euc_kr", "한국어 페이지 내용."),
    ("Big5", "big5", "繁體中文網頁。"),
    ("KOI8-R", "koi8-r", "русский текст страницы"),
    ("windows-1251", "cp1251", "еще кириллица"),
    ("ISO-8859-2", "iso8859-2", "zażółć gęślą jaźń"),
    ("windows-1252", "cp1252", "café naïve — résumé"),
    ("TIS-620", "cp874", "ภาษาไทย"),
]


def test_normalize_label_whatwg_folds():
    assert normalize_label("Latin1") == "cp1252"  # web latin-1 IS cp1252
    assert normalize_label("ISO-8859-1") == "cp1252"
    assert normalize_label("us-ascii") == "cp1252"
    assert normalize_label("GB2312") == "gbk"
    assert normalize_label("sjis") == "shift_jis"
    assert normalize_label(b"UTF-8 ") == "utf-8"
    assert normalize_label("no-such-charset-xyz") is None
    assert normalize_label("") is None


@pytest.mark.parametrize("label,codec,text", _CASES)
def test_meta_charset_roundtrip(label, codec, text):
    html = f'<html><head><meta charset="{label}"></head><body>{text}</body>'.encode(
        codec
    )
    assert sniff_charset(html) == normalize_label(label)
    out, cs = to_utf8(html)
    assert cs == normalize_label(label)
    assert text in out.decode("utf-8")


def test_http_equiv_and_xml_decl_prescan():
    sjis = '<meta http-equiv="Content-Type" content="text/html; charset=Shift_JIS"><p>東京</p>'.encode(
        "shift_jis"
    )
    assert sniff_charset(sjis) == "shift_jis"
    xml = '<?xml version="1.0" encoding="EUC-KR"?><root>서울</root>'.encode("euc_kr")
    assert sniff_charset(xml) == "euc_kr"


def test_http_content_type_beats_meta_but_not_bom():
    body = '<meta charset="utf-8"><p>Привет</p>'.encode("cp1251")
    assert sniff_charset(body, "text/html; charset=windows-1251") == "cp1251"
    bom = "﻿Привет".encode("utf-16-le")
    with_bom = b"\xff\xfe" + "Привет".encode("utf-16-le")
    assert sniff_charset(with_bom, "text/html; charset=gbk") == "utf-16-le"
    assert "Привет" in to_utf8(bom)[0].decode("utf-8")


def test_bom_variants_and_strip():
    for enc, bom in [
        ("utf-8", b"\xef\xbb\xbf"),
        ("utf-16-le", b"\xff\xfe"),
        ("utf-16-be", b"\xfe\xff"),
        ("utf-32-le", b"\xff\xfe\x00\x00"),
        ("utf-32-be", b"\x00\x00\xfe\xff"),
    ]:
        payload = bom + "héllo wörld".encode(enc)
        out, cs = to_utf8(payload)
        assert cs == enc
        assert out.decode("utf-8") == "héllo wörld"  # BOM char stripped


def test_fallbacks_and_clean_utf8_passthrough():
    clean = "plain utf-8 … ünïcode".encode("utf-8")
    out, cs = to_utf8(clean)
    assert cs == "utf-8" and out is clean  # zero-copy identity
    # invalid utf-8, no declaration anywhere -> windows-1252
    legacy = b"caf\xe9 r\xe9sum\xe9"
    out, cs = to_utf8(legacy)
    assert cs == "cp1252" and out.decode("utf-8") == "café résumé"
    # meta lying about utf-16 on undecoded bytes means utf-8 per spec
    lying = b'<meta charset="utf-16">plain'
    assert sniff_charset(lying) == "utf-8"
    # truncated multi-byte tail: replacement, never an exception
    cut = "中文网页".encode("utf-8")[:-1]
    assert to_utf8(b'<meta charset="utf-8">' + cut)[0]


def test_unknown_label_falls_through_to_validity():
    page = '<meta charset="klingon-9">中文'.encode("utf-8")
    assert sniff_charset(page) == "utf-8"


def test_transcode_stage_repairs_legacy_pages(ray_session):
    import ray.data as rd

    from deduplicatr_ray.functions.textnorm import extract_text
    from deduplicatr_ray.stages.extract import extract_stage, transcode_stage

    gbk_html = '<html><meta charset="gb2312"><body>简体中文页</body></html>'.encode(
        "gbk"
    )
    utf8_html = "<html><body>already clean — ünïcode</body></html>".encode()
    pages = pa.table(
        {
            "url": ["http://a.cn/", "http://b.com/", "http://c.org/"],
            "warc_ts": pa.array([0, 0, 0], pa.timestamp("us")),
            "html": pa.array([gbk_html, utf8_html, None], pa.binary()),
            "text": pa.array([None, None, "wet text"], pa.string()),
            "lang": ["und"] * 3,
        }
    )
    fixed = transcode_stage(rd.from_arrow(pages), keep_charset=True)
    df = fixed.to_pandas().set_index("url")
    assert df.loc["http://a.cn/", "charset"] == "gbk"
    assert df.loc["http://b.com/", "charset"] == "utf-8"
    assert df.loc["http://b.com/", "html"] == utf8_html  # idempotent
    ext = extract_stage(transcode_stage(rd.from_arrow(pages))).to_pandas()
    by_url = dict(zip(ext.url, ext.text))
    assert "简体中文页" in by_url["http://a.cn/"]
    assert by_url["http://c.org/"] == "wet text"  # passthrough untouched
    # without repair the frozen extractor mojibakes via latin-1 fallback
    assert "简体中文页" not in extract_text(gbk_html)


def test_read_warc_transcode_uses_http_charset(ray_session, tmp_path):
    from deduplicatr_ray.sources.warc import build_warc, read_warc
    from deduplicatr_ray.stages.extract import extract_stage

    sjis_body = "<html><body>日本語ページ</body></html>".encode("shift_jis")
    records = [
        {
            "url": "http://jp.example/",
            "html": sjis_body,
            "http_content_type": "text/html; charset=Shift_JIS",
        },
        {"url": "http://plain.example/", "html": b"<p>ok ascii</p>"},
    ]
    p = tmp_path / "fix.warc.gz"
    p.write_bytes(build_warc(records))
    texts = dict(
        zip(
            *(
                lambda d: (d.url, d.text)
            )(extract_stage(read_warc([str(p)], transcode=True)).to_pandas())
        )
    )
    assert "日本語ページ" in texts["http://jp.example/"]
    assert texts["http://plain.example/"] == "ok ascii"
    # default ingest stays byte-faithful: raw payload untouched
    raw = read_warc([str(p)]).to_pandas().set_index("url")
    assert bytes(raw.loc["http://jp.example/", "html"]) == sjis_body
