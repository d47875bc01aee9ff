"""WARC source (sources/warc.py): record framing, per-record gzip
members, HTTP response split, and the read_warc -> extract_stage path."""

from __future__ import annotations

import gzip

import pytest

from deduplicatr_ray.sources import warc as W

RECS = [
    {
        "url": "http://a.example/x",
        "date": "2021-05-01T12:00:00Z",
        "html": b"<html><body>Hello &amp; goodbye</body></html>",
    },
    {"url": "http://b.example/y", "html": b"<p>gone</p>", "status": 404},
    {"url": "http://c.example/z", "html": b"<p>three</p>"},
]


@pytest.mark.parametrize("gz", [True, False])
def test_build_parse_roundtrip(gz):
    buf = W.build_warc(RECS, gzip_per_record=gz)
    t = W.warc_bytes_to_pages(buf)
    # warcinfo and the 404 are skipped; 200s become pages rows
    assert t["url"].to_pylist() == ["http://a.example/x", "http://c.example/z"]
    assert t["html"].to_pylist()[0] == RECS[0]["html"]
    assert t["text"].to_pylist() == [None, None]
    assert t["lang"].to_pylist() == ["und", "und"]
    ts = t["warc_ts"].to_pylist()[0]
    assert (ts.year, ts.month, ts.hour) == (2021, 5, 12)


def test_gzip_members_are_concatenated_per_record():
    buf = W.build_warc(RECS, gzip_per_record=True)
    # Common Crawl layout: one gzip member per record, concatenated —
    # more than one member magic must appear
    assert buf[:2] == b"\x1f\x8b" and buf.count(b"\x1f\x8b\x08") >= 3
    # and the concatenation inflates to the plain layout
    assert gzip.decompress(buf) == W.build_warc(RECS, gzip_per_record=False)


def test_split_http_response():
    body = b"HTTP/1.1 200 OK\r\nX: y\r\n\r\npayload bytes"
    assert W.split_http_response(body) == (200, b"payload bytes")
    with pytest.raises(ValueError):
        W.split_http_response(b"no terminator at all")
    with pytest.raises(ValueError):
        W.split_http_response(b"GARBAGE line\r\n\r\nx")


def test_framing_corruption_raises_value_error():
    plain = W.build_warc(RECS, gzip_per_record=False)
    with pytest.raises(ValueError):
        W.warc_bytes_to_pages(plain[:-40])  # body overruns
    with pytest.raises(ValueError):
        W.warc_bytes_to_pages(b"NOTAWARC" * 4)
    with pytest.raises(ValueError):
        W.warc_bytes_to_pages(b"WARC/1.0\r\nno-content-length: 1\r\n\r\n")


def test_resource_record_body_is_payload():
    # a record without the application/http content type: body IS html
    body = b"<p>body</p>"
    rec = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Target-URI: http://r.example/\r\n"
        b"WARC-Date: 2020-01-01T00:00:00Z\r\n"
        b"Content-Type: text/html\r\n"
        + f"Content-Length: {len(body)}\r\n".encode()
        + b"\r\n"
        + body
        + b"\r\n\r\n"
    )
    t = W.warc_bytes_to_pages(rec)
    assert t["html"].to_pylist() == [body]


def test_read_warc_extract_end_to_end(ray_session, tmp_path):
    from deduplicatr_ray.stages.extract import extract_stage

    path = tmp_path / "fixture.warc.gz"
    path.write_bytes(W.build_warc(RECS))
    out = (
        extract_stage(W.read_warc(str(path)))
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert list(out["url"]) == ["http://a.example/x", "http://c.example/z"]
    # tag strip -> unescape -> collapse
    assert list(out["text"]) == ["Hello & goodbye", "three"]
    assert list(out["n_chars"]) == [15, 5]


def test_read_warc_feeds_flagship_dedup(ray_session, tmp_path):
    # the CLI's WARC ingest path: WARC file -> read_warc -> dedup_pipeline
    from deduplicatr_ray.config import CANONICAL
    from deduplicatr_ray.pipelines.flagship import dedup_pipeline

    text = "the quick brown fox jumps over the lazy dog " * 20
    recs = []
    for i in range(30):
        t = (
            text
            if i % 3 == 0
            else f"document {i} body " + ("tokens all over " * 30)
        )
        recs.append(
            {
                "url": f"http://w{i:02d}.example/",
                "html": f"<html><body>{t}</body></html>".encode(),
            }
        )
    path = tmp_path / "pages.warc.gz"
    path.write_bytes(W.build_warc(recs))
    res = dedup_pipeline(W.read_warc(str(path)), CANONICAL)
    df = res.clusters.to_pandas()
    assert len(df) == 30
    sizes = df["cluster_size"].value_counts().to_dict()
    # 10 exact copies cluster together; the 20 near-identical docs too
    assert sizes == {10: 10, 20: 20}


def test_wet_conversion_records(ray_session, tmp_path):
    # Common Crawl WET layout: conversion records with text/plain
    # bodies become text rows; the extractor passthrough keeps them
    # byte-identical (incl. whitespace runs — no html collapse applies)
    from deduplicatr_ray.stages.extract import extract_stage

    recs = [
        {"url": "http://t.example/1", "text": "plain  text \n with runs"},
        {"url": "http://t.example/2", "html": b"<p>mixed file</p>"},
        {"url": "http://t.example/3", "text": "unicode café"},
    ]
    buf = W.build_warc(recs)
    t = W.warc_bytes_to_pages(buf)
    assert t.num_rows == 3
    assert t["text"].to_pylist() == [recs[0]["text"], None, recs[2]["text"]]
    assert t["html"].to_pylist()[1] == recs[1]["html"]
    path = tmp_path / "pages.wet.gz"
    path.write_bytes(buf)
    out = (
        extract_stage(W.read_warc(str(path)))
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    # WET text passes through UNCHANGED; html rows still extract
    assert list(out["text"]) == [
        "plain  text \n with runs",
        "mixed file",
        "unicode café",
    ]


def test_partitioned_checkpoint_resume_over_warc_files(ray_session, tmp_path):
    # the resumable CC-ingest path: WARC files as checkpoint partitions
    import json
    import os

    from deduplicatr_ray.pipelines.flagship import dedup_pipeline_partitioned

    text = "the quick brown fox jumps over the lazy dog " * 20
    paths = []
    for f in range(4):
        recs = []
        for i in range(12):
            t = text if i % 2 == 0 else f"file {f} doc {i} " + ("tok " * 40)
            recs.append(
                {
                    "url": f"http://f{f}d{i:02d}.example/",
                    "html": f"<html><body>{t}</body></html>".encode(),
                }
            )
        p = tmp_path / f"crawl{f}.warc.gz"
        p.write_bytes(W.build_warc(recs))
        paths.append(str(p))
    ckpt = str(tmp_path / "ckpt")
    res1 = dedup_pipeline_partitioned(
        paths, checkpoint_dir=ckpt, run_id="w1", num_partitions=2
    )
    df1 = res1.clusters.to_pandas().sort_values("url").reset_index(drop=True)
    assert len(df1) == 48
    # the 24 exact copies across all files form one cluster
    assert df1["cluster_size"].max() == 24
    manifest = json.load(open(os.path.join(ckpt, "w1", "_lineage.json")))
    sig_keys = [k for k in manifest["entries"] if k.startswith("signatures/")]
    assert len(sig_keys) == 2  # warc file groups became checkpoint partitions
    assert all(
        manifest["entries"][k]["input_files"][0].endswith(".warc.gz")
        for k in sig_keys
    )
    # resume: nothing recomputed, identical clusters
    res2 = dedup_pipeline_partitioned(
        paths, checkpoint_dir=ckpt, run_id="w1", num_partitions=2
    )
    manifest2 = json.load(open(os.path.join(ckpt, "w1", "_lineage.json")))
    for k in sig_keys:
        assert manifest["entries"][k] == manifest2["entries"][k]
    df2 = res2.clusters.to_pandas().sort_values("url").reset_index(drop=True)
    assert df2.equals(df1)


def test_read_warc_on_error_skip_drops_corrupt_files(ray_session, tmp_path):
    good = W.build_warc(
        [{"url": "http://ok.example/", "html": b"<p>fine</p>"}]
    )
    (tmp_path / "good.warc.gz").write_bytes(good)
    (tmp_path / "bad.warc.gz").write_bytes(b"\x1f\x8b\x08garbage not gzip")
    (tmp_path / "trunc.warc.gz").write_bytes(good[:-20])
    # default: the corrupt file fails the read
    with pytest.raises(Exception):
        W.read_warc(str(tmp_path)).count()
    # skip: good rows survive, corrupt files dropped
    out = W.read_warc(str(tmp_path), on_error="skip").to_pandas()
    assert list(out["url"]) == ["http://ok.example/"]


def test_corrupt_gzip_surfaces_as_value_error():
    with pytest.raises(ValueError, match="gzip"):
        W.warc_bytes_to_pages(b"\x1f\x8b\x08\x00garbage bytes here")


# --- HTTP entity-body decoding (chunked + Content-Encoding) ---------------

HTML = b"<html><body>Chunky &amp; zipped page body, long enough to split.</body></html>"


@pytest.mark.parametrize("ce", [None, "gzip", "deflate"])
@pytest.mark.parametrize("chunked", [True, False])
def test_http_entity_decoding_roundtrip(ce, chunked):
    rec = {"url": "http://e.example/enc", "html": HTML}
    if ce:
        rec["content_encoding"] = ce
    if chunked:
        rec["chunked"] = True
    buf = W.build_warc([rec])
    t = W.warc_bytes_to_pages(buf)
    # whatever the wire encoding, the pages row carries the ENTITY bytes
    assert t["html"].to_pylist() == [HTML]


def test_dechunk_multi_chunk_and_extensions():
    raw = b"5;ext=1\r\nhello\r\n6\r\n world\r\n0\r\n\r\n"
    assert W._dechunk(raw) == b"hello world"
    # truncated final chunk keeps the partial data (crawl capture cut off)
    assert W._dechunk(b"a\r\nhello") == b"hello"


def test_bad_chunk_header_falls_back_to_raw():
    body = (
        b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
        b"NOTHEX\r\ndata"
    )
    status, payload, headers = W.split_http_response_headers(body)
    assert status == 200
    assert payload == b"NOTHEX\r\ndata"  # warcio-style raw fallback


def test_misdeclared_content_encoding_keeps_raw():
    body = (
        b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n"
        b"plain, not gzip at all"
    )
    _s, payload, _h = W.split_http_response_headers(body)
    assert payload == b"plain, not gzip at all"


def test_truncated_gzip_entity_keeps_decoded_prefix():
    import io as _io

    bio = _io.BytesIO()
    with gzip.GzipFile(fileobj=bio, mode="wb", mtime=0) as f:
        f.write(b"x" * 10000)
    gz = bio.getvalue()
    body = (
        b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n" + gz[:-8]
    )
    _s, payload, _h = W.split_http_response_headers(body)
    assert payload.startswith(b"xxxx") and len(payload) > 0


def test_tolerant_http_headers_skip_junk_lines():
    body = (
        b"HTTP/1.1 200 OK\r\n"
        b"this line has no colon\r\n"
        b"Content-Type: text/html; charset=utf-8\r\n"
        b"Content-Type: text/plain\r\n"  # duplicate: first wins
        b"\r\nbody"
    )
    status, payload, headers = W.split_http_response_headers(body)
    assert status == 200 and payload == b"body"
    assert headers["content-type"] == "text/html; charset=utf-8"


def test_chunked_gzip_end_to_end_extract(ray_session, tmp_path):
    from deduplicatr_ray.stages.extract import extract_stage

    recs = [
        {"url": "http://plain.example/", "html": HTML},
        {
            "url": "http://enc.example/",
            "html": HTML,
            "chunked": True,
            "content_encoding": "gzip",
        },
    ]
    (tmp_path / "f.warc.gz").write_bytes(W.build_warc(recs))
    docs = extract_stage(W.read_warc(str(tmp_path))).to_pandas()
    docs = docs.sort_values("url").reset_index(drop=True)
    # identical entity bytes -> byte-identical extracted text
    assert docs.loc[0, "text"] == docs.loc[1, "text"]
    assert "Chunky & zipped" in docs.loc[0, "text"]


def test_warc_parse_fuzz_truncations_and_mutations():
    """Parser contract behind on_error="skip": warc_bytes_to_pages
    either returns a pages table or raises ValueError — NEVER a raw
    IndexError/UnicodeError/OverflowError/KeyError that would escape
    read_warc's per-file handler and kill the partition. Sweep
    truncation prefixes and seeded byte mutations of a multi-record
    file in both the gz-member and plain layouts."""
    import numpy as np

    recs = [
        {"url": "http://a.example/1", "html": b"<p>one</p>"},
        {
            "url": "http://a.example/2",
            "html": b"<p>two two</p>",
            "chunked": True,
            "content_encoding": "gzip",
        },
        {"url": "http://a.example/3", "text": "wet text body"},
        {"url": "http://a.example/4", "html": b"<p>gone</p>", "status": 301},
    ]
    rng = np.random.Generator(np.random.PCG64(23))
    for gz in (True, False):
        buf = W.build_warc(recs, gzip_per_record=gz)
        W.warc_bytes_to_pages(buf)  # intact file parses
        step = max(1, len(buf) // 149)
        for cut in range(0, len(buf), step):
            try:
                W.warc_bytes_to_pages(buf[:cut])
            except ValueError:
                pass  # the ONLY allowed failure type
        for _ in range(200):
            i = int(rng.integers(0, len(buf)))
            q = bytearray(buf)
            q[i] ^= int(rng.integers(1, 256))
            try:
                W.warc_bytes_to_pages(bytes(q), transcode=True)
            except ValueError:
                pass


# --- record-level salvage (bad_records="skip" / on_error="salvage") -------


def _recs(n):
    return [
        {"url": f"http://s.example/{i}", "html": f"<p>doc {i}</p>".encode()}
        for i in range(n)
    ]


def test_salvage_gzip_member_corruption_costs_one_record():
    recs = _recs(6)
    buf = W.build_warc(recs, gzip_per_record=True)
    # locate gzip member boundaries, corrupt the 3rd member's middle
    starts = []
    i = 0
    while True:
        i = buf.find(b"\x1f\x8b\x08", i)
        if i < 0:
            break
        starts.append(i)
        i += 3
    assert len(starts) == 7  # warcinfo + 6 records
    bad = bytearray(buf)
    mid = (starts[3] + starts[4]) // 2
    bad[mid] ^= 0xFF
    bad = bytes(bad)
    with pytest.raises(ValueError):
        W.warc_bytes_to_pages(bad)  # default still raises
    t = W.warc_bytes_to_pages(bad, bad_records="skip")
    got = t["url"].to_pylist()
    assert len(got) == 5 and "http://s.example/2" not in got


def test_salvage_plain_framing_resyncs_at_next_record():
    recs = _recs(5)
    buf = W.build_warc(recs, gzip_per_record=False)
    # corrupt record 1's Content-Length header value
    bad = buf.replace(
        b"WARC-Target-URI: http://s.example/1", b"WARC-Target-URX junk\xff:"
    )
    t = W.warc_bytes_to_pages(bad, bad_records="skip")
    got = t["url"].to_pylist()
    assert "http://s.example/0" in got and "http://s.example/4" in got
    assert len(got) >= 4


def test_salvage_record_local_damage_drops_only_that_record():
    recs = _recs(3)
    buf = W.build_warc(recs, gzip_per_record=False)
    bad = buf.replace(b"HTTP/1.1 200 OK", b"GARBAGE STATUS!", 1)
    t = W.warc_bytes_to_pages(bad, bad_records="skip")
    assert t["url"].to_pylist() == [
        "http://s.example/1",
        "http://s.example/2",
    ]


def test_read_warc_on_error_salvage_end_to_end(ray_session, tmp_path):
    good = W.build_warc(_recs(4))
    starts = []
    i = 0
    while True:
        i = good.find(b"\x1f\x8b\x08", i)
        if i < 0:
            break
        starts.append(i)
        i += 3
    bad = bytearray(good)
    bad[(starts[2] + starts[3]) // 2] ^= 0x55  # kill record 1's member
    (tmp_path / "f.warc.gz").write_bytes(bytes(bad))
    out = W.read_warc(str(tmp_path), on_error="salvage").to_pandas()
    urls = sorted(out["url"])
    assert len(urls) == 3 and "http://s.example/1" not in urls


def test_salvage_fuzz_never_raises():
    """With bad_records="skip" the parser must ALWAYS return a table —
    any corruption only shrinks the row count."""
    import numpy as np

    recs = _recs(4) + [{"url": "http://s.example/w", "text": "wet row"}]
    rng = np.random.Generator(np.random.PCG64(31))
    for gz in (True, False):
        buf = W.build_warc(recs, gzip_per_record=gz)
        full = len(W.warc_bytes_to_pages(buf, bad_records="skip"))
        assert full == 5
        step = max(1, len(buf) // 149)
        for cut in range(0, len(buf), step):
            t = W.warc_bytes_to_pages(buf[:cut], bad_records="skip")
            assert len(t) <= full
        for _ in range(300):
            i = int(rng.integers(0, len(buf)))
            q = bytearray(buf)
            q[i] ^= int(rng.integers(1, 256))
            W.warc_bytes_to_pages(bytes(q), bad_records="skip")


# --- CDX indexing + record fetch -------------------------------------------


def test_cdx_records_and_range_fetch_roundtrip(tmp_path):
    import hashlib

    recs = [
        {"url": "http://c.example/1", "html": b"<p>one</p>"},
        {"url": "http://c.example/2", "html": b"<p>gone</p>", "status": 404},
        {"url": "http://c.example/3", "text": "wet text body"},
        {
            "url": "http://c.example/4",
            "html": b"<p>four</p>",
            "chunked": True,
            "content_encoding": "gzip",
        },
    ]
    for gz in (True, False):
        buf = W.build_warc(recs, gzip_per_record=gz)
        name = "f.warc.gz" if gz else "f.warc"
        (tmp_path / name).write_bytes(buf)
        t = W.warc_cdx_records(buf)
        assert t["url"].to_pylist() == [r["url"] for r in recs]
        assert t["status"].to_pylist() == [200, 404, None, 200]
        assert t["record_type"].to_pylist() == [
            "response", "response", "conversion", "response",
        ]
        assert t["mime"].to_pylist() == [
            "text/html", "text/html", "text/plain", "text/html",
        ]
        # digest is over the DECODED entity (chunked+gzip removed)
        assert (
            t["digest_sha256"][3].as_py()
            == hashlib.sha256(b"<p>four</p>").hexdigest()
        )
        # the indexed byte span fetches + parses standalone; the 404 and
        # the WET row parse to their own shapes
        row1 = t.to_pylist()[0]
        sub = W.fetch_warc_record(
            str(tmp_path / name), row1["offset"], row1["length"]
        )
        assert sub["url"].to_pylist() == ["http://c.example/1"]
        assert sub["html"][0].as_py() == b"<p>one</p>"


def test_cdx_index_dataset_and_salvage(ray_session, tmp_path):
    recs = _recs(6)
    good = W.build_warc(recs)
    (tmp_path / "a.warc.gz").write_bytes(good)
    starts = []
    i = 0
    while True:
        i = good.find(b"\x1f\x8b\x08", i)
        if i < 0:
            break
        starts.append(i)
        i += 3
    bad = bytearray(good)
    bad[(starts[2] + starts[3]) // 2] ^= 0x7F  # kill record 1's member
    (tmp_path / "b.warc.gz").write_bytes(bytes(bad))
    with pytest.raises(Exception):
        W.warc_cdx_index(str(tmp_path), on_error="raise").count()
    df = W.warc_cdx_index(str(tmp_path), on_error="salvage").to_pandas()
    assert sorted(df["filename"].unique()) == ["a.warc.gz", "b.warc.gz"]
    a = df[df["filename"] == "a.warc.gz"]
    b = df[df["filename"] == "b.warc.gz"]
    assert len(a) == 6 and len(b) == 5
    assert "http://s.example/1" not in set(b["url"])
    # digests of surviving records are identical across the two files
    merged = a.merge(b, on="url", suffixes=("_a", "_b"))
    assert (merged["digest_sha256_a"] == merged["digest_sha256_b"]).all()


def test_revisit_records_indexed_with_named_digest():
    import hashlib

    body = b"<p>original</p>"
    d = hashlib.sha256(body).hexdigest()
    recs = [
        {"url": "http://r.example/orig", "html": body},
        {
            "url": "http://r.example/again",
            "revisit_of": "http://r.example/orig",
            "digest": d,
        },
    ]
    buf = W.build_warc(recs)
    # pages ingest skips revisit records (no payload stored)
    assert W.warc_bytes_to_pages(buf)["url"].to_pylist() == [
        "http://r.example/orig"
    ]
    # CDX indexes them with the referenced digest
    t = W.warc_cdx_records(buf)
    assert t["record_type"].to_pylist() == ["response", "revisit"]
    assert t["digest_sha256"].to_pylist() == [d, d]
    assert t["status"].to_pylist() == [200, 304]
    # corrupt: a revisit without a digest header (plain layout so the
    # header string is mutable in the raw bytes)
    plain = W.build_warc(recs, gzip_per_record=False)
    bad = plain.replace(b"WARC-Payload-Digest", b"X-Payload-Digest00")
    with pytest.raises(ValueError):
        W.warc_cdx_records(bad)
    assert W.warc_cdx_records(bad, bad_records="skip")[
        "record_type"
    ].to_pylist() == ["response"]


@pytest.mark.parametrize("budget", [None, 0])
def test_cdx_dedup_against_cross_crawl(ray_session, tmp_path, budget):
    """Digest-only cross-crawl dedup; budget=0 forces the hash
    left-outer branch of mark_membership, None the broadcast branch —
    verdicts must be identical."""
    old_recs = [
        {"url": f"http://old.example/{i}", "html": f"<p>page {i}</p>".encode()}
        for i in range(8)
    ]
    new_recs = [
        # 0-3: same content at new urls -> dup_of_prior
        {"url": f"http://new.example/{i}", "html": f"<p>page {i}</p>".encode()}
        for i in range(4)
    ] + [
        # 4-7: changed content -> new
        {"url": f"http://new.example/{i}", "html": f"<p>page {i} v2</p>".encode()}
        for i in range(4, 8)
    ] + [
        # a crawler-side revisit of old content: digest says dup
        {
            "url": "http://new.example/re",
            "revisit_of": "http://old.example/0",
            "payload": b"<p>page 0</p>",
        }
    ]
    (tmp_path / "old").mkdir()
    (tmp_path / "new").mkdir()
    (tmp_path / "old" / "a.warc.gz").write_bytes(W.build_warc(old_recs))
    (tmp_path / "new" / "b.warc.gz").write_bytes(W.build_warc(new_recs))
    old_idx = W.warc_cdx_index(str(tmp_path / "old"))
    new_idx = W.warc_cdx_index(str(tmp_path / "new"))
    kw = {} if budget is None else {"broadcast_budget": budget}
    df = (
        W.cdx_dedup_against(new_idx, old_idx, **kw)
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert len(df) == 9
    verdicts = dict(zip(df["url"], df["dup_of_prior"]))
    for i in range(4):
        assert verdicts[f"http://new.example/{i}"] == True  # noqa: E712
    for i in range(4, 8):
        assert verdicts[f"http://new.example/{i}"] == False  # noqa: E712
    assert verdicts["http://new.example/re"] == True  # noqa: E712
    # columns preserved + the one flag added
    assert "digest_sha256" in df.columns and "offset" in df.columns


@pytest.mark.parametrize("gz", [True, False])
def test_compact_warc_storage_dedup(ray_session, tmp_path, gz):
    import hashlib

    def page(i):  # incompressible + big: a revisit stub is a real saving
        import hashlib as _hl

        filler = "".join(
            _hl.sha256(f"{i}:{j}".encode()).hexdigest() for j in range(20)
        )
        return f"<p>page {i} {filler}</p>".encode()

    old_recs = [
        {"url": f"http://o.example/{i}", "html": page(i)} for i in range(6)
    ]
    new_recs = (
        [
            {
                "url": f"http://n.example/{i}",
                "html": page(i),  # re-captures: dup
            }
            for i in range(3)
        ]
        + [
            {
                "url": f"http://n.example/{i}",
                "html": (b"<p>fresh " + b"x" * 400 + b"</p>"),  # new
            }
            for i in range(3, 6)
        ]
        + [{"url": "http://n.example/wet", "text": "wet stays verbatim"}]
    )
    (tmp_path / "old").mkdir()
    (tmp_path / "new").mkdir()
    (tmp_path / "out").mkdir()
    ext = "warc.gz" if gz else "warc"
    (tmp_path / "old" / f"a.{ext}").write_bytes(
        W.build_warc(old_recs, gzip_per_record=gz)
    )
    new_buf = W.build_warc(new_recs, gzip_per_record=gz)
    (tmp_path / "new" / f"b.{ext}").write_bytes(new_buf)
    old_idx = W.warc_cdx_index(str(tmp_path / "old"))
    man = W.compact_warc(
        str(tmp_path / "new"), old_idx, str(tmp_path / "out")
    ).to_pandas()
    assert len(man) == 1
    row = man.iloc[0]
    # warcinfo + 7 records; 3 responses deduped to revisit stubs
    assert row["n_records"] == 8
    assert row["n_revisit"] == 3 and row["n_stored"] == 5
    out_buf = (tmp_path / "out" / f"b.{ext}").read_bytes()
    assert row["bytes_out"] == len(out_buf) < row["bytes_in"] == len(new_buf)
    # pages from the compacted crawl: only novel content stored
    pages = W.warc_bytes_to_pages(out_buf)
    stored_urls = sorted(pages["url"].to_pylist())
    assert stored_urls == [
        "http://n.example/3", "http://n.example/4", "http://n.example/5",
        "http://n.example/wet",
    ]
    # CDX of the compacted file still lists EVERY capture with its true
    # digest (revisit stubs carry the original payload digest)
    cdx_new = W.warc_cdx_records(new_buf).to_pandas()
    cdx_out = W.warc_cdx_records(out_buf).to_pandas()
    a = cdx_new.sort_values("url")[["url", "digest_sha256"]]
    b = cdx_out.sort_values("url")[["url", "digest_sha256"]]
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))
    assert (
        cdx_out.sort_values("url")["record_type"].tolist()
        == ["revisit"] * 3 + ["response"] * 3 + ["conversion"]
    )
    # stored members are byte-verbatim: the fresh page's exact html
    # survives
    assert hashlib.sha256(b"<p>fresh " + b"x" * 400 + b"</p>").hexdigest() in set(
        cdx_out["digest_sha256"]
    )
    # resume: re-running skips the finished file (manifest empty)
    man2 = W.compact_warc(
        str(tmp_path / "new"), old_idx, str(tmp_path / "out")
    ).to_pandas()
    assert len(man2) == 0


def test_compact_warc_over_budget_raises(ray_session, tmp_path):
    (tmp_path / "new").mkdir()
    (tmp_path / "new" / "b.warc.gz").write_bytes(
        W.build_warc([{"url": "http://x/", "html": b"<p>x</p>"}])
    )
    old_idx = W.warc_cdx_index(str(tmp_path / "new"))
    with pytest.raises(Exception, match="broadcast budget"):
        W.compact_warc(
            str(tmp_path / "new"),
            old_idx,
            str(tmp_path / "out"),
            broadcast_budget=0,
        ).to_pandas()


def test_write_wet_roundtrip(ray_session, tmp_path):
    import ray.data as rd
    import pyarrow as pa

    rows = {
        "url": [f"http://w.example/{i}" for i in range(40)],
        "text": [f"doc {i} text  with \n runs kept" for i in range(40)],
        "warc_ts": pa.array([1_600_000_000_000_000 + i for i in range(40)],
                            pa.timestamp("us")),
    }
    pages = rd.from_arrow(pa.table(rows)).repartition(3)
    out = str(tmp_path / "wet")
    man = W.write_wet(pages, out).to_pandas()
    assert man["n_records"].sum() == 40 and len(man) >= 1
    # re-ingest: WET conversion records come back byte-identical
    back = (
        W.read_warc(out)
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert len(back) == 40
    want = dict(zip(rows["url"], rows["text"]))
    assert {u: t for u, t in zip(back["url"], back["text"])} == want
    assert back["html"].isna().all()
    # WARC-Date survives the roundtrip
    assert back.loc[0, "warc_ts"].year == 2020


def test_write_cdxj_sorted_shards(ray_session, tmp_path):
    import gzip as _gz
    import json

    recs = [
        {
            "url": f"http://{h}.example/p{i}",
            "html": f"<p>page {h} {i}</p>".encode(),
        }
        for i, h in enumerate(
            ["zeta", "alpha", "mid", "beta", "omega", "kappa"] * 4
        )
    ]
    (tmp_path / "w").mkdir()
    (tmp_path / "w" / "a.warc.gz").write_bytes(W.build_warc(recs))
    idx = W.warc_cdx_index(str(tmp_path / "w")).repartition(4)
    man = (
        W.write_cdxj(idx, str(tmp_path / "cdx"))
        .to_pandas()
        .sort_values("first_key")
        .reset_index(drop=True)
    )
    assert man["n_records"].sum() == 24
    # shards are disjoint, manifest-ordered key ranges (cluster.idx
    # semantics: global order lives in the manifest)
    for i in range(len(man)):
        assert man.loc[i, "first_key"] <= man.loc[i, "last_key"]
        if i:
            assert man.loc[i - 1, "last_key"] <= man.loc[i, "first_key"]
    # lines inside each shard are sorted; json fields parse and match
    all_keys = []
    seen_urls = set()
    for _, row in man.iterrows():
        raw = (tmp_path / "cdx" / row["filename"]).read_bytes()
        text = _gz.decompress(raw).decode()
        keys = []
        for line in text.strip().splitlines():
            surt, ts14, js = line.split(" ", 2)
            rec = json.loads(js)
            assert ts14.isdigit() and len(ts14) == 14
            assert len(rec["digest"]) == 64 and rec["status"] == 200
            keys.append(surt)
            seen_urls.add(rec["url"])
        assert keys == sorted(keys)
        all_keys.extend(keys)
    assert all_keys == sorted(all_keys)  # global order via manifest
    assert seen_urls == {r["url"] for r in recs}


def test_crawl_refresh_composition_end_to_end(ray_session, tmp_path):
    """The round-5 family composed as one job: a prior crawl + a new
    crawl (wire-encoded bodies, one corrupt member) -> salvage ingest,
    CDX indexes, cross-crawl verdicts, storage compaction -> the
    compacted crawl still extracts exactly the novel pages, and the
    flagship dedup over old+new extracted text finds the re-captured
    pages as exact dup clusters."""
    import hashlib

    from deduplicatr_ray.config import CANONICAL
    from deduplicatr_ray.pipelines.flagship import dedup_pipeline
    from deduplicatr_ray.stages.extract import extract_stage

    def page(i):
        filler = " ".join(
            hashlib.sha256(f"{i}:{j}".encode()).hexdigest() for j in range(8)
        )
        return f"<html><body><p>doc {i} {filler}</p></body></html>".encode()

    old_recs = [
        {"url": f"http://old.example/{i}", "html": page(i)} for i in range(20)
    ]
    new_recs = [
        {
            "url": f"http://new.example/{i}",
            "html": page(i) if i < 10 else page(100 + i),
            **({"chunked": True, "content_encoding": "gzip"} if i % 2 else {}),
        }
        for i in range(20)
    ]
    (tmp_path / "old").mkdir()
    (tmp_path / "new").mkdir()
    (tmp_path / "old" / "a.warc.gz").write_bytes(W.build_warc(old_recs))
    new_buf = bytearray(W.build_warc(new_recs))
    # corrupt one member mid-crawl: salvage must keep the rest
    starts = []
    i = 0
    while True:
        i = bytes(new_buf).find(b"\x1f\x8b\x08", i)
        if i < 0:
            break
        starts.append(i)
        i += 3
    new_buf[(starts[3] + starts[4]) // 2] ^= 0x5A  # record index 2 dies
    (tmp_path / "new" / "b.warc.gz").write_bytes(bytes(new_buf))

    old_idx = W.warc_cdx_index(str(tmp_path / "old")).materialize()
    new_idx = W.warc_cdx_index(str(tmp_path / "new"), on_error="salvage")
    verdicts = (
        W.cdx_dedup_against(new_idx, old_idx)
        .to_pandas()
        .set_index("url")["dup_of_prior"]
    )
    assert len(verdicts) == 19  # one record lost to the corrupt member
    assert "http://new.example/2" not in verdicts.index
    dups = {u for u, d in verdicts.items() if d}
    assert dups == {f"http://new.example/{i}" for i in range(10) if i != 2}

    man = W.compact_warc(
        str(tmp_path / "new"),
        old_idx,
        str(tmp_path / "out"),
        bad_records="skip",
    ).to_pandas()
    assert int(man["n_revisit"].sum()) == 9
    # the compacted crawl extracts exactly the novel pages
    novel = (
        extract_stage(W.read_warc(str(tmp_path / "out")))
        .to_pandas()
        .sort_values("url")
    )
    assert list(novel["url"]) == [
        f"http://new.example/{i}" for i in range(10, 20)
    ]
    # flagship dedup over both crawls' extracted text: the 9 surviving
    # re-captures pair with their originals as 2-doc exact clusters
    union = W.read_warc(str(tmp_path / "old")).union(
        W.read_warc(str(tmp_path / "new"), on_error="salvage")
    )
    res = dedup_pipeline(union, CANONICAL)
    df = res.clusters.to_pandas()
    assert len(df) == 39
    two = df[df["cluster_size"] == 2]
    assert len(two) == 18  # 9 dup pairs x 2 members
    paired_new = {
        u for u in two["url"] if u.startswith("http://new.example/")
    }
    assert paired_new == dups


def test_wat_sidecar_roundtrip(ray_session, tmp_path):
    import hashlib

    recs = [
        {
            "url": f"http://s{i % 3}.example/p{i}",
            "html": (
                f"<html><head><title> Page  {i} </title></head><body>"
                f'<a href="http://t{i % 4}.example/x">l</a>'
                f'<a href="/rel{i}">r</a></body></html>'
            ).encode(),
            **({"chunked": True, "content_encoding": "gzip"} if i % 2 else {}),
        }
        for i in range(9)
    ] + [{"url": "http://s0.example/gone", "html": b"<p>x</p>", "status": 404}]
    (tmp_path / "w").mkdir()
    (tmp_path / "w" / "seg.warc.gz").write_bytes(W.build_warc(recs))
    man = W.write_wat(str(tmp_path / "w"), str(tmp_path / "wat")).to_pandas()
    assert list(man["filename"]) == ["seg.wat.gz"]
    assert man["n_records"].sum() == 10  # WAT keeps non-200s too
    assert man["n_links"].sum() == 18  # 9 pages x 2; the 404 has none
    wat = W.read_wat(str(tmp_path / "wat")).to_pandas()
    assert len(wat) == 10
    row = wat.set_index("url").loc["http://s1.example/p1"]
    # digest covers the DECODED entity (chunked+gzip removed)
    assert row["digest_sha256"] == hashlib.sha256(recs[1]["html"]).hexdigest()
    assert row["title"] == "Page 1"
    assert sorted(row["links"]) == [
        "http://s1.example/rel1",
        "http://t1.example/x",
    ]
    assert int(wat.set_index("url").loc["http://s0.example/gone", "status"]) == 404
    # resume: second run skips the finished sidecar
    assert len(W.write_wat(str(tmp_path / "w"), str(tmp_path / "wat")).to_pandas()) == 0
    # the sidecar is a valid WARC: pages ingest sees 0 rows (metadata
    # records carry no payload), CDX indexes nothing
    t = W.warc_bytes_to_pages((tmp_path / "wat" / "seg.wat.gz").read_bytes())
    assert len(t) == 0
