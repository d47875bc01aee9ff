"""Minimum end-to-end slice (SURVEY.md §7.2): pages -> extract -> parquet."""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.parquet as pq

from deduplicatr_ray.sources.synthetic import gen_corpus
from deduplicatr_ray.stages.extract import extract_batch, extract_stage


def test_extract_batch_passthrough_and_recover():
    pages, _ = gen_corpus("exact")
    out = extract_batch(pages)
    assert out.column_names == ["url", "warc_ts", "text", "lang", "text_sha1", "n_chars"]
    texts = out["text"].to_pylist()
    in_texts = pages["text"].to_pylist()
    htmls = pages["html"].to_pylist()
    for t_in, h_in, t_out in zip(in_texts, htmls, texts):
        if t_in is not None:
            assert t_out == t_in  # byte-identical pass-through
        else:
            assert h_in is not None and t_out  # recovered from html
    # sha1 matches text bytes
    for t, h in zip(texts[:20], out["text_sha1"].to_pylist()[:20]):
        assert h == hashlib.sha1(t.encode()).digest()


def test_extract_recovers_same_body_as_text_rows():
    """html-only rows of an exact-dup cluster must recover the identical body,
    so exact dedup sees them as duplicates (the north_rule invariant)."""
    pages, truth = gen_corpus("exact")
    out = extract_batch(pages)
    by_url = dict(zip(out["url"].to_pylist(), out["text"].to_pylist()))
    for a, b in zip(truth["url_a"].to_pylist(), truth["url_b"].to_pylist()):
        assert by_url[a] == by_url[b]


def test_extract_stage_end_to_end(ray_session, tmp_path):
    import ray.data as rd

    pages, _ = gen_corpus("edge")
    ds = rd.from_arrow(pages)
    out = extract_stage(ds)
    out.write_parquet(str(tmp_path / "extracted"))
    back = pq.read_table(str(tmp_path / "extracted"))
    assert back.num_rows == pages.num_rows
    assert set(back.column_names) == {"url", "warc_ts", "text", "lang", "text_sha1", "n_chars"}
    # latin-1 html row decoded without error
    by_url = dict(zip(back["url"].to_pylist(), back["text"].to_pylist()))
    fr = [u for u in by_url if "/fr/" in u]
    assert any("caf\xe9" in by_url[u] for u in fr)
