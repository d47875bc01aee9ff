"""Extract + normalize stage (M4/M5/M1/M3; SURVEY.md §3.2 first stage).

Stateless ``map_batches`` task: pages -> EXTRACTED. Fuses HTML extraction,
text pass-through, SHA-1 content fingerprinting (the reference's full-content
hash, ``src/deduplicatr/hash.clj:~10-25`` approximate citation) and length
projection in one pass, then DROPS the wide ``html`` column so downstream
blocks carry only what they need (SURVEY.md §7.5).
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc

from ..functions.textnorm import extract_text


def extract_batch(batch: pa.Table) -> pa.Table:
    """pages batch -> EXTRACTED batch (zero-copy where text passes through)."""
    text_col = batch["text"]
    html_col = batch["html"]
    n = len(batch)

    # Fast path: rows with non-null text pass through byte-identical
    # (FIXTURES.md §3 step 6). Only null-text rows run the extractor.
    need_extract = pc.and_(pc.is_null(text_col), pc.is_valid(html_col))
    if pc.any(need_extract).as_py():
        texts = text_col.to_pylist()
        htmls = html_col.to_pylist()
        out_texts = [
            t if t is not None else (extract_text(h) if h is not None else "")
            for t, h in zip(texts, htmls)
        ]
    else:
        out_texts = [t if t is not None else "" for t in text_col.to_pylist()]

    sha1 = [hashlib.sha1(t.encode("utf-8")).digest() for t in out_texts]
    text_arr = pa.array(out_texts, pa.large_string())
    return pa.table(
        {
            "url": batch["url"],
            "warc_ts": batch["warc_ts"],
            "text": text_arr,
            "lang": batch["lang"],
            "text_sha1": pa.array(sha1, pa.binary(20)),
            "n_chars": pc.utf8_length(text_arr).cast(pa.int64()),
        }
    )


def extract_stage(pages, *, batch_size: int = 1024):
    """pages Dataset -> EXTRACTED Dataset (stateless task stage)."""
    return pages.map_batches(
        extract_batch,
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
    )


def transcode_batch(batch: pa.Table, *, keep_charset: bool = False) -> pa.Table:
    """pages batch -> pages batch with every non-null ``html`` payload
    transcoded to clean UTF-8 (``functions/charset.py`` WHATWG sniff:
    BOM > meta/XML prescan > UTF-8 validity > windows-1252). Clean-UTF-8
    payloads pass through byte-identical, so the stage is idempotent and
    a no-op on already-normalized corpora. ``keep_charset=True`` appends
    the sniffed codec name as a ``charset`` column (census/debug)."""
    from ..functions.charset import to_utf8

    html_col = batch["html"]
    charsets: list[str | None] = [None] * len(batch)
    if pc.any(pc.is_valid(html_col)).as_py():
        htmls = html_col.to_pylist()
        out: list[bytes | None] = [None] * len(htmls)
        for i, h in enumerate(htmls):
            if h is not None:
                out[i], charsets[i] = to_utf8(h)
        html_col = pa.array(out, type=pa.binary())
    cols = {name: batch[name] for name in batch.column_names}
    cols["html"] = html_col
    if keep_charset:
        cols["charset"] = pa.array(charsets, pa.string())
    return pa.table(cols)


def transcode_stage(pages, *, keep_charset: bool = False, batch_size: int = 1024):
    """OPT-IN charset repair ahead of the frozen extractor: pages Dataset ->
    pages Dataset with legacy-encoded HTML (Shift_JIS, GBK, EUC-KR, Big5,
    windows-125x, UTF-16 BOM, ...) rewritten as UTF-8 bytes. Row-local,
    stateless, zero shuffle; the frozen utf-8-first decode in
    ``extract_text`` then never hits its latin-1 mojibake fallback. The
    DEFAULT pipelines skip this stage — the per-url byte-identical
    extraction invariant is against raw payloads."""
    import functools

    return pages.map_batches(
        functools.partial(transcode_batch, keep_charset=keep_charset),
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
    )


def main_content_stage(
    pages,
    *,
    min_len: int = 40,
    max_link_density: float = 0.33,
    batch_size: int = 512,
):
    """Boilerplate removal (`functions/boilerplate.py`): per page the
    ARTICLE text with nav/footer/sidebar chrome dropped — the
    RefinedWeb-class extraction stage, opt-in beside the frozen
    byte-identical `extract_stage`. Rows with no html (WET text rows)
    pass their text through unchanged. Output: (url, main_text,
    n_chars)."""
    from ..functions.boilerplate import main_content

    def fn(batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        htmls = batch["html"].to_pylist()
        texts = (
            batch["text"].to_pylist()
            if "text" in batch.column_names
            else [None] * len(urls)
        )
        out = []
        for h, t in zip(htmls, texts):
            if h is None:
                out.append(t or "")
            else:
                out.append(
                    main_content(
                        h,
                        min_len=min_len,
                        max_link_density=max_link_density,
                    )
                )
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "main_text": pa.array(out, pa.string()),
                "n_chars": pa.array([len(t) for t in out], pa.int64()),
            }
        )

    return pages.map_batches(
        fn,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
    )
