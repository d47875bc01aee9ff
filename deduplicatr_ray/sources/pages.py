"""Page-table sources (S1/S3; SURVEY.md §2.1).

The reference's source is a recursive filesystem walk building one record per
file (``src/deduplicatr/fstree.clj:~10-40``, approximate citation — reference
mount empty at survey time); the target's analog is a Parquet scan producing
one row per page, with projection + predicate pushdown at the read.
"""

from __future__ import annotations

import os

import ray.data as rd

_SMALL_INPUT_BYTES = 256 * 2**20   # below this, Ray's parallelism heuristic
_TARGET_BLOCK_BYTES = 32 * 2**20   # over-splits and shuffle task overhead dominates


def _auto_blocks(path: str) -> int | None:
    """Size-aware read parallelism: Ray's default heuristic targets
    ~2x CPUs blocks, which over-splits small files into dozens of tiny
    blocks and makes every downstream all-to-all pay ~50-100ms of task
    overhead per block. For small inputs, cap blocks at size/32MiB (>=4
    so map stages still parallelize); for large inputs return None and
    let Ray's streaming heuristics size blocks."""
    try:
        if os.path.isdir(path):
            size = sum(
                os.path.getsize(os.path.join(r, f))
                for r, _, fs in os.walk(path)
                for f in fs
            )
        else:
            size = os.path.getsize(path)
    except OSError:
        return None
    if size >= _SMALL_INPUT_BYTES:
        return None
    return max(4, int(size // _TARGET_BLOCK_BYTES))


def read_parquet_auto(path: str, **kwargs):
    """``ray.data.read_parquet`` with size-aware block-count override."""
    blocks = _auto_blocks(path)
    if blocks is not None and "override_num_blocks" not in kwargs:
        kwargs["override_num_blocks"] = blocks
    return rd.read_parquet(path, **kwargs)


def read_pages(path: str, *, lang: str | None = None, columns: list[str] | None = None):
    """Read a Common-Crawl-style pages Parquet table (BASELINE.json:15).

    Column pruning and the optional ``lang`` predicate are pushed into the
    scan so unneeded columns / row groups never leave storage.

    Schema-adaptive (CLI ergonomics): a documents-shaped table (``doc_id``
    column, no ``url``) is adapted through the FIXTURES.md §5 mapping, and
    a pages table missing the optional ``html`` / ``warc_ts`` columns gets
    them as nulls — so ``cli run --input`` works on any of the test tables
    without a manual conversion step.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    kwargs = {}
    if columns is not None:
        kwargs["columns"] = columns
    if lang is not None:
        kwargs["filter"] = pc.field("lang") == lang
    ds = read_parquet_auto(path, **kwargs)
    if columns is not None:
        return ds
    try:
        names = ds.schema().names
    except Exception:
        return ds
    if "url" not in names and "doc_id" in names:
        keep = [c for c in ("doc_id", "text", "lang") if c in names]
        return ds.select_columns(keep).map_batches(
            _docs_to_pages_batch, batch_format="pyarrow", zero_copy_batch=True
        )
    missing = [c for c in ("html", "warc_ts") if c not in names]
    if missing:
        def add_nulls(batch: pa.Table) -> pa.Table:
            n = len(batch)
            if "html" not in batch.column_names:
                batch = batch.append_column("html", pa.nulls(n, pa.binary()))
            if "warc_ts" not in batch.column_names:
                batch = batch.append_column(
                    "warc_ts", pa.nulls(n, pa.timestamp("us"))
                )
            return batch

        ds = ds.map_batches(add_nulls, batch_format="pyarrow", zero_copy_batch=True)
    return ds


# deterministic synthetic crawl time for the doc adapter: 2020-01-01 UTC
# + doc_id minutes (SQL-reproducible: TIMESTAMP '2020-01-01' + doc_id *
# INTERVAL 1 MINUTE), so cluster recency metadata is oracle-checkable.
_TS_EPOCH_US = 1_577_836_800_000_000  # 2020-01-01T00:00:00Z in microseconds


def _docs_to_pages_batch(batch):
    """documents-schema batch -> pages-schema batch (FIXTURES.md §5 mapping:
    url = doc://{doc_id}, html = NULL, warc_ts = 2020-01-01 + doc_id min)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    n = len(batch)
    urls = pc.binary_join_element_wise(
        "doc://", pc.cast(batch["doc_id"], pa.string()), ""
    )
    ts = pc.add(
        pc.multiply(pc.cast(batch["doc_id"], pa.int64()), 60_000_000),
        _TS_EPOCH_US,
    ).cast(pa.timestamp("us"))
    lang = (
        batch["lang"].cast(pa.string())
        if "lang" in batch.column_names
        else pa.nulls(n, pa.string())
    )
    return pa.table(
        {
            "url": urls,
            "warc_ts": ts,
            "html": pa.nulls(n, pa.binary()),
            "text": batch["text"].cast(pa.string()),
            "lang": lang,
        }
    )


def docs_as_pages(sf_dir: str, *, columns_needed: bool = True):
    """Adapt /root/testdata ``documents.parquet`` to the pages schema
    (FIXTURES.md §5 mapping)."""
    ds = read_parquet_auto(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    return ds.map_batches(
        _docs_to_pages_batch, batch_format="pyarrow", zero_copy_batch=True
    )
