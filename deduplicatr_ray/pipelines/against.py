"""Cross-corpus deduplication — "dedup the new crawl AGAINST the existing
corpus": flag every new doc that exactly or nearly duplicates any existing
doc, WITHOUT deduplicating the new corpus within itself (that's the
flagship's job on its own pass). This is the standard refresh-crawl /
continued-pretraining filter (the batch analog of the engine's online
``state/incremental.py`` index actors, which claim-as-they-ingest).

One flagship run does all the work: both corpora enter the signature +
band pipeline under side-tagged urls (``a://`` existing, ``b://`` new), so
the ONE key-only all-to-all carries exact AND near evidence for the union,
and cluster membership gives the cross-corpus verdict: a new doc is a
duplicate iff its cluster contains at least one existing-side member
(connected-component semantics — transitive matches count, exactly like
the flagship's own dup notion).

The side resolution is the engine's standard shape — ONE hash-partitioned
groupby on the 128-bit cluster-key hash with a vectorized any-existing-
in-segment kernel — NOT a join: two ``Dataset.join`` operators in one
streaming plan each pin ``num_partitions`` aggregator actors and deadlock
small CPU budgets (observed at 4 CPUs), and a join is the wrong tool for
"does my group contain a tagged row" anyway.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_EXISTING = "a://"
_NEW = "b://"


def _tag_pages(docs, prefix: str):
    """(doc_id, text, lang?) -> pages schema with side-tagged urls."""
    import pyarrow.compute as pc

    def fn(b: pa.Table) -> pa.Table:
        n = len(b)
        urls = pc.binary_join_element_wise(
            prefix, pc.cast(b["doc_id"], pa.string()), ""
        )
        lang = (
            b["lang"].cast(pa.string())
            if "lang" in b.column_names
            else pa.nulls(n, pa.string())
        )
        return pa.table(
            {
                "url": urls,
                "warc_ts": pa.nulls(n, pa.timestamp("us")),
                "html": pa.nulls(n, pa.binary()),
                "text": pc.cast(b["text"], pa.string()),
                "lang": lang,
            }
        )

    return docs.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def dedup_against(new_docs, existing_docs, *, num_partitions: int | None = None):
    """Per-NEW-doc verdict: ``doc_id, dup_against`` (int8; 1 = the doc's
    cluster in the union pipeline contains an existing-side member).
    Survivor filtering is ``filter(dup_against == 0)`` + a semi-join back
    to the new corpus."""
    import pyarrow.compute as pc

    from ..functions.hashing import hash_columns_u64
    from ..stages.lsh import default_num_partitions
    from .flagship import dedup_pipeline

    P = num_partitions or default_num_partitions()

    pages = _tag_pages(existing_docs, _EXISTING).union(
        _tag_pages(new_docs, _NEW)
    )
    clusters = dedup_pipeline(pages).clusters

    def keyed(b: pa.Table) -> pa.Table:
        """Every clustered row -> (cluster-key hash pair, doc_id | -1,
        is_existing). Unclustered rows carry their OWN url as cluster_id
        (the flagship emits singletons, never nulls), so every new doc has
        exactly one row here; a null would mean an upstream contract break
        and is defensively folded to the row's own url."""
        cid = pc.coalesce(b["cluster_id"], b["url"])
        ct = pa.table({"c": cid})
        h1 = hash_columns_u64(ct, ["c"], seed=0)
        h2 = hash_columns_u64(ct, ["c"], seed=0x9E3779B9)
        is_a = pc.starts_with(b["url"], _EXISTING).to_numpy(
            zero_copy_only=False
        )
        ids = np.full(len(b), -1, np.int64)
        if (~is_a).any():
            new_ids = pc.cast(
                pc.utf8_slice_codeunits(
                    b.filter(pa.array(~is_a))["url"], len(_NEW)
                ),
                pa.int64(),
            ).to_numpy(zero_copy_only=False)
            ids[~is_a] = new_ids
        return pa.table(
            {
                "ch1": pa.array(h1.view(np.int64), pa.int64()),
                "ch2": pa.array(h2.view(np.int64), pa.int64()),
                "doc_id": pa.array(ids, pa.int64()),
                "is_a": pa.array(is_a.astype(np.int8), pa.int8()),
                "part": pa.array(
                    (h1 % np.uint64(P)).astype(np.int32), pa.int32()
                ),
            }
        )

    def verdict(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["part"])
        n = len(g)
        order = pc.sort_indices(
            g, sort_keys=[("ch1", "ascending"), ("ch2", "ascending")]
        )
        g = g.take(order)
        h1 = g["ch1"].to_numpy(zero_copy_only=False)
        h2 = g["ch2"].to_numpy(zero_copy_only=False)
        first = np.ones(n, bool)
        if n:
            first[1:] = (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1])
        starts = np.flatnonzero(first)
        seg = np.cumsum(first) - 1
        is_a = g["is_a"].to_numpy(zero_copy_only=False)
        has_a = (
            np.maximum.reduceat(is_a, starts)
            if n
            else np.empty(0, np.int8)
        )
        ids = g["doc_id"].to_numpy(zero_copy_only=False)
        is_new = ids >= 0
        return pa.table(
            {
                "doc_id": pa.array(ids[is_new], pa.int64()),
                "dup_against": pa.array(
                    has_a[seg][is_new].astype(np.int8), pa.int8()
                ),
            }
        )

    return (
        clusters.map_batches(keyed, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(verdict, batch_format="pyarrow")
    )
