"""Paragraph-level exact deduplication (MassiveText / Gopher, Rae et al.
2021; also RefinedWeb's line-level pass): split every document on a
delimiter and keep only the FIRST corpus-wide occurrence of each paragraph,
ordered by ``(doc_id, para_idx)``. Subsequent occurrences are removed from
their documents; paragraphs shorter than ``min_chars`` are never dedup
candidates (boilerplate guard — the published pipelines exempt short lines).

The reference CLI (whole-file dedup) has no sub-document operator; this is
the sub-document analog of its D1 exact-dup group, expressed with the
engine's standard shapes (the ``window_dedup_stage`` shuffle diet):

* the split + paragraph hash is row-local ``map_batches`` (one Arrow
  ``split_pattern`` per batch, no per-paragraph Python);
* ONLY ``(ph1, ph2, order_key, plen)`` — 32 B per paragraph, never the
  text — enters the one hash-partitioned all-to-all; sub-``min_chars``
  paragraphs ride it under per-OCCURRENCE unique keys (each is its own
  single-member run, hence always kept) so every block has one schema and
  per-doc paragraph totals fall out of the same kernel;
* first-occurrence marking is a per-partition vectorized lexsort kernel
  that PRE-AGGREGATES per doc before the final combining ``groupby``, so
  the last exchange carries one row per (partition, doc), not per
  paragraph.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# order_key packs (doc_id, para_idx) into one sortable int64 so the
# first-occurrence rule (lexicographic min) is a single segment-min.
_PARA_BITS = 20
_PARA_CAP = 1 << _PARA_BITS


def _split_paras(batch: pa.Table, delimiter: str):
    """Shared split prologue: NULL-folded delimiter split + per-paragraph
    ``(flat strings, doc_idx, para_idx, plen, ids, order_key)`` arrays
    (all vectorized; raises on the order_key packing limits)."""
    import pyarrow.compute as pc

    n = len(batch)
    text = pc.coalesce(batch["text"], pa.scalar("", pa.string()))
    paras = pc.split_pattern(text, delimiter).combine_chunks()
    flat = paras.flatten()
    m = len(flat)
    offs = paras.offsets.to_numpy(zero_copy_only=False)
    counts = np.diff(offs)
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), counts)
    ids = (
        batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    )[doc_idx]
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    para_idx = np.arange(m, dtype=np.int64) - starts[doc_idx]
    if m and int(para_idx.max()) >= _PARA_CAP:
        raise ValueError(
            f"paragraph ops: doc with >= {_PARA_CAP} paragraphs "
            "(order_key packs para_idx into 20 bits; split coarser)"
        )
    if m and int(ids.max()) >= 1 << (63 - _PARA_BITS):
        raise ValueError("paragraph ops: doc_id must be < 2^43")
    plen = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(
        np.int64
    )
    order_key = (ids << _PARA_BITS) | para_idx
    return flat, doc_idx, para_idx, plen, ids, order_key


def paragraph_dedup(
    docs,
    *,
    delimiter: str = "\n",
    min_chars: int = 1,
    num_partitions: int | None = None,
):
    """Per-doc paragraph-dedup accounting: ``doc_id, n_paras, n_kept,
    kept_chars`` (kept = first corpus-wide occurrence, or shorter than
    ``min_chars``). ``docs`` needs ``doc_id`` (int64, < 2^43) and ``text``
    (NULL text = empty doc = one empty paragraph, matching SQL
    ``str_split(coalesce(text,''), d)``).

    SQL-oracle-expressible: ``oracle_sql()['paragraph_dedup']`` mirrors the
    split, the >= ``min_chars`` gate, and the ``row_number() OVER
    (PARTITION BY para ORDER BY doc_id, para_idx)`` keep-first rule.
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from ..functions.hashing import hash_columns_u64
    from .lsh import default_num_partitions

    P = num_partitions or default_num_partitions()

    def split(batch: pa.Table) -> pa.Table:
        flat, _doc_idx, _para_idx, plen, _ids, order_key = _split_paras(
            batch, delimiter
        )
        m = len(flat)
        is_cand = plen >= min_chars

        h1 = np.empty(m, np.uint64)
        h2 = np.empty(m, np.uint64)
        if is_cand.any():
            cand = pa.table({"p": flat.filter(pa.array(is_cand))})
            h1[is_cand] = hash_columns_u64(cand, ["p"], seed=0)
            h2[is_cand] = hash_columns_u64(cand, ["p"], seed=0x9E3779B9)
        # short paragraphs: per-OCCURRENCE unique key -> single-member run
        # -> always kept (never dedup candidates), one shared schema
        if (~is_cand).any():
            ok = order_key[~is_cand].astype(np.uint64)
            h1[~is_cand] = ok
            h2[~is_cand] = ok
        return pa.table(
            {
                "ph1": pa.array(h1.view(np.int64), pa.int64()),
                "ph2": pa.array(h2.view(np.int64), pa.int64()),
                "order_key": pa.array(order_key, pa.int64()),
                "plen": pa.array(plen, pa.int64()),
                "part": pa.array(
                    (h1 % np.uint64(P)).astype(np.int32), pa.int32()
                ),
            }
        )

    def mark_block(g: pa.Table) -> pa.Table:
        """One hash partition -> per-doc (n_paras, n_kept, kept_chars)
        partials (pre-aggregated; final groupby carries docs, not paras)."""
        g = g.drop_columns(["part"])
        n = len(g)
        order = pc.sort_indices(
            g,
            sort_keys=[
                ("ph1", "ascending"),
                ("ph2", "ascending"),
                ("order_key", "ascending"),
            ],
        )
        g = g.take(order)
        h1 = g["ph1"].to_numpy(zero_copy_only=False)
        h2 = g["ph2"].to_numpy(zero_copy_only=False)
        first = np.ones(n, bool)
        if n:
            first[1:] = (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1])
        doc = g["order_key"].to_numpy(zero_copy_only=False) >> _PARA_BITS
        plen = g["plen"].to_numpy(zero_copy_only=False)
        udoc, inv = np.unique(doc, return_inverse=True)
        # float64 bincount weights are exact below 2**53
        n_paras = np.bincount(inv, minlength=len(udoc)).astype(np.int64)
        kept = np.bincount(inv, weights=first).astype(np.int64)
        kept_chars = np.bincount(
            inv, weights=np.where(first, plen, 0)
        ).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(udoc, pa.int64()),
                "n_paras": pa.array(n_paras, pa.int64()),
                "n_kept": pa.array(kept, pa.int64()),
                "kept_chars": pa.array(kept_chars, pa.int64()),
            }
        )

    return (
        docs.map_batches(split, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(mark_block, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(
            Sum("n_paras", alias_name="n_paras"),
            Sum("n_kept", alias_name="n_kept"),
            Sum("kept_chars", alias_name="kept_chars"),
        )
    )


def _broadcast_key_budget() -> int:
    """Max removed-sliver ROWS a scrub will broadcast instead of shuffling
    document text (env ``GRAFT_SCRUB_BCAST_MAX``, default 5M). The per-row
    payload differs per tail — 8 B here (one order_key), 16 B for the
    window tail's (udd, packed) arrays, 24 B for the span tail's
    (doc_id, start, end) — so the default bounds the broadcast at
    40–120 MB in the object store, read zero-copy by every cut task."""
    import os

    return int(os.environ.get("GRAFT_SCRUB_BCAST_MAX", 5_000_000))


def _cut_removed(batch: pa.Table, rem: np.ndarray, delimiter: str) -> pa.Table:
    """Row-local cut kernel shared by both scrub tails: re-split ``batch``
    (doc_id, text), drop paragraphs whose order_key is in the SORTED
    ``rem`` array, re-join survivors with ``delimiter``."""
    import pyarrow.compute as pc

    n = len(batch)
    if n == 0:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "clean_text": pa.array([], pa.string()),
                "n_paras": pa.array([], pa.int64()),
                "n_removed": pa.array([], pa.int64()),
            }
        )
    flat, doc_idx, _para_idx, _plen, _ids, order_key = _split_paras(
        batch, delimiter
    )
    pos = np.searchsorted(rem, order_key)
    pos_c = np.minimum(pos, max(0, len(rem) - 1))
    hit = (rem[pos_c] == order_key) if len(rem) else np.zeros(
        len(order_key), bool
    )
    keep = ~hit
    kept_counts = np.bincount(doc_idx, weights=keep, minlength=n).astype(
        np.int64
    )
    n_paras = np.bincount(doc_idx, minlength=n).astype(np.int64)
    offsets = np.concatenate(([0], np.cumsum(kept_counts))).astype(np.int32)
    kept_list = pa.ListArray.from_arrays(
        pa.array(offsets, pa.int32()), flat.filter(pa.array(keep))
    )
    clean = pc.binary_join(kept_list, pa.scalar(delimiter, pa.string()))
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "clean_text": clean,
            "n_paras": pa.array(n_paras, pa.int64()),
            "n_removed": pa.array(n_paras - kept_counts, pa.int64()),
        }
    )


def paragraph_scrub(
    docs,
    *,
    delimiter: str = "\n",
    min_chars: int = 1,
    num_partitions: int | None = None,
    broadcast_budget: int | None = None,
):
    """The APPLY companion of :func:`paragraph_dedup` (MassiveText actually
    rewrites each doc minus its duplicated paragraphs): per doc,
    ``doc_id, clean_text, n_paras, n_removed`` where ``clean_text`` is the
    original paragraphs minus every non-first corpus-wide occurrence of a
    >= ``min_chars`` paragraph, re-joined with ``delimiter`` in original
    order.

    The ``window_scrub_stage`` route->mark->cut shape, so the all-to-all
    never carries text:

    1. the candidate-key shuffle of ``paragraph_dedup``, emitting ONLY the
       REMOVED ``(doc_id, para_idx)`` rows — the duplicated sliver
       (materialized; small by definition);
    2. the cut. When the sliver is within ``broadcast_budget`` keys
       (default :func:`_broadcast_key_budget`), its SORTED order_key array
       is broadcast once via ``ray.put`` and the cut is a single row-local
       ``map_batches`` over the docs — document text never enters an
       all-to-all. Past the budget (pathological dup rates), fall back to
       a union-tag partition join on ``hash(doc_id)``: docs re-split
       locally, flagged paragraphs drop via one ``searchsorted`` against
       the partition's removed keys, and the survivors re-join with one
       Arrow ``binary_join`` per block.

    Both tails share the :func:`_cut_removed` kernel and produce identical
    output (equivalence pytest-gated). SQL-oracle-expressible
    (``string_agg`` over keep-first rows ordered by para_idx —
    ``oracle_sql()['paragraph_scrub']``).
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum  # noqa: F401  (parity with dedup)

    from ..functions.hashing import hash_columns_u64
    from .lsh import default_num_partitions

    P = num_partitions or default_num_partitions()

    def split(batch: pa.Table):
        flat, _doc_idx, para_idx, plen, ids, order_key = _split_paras(
            batch, delimiter
        )
        is_cand = plen >= min_chars
        if not is_cand.any():
            return
        cand = pa.table({"p": flat.filter(pa.array(is_cand))})
        h1 = hash_columns_u64(cand, ["p"], seed=0)
        h2 = hash_columns_u64(cand, ["p"], seed=0x9E3779B9)
        yield pa.table(
            {
                "ph1": pa.array(h1.view(np.int64), pa.int64()),
                "ph2": pa.array(h2.view(np.int64), pa.int64()),
                "order_key": pa.array(order_key[is_cand], pa.int64()),
                "part": pa.array(
                    (h1 % np.uint64(P)).astype(np.int32), pa.int32()
                ),
            }
        )

    def removed_block(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["part"])
        n = len(g)
        order = pc.sort_indices(
            g,
            sort_keys=[
                ("ph1", "ascending"),
                ("ph2", "ascending"),
                ("order_key", "ascending"),
            ],
        )
        g = g.take(order)
        h1 = g["ph1"].to_numpy(zero_copy_only=False)
        h2 = g["ph2"].to_numpy(zero_copy_only=False)
        first = np.ones(n, bool)
        if n:
            first[1:] = (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1])
        return pa.table({"order_key": g["order_key"].filter(pa.array(~first))})

    removed = (
        docs.map_batches(split, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(removed_block, batch_format="pyarrow")
        .materialize()  # the duplicated sliver; its shuffle completes first
    )

    import ray

    budget = (
        broadcast_budget
        if broadcast_budget is not None
        else _broadcast_key_budget()
    )
    if removed.count() <= budget:
        # broadcast tail: one sorted key array in the object store, cut is
        # row-local — document text never rides an all-to-all
        from .relational import pull_columns

        (keys,) = pull_columns(removed, ["order_key"])
        rem_ref = ray.put(np.sort(keys.astype(np.int64)))

        def cut_broadcast(batch: pa.Table) -> pa.Table:
            return _cut_removed(batch, ray.get(rem_ref), delimiter)

        return docs.map_batches(
            cut_broadcast, batch_format="pyarrow", zero_copy_batch=True
        )

    def tag_docs(b: pa.Table) -> pa.Table:
        h = hash_columns_u64(b, ["doc_id"], seed=7)
        n = len(b)
        return pa.table(
            {
                "part": pa.array(
                    (h % np.uint64(P)).astype(np.int32), pa.int32()
                ),
                "doc_id": b["doc_id"],
                "order_key": pa.array(np.full(n, -1, np.int64), pa.int64()),
                "text": b["text"],
            }
        )

    def tag_removed(b: pa.Table):
        if len(b) == 0:
            return
        ids = (
            b["order_key"].to_numpy(zero_copy_only=False) >> _PARA_BITS
        )
        keyed = pa.table({"doc_id": pa.array(ids, pa.int64())})
        h = hash_columns_u64(keyed, ["doc_id"], seed=7)
        yield pa.table(
            {
                "part": pa.array(
                    (h % np.uint64(P)).astype(np.int32), pa.int32()
                ),
                "doc_id": pa.array(ids, pa.int64()),
                "order_key": b["order_key"],
                "text": pa.nulls(len(b), pa.string()),
            }
        )

    def rebuild(grp: pa.Table) -> pa.Table:
        is_doc = pc.equal(grp["order_key"], -1)
        docs_t = grp.filter(is_doc)
        rem = np.sort(
            grp.filter(pc.invert(is_doc))["order_key"].to_numpy(
                zero_copy_only=False
            )
        )
        batch = pa.table({"doc_id": docs_t["doc_id"], "text": docs_t["text"]})
        return _cut_removed(batch, rem, delimiter)

    tagged = docs.map_batches(
        tag_docs, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        removed.map_batches(
            tag_removed, batch_format="pyarrow", zero_copy_batch=True
        )
    )
    return tagged.groupby("part").map_groups(rebuild, batch_format="pyarrow")
