"""Incremental (streaming-ingest) exact dedup against a shared mutable
index — continuous-crawl semantics: every arriving shard is deduplicated
against EVERYTHING seen before, and the first arrival of a content hash
becomes its canonical document.

This is the one shape the Dataset API genuinely cannot express (task
brief: "drop to raw Ray actors only where ... e.g. a shared mutable
index"): the index must persist ACROSS pipeline invocations and answer
point lookups with read-your-writes ordering. Design:

* The index is SHARDED across ``num_shards`` ``DedupIndexShard`` actors by
  content-hash range — each shard owns a disjoint key space, so shards
  never coordinate and lookups scale linearly with shard count (the same
  partitioning assumption as every shuffle in this engine, held as actor
  state instead of a transient exchange).
* The HEAVY work (content hashing) stays a distributed ``map_batches``
  stage; only the thin (id, digest) stream routes through the actors
  (~24 B/doc).
* Within a call, a shard resolves keys with a per-unique-key dict probe —
  that dict IS the state being offered (an in-memory KV), not a transform
  loop; batches pre-collapse duplicate keys with numpy first.

Ordering contract: Ray's streaming executor does NOT preserve block order
by default, so ``ingest(ordered=True)`` (the default) sorts the thin
(id, digest) stream by id before feeding — "first arrival" = min id,
deterministic and oracle-checkable, guarded by a monotonicity check. At
ingest scale use ``ordered=False`` (completion-order feed) or let map
tasks call the shard actors directly: grouping is unchanged, only WHICH
member is canonical varies.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray


@ray.remote
class DedupIndexShard:
    """One content-hash range of the incremental exact-dup index:
    digest → canonical doc id (int64), first write wins."""

    def __init__(self) -> None:
        self._idx: dict[bytes, int] = {}

    def assign(self, digests: list[bytes], ids: np.ndarray) -> np.ndarray:
        """Canonical id per digest; unseen digests are claimed by the FIRST
        occurrence in this call (callers send calls in arrival order)."""
        out = np.empty(len(digests), np.int64)
        idx = self._idx
        for i, (d, doc) in enumerate(zip(digests, ids.tolist())):
            got = idx.get(d)
            if got is None:
                idx[d] = got = doc
            out[i] = got
        return out

    def size(self) -> int:
        return len(self._idx)


def _digest_stage(docs, *, id_col: str, text_col: str):
    """Distributed hashing: (id, md5 digest bytes) — the only heavy work."""
    import hashlib

    def fn(b: pa.Table) -> pa.Table:
        digs = [
            hashlib.md5(t.encode()).digest() for t in b[text_col].to_pylist()
        ]
        return pa.table(
            {
                "doc_id": pa.array(
                    b[id_col].to_numpy(zero_copy_only=False).astype(np.int64),
                    pa.int64(),
                ),
                "digest": pa.array(digs, pa.binary(16)),
            }
        )

    return docs.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def incremental_exact_assign(
    docs,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_shards: int = 8,
    batch_size: int = 4096,
) -> pa.Table:
    """Stream ``docs`` in dataset order through the sharded index; return
    an Arrow table ``(doc_id, canonical_id)`` where ``canonical_id`` is the
    id of the FIRST-ARRIVED document with identical text.

    Equivalent to the batch groupby (canonical = min id; the ordered feed
    guarantees it) — the point is the mechanism: state persists in the
    shard actors, so subsequent calls against the same shards dedup new
    shards against all prior ingests (see ``tests/test_incremental.py``).
    """
    shards = [DedupIndexShard.remote() for _ in range(num_shards)]
    return ingest(
        docs, shards, id_col=id_col, text_col=text_col, batch_size=batch_size
    )


def ingest(
    docs,
    shards: list,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    batch_size: int = 4096,
    ordered: bool = True,
) -> pa.Table:
    """One ingest round against an EXISTING shard set (the continuous-crawl
    entry point: call repeatedly with new shards of data).

    ``ordered=True`` (the deterministic mode): the thin (id, digest) stream
    is sorted by id before feeding, so "first arrival" = min id regardless
    of which read/hash task finishes first. Ray's streaming executor does
    NOT preserve block order by default (``preserve_order=False``), so
    iterating the un-sorted stream would make canonicals depend on task
    completion order; the sort costs one exchange of 24 B/doc rows.
    ``ordered=False`` is the ingest-scale mode: completion-order feed, same
    GROUPING, nondeterministic choice of canonical within each group.
    """
    S = len(shards)
    hashed = _digest_stage(docs, id_col=id_col, text_col=text_col)
    if ordered:
        hashed = hashed.sort("doc_id")
    id_parts: list[np.ndarray] = []
    canon_parts: list[np.ndarray] = []
    last_id = None
    for b in hashed.iter_batches(batch_format="pyarrow", batch_size=batch_size):
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        if ordered and len(ids):
            # the deterministic contract stands on sorted iteration; fail
            # loudly if the executor ever yields post-sort blocks reordered
            if last_id is not None and ids[0] < last_id:
                raise RuntimeError(
                    "ingest(ordered=True): sorted stream arrived out of order"
                )
            last_id = ids[-1]
        digests = b["digest"].to_pylist()
        # collapse duplicate digests within the batch: each unique key is
        # probed ONCE; its first occurrence (min id under ordered=True,
        # since ids arrive ascending) claims the canonical slot
        packed = np.frombuffer(b"".join(digests), dtype="V16")
        uniq, first_idx, inverse = np.unique(
            packed, return_index=True, return_inverse=True
        )
        sub_all_ids = ids[first_idx]
        # route by the digest's leading byte range -> shard
        lead = uniq.view(np.uint8).reshape(-1, 16)[:, 0]
        shard_of = lead % np.uint8(S)
        futs = {}
        for s in range(S):
            mask = shard_of == s
            if not mask.any():
                continue
            sub_ids = sub_all_ids[mask]
            sub_digs = [digests[first_idx[i]] for i in np.flatnonzero(mask)]
            futs[s] = (mask, shards[s].assign.remote(sub_digs, sub_ids))
        canon_u = np.empty(len(uniq), np.int64)
        for s, (mask, fut) in futs.items():
            canon_u[mask] = ray.get(fut)
        canon = canon_u[inverse]
        id_parts.append(ids.astype(np.int64))
        canon_parts.append(canon)
    if not id_parts:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "canonical_id": pa.array([], pa.int64()),
            }
        )
    return pa.table(
        {
            "doc_id": pa.array(np.concatenate(id_parts), pa.int64()),
            "canonical_id": pa.array(np.concatenate(canon_parts), pa.int64()),
        }
    )
