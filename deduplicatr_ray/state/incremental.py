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

import os

import numpy as np
import pyarrow as pa
import ray


def _atomic_parquet(tbl: pa.Table, path: str) -> None:
    import pyarrow.parquet as pq

    tmp = path + ".tmp"
    pq.write_table(tbl, tmp)
    os.replace(tmp, path)  # atomic on POSIX


@ray.remote
class DedupIndexShard:
    """One content-hash range of the incremental exact-dup index:
    digest → canonical doc id (int64), first write wins.

    ``spill_file``: restore the shard's state from a prior ``spill()``
    snapshot at construction (the restart path)."""

    def __init__(self, spill_file: str | None = None) -> None:
        self._idx: dict[bytes, int] = {}
        if spill_file and os.path.exists(spill_file):
            import pyarrow.parquet as pq

            t = pq.read_table(spill_file)
            self._idx = dict(
                zip(t["digest"].to_pylist(), t["canonical_id"].to_pylist())
            )

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

    def spill(self, spill_file: str) -> int:
        """Compacting snapshot to Parquet (atomic tmp+rename). Entries are
        immutable once written (first arrival wins), so a snapshot is the
        full compaction of the shard's history; returns keys written."""
        _atomic_parquet(
            pa.table(
                {
                    "digest": pa.array(list(self._idx.keys()), pa.binary(16)),
                    "canonical_id": pa.array(
                        list(self._idx.values()), pa.int64()
                    ),
                }
            ),
            spill_file,
        )
        return len(self._idx)

    def size(self) -> int:
        return len(self._idx)


def _digest_stage(docs, *, id_col: str, text_col: str):
    """Distributed hashing: (id, md5 digest bytes) — the only heavy work."""
    import hashlib

    def fn(b: pa.Table) -> pa.Table:
        # NULL text = empty doc (same guard as ingest_near's to_pages);
        # crawl parquet dumps routinely carry nulls in the text column
        digs = [
            hashlib.md5((t or "").encode()).digest()
            for t in b[text_col].to_pylist()
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


@ray.remote
class NearIndexShard:
    """One band-key range of the incremental NEAR-dup index:
    key (uint64 band-or-exact hash) -> (canonical doc id, packed b-bit
    sketch). First write wins. The sketch is stored inline per key so a
    probe is ONE round trip; at 10^9+ canonicals normalize it into a
    doc-id-sharded sketch layer instead (second hop, 36x less memory) —
    documented trade, same protocol."""

    def __init__(self, spill_file: str | None = None) -> None:
        self._idx: dict[int, tuple[int, bytes]] = {}
        if spill_file and os.path.exists(spill_file):
            import pyarrow.parquet as pq

            t = pq.read_table(spill_file)
            self._idx = {
                k: (i, s)
                for k, i, s in zip(
                    t["key"].to_pylist(),
                    t["canonical_id"].to_pylist(),
                    t["sketch"].to_pylist(),
                )
            }

    def probe(self, keys: list[int]) -> list:
        """(canonical id, sketch bytes) per key, or None if unseen."""
        idx = self._idx
        return [idx.get(k) for k in keys]

    def claim(self, keys: list[int], ids: list[int], sketches: list[bytes]) -> None:
        """Register canonical claims; existing entries win (first arrival)."""
        idx = self._idx
        for k, i, s in zip(keys, ids, sketches):
            if k not in idx:
                idx[k] = (i, s)

    def spill(self, spill_file: str) -> int:
        """Compacting snapshot to Parquet (atomic tmp+rename); see
        ``DedupIndexShard.spill``. Returns keys written."""
        keys = list(self._idx.keys())
        _atomic_parquet(
            pa.table(
                {
                    "key": pa.array(keys, pa.uint64()),
                    "canonical_id": pa.array(
                        [self._idx[k][0] for k in keys], pa.int64()
                    ),
                    "sketch": pa.array(
                        [self._idx[k][1] for k in keys], pa.binary()
                    ),
                }
            ),
            spill_file,
        )
        return len(keys)

    def size(self) -> int:
        return len(self._idx)


_NEAR_POLY = np.uint64(0x9E3779B97F4A7C15)
_EXACT_MIX = np.uint64(0xD6E8FEB86659FD93)


def _doc_keys(band_hashes: np.ndarray, sha64: np.ndarray, n_shingles: np.ndarray):
    """Per-doc uint64 probe keys: one per LSH band (band_id mixed in, so
    equal hashes in different bands never collide) for docs with shingles,
    plus one exact content key for every doc."""
    from ..functions.hashing import splitmix64

    n, bands = band_hashes.shape
    with np.errstate(over="ignore"):
        bmix = splitmix64(
            band_hashes ^ (np.arange(bands, dtype=np.uint64)[None, :] * _NEAR_POLY)
        )
        ekey = splitmix64(sha64 ^ _EXACT_MIX)
    return bmix, ekey


def incremental_near_assign(
    docs,
    *,
    cfg=None,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_shards: int = 8,
    batch_size: int = 4096,
) -> pa.Table:
    """Fresh shard set + one ingest round (see ``ingest_near``)."""
    shards = [NearIndexShard.remote() for _ in range(num_shards)]
    return ingest_near(
        docs,
        shards,
        cfg=cfg,
        id_col=id_col,
        text_col=text_col,
        batch_size=batch_size,
    )


def ingest_near(
    docs,
    shards: list,
    *,
    cfg=None,
    id_col: str = "doc_id",
    text_col: str = "text",
    batch_size: int = 4096,
) -> pa.Table:
    """Streaming-ingest NEAR-dup assignment against a persistent sharded
    band index (the online analog of the flagship's batch clustering).

    Every arriving doc probes its 32 LSH band keys + exact content key
    against the index; candidates are verified LOCALLY with the packed
    b-bit sketch (bias-corrected Jaccard >= tau - margin, exactly the
    flagship's verifier); a verified doc is ASSIGNED to the minimum
    verified canonical id, otherwise it becomes a new canonical and claims
    its keys (first arrival wins — continuous-crawl drop-if-dup
    semantics). This is assignment, NOT re-clustering: earlier canonicals
    are never merged retroactively; the batch flagship is the offline
    full-clustering pass. SimHash blocking is intentionally absent here
    (its 16-bit key alphabet floods a persistent index; MinHash + exact
    are the online signals).

    The HEAVY work (signatures) stays a distributed ``map_batches`` actor
    stage; only the thin (id, 32 keys, 64 B sketch) stream routes through
    the index actors. Docs are fed in id order (same contract and
    monotonicity guard as exact ``ingest(ordered=True)``), so assignment
    is deterministic; in-batch dups are resolved against a batch-local
    claims dict BEFORE remote claiming, so two near-dups arriving in one
    batch still co-cluster.
    """
    from ..config import CANONICAL
    from ..stages.signatures import sketch_eq_mean, signature_stage
    from ..stages.lsh import _sha64_of

    cfg = cfg or CANONICAL
    S = len(shards)
    tau = cfg.jaccard_threshold - cfg.verify_margin
    c = 1.0 / (1 << cfg.bbit_bits)
    W = cfg.sketch_width

    def to_pages(b: pa.Table) -> pa.Table:
        import hashlib

        texts = [t if t is not None else "" for t in b[text_col].to_pylist()]
        return pa.table(
            {
                # bias by 2^63 so the zero-padded string sort IS numeric
                # id order for the FULL int64 range (plain f"{i:020d}"
                # sorts negative ids in reverse and trips the downstream
                # monotonicity guard)
                "url": pa.array(
                    [
                        f"{i + (1 << 63):020d}"
                        for i in b[id_col].to_pylist()
                    ],
                    pa.string(),
                ),
                "text": pa.array(texts, pa.large_string()),
                "text_sha1": pa.array(
                    [hashlib.sha1(t.encode()).digest() for t in texts],
                    pa.binary(20),
                ),
            }
        )

    sigs = signature_stage(
        docs.map_batches(to_pages, batch_format="pyarrow", zero_copy_batch=True),
        cfg,
        batch_size=256,
        concurrency=(1, 4),
        keep_minhash=False,
    ).sort("url")  # id order; url is str(doc_id) — re-sorted numerically below

    def best_verified(my: np.ndarray, cands: dict[int, bytes]) -> int | None:
        """Min candidate id whose sketch passes the est cut — ONE
        vectorized sketch_eq_mean over the doc's unique candidates
        instead of a per-candidate (1, W) call (code-review finding:
        up to bands scalar round trips per doc on the online hot path)."""
        cid = np.fromiter(cands.keys(), np.int64, len(cands))
        mat = np.frombuffer(b"".join(cands.values()), np.uint8).reshape(
            len(cands), W
        )
        eq = sketch_eq_mean(np.broadcast_to(my, mat.shape), mat, cfg)
        ok = (eq - c) / (1.0 - c) >= tau
        return int(cid[ok].min()) if ok.any() else None

    id_parts: list[np.ndarray] = []
    canon_parts: list[np.ndarray] = []
    last_id = None
    for b in sigs.iter_batches(batch_format="pyarrow", batch_size=batch_size):
        n = len(b)
        if n == 0:
            continue
        ids = np.array(
            [int(u) - (1 << 63) for u in b["url"].to_pylist()], np.int64
        )
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        if last_id is not None and ids[0] < last_id:
            raise RuntimeError("ingest_near: stream arrived out of id order")
        last_id = ids[-1]
        take = pa.array(order, pa.int64())
        bh = (
            b["band_hashes"].take(take).combine_chunks().flatten()
            .to_numpy(zero_copy_only=False).reshape(n, cfg.bands)
        )
        sk = (
            b["sig8"].take(take).combine_chunks().flatten()
            .to_numpy(zero_copy_only=False).reshape(n, W)
        )
        nsh = b["n_shingles"].take(take).to_numpy(zero_copy_only=False)
        sha64 = _sha64_of(b["text_sha1"].take(take).combine_chunks(), n)
        bkeys, ekeys = _doc_keys(bh, sha64, nsh)

        # ---- phase A: one probe round trip over all unique keys ----
        all_keys = np.concatenate([ekeys, bkeys[nsh > 0].reshape(-1)])
        uniq = np.unique(all_keys)
        found: dict[int, tuple[int, bytes]] = {}
        futs = []
        for s in range(S):
            ks = uniq[uniq % np.uint64(S) == s].tolist()
            if ks:
                futs.append((ks, shards[s].probe.remote(ks)))
        for ks, fut in futs:
            for k, hit in zip(ks, ray.get(fut)):
                if hit is not None:
                    found[k] = hit
        # ---- local pass in id order: exact > minhash verify > new ----
        local: dict[int, tuple[int, bytes]] = {}
        canon = np.empty(n, np.int64)
        claim_keys: list[int] = []
        claim_ids: list[int] = []
        claim_sk: list[bytes] = []
        for i in range(n):
            ek = int(ekeys[i])
            hit = found.get(ek) or local.get(ek)
            if hit is not None:
                canon[i] = hit[0]
                continue
            best = None
            if nsh[i] > 0:
                cands: dict[int, bytes] = {}
                for k in bkeys[i].tolist():
                    cand = found.get(k) or local.get(k)
                    if cand is not None:
                        cands.setdefault(cand[0], cand[1])
                if cands:
                    best = best_verified(sk[i], cands)
            if best is not None:
                canon[i] = best
                continue
            # new canonical: claim exact + band keys (batch-locally first)
            canon[i] = ids[i]
            payload = (int(ids[i]), sk[i].tobytes())
            new_keys = [ek]
            local.setdefault(ek, payload)
            if nsh[i] > 0:
                for k in bkeys[i].tolist():
                    local.setdefault(k, payload)
                    new_keys.append(k)
            claim_keys.extend(new_keys)
            claim_ids.extend([payload[0]] * len(new_keys))
            claim_sk.extend([payload[1]] * len(new_keys))
        # ---- phase B: register new canonicals (first write wins) ----
        ck = np.asarray(claim_keys, np.uint64)
        done = []
        for s in range(S):
            mask = ck % np.uint64(S) == s
            if mask.any():
                idxs = np.flatnonzero(mask)
                done.append(
                    shards[s].claim.remote(
                        [claim_keys[j] for j in idxs],
                        [claim_ids[j] for j in idxs],
                        [claim_sk[j] for j in idxs],
                    )
                )
        ray.get(done)
        id_parts.append(ids)
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


def spill_index(
    shards: list,
    checkpoint_dir: str,
    *,
    run_id: str = "index0",
    stage: str = "index",
    cfg=None,
) -> dict:
    """Spill every shard's state to ``checkpoint_dir/run_id/stage/shard_i
    .parquet`` with a ``_lineage.json`` manifest entry (reusing the S4
    checkpoint machinery) — the growth/restart story for the otherwise
    unboundedly-growing index actors: snapshot between ingest rounds, kill
    the actors (or lose the node), ``restore_index`` resumes with identical
    first-arrival state. Each shard writes atomically and records its own
    manifest key, so re-running after a crash mid-spill re-spills ONLY the
    missing shards. Consequently a ``(run_id, stage)`` snapshot id is
    immutable once begun — to snapshot again after further ingest, use a
    fresh ``stage``/``run_id`` (recorded shards would otherwise be skipped,
    not refreshed).

    On a multi-node cluster point ``checkpoint_dir`` at shared storage —
    each shard actor writes from whatever node hosts it.
    """
    from ..config import CANONICAL
    from ..pipelines.checkpoint import CheckpointManager

    mgr = CheckpointManager(checkpoint_dir, run_id, cfg or CANONICAL)
    out_dir = mgr.stage_dir(stage)
    os.makedirs(out_dir, exist_ok=True)
    total = 0
    futs = {}
    for i, s in enumerate(shards):
        # re-spill granularity: skip shards a previous (crashed) spill
        # already recorded, provided the file still exists (r3 advice —
        # the docstring promised this; now the code does it)
        path = os.path.join(out_dir, f"shard_{i}.parquet")
        prior = mgr.entry(f"{stage}/shard_{i}")
        if prior is not None and os.path.exists(path):
            total += int(prior.get("keys", 0))
            continue
        futs[s.spill.remote(path)] = i
    pending = list(futs)
    # record each shard's manifest entry AS ITS WRITE COMPLETES (ray.wait
    # loop, not one ray.get barrier) — otherwise a crash mid-spill leaves
    # zero manifest entries and the per-shard re-spill granularity above
    # never exists
    while pending:
        done, pending = ray.wait(pending, num_returns=1)
        i = futs[done[0]]
        n = int(ray.get(done[0]))
        mgr.record(f"{stage}/shard_{i}", keys=n)
        total += n
    mgr.record(stage, num_shards=len(shards), keys=total)
    return {"num_shards": len(shards), "keys": total, "dir": out_dir}


def restore_index(
    shard_cls,
    checkpoint_dir: str,
    *,
    run_id: str = "index0",
    stage: str = "index",
    cfg=None,
) -> list:
    """Spawn a fresh shard set restored from a ``spill_index`` snapshot.
    ``shard_cls`` is ``DedupIndexShard`` or ``NearIndexShard`` (the spill
    schema is per-class). Raises if the snapshot is absent/incomplete —
    a half-spilled index must not silently restart empty."""
    from ..config import CANONICAL
    from ..pipelines.checkpoint import CheckpointManager

    mgr = CheckpointManager(checkpoint_dir, run_id, cfg or CANONICAL)
    head = mgr.entry(stage)
    if head is None:
        raise FileNotFoundError(
            f"no completed index spill for stage {stage!r} under "
            f"{checkpoint_dir}/{run_id}"
        )
    out_dir = mgr.stage_dir(stage)
    shards = []
    for i in range(int(head["num_shards"])):
        if not mgr.is_done(f"{stage}/shard_{i}"):
            raise FileNotFoundError(f"index spill missing shard {i}")
        shards.append(
            shard_cls.remote(os.path.join(out_dir, f"shard_{i}.parquet"))
        )
    return shards
