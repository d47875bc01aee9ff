"""Directory-tree rollup + duplicate-directory detection — the reference's
headline feature, Ray-Data-first.

The reference (`src/deduplicatr/file.clj:~22-45`, `duplicates.clj:~10-60`,
approximate citations — reference mount empty at survey time; SURVEY.md §2
A1/D6) accumulates a ``DirSummary {bytes, hash, filecount}`` per directory,
where ``hash`` is the COMMUTATIVE SUM of descendant file content hashes —
order- and name-independent, so two dirs are duplicates iff they hold the
same multiset of file contents — then flattens files+dirs into one sequence,
groups by (hash, filecount, bytes), and prunes children of already-reported
duplicate dirs.

Ray-Data expression (no recursive tree walk, no driver state):

1. **Expand**: each file row fans out to its ancestor paths (depth 1..L —
   a bounded, vectorized ``map_batches`` projection; L is the hierarchy
   depth, a small constant).
2. **Partial rollup inside the same batch**: paths repeat heavily within a
   block, so each batch pre-aggregates (filecount, n_bytes, hash_sum) per
   path BEFORE the shuffle — the all-to-all carries O(distinct paths per
   block), not O(rows x depth).
3. **One hash-partitioned shuffle on path** + a vectorized final rollup
   per partition (Arrow sort + ``np.add.reduceat`` segment sums — the
   engine's standard block-kernel pattern, see ``stages/lsh.py``).
4. **Dup grouping**: partition by ``hash_sum`` and group on
   (hash_sum, filecount, n_bytes); nested pruning drops members with a
   duplicate ancestor via a broadcast of the (small) dup-path set.

Hash sums are uint64 and wrap mod 2^64 (numpy's native uint64 overflow) —
deterministic and commutative, and SQL-reproducible as
``sum(CAST(h AS HUGEINT)) % 2^64`` over DuckDB's ``md5_number_lower``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_SUMMARY_SCHEMA = {
    "path": pa.string(),
    "depth": pa.int64(),
    "filecount": pa.int64(),
    "n_bytes": pa.int64(),
    "hash_sum": pa.uint64(),
}


def _empty_summary() -> pa.Table:
    return pa.table({k: pa.array([], t) for k, t in _SUMMARY_SCHEMA.items()})


DOC_LEVELS = ["source", "lang", "bucket", "name"]  # bucket = doc_id % 10


def documents_to_file_table(ds, *, mirror_source: str | None = None):
    """documents-schema Dataset → one 'file' row per doc with the
    ``DOC_LEVELS`` hierarchy columns, ``hash64`` (uint64 content hash
    matching DuckDB ``md5_number_lower``: digest bytes 8..16
    little-endian) and ``n_bytes`` (``n_chars``, or utf8 length when the
    column is absent). The oracle-critical conventions live ONLY here —
    both `__ray_entry__` and the CLI import this mapping.

    ``mirror_source``: deterministically re-emit that source's rows under
    ``<source>_copy`` (a duplicated subtree, for exercising the dup-group/
    prune path on corpora with no duplicate texts)."""
    import hashlib

    import pyarrow.compute as pc

    def prep(b: pa.Table) -> pa.Table:
        # NULL text = empty doc (same guard as the rest of the engine)
        h = np.fromiter(
            (
                int.from_bytes(
                    hashlib.md5((t or "").encode()).digest()[8:16], "little"
                )
                for t in b["text"].to_pylist()
            ),
            np.uint64,
            len(b),
        )
        bucket = b["doc_id"].to_numpy(zero_copy_only=False) % np.int64(10)
        # REAL byte length (utf8_length counts codepoints — mislabeled
        # 'bytes' on non-ASCII text); n_chars fallback only when the text
        # column is absent. Nulls count as 0 bytes.
        nb = pc.fill_null(
            pc.binary_length(b["text"])
            if "text" in b.column_names
            else b["n_chars"],
            0,
        )
        t = pa.table(
            {
                "source": pc.cast(b["source"], pa.string()),
                "lang": pc.cast(b["lang"], pa.string()),
                "bucket": pc.cast(pa.array(bucket, pa.int64()), pa.string()),
                "name": pc.cast(b["doc_id"], pa.string()),
                "hash64": pa.array(h, pa.uint64()),
                "n_bytes": pc.cast(nb, pa.int64()),
            }
        )
        if mirror_source is not None:
            mask = pc.equal(t["source"], mirror_source)
            copy = t.filter(mask)
            copy = copy.set_column(
                0,
                "source",
                pa.array([f"{mirror_source}_copy"] * len(copy), pa.string()),
            )
            t = pa.concat_tables([t, copy])
        return t

    return ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)


def _rollup_table(t: pa.Table) -> pa.Table:
    """Aggregate (filecount, n_bytes, hash_sum) per (path, depth).

    One Arrow sort + ``np.add.reduceat`` segment sums; uint64 hash sums
    wrap mod 2^64. Used both as the per-batch partial combiner and as the
    per-partition final rollup (the aggregation is associative +
    commutative, the reference's own requirement for its dir-hash sum).
    """
    import pyarrow.compute as pc

    n = len(t)
    if n == 0:
        return _empty_summary()
    order = pc.sort_indices(t, sort_keys=[("path", "ascending")])
    t = t.take(order)
    path = t["path"].combine_chunks()
    # segment starts: first row of each distinct path
    neq = pc.not_equal(path.slice(1), path.slice(0, n - 1))
    starts = np.concatenate(
        ([0], np.flatnonzero(neq.to_numpy(zero_copy_only=False)) + 1)
    )
    fc = t["filecount"].to_numpy(zero_copy_only=False).astype(np.int64)
    nb = t["n_bytes"].to_numpy(zero_copy_only=False).astype(np.int64)
    hs = t["hash_sum"].to_numpy(zero_copy_only=False).astype(np.uint64)
    return pa.table(
        {
            "path": path.take(pa.array(starts, pa.int64())),
            "depth": t["depth"].take(pa.array(starts, pa.int64())),
            "filecount": pa.array(np.add.reduceat(fc, starts), pa.int64()),
            "n_bytes": pa.array(np.add.reduceat(nb, starts), pa.int64()),
            "hash_sum": pa.array(np.add.reduceat(hs, starts), pa.uint64()),
        }
    )


def dir_rollup(
    ds,
    levels: list[str],
    *,
    hash_col: str = "hash64",
    bytes_col: str = "n_bytes",
    num_partitions: int | None = None,
):
    """Roll a flat file table up its directory hierarchy.

    ``ds`` has one row per file with string hierarchy columns ``levels``
    (outermost first; the LAST level is the file's own name, so depth
    ``len(levels)`` rows are the files themselves, mirroring the
    reference's flattened files+dirs sequence), a uint64 content-hash
    column ``hash_col`` and an int64 size column ``bytes_col``.

    Returns a Dataset of ``path, depth, filecount, n_bytes, hash_sum``
    with one row per directory/file node. ``hash_sum`` is the commutative
    mod-2^64 sum of descendant file hashes (= the file's own hash at leaf
    depth).
    """
    import pyarrow.compute as pc

    from ..functions.hashing import add_hash_part
    from .lsh import default_num_partitions

    P = num_partitions or default_num_partitions()
    L = len(levels)

    def expand_partial(b: pa.Table) -> pa.Table:
        n = len(b)
        if n == 0:
            return _empty_summary()
        # '/' IS the path separator, so a level VALUE containing '/'
        # (e.g. source='github.com/foo') would collide with a deeper
        # node's joined path and silently merge two distinct directories
        # (summed filecount/hash_sum — corrupted dup groups). Escape it;
        # the SQL oracles apply the same replace() so parity holds.
        cols = [
            pc.replace_substring(pc.cast(b[c], pa.string()), "/", "%2F")
            for c in levels
        ]
        h = b[hash_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        nb = b[bytes_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ones = np.ones(n, np.int64)
        parts = []
        for d in range(1, L + 1):
            path = (
                cols[0]
                if d == 1
                else pc.binary_join_element_wise(*cols[:d], "/")
            )
            parts.append(
                pa.table(
                    {
                        "path": path,
                        "depth": pa.array(np.full(n, d, np.int64)),
                        "filecount": pa.array(ones, pa.int64()),
                        "n_bytes": pa.array(nb, pa.int64()),
                        "hash_sum": pa.array(h, pa.uint64()),
                    }
                )
            )
        # partial combine per batch: the shuffle ships distinct paths only
        return _rollup_table(pa.concat_tables(parts))

    def with_part(b: pa.Table) -> pa.Table:
        return add_hash_part(b, ["path"], P)

    def final(g: pa.Table) -> pa.Table:
        return _rollup_table(g.drop_columns(["part"]))

    return (
        ds.map_batches(expand_partial, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(with_part, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(final, batch_format="pyarrow")
    )


def _dup_members(g: pa.Table) -> pa.Table:
    """Within one hash_sum partition: keep nodes whose
    (hash_sum, filecount, n_bytes) key has >= 2 members; attach n_dups."""
    import pyarrow.compute as pc

    n = len(g)
    empty = _empty_summary().append_column("n_dups", pa.array([], pa.int64()))
    if n == 0:
        return empty
    order = pc.sort_indices(
        g,
        sort_keys=[
            ("hash_sum", "ascending"),
            ("filecount", "ascending"),
            ("n_bytes", "ascending"),
            ("path", "ascending"),
        ],
    )
    g = g.take(order)
    hs = g["hash_sum"].to_numpy(zero_copy_only=False).astype(np.uint64)
    fc = g["filecount"].to_numpy(zero_copy_only=False)
    nb = g["n_bytes"].to_numpy(zero_copy_only=False)
    new = np.empty(n, np.bool_)
    new[0] = True
    new[1:] = (hs[1:] != hs[:-1]) | (fc[1:] != fc[:-1]) | (nb[1:] != nb[:-1])
    gid = np.cumsum(new) - 1
    sizes = np.bincount(gid)
    keep = sizes[gid] >= 2
    if not keep.any():
        return empty
    kept = g.filter(pa.array(keep))
    return kept.append_column(
        "n_dups", pa.array(sizes[gid][keep].astype(np.int64), pa.int64())
    )


def dir_dup_groups(
    summaries,
    *,
    leaf_depth: int,
    prune_nested: bool = True,
    num_partitions: int | None = None,
):
    """Duplicate nodes from a ``dir_rollup`` summary table.

    Groups nodes by (hash_sum, filecount, n_bytes) — the reference's
    duplicate key (`duplicates.clj:~10-50`) — and keeps groups with >= 2
    members. With ``prune_nested`` (reference D6), members that sit INSIDE
    a duplicate directory are dropped (their duplication is already
    reported at the ancestor), and groups reduced below 2 members vanish;
    the dup-path set is small (it shrinks with dedup quality), so it is
    collected once and broadcast via ``ray.put`` rather than shuffled.

    Output: one row per surviving member — ``path, depth, filecount,
    n_bytes, hash_sum, n_dups`` (n_dups = surviving group size; groups are
    re-counted after pruning).

    Note the reference quirk this preserves: a directory holding exactly
    one file has the same (hash, filecount, bytes) key as the file itself —
    same content multiset — so chains like ``s/l/b/f`` self-group; pruning
    then collapses the chain to its outermost member, which the recount
    drops when nothing else matches.
    """
    import ray

    from ..functions.hashing import add_hash_part
    from .lsh import default_num_partitions

    P = num_partitions or default_num_partitions()

    def with_part(b: pa.Table) -> pa.Table:
        return add_hash_part(b, ["hash_sum"], P)

    def block(g: pa.Table) -> pa.Table:
        return _dup_members(g.drop_columns(["part"]))

    dups = (
        summaries.map_batches(with_part, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(block, batch_format="pyarrow")
    )
    if not prune_nested:
        return dups

    dups = dups.materialize()
    # dup DIRECTORY paths only (depth < leaf_depth; a file leaf can't
    # contain other nodes). This set is small — dup dirs shrink with corpus
    # quality — so collect once + broadcast via ray.put, don't shuffle.
    dir_paths = [
        p
        for b in dups.iter_batches(batch_format="pyarrow", batch_size=65536)
        for p, d in zip(b["path"].to_pylist(), b["depth"].to_pylist())
        if d < leaf_depth
    ]
    dup_dir_ref = ray.put(frozenset(dir_paths))

    def prune(b: pa.Table, *, ref=dup_dir_ref) -> pa.Table:
        dup_dirs = ref if isinstance(ref, frozenset) else ray.get(ref)
        if len(b) == 0 or not dup_dirs:
            return b
        paths = b["path"].to_pylist()
        keep = np.ones(len(b), np.bool_)
        for i, p in enumerate(paths):
            segs = p.split("/")
            for d in range(1, len(segs)):
                if "/".join(segs[:d]) in dup_dirs:
                    keep[i] = False
                    break
        return b.filter(pa.array(keep))

    pruned = dups.map_batches(prune, batch_format="pyarrow", zero_copy_batch=True)

    # re-check group sizes after pruning (a group can fall below 2)
    def recheck(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["part", "n_dups"])
        return _dup_members(g)

    out = (
        pruned.map_batches(with_part, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(recheck, batch_format="pyarrow")
    )
    # an all-empty groupby result drops its schema; the dup set is small
    # (already materialized above), so pin the schema explicitly
    out = out.materialize()
    if out.count() == 0:
        import ray.data as rd

        return rd.from_arrow(
            _empty_summary().append_column("n_dups", pa.array([], pa.int64()))
        )
    return out
