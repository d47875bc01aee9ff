"""Exact dedup (A2/D1) — THE core reference operation.

The reference groups file/dir summaries by content hash and keeps groups with
count > 1 (``src/deduplicatr/duplicates.clj:~10-35``, approximate citation —
mount empty at survey time). Target: hash-partition shuffle on ``text_sha1``
(a crypto hash => uniform keys, no skew; SURVEY.md §7.4) + per-group pair
emission in star form: (min_url, other) for each other member — union-find
closes the transitive cluster, so O(m) rows instead of O(m^2) suffice.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_EMPTY = pa.table(
    {
        "url_a": pa.array([], pa.string()),
        "url_b": pa.array([], pa.string()),
        "jaccard_est": pa.array([], pa.float32()),
        "method": pa.array([], pa.string()),
        "ha": pa.array([], pa.uint64()),
        "hb": pa.array([], pa.uint64()),
    }
)


def exact_pairs_block(block: pa.Table) -> pa.Table:
    """WHOLE text_sha1 groups (hash-partitioned upstream) -> star pairs.

    Fully vectorized: one Arrow sort by (text_sha1, url), NumPy segment
    boundaries, then (min_url, member) edges via index math — no per-group
    Python calls, no O(m^2) (star + union-find closes the cluster).
    """
    n = len(block)
    if n < 2:
        return _EMPTY
    order = pc.sort_indices(
        block, sort_keys=[("text_sha1", "ascending"), ("url", "ascending")]
    )
    block = block.take(order)
    sha = block["text_sha1"].combine_chunks()
    same = pc.equal(sha.slice(1), sha.slice(0, n - 1)).to_numpy(
        zero_copy_only=False
    )
    starts = np.concatenate([[0], np.flatnonzero(~same) + 1])
    lens = np.diff(np.concatenate([starts, [n]]))
    seg = np.repeat(np.arange(len(starts)), lens)
    root = starts[seg]
    member = np.flatnonzero(np.arange(n) != root)  # non-first rows of m>=2 groups
    if len(member) == 0:
        return _EMPTY
    urls = block["url"]
    out = pa.table(
        {
            "url_a": urls.take(pa.array(root[member], pa.int64())),
            "url_b": urls.take(pa.array(member, pa.int64())),
            "jaccard_est": pa.array(
                np.ones(len(member), np.float32), pa.float32()
            ),
            "method": pa.array(["exact"] * len(member), pa.string()),
        }
    )
    return _append_edge_hashes(out)


def _append_edge_hashes(pairs: pa.Table) -> pa.Table:
    """ha/hb uint64 endpoint hashes, appended at emission (post-shuffle, so
    free to ship) — lets the driver components pull ONLY 16 B/edge."""
    from ..functions.hashing import hash_columns_u64

    return pairs.append_column(
        "ha", pa.array(hash_columns_u64(pairs, ["url_a"]), pa.uint64())
    ).append_column("hb", pa.array(hash_columns_u64(pairs, ["url_b"]), pa.uint64()))


def exact_pairs_group(group: pa.Table) -> pa.Table:
    """One text_sha1 group -> star pairs (unit-test seam)."""
    return exact_pairs_block(group)


def exact_pairs_stage(signatures, *, num_partitions: int | None = None):
    """Dataset with (url, text_sha1) -> exact-dup PAIRS (SHUFFLE #3).

    Hash-partition on text_sha1 (crypto hash => uniform, no skew) + one
    vectorized ``exact_pairs_block`` call per partition.
    """
    from ..functions.hashing import hash_columns_u64
    from .lsh import default_num_partitions

    P = num_partitions or default_num_partitions()

    def with_part(b: pa.Table) -> pa.Table:
        part = (hash_columns_u64(b, ["text_sha1"]) % np.uint64(P)).astype(np.int32)
        return b.append_column("part", pa.array(part, pa.int32()))

    def block(g: pa.Table) -> pa.Table:
        return exact_pairs_block(g.drop_columns(["part"]))

    return (
        signatures.select_columns(["url", "text_sha1"])  # prune BEFORE the shuffle
        .map_batches(with_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(block, batch_format="pyarrow")
    )


def exact_dup_groups(extracted):
    """Reference-shaped duplicate-group report (A2 + O1): one row per
    duplicated content hash, sorted by total bytes desc — the analog of the
    reference's stdout group listing (core.clj:~20-40)."""
    from ray.data.aggregate import Count, Max, Min, Sum

    return (
        extracted.groupby("text_sha1")
        .aggregate(
            Count(alias_name="dup_count"),
            Min("url", alias_name="min_url"),
            Sum("n_chars", alias_name="total_chars"),
            Max("n_chars", alias_name="n_chars_each"),
        )
        .filter(expr="dup_count > 1")
        .sort("total_chars", descending=True)
    )
