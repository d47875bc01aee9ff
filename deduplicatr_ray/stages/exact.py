"""Exact dedup (A2/D1) — THE core reference operation.

The reference groups file/dir summaries by content hash and keeps groups with
count > 1 (``src/deduplicatr/duplicates.clj:~10-35``, approximate citation —
mount empty at survey time). Target: hash-partition shuffle on ``text_sha1``
(a crypto hash => uniform keys, no skew; SURVEY.md §7.4) + per-group pair
emission in star form: (min_url, other) for each other member — union-find
closes the transitive cluster, so O(m) rows instead of O(m^2) suffice.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def exact_pairs_group(group: pa.Table) -> pa.Table:
    m = len(group)
    if m < 2:
        return pa.table(
            {
                "url_a": pa.array([], pa.string()),
                "url_b": pa.array([], pa.string()),
                "jaccard_est": pa.array([], pa.float32()),
                "method": pa.array([], pa.string()),
            }
        )
    urls = sorted(group["url"].to_pylist())
    root = urls[0]
    return pa.table(
        {
            "url_a": pa.array([root] * (m - 1), pa.string()),
            "url_b": pa.array(urls[1:], pa.string()),
            "jaccard_est": pa.array([1.0] * (m - 1), pa.float32()),
            "method": pa.array(["exact"] * (m - 1), pa.string()),
        }
    )


def exact_pairs_stage(signatures):
    """Dataset with (url, text_sha1) -> exact-dup PAIRS (SHUFFLE #3)."""
    return (
        signatures.select_columns(["url", "text_sha1"])
        .groupby("text_sha1")
        .map_groups(exact_pairs_group, batch_format="pyarrow")
        .select_columns(["url_a", "url_b", "jaccard_est", "method"])
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
