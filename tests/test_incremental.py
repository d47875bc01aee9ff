"""Incremental exact dedup against sharded index actors
(state/incremental.py): first-arrival canonicals, cross-ingest state."""

from __future__ import annotations

import pyarrow as pa

from deduplicatr_ray.state.incremental import (
    DedupIndexShard,
    incremental_exact_assign,
    ingest,
)


def _docs(rows):
    """rows: (doc_id, text)."""
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
        }
    )


def test_first_arrival_wins_in_order(ray_session):
    import ray

    t = _docs([(1, "aa"), (2, "bb"), (3, "aa"), (4, "cc"), (5, "bb"), (6, "aa")])
    out = (
        incremental_exact_assign(ray.data.from_arrow(t), num_shards=4)
        .to_pandas()
        .sort_values("doc_id")
    )
    assert out["canonical_id"].tolist() == [1, 2, 1, 4, 2, 1]


def test_state_persists_across_ingests(ray_session):
    import ray

    shards = [DedupIndexShard.remote() for _ in range(4)]
    first = ingest(ray.data.from_arrow(_docs([(1, "aa"), (2, "bb")])), shards)
    assert first["canonical_id"].to_pylist() == [1, 2]
    # second shard arrives later; its dup of "aa" must resolve to doc 1
    second = ingest(
        ray.data.from_arrow(_docs([(10, "aa"), (11, "zz")])), shards
    )
    assert second["canonical_id"].to_pylist() == [1, 11]
    sizes = sum(ray.get([s.size.remote() for s in shards]))
    assert sizes == 3  # aa, bb, zz


def test_small_batches_preserve_order(ray_session):
    import ray

    rows = [(i, f"t{i % 3}") for i in range(1, 31)]
    out = (
        incremental_exact_assign(
            ray.data.from_arrow(_docs(rows)), num_shards=3, batch_size=4
        )
        .to_pandas()
        .sort_values("doc_id")
    )
    # canonical of text "t{k}" = first doc id with that text: t1->1, t2->2, t0->3
    expect = [{1: 1, 2: 2, 0: 3}[i % 3] for i in range(1, 31)]
    assert out["canonical_id"].tolist() == expect
