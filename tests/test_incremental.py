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


def _near_docs():
    import ray.data as rd

    from deduplicatr_ray.sources.synthetic import gen_corpus
    from deduplicatr_ray.stages.extract import extract_stage

    pages, truth = gen_corpus("near")
    ext = extract_stage(rd.from_arrow(pages)).to_pandas().sort_values("url")
    uid = {u: i for i, u in enumerate(ext["url"])}
    docs = pa.table(
        {
            "doc_id": pa.array([uid[u] for u in ext["url"]], pa.int64()),
            "text": pa.array(ext["text"].tolist(), pa.string()),
        }
    )
    want = {
        (min(uid[a], uid[b]), max(uid[a], uid[b]))
        for a, b in zip(truth["url_a"].to_pylist(), truth["url_b"].to_pylist())
    }
    return docs, want


def _implied(out) -> set:
    from itertools import combinations

    got = set()
    for mem in out.groupby("canonical_id")["doc_id"].apply(list):
        got.update(combinations(sorted(mem), 2))
    return got


def test_incremental_near_recall(ray_session):
    import ray.data as rd

    from deduplicatr_ray.state.incremental import incremental_near_assign

    docs, want = _near_docs()
    out = incremental_near_assign(rd.from_arrow(docs), num_shards=4).to_pandas()
    got = _implied(out)
    assert len(got & want) / len(want) >= 0.99
    # online assignment never invents pairs the batch verifier wouldn't
    assert not (got - want)


def test_incremental_near_two_ingests_match_one(ray_session):
    """Cross-ingest persistence: deduping the corpus in two arrival waves
    against the SAME shard set assigns exactly what one ingest assigns."""
    import ray.data as rd

    from deduplicatr_ray.state.incremental import NearIndexShard, ingest_near

    docs, _ = _near_docs()
    n = len(docs)
    one = ingest_near(
        rd.from_arrow(docs),
        [NearIndexShard.remote() for _ in range(4)],
    ).to_pandas()

    shards = [NearIndexShard.remote() for _ in range(4)]
    first = ingest_near(rd.from_arrow(docs.slice(0, n // 2)), shards).to_pandas()
    second = ingest_near(rd.from_arrow(docs.slice(n // 2)), shards).to_pandas()
    import pandas as pd

    two = pd.concat([first, second], ignore_index=True)
    one = one.sort_values("doc_id").reset_index(drop=True)
    two = two.sort_values("doc_id").reset_index(drop=True)
    assert one.equals(two)


def test_exact_index_spill_restore(ray_session, tmp_path):
    """Restart-from-spill: kill the shard set after a spill, restore a new
    one, and later arrivals still resolve against everything seen before
    (first-arrival semantics preserved across the restart)."""
    import ray

    from deduplicatr_ray.state.incremental import restore_index, spill_index

    shards = [DedupIndexShard.remote() for _ in range(4)]
    first = ingest(ray.data.from_arrow(_docs([(1, "aa"), (2, "bb")])), shards)
    assert first["canonical_id"].to_pylist() == [1, 2]
    info = spill_index(shards, str(tmp_path), stage="exact_index")
    assert info["keys"] == 2 and info["num_shards"] == 4
    for s in shards:
        ray.kill(s)

    restored = restore_index(
        DedupIndexShard, str(tmp_path), stage="exact_index"
    )
    out = ingest(
        ray.data.from_arrow(_docs([(10, "aa"), (11, "bb"), (12, "zz")])),
        restored,
    )
    assert out["canonical_id"].to_pylist() == [1, 2, 12]


def test_spill_resume_skips_recorded_shards(ray_session, tmp_path):
    """Crash mid-spill: a re-run re-spills ONLY shards missing from the
    manifest — recorded shards' files are left untouched (ADVICE r3: the
    docstring promised this; the manifest entries now drive it)."""
    import json
    import os

    import ray

    from deduplicatr_ray.state.incremental import restore_index, spill_index

    shards = [DedupIndexShard.remote() for _ in range(4)]
    ingest(ray.data.from_arrow(_docs([(1, "aa"), (2, "bb"), (3, "cc")])), shards)
    info = spill_index(shards, str(tmp_path), stage="exact_index")
    assert info["keys"] == 3

    # simulate a crash that lost shard_0's write + manifest entry (and the
    # stage-level summary entry, which lands last)
    manifest_path = tmp_path / "index0" / "_lineage.json"
    m = json.loads(manifest_path.read_text())
    del m["entries"]["exact_index/shard_0"]
    del m["entries"]["exact_index"]
    manifest_path.write_text(json.dumps(m))
    shard0 = tmp_path / "index0" / "exact_index" / "shard_0.parquet"
    os.remove(shard0)
    mtimes = {
        i: os.path.getmtime(tmp_path / "index0" / "exact_index" / f"shard_{i}.parquet")
        for i in range(1, 4)
    }

    info2 = spill_index(shards, str(tmp_path), stage="exact_index")
    assert info2["keys"] == 3 and shard0.exists()
    for i, mt in mtimes.items():
        path = tmp_path / "index0" / "exact_index" / f"shard_{i}.parquet"
        assert os.path.getmtime(path) == mt, f"shard_{i} was re-spilled"

    for s in shards:
        ray.kill(s)
    restored = restore_index(DedupIndexShard, str(tmp_path), stage="exact_index")
    out = ingest(ray.data.from_arrow(_docs([(9, "aa"), (10, "zz")])), restored)
    assert out["canonical_id"].to_pylist() == [1, 10]


def test_near_index_spill_restore(ray_session, tmp_path):
    """Near-index restart: post-restore ingest assigns exactly what an
    uninterrupted shard set assigns (sketches round-trip the spill)."""
    import pandas as pd
    import ray
    import ray.data as rd

    from deduplicatr_ray.state.incremental import (
        NearIndexShard,
        ingest_near,
        restore_index,
        spill_index,
    )

    docs, _ = _near_docs()
    n = len(docs)
    one = ingest_near(
        rd.from_arrow(docs), [NearIndexShard.remote() for _ in range(4)]
    ).to_pandas()

    shards = [NearIndexShard.remote() for _ in range(4)]
    first = ingest_near(rd.from_arrow(docs.slice(0, n // 2)), shards).to_pandas()
    spill_index(shards, str(tmp_path), stage="near_index")
    for s in shards:
        ray.kill(s)
    restored = restore_index(NearIndexShard, str(tmp_path), stage="near_index")
    second = ingest_near(rd.from_arrow(docs.slice(n // 2)), restored).to_pandas()

    two = pd.concat([first, second], ignore_index=True)
    one = one.sort_values("doc_id").reset_index(drop=True)
    two = two.sort_values("doc_id").reset_index(drop=True)
    assert one.equals(two)


def test_restore_refuses_incomplete_spill(ray_session, tmp_path):
    """A half-spilled index must not silently restart empty."""
    import json
    import os

    import pytest

    from deduplicatr_ray.state.incremental import restore_index, spill_index

    shards = [DedupIndexShard.remote() for _ in range(2)]
    ingest(__import__("ray").data.from_arrow(_docs([(1, "aa")])), shards)
    spill_index(shards, str(tmp_path), stage="exact_index")
    # corrupt: drop one shard's manifest entry
    mpath = os.path.join(str(tmp_path), "index0", "_lineage.json")
    with open(mpath) as f:
        m = json.load(f)
    del m["entries"]["exact_index/shard_1"]
    with open(mpath, "w") as f:
        json.dump(m, f)
    with pytest.raises(FileNotFoundError):
        restore_index(DedupIndexShard, str(tmp_path), stage="exact_index")


def test_exact_null_text_treated_as_empty(ray_session):
    """A NULL text row (routine in crawl parquet) must hash as the empty
    string, not crash the digest stage (code-review finding)."""
    import ray

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(["aa", None, ""], pa.string()),
        }
    )
    out = (
        incremental_exact_assign(ray.data.from_arrow(t), num_shards=2)
        .to_pandas()
        .sort_values("doc_id")
    )
    # NULL and "" share the empty-string digest: first arrival (id 2) wins
    assert out["canonical_id"].tolist() == [1, 2, 2]


def test_ingest_near_negative_ids(ray_session):
    """Negative doc ids must survive the id->url encoding: the biased
    zero-padded form sorts numerically over the full int64 range (plain
    f'{i:020d}' reversed negative order and tripped the monotonicity
    guard — code-review finding)."""
    import ray.data as rd

    from deduplicatr_ray.state.incremental import NearIndexShard, ingest_near

    shards = [NearIndexShard.remote() for _ in range(2)]
    text = "the quick brown fox jumps over the lazy dog again and again"
    docs = _docs([(-5, text), (-1, text), (3, text)])
    out = (
        ingest_near(rd.from_arrow(docs), shards)
        .to_pandas()
        .sort_values("doc_id")
    )
    assert out["doc_id"].tolist() == [-5, -1, 3]
    assert out["canonical_id"].tolist() == [-5, -5, -5]  # first arrival = -5


def test_distributed_labels_raises_on_round_exhaustion(ray_session):
    """A component whose partition-hop diameter exceeds max_rounds must
    raise, not silently split into multiple cluster ids (code-review
    finding: pending offers were dropped with no convergence check)."""
    import numpy as np
    import pytest
    import ray.data as rd

    from deduplicatr_ray.state.unionfind import distributed_labels

    # a 40-node chain of distinct hashes spread over 8 partitions needs
    # several cross-partition hops; max_rounds=1 cannot converge
    h = (np.arange(1, 41, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15))
    edges = pa.table(
        {
            "ha": pa.array(h[:-1], pa.uint64()),
            "hb": pa.array(h[1:], pa.uint64()),
        }
    )
    with pytest.raises(RuntimeError, match="max_rounds"):
        distributed_labels(
            rd.from_arrow(edges), num_partitions=8, max_rounds=1
        ).materialize()
