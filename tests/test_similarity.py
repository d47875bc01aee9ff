"""Blocked exact embedding-dup pairs (stages/similarity.py) vs an
in-process dense reference: the block-pair task decomposition must produce
exactly the dense pair set, once per unordered pair, across multiple
blocks (within-block triu + cross-block emission)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _fixture_embeddings(n: int = 100, dim: int = 16, seed: int = 7):
    rng = np.random.Generator(np.random.PCG64(seed))
    # a few tight clusters so pairs exist at high thresholds
    centers = rng.standard_normal((8, dim))
    assign = rng.integers(0, 8, size=n)
    m = centers[assign] + 0.05 * rng.standard_normal((n, dim))
    ids = np.arange(n, dtype=np.int64)
    tbl = pa.table(
        {
            "vec_id": pa.array(ids),
            "embedding": pa.array(list(m), pa.list_(pa.float64(), dim)),
        }
    )
    return tbl, ids, m


def _dense_pairs(ids: np.ndarray, m: np.ndarray, threshold: float) -> set:
    norm = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = norm @ norm.T
    iu, ju = np.triu_indices(len(ids), k=1)
    keep = sims[iu, ju] >= threshold
    return {(int(ids[i]), int(ids[j])) for i, j in zip(iu[keep], ju[keep])}


@pytest.mark.parametrize("block_rows", [16, 1000])
def test_blocked_pairs_match_dense(ray_session, block_rows):
    """Multi-block (16 => 7 blocks, 28 block-pair tasks) and single-block
    configurations both reproduce the dense pair set exactly."""
    import ray.data as rd

    from deduplicatr_ray.stages.similarity import embedding_dup_pairs

    tbl, ids, m = _fixture_embeddings()
    want = _dense_pairs(ids, m, threshold=0.9)
    assert want  # fixture sanity: clusters produce pairs

    out = embedding_dup_pairs(
        rd.from_arrow(tbl), threshold=0.9, block_rows=block_rows
    ).to_pandas()
    got = set(zip(out["id_a"].astype(int), out["id_b"].astype(int)))
    assert got == want
    # exactly once per unordered pair (no triu/cross double emission)
    assert len(out) == len(got)
    assert (out["id_a"] < out["id_b"]).all()


def test_blocked_pairs_row_chunking(ray_session):
    """row_chunk smaller than the block: chunked matmul must not drop or
    duplicate upper-triangle pairs at chunk boundaries."""
    import ray.data as rd

    from deduplicatr_ray.stages.similarity import (
        _block_pair_sims,
        embedding_dup_pairs,
    )

    tbl, ids, m = _fixture_embeddings(n=50)
    want = _dense_pairs(ids, m, threshold=0.85)
    norm = m / np.linalg.norm(m, axis=1, keepdims=True)
    out = _block_pair_sims((ids, norm), (ids, norm), 0.85, same=True, row_chunk=7)
    got = set(zip(out["id_a"].to_pylist(), out["id_b"].to_pylist()))
    assert got == want

    # end-to-end with blocks not dividing n evenly
    ds_out = embedding_dup_pairs(
        rd.from_arrow(tbl), threshold=0.85, block_rows=13
    ).to_pandas()
    assert set(zip(ds_out["id_a"].astype(int), ds_out["id_b"].astype(int))) == want


def test_ivf_full_probe_equals_brute(ray_session):
    """nprobe == ncells prunes nothing: IVF must equal brute exactly."""
    import ray.data as rd

    from deduplicatr_ray.stages.similarity import ann_ivf_knn, knn_brute

    tbl, _, _ = _fixture_embeddings(n=120)
    ds = rd.from_arrow(tbl)
    qids = list(range(6))
    brute = (
        knn_brute(ds, query_ids=qids, k=5)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    ivf = (
        ann_ivf_knn(ds, query_ids=qids, k=5, ncells=8, nprobe=8)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    assert brute.equals(ivf)


def test_ivf_pruned_recall(ray_session):
    """Clustered fixture: probing 2 of 8 cells keeps recall@5 high — the
    coarse quantizer routes queries to their own cluster's cell."""
    import ray.data as rd

    from deduplicatr_ray.stages.similarity import ann_ivf_knn, knn_brute

    tbl, _, _ = _fixture_embeddings(n=200)
    ds = rd.from_arrow(tbl)
    qids = list(range(10))
    brute = knn_brute(ds, query_ids=qids, k=5).to_pandas()
    ivf = ann_ivf_knn(ds, query_ids=qids, k=5, ncells=8, nprobe=2).to_pandas()
    want = set(zip(brute["query_id"], brute["neighbor_id"]))
    got = set(zip(ivf["query_id"], ivf["neighbor_id"]))
    recall = len(want & got) / len(want)
    assert recall >= 0.9, recall


def test_semdedup_single_cell_equals_dense(ray_session):
    """ncells=1 puts every vector in one cluster: SemDeDup prunes nothing
    and must equal the dense exact pair set."""
    import ray.data as rd

    from deduplicatr_ray.stages.similarity import semdedup_pairs

    tbl, ids, m = _fixture_embeddings()
    want = _dense_pairs(ids, m, threshold=0.9)
    out = semdedup_pairs(rd.from_arrow(tbl), threshold=0.9, ncells=1).to_pandas()
    got = set(zip(out["id_a"].astype(int), out["id_b"].astype(int)))
    assert got == want
    assert (out["id_a"] < out["id_b"]).all()


def test_semdedup_bucketed_is_high_recall_subset(ray_session):
    """With ncells ~= true cluster count, the bucketed pass may only miss
    cross-cluster pairs: output is a subset of the dense set with high
    recall on this well-separated fixture."""
    import ray.data as rd

    from deduplicatr_ray.stages.similarity import semdedup_pairs

    tbl, ids, m = _fixture_embeddings()
    want = _dense_pairs(ids, m, threshold=0.9)
    out = semdedup_pairs(rd.from_arrow(tbl), threshold=0.9, ncells=8).to_pandas()
    got = set(zip(out["id_a"].astype(int), out["id_b"].astype(int)))
    assert got <= want
    # seeded k-means occasionally splits a true cluster across two cells;
    # 0.88 observed on this fixture — the documented SemDeDup approximation
    assert len(got) >= 0.8 * len(want)


def test_ann_lsh_hot_bucket_starred_not_dropped(ray_session):
    """A bucket with more members than group_cap used to be skipped — a
    giant tight cluster (near-identical embeddings) produced ZERO pairs
    from every table. With hyperplane-salt + star it stays connected: the
    clones can't be split by any plane (identical signs), so the
    depth-exhausted star emits min-id pairs, exact-cosine-verified."""
    import ray.data as rd

    from deduplicatr_ray.stages.similarity import ann_lsh_pairs

    rng = np.random.Generator(np.random.PCG64(41))
    dim, n = 16, 60
    center = rng.standard_normal(dim)
    m = center[None, :] + 1e-4 * rng.standard_normal((n, dim))
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(list(m), pa.list_(pa.float64(), dim)),
        }
    )
    out = ann_lsh_pairs(
        rd.from_arrow(tbl), threshold=0.99, group_cap=8
    ).to_pandas()
    got = set(zip(out["id_a"].astype(int), out["id_b"].astype(int)))
    # the star around vec_id 0 must connect every clone in >= 1 table
    assert {(0, j) for j in range(1, n)} <= got
    assert (out["id_a"] < out["id_b"]).all()


def test_topk_select_equals_stable_argsort():
    """_topk_select (argpartition + boundary-tie widening) must select the
    identical per-column set as the stable argsort it replaced, including
    under heavy exact-value ties."""
    from deduplicatr_ray.stages.similarity import _topk_select

    rng = np.random.Generator(np.random.PCG64(3))
    for trial in range(100):
        n = int(rng.integers(2, 60))
        nq = int(rng.integers(1, 20))
        kk = min(int(rng.integers(1, n + 2)), n)
        sims = np.round(rng.random((n, nq)) * 5) / 5  # heavy ties
        want = np.argsort(-sims, axis=0, kind="stable")[:kk]
        rows_k, cols_k = _topk_select(sims, kk)
        for c in range(nq):
            assert set(want[:, c].tolist()) == set(
                rows_k[cols_k == c].tolist()
            ), (trial, c)
