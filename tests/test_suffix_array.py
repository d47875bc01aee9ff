"""True suffix-array pass (D5 variant): numpy kernels + distributed stage."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def test_suffix_array_banana():
    from deduplicatr_ray.functions.suffix import lcp_adjacent, suffix_array

    s = np.frombuffer(b"banana", np.uint8).astype(np.int32)
    sa, snaps = suffix_array(s)
    assert sa.tolist() == [5, 3, 1, 0, 4, 2]
    assert lcp_adjacent(sa, snaps).tolist() == [1, 3, 0, 0, 2]


def test_sa_doc_pairs_known_shared_substring():
    """Two docs sharing a known 60-char block are detected with an
    lcs_len >= 60; an unrelated doc pairs with nobody."""
    from deduplicatr_ray.functions.suffix import sa_doc_pairs

    shared = "the quick brown fox jumps over the lazy dog near the rivers "
    assert len(shared) == 60
    texts = [
        "doc one preamble q " + shared + "doc one epilogue alpha",
        "second doc intro z " + shared + "different ending beta",
        "entirely unrelated content with no overlap whatsoever gamma",
    ]
    a, b, l = sa_doc_pairs(texts, np.array([10, 20, 30]), min_len=50)
    got = list(zip(a.tolist(), b.tolist()))
    assert got == [(10, 20)]
    assert l[0] >= 60
    # below min_len: no pairs
    a, b, l = sa_doc_pairs(texts, np.array([10, 20, 30]), min_len=80)
    assert len(a) == 0


def test_sa_doc_pairs_no_cross_doc_boundary_match():
    """Sentinels prevent matches spanning document boundaries."""
    from deduplicatr_ray.functions.suffix import sa_doc_pairs

    # doc0's tail + doc1's head would form doc2's content if concatenation
    # leaked across the boundary
    texts = ["AAAAABBBBB", "CCCCCDDDDD", "BBBBBCCCCC"]
    a, b, l = sa_doc_pairs(texts, np.array([1, 2, 3]), min_len=6)
    assert len(a) == 0


def test_suffix_array_stage_superset_of_winnowing(ray_session):
    """At min_len <= w the SA pairs are a superset of the winnowed
    candidate pairs (VERDICT r1 item 4 done-criterion)."""
    import ray.data as rd

    from deduplicatr_ray.stages.textstats import (
        suffix_array_pairs,
        suffix_candidate_pairs,
    )

    rng = np.random.default_rng(7)
    words = ["alpha", "bravo", "charlie", "delta", "echo", "fox", "golf"]

    def mk(n):
        return " ".join(rng.choice(words, n).tolist())

    shared = mk(20)  # ~100+ chars shared block
    texts = [mk(30) + " " + shared + " " + mk(10) for _ in range(4)]
    texts += [mk(45) for _ in range(6)]
    docs = pa.table(
        {
            "doc_id": pa.array(list(range(10)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    ds = rd.from_arrow(docs)
    win = suffix_candidate_pairs(ds).to_pandas()
    sa = suffix_array_pairs(ds).to_pandas()
    win_set = set(zip(win.id_a, win.id_b))
    sa_set = set(zip(sa.id_a, sa.id_b))
    assert win_set <= sa_set
    # the 4 shared-block docs form all 6 pairs with lcs_len >= shared len
    expect = {(i, j) for i in range(4) for j in range(i + 1, 4)}
    assert expect <= sa_set
    by_pair = {(r.id_a, r.id_b): r.lcs_len for r in sa.itertuples()}
    for p in expect:
        assert by_pair[p] >= len(shared)
