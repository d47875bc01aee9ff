"""Weighted-Jaccard family (stages/wjaccard.py): exact postings anchor +
Ioffe CWS weighted-MinHash sketch."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from deduplicatr_ray.stages.wjaccard import (
    cws_signatures,
    weighted_jaccard_all,
    wminhash_near_dups,
)


def _docs(texts):
    return pa.table(
        {
            "doc_id": pa.array(list(range(1, len(texts) + 1)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )


def _exact_jw(a: str, b: str) -> float:
    from collections import Counter

    ca, cb = Counter(a.split()), Counter(b.split())
    toks = set(ca) | set(cb)
    mins = sum(min(ca[t], cb[t]) for t in toks)
    maxs = sum(max(ca[t], cb[t]) for t in toks)
    return mins / maxs


def test_weighted_jaccard_all_exact_counts(ray_session):
    """Hand corpus: multiset semantics (repetition matters), threshold
    inclusive at exactly 0.7, pairs below excluded."""
    import ray

    texts = [
        "spam spam spam spam eggs",      # 1
        "spam spam spam spam eggs",      # 2: identical -> J_w = 1
        "spam eggs",                     # 3 vs 1: min=2, max=5 -> 0.4
        "a b c d e f g",                 # 4
        "a b c d e f g x x x",           # 5 vs 4: 7/10 = 0.7 exactly
    ]
    ds = ray.data.from_arrow(_docs(texts))
    out = (
        weighted_jaccard_all(ds, num_partitions=4)
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    pairs = set(zip(out["id_a"], out["id_b"]))
    assert pairs == {(1, 2), (4, 5)}
    r12 = out[(out.id_a == 1) & (out.id_b == 2)].iloc[0]
    assert r12["n_min"] == 5 and r12["n_union"] == 5
    r45 = out[(out.id_a == 4) & (out.id_b == 5)].iloc[0]
    assert r45["n_min"] == 7 and r45["n_union"] == 10


def test_cws_estimator_unbiased(ray_session):
    """P[sample agreement] == true weighted Jaccard (Ioffe property):
    estimate within 3 sd at K=512 on an asymmetric tf pair."""
    from deduplicatr_ray.functions.hashing import hash_columns_u64

    def sigs(tfs, K=512):
        toks = sorted(tfs)
        th = hash_columns_u64(pa.table({"t": pa.array(toks)}), ["t"])
        return cws_signatures(
            np.zeros(len(toks), np.int64),
            th,
            np.array([tfs[t] for t in toks], np.int64),
            1,
            num_perm=K,
        )[0]

    a = {"x": 4, "y": 1, "z": 2}
    b = {"x": 1, "y": 1, "w": 3}
    true_jw = 2 / 10
    est = (sigs(a) == sigs(b)).mean()
    assert abs(est - true_jw) <= 3 * np.sqrt(true_jw * (1 - true_jw) / 512)
    assert (sigs(a) == sigs(a)).all()  # identical multisets always agree


def test_wminhash_recall_vs_exact_anchor(ray_session):
    """On a seeded corpus with planted weighted near-dups, the sketch
    finds every pair the exact anchor reports (recall 1 at the operating
    point), and every reported estimate is a real >= threshold-2sd pair."""
    import ray

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(30)]
    base = [
        " ".join(rng.choice(vocab, size=40).tolist()) for _ in range(30)
    ]
    # planted near-dups: drop 3 of 40 tokens
    variants = [" ".join(t.split()[3:]) for t in base[:10]]
    texts = base + variants
    ds = lambda: ray.data.from_arrow(_docs(texts))
    exact = weighted_jaccard_all(ds(), num_partitions=4).to_pandas()
    want = set(zip(exact["id_a"], exact["id_b"]))
    assert len(want) >= 10  # the planted pairs are above 0.7
    got_df = wminhash_near_dups(ds(), num_partitions=4).to_pandas()
    got = set(zip(got_df["id_a"], got_df["id_b"]))
    assert want <= got  # recall 1.0
    # no wild false positives: every accept is truly close to threshold
    for _, r in got_df.iterrows():
        jw = _exact_jw(texts[int(r.id_a) - 1], texts[int(r.id_b) - 1])
        assert jw >= 0.7 - 2 * np.sqrt(0.25 / 256)


def test_weighted_jaccard_pairs_exact(ray_session):
    """Per-pair verify: bit-exact (n_min, n_union) on requested pairs only,
    sub-threshold candidates dropped, pairs naming a missing doc dropped."""
    import ray

    from deduplicatr_ray.stages.wjaccard import weighted_jaccard_pairs

    texts = [
        "spam spam spam spam eggs",      # 1
        "spam spam spam spam eggs",      # 2
        "spam eggs",                     # 3: vs 1 -> 0.4 (sub-threshold)
        "a b c d e f g",                 # 4
        "a b c d e f g x x x",           # 5: vs 4 -> 7/10 exactly
    ]
    docs = ray.data.from_arrow(_docs(texts))
    cand = ray.data.from_arrow(
        pa.table(
            {
                "id_a": pa.array([1, 1, 4, 9], pa.int64()),
                "id_b": pa.array([2, 3, 5, 10], pa.int64()),
            }
        )
    )
    out = (
        weighted_jaccard_pairs(docs, cand, num_partitions=4)
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    assert set(zip(out["id_a"], out["id_b"])) == {(1, 2), (4, 5)}
    r12 = out[(out.id_a == 1) & (out.id_b == 2)].iloc[0]
    assert r12["n_min"] == 5 and r12["n_union"] == 5
    r45 = out[(out.id_a == 4) & (out.id_b == 5)].iloc[0]
    assert r45["n_min"] == 7 and r45["n_union"] == 10


def test_wminhash_verified_matches_anchor(ray_session):
    """The production candidates->per-pair-verify path reproduces the exact
    anchor bit-for-bit on a planted near-dup corpus (recall + exactness)."""
    import ray

    from deduplicatr_ray.stages.wjaccard import wminhash_verified

    rng = np.random.default_rng(23)
    vocab = [f"w{i}" for i in range(30)]
    base = [" ".join(rng.choice(vocab, size=40).tolist()) for _ in range(30)]
    variants = [" ".join(t.split()[3:]) for t in base[:10]]
    texts = base + variants
    ds = lambda: ray.data.from_arrow(_docs(texts))
    exact = (
        weighted_jaccard_all(ds(), num_partitions=4)
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    got = (
        wminhash_verified(ds(), num_partitions=4)
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    assert len(exact) >= 10
    assert exact[["id_a", "id_b", "n_min", "n_union"]].equals(
        got[["id_a", "id_b", "n_min", "n_union"]]
    )


def test_wminhash_distinct_emit(ray_session):
    """emit='distinct' returns each candidate pair once, id-only schema."""
    import ray

    texts = ["q r s t u v w"] * 4 + ["completely different tokens here"]
    ds = ray.data.from_arrow(_docs(texts))
    out = wminhash_near_dups(
        ds, num_partitions=4, emit="distinct"
    ).to_pandas()
    assert list(out.columns) == ["id_a", "id_b"]
    pairs = list(zip(out["id_a"], out["id_b"]))
    assert len(pairs) == len(set(pairs)) == 6  # C(4,2) exact clones
    assert all(a < b for a, b in pairs)


def test_wminhash_hot_bucket_starred_not_dropped(ray_session):
    """A bucket with more than group_cap DISTINCT doc ids used to be
    skipped entirely (recall 0 on a giant shuffled-clone family whose
    every bucket is hot). With the salt-split + star policy the family is
    still connected: identical multisets share every CWS sample, salting
    can't split them, and the depth-exhausted star emits min-id -> member
    pairs at est 1.0 which the verified path re-scores exactly."""
    import ray

    from deduplicatr_ray.stages.wjaccard import wminhash_verified

    rng = np.random.Generator(np.random.PCG64(31))
    base = [f"tok{i}" for i in range(40)] * 2  # multiset, tf=2 each
    texts = []
    for _ in range(40):  # group_cap=8 makes 40 docs 'giant'
        w = list(base)
        rng.shuffle(w)
        texts.append(" ".join(w))
    ds = ray.data.from_arrow(_docs(texts))
    out = wminhash_verified(
        ds, num_partitions=4, group_cap=8, salt_depth=2
    ).to_pandas()
    # star around min doc id connects all 40 shuffled clones exactly
    assert len(out) == 39
    assert set(out["id_a"]) == {1}
    assert sorted(out["id_b"]) == list(range(2, 41))
    assert (out["n_min"] == out["n_union"]).all()  # exact clones: J_w = 1


def test_wminhash_verified_custom_id_col(ray_session):
    """id_col must thread through BOTH stages (candidates + verify); it
    used to reach only the verify stage, so any non-default id column
    crashed or silently mismatched (code-review finding)."""
    import ray

    from deduplicatr_ray.stages.wjaccard import wminhash_verified

    texts = ["a b c d e f g h"] * 3 + ["totally different words here now"]
    t = pa.table(
        {
            "page_id": pa.array([10, 20, 30, 40], pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    out = wminhash_verified(
        ray.data.from_arrow(t), num_partitions=2, id_col="page_id"
    ).to_pandas()
    pairs = sorted(zip(out["id_a"], out["id_b"]))
    assert pairs == [(10, 20), (10, 30), (20, 30)]
