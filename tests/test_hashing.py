"""Unit tests for the hashing kernels (SURVEY.md §5.2.1).

Mirrors the reference's hash_test.clj shape (digest determinism, small vs
sampled paths) plus MinHash/SimHash math the reference doesn't have.
"""

from __future__ import annotations

import numpy as np
import pytest

from deduplicatr_ray.config import MERSENNE_P61, CANONICAL
from deduplicatr_ray.functions.hashing import (
    TokenHasher,
    hamming64,
    make_permutations,
    minhash_segments,
    mod_p61,
    mulmod_p61,
    sampled_hash,
    sha1_bytes,
    shingle_hashes,
    simhash_segments,
    splitmix64,
)


def test_mulmod_p61_matches_python_bigint():
    rng = np.random.Generator(np.random.PCG64(7))
    a = rng.integers(0, MERSENNE_P61, size=500, dtype=np.uint64)
    x = rng.integers(0, MERSENNE_P61, size=500, dtype=np.uint64)
    got = mulmod_p61(a, x)
    want = (a.astype(object) * x.astype(object)) % MERSENNE_P61
    assert (got.astype(object) == want).all()


def test_mod_p61_matches_python_bigint():
    rng = np.random.Generator(np.random.PCG64(8))
    x = rng.integers(0, 2**64, size=1000, dtype=np.uint64)
    got = mod_p61(x)
    want = x.astype(object) % MERSENNE_P61
    assert (got.astype(object) == want).all()


def test_token_hash_deterministic_and_seed_sensitive():
    h1 = TokenHasher(1).hash_token("hello")
    h1b = TokenHasher(1).hash_token("hello")
    h2 = TokenHasher(2).hash_token("hello")
    assert h1 == h1b
    assert h1 != h2


def test_shingle_hashes_short_doc_empty():
    th = TokenHasher(CANONICAL.token_hash_seed)
    toks = th.hash_tokens(["a", "b", "c"])
    assert len(shingle_hashes(toks, 5)) == 0  # M10 short-doc rule


def test_shingle_hashes_shift_invariant_overlap():
    th = TokenHasher(CANONICAL.token_hash_seed)
    words = [f"w{i}" for i in range(20)]
    a = shingle_hashes(th.hash_tokens(words), 5)
    b = shingle_hashes(th.hash_tokens(words[1:]), 5)
    # dropping the first token removes exactly one shingle
    assert len(np.intersect1d(a, b)) == len(b) == len(a) - 1


def test_minhash_known_jaccard():
    """8/12-overlap hand-built shingle sets (FIXTURES.md §2 micro-fixture)."""
    a, b = make_permutations(CANONICAL.num_perm, CANONICAL.perm_seed)
    rng = np.random.Generator(np.random.PCG64(3))
    common = rng.integers(0, 2**63, size=8, dtype=np.uint64)
    only_a = rng.integers(0, 2**63, size=2, dtype=np.uint64)
    only_b = rng.integers(0, 2**63, size=2, dtype=np.uint64)
    sa = np.concatenate([common, only_a])
    sb = np.concatenate([common, only_b])
    shingles = np.concatenate([sa, sb])
    sig = minhash_segments(shingles, np.array([0, len(sa)]), a, b)
    est = (sig[0] == sig[1]).mean()
    true_j = 8 / 12
    assert abs(est - true_j) < 0.15  # 128 perms => se ~ 0.04


def test_minhash_identical_sets_identical_sigs():
    a, b = make_permutations(CANONICAL.num_perm, CANONICAL.perm_seed)
    s = np.array([5, 9, 123456789], dtype=np.uint64)
    sig = minhash_segments(np.concatenate([s, s]), np.array([0, 3]), a, b)
    assert (sig[0] == sig[1]).all()


def test_simhash_identical_and_disjoint():
    th = TokenHasher(0)
    t1 = th.hash_tokens([f"x{i}" for i in range(50)])
    t2 = th.hash_tokens([f"y{i}" for i in range(50)])
    tf = np.ones(50)
    hashes = np.concatenate([t1, t1, t2])
    tfs = np.concatenate([tf, tf, tf])
    idx = np.concatenate([np.zeros(50, int), np.ones(50, int), np.full(50, 2)])
    sh = simhash_segments(hashes, tfs, idx, 3)
    assert sh[0] == sh[1]
    d = hamming64(sh[:1], sh[2:3])[0]
    assert d > 10  # unrelated docs are far apart


def test_hamming64():
    a = np.array([0b1011, 0], dtype=np.uint64)
    b = np.array([0b0010, np.iinfo(np.uint64).max], dtype=np.uint64)
    assert list(hamming64(a, b)) == [2, 64]


def test_sha1_and_sampled_hash():
    assert sha1_bytes(["abc"])[0] == __import__("hashlib").sha1(b"abc").digest()
    # sampled hash: equal ends + equal length collide (the reference's
    # intentional approximation for big files, hash.clj:~25-45)
    t1 = "A" * 100 + "MID1" + "B" * 100
    t2 = "A" * 100 + "MID2" + "B" * 100
    assert sampled_hash(t1, 50) == sampled_hash(t2, 50)
    assert sampled_hash(t1, 200) != sampled_hash(t2, 200)  # small => full content
    assert sampled_hash(t1 + "C", 50) != sampled_hash(t1, 50)  # length differs


def test_splitmix64_bijective_sample():
    x = np.arange(10_000, dtype=np.uint64)
    assert len(np.unique(splitmix64(x))) == 10_000


def test_hll_sketch_accuracy_and_commutativity():
    """A7 sketch: ~2% error at p=12, and merge is commutative/associative
    (the reference's order-independent accumulation analog)."""
    import numpy as np

    from deduplicatr_ray.functions.sketch import (
        hll_add_hashes,
        hll_estimate,
        hll_init,
        hll_merge,
    )

    rng = np.random.Generator(np.random.PCG64(7))
    hs = rng.integers(0, 2**64 - 1, 50_000, dtype=np.uint64)
    reg = hll_add_hashes(hll_init(12), hs)
    est = hll_estimate(reg)
    assert abs(est - 50_000) / 50_000 < 0.05

    # split + merge in any order == whole
    a = hll_add_hashes(hll_init(12), hs[:20_000])
    b = hll_add_hashes(hll_init(12), hs[20_000:])
    assert np.array_equal(hll_merge(a, b), reg)
    assert np.array_equal(hll_merge(b, a), reg)


# --- One-Permutation Hashing (oph_minhash_segments) -------------------------


def test_oph_shapes_and_determinism():
    import numpy as np

    from deduplicatr_ray.functions.hashing import (
        oph_minhash_segments,
        splitmix64,
    )

    rng = np.random.Generator(np.random.PCG64(3))
    sh = splitmix64(rng.integers(0, 1 << 63, size=500, dtype=np.uint64))
    starts = np.array([0, 100, 350], dtype=np.int64)
    a = oph_minhash_segments(sh, starts, 128, seed=42)
    b = oph_minhash_segments(sh, starts, 128, seed=42)
    assert a.shape == (3, 128) and a.dtype == np.uint64
    assert (a == b).all()
    c = oph_minhash_segments(sh, starts, 128, seed=7)
    assert (a != c).any()


def test_oph_densification_fills_every_bin():
    """Docs with fewer shingles than bins: rotation densification must
    leave no sentinel, and borrowed values must be distance-offset (two
    empty bins borrowing from the same source differ)."""
    import numpy as np

    from deduplicatr_ray.functions.hashing import oph_minhash_segments

    sh = np.array([12345], dtype=np.uint64)  # ONE shingle -> 1 filled bin
    out = oph_minhash_segments(sh, np.array([0], dtype=np.int64), 128, 42)
    assert (out != np.iinfo(np.uint64).max).all()
    # 128 bins from one source: every value distinct (hops * odd-C offsets)
    assert len(set(out[0].tolist())) == 128


def test_oph_estimator_unbiased_at_tau():
    """Matching-lane estimate within 3 sigma of true Jaccard (same
    statistical contract as k-perm at 128 lanes)."""
    import numpy as np

    from deduplicatr_ray.functions.hashing import (
        oph_minhash_segments,
        splitmix64,
    )

    rng = np.random.Generator(np.random.PCG64(11))
    n_items, J, P = 3000, 0.7, 128
    errs = []
    for _ in range(20):
        base = splitmix64(
            rng.integers(0, 1 << 63, size=2 * n_items, dtype=np.uint64)
        )
        shared = int(round(2 * n_items * J / (1 + J)))
        A = base[:n_items]
        B = np.concatenate([base[:shared], base[n_items : 2 * n_items - shared]])
        sig = oph_minhash_segments(
            np.concatenate([A, B]),
            np.array([0, n_items], dtype=np.int64),
            P,
            42,
        )
        true_j = shared / (2 * n_items - shared)
        errs.append((sig[0] == sig[1]).mean() - true_j)
    mean_err = float(np.mean(errs))
    assert abs(mean_err) < 3 * 0.04 / (20**0.5), mean_err


def test_oph_identical_sets_match_all_lanes():
    import numpy as np

    from deduplicatr_ray.functions.hashing import oph_minhash_segments

    sh1 = np.arange(1, 300, dtype=np.uint64) * np.uint64(2654435761)
    sh = np.concatenate([sh1, sh1])
    starts = np.array([0, len(sh1)], dtype=np.int64)
    sig = oph_minhash_segments(sh, starts, 64, 42)
    assert (sig[0] == sig[1]).all()


def test_oph_densified_estimator_on_sparse_docs():
    """Regression for the rotation-densification index bug: with fewer
    shingles than bins (every short doc), empty bins must borrow from the
    NEAREST filled bin to their left (circular), not the globally
    max-index filled bin — the broken doubling ([pos, pos] instead of
    [pos, pos+P]) collapsed all densified lanes to one source and drove
    the matching-lane estimate for true J~0.97 down to ~0.2."""
    from deduplicatr_ray.functions.hashing import oph_minhash_segments

    rng = np.random.Generator(np.random.PCG64(7))
    ests = []
    for t in range(100):
        sh = rng.integers(1, 2**63, 31, dtype=np.uint64)
        stream = np.concatenate([sh[:30], sh])  # J = 30/31 ~ 0.968
        sig = oph_minhash_segments(
            stream, np.array([0, 30], dtype=np.int64), 128, seed=1234 + t
        )
        ests.append(float((sig[0] == sig[1]).mean()))
    mean = float(np.mean(ests))
    assert abs(mean - 30 / 31) < 0.03, mean


def test_oph_densification_nearest_left_circular():
    """Structural check of the borrow source: force exactly one filled
    bin at a known position and verify every empty bin's borrowed value
    equals filled_value + hops*C with hops = circular left-distance."""
    from deduplicatr_ray.functions.hashing import (
        _POLY_M,
        make_permutations,
        oph_minhash_segments,
    )

    P = 8
    seed = 0
    a, b = make_permutations(1, seed)
    # find a shingle landing in bin 5 (top 3 bits of its hash == 5)
    kbits = 3
    import itertools

    for cand in itertools.count(1):
        x = np.uint64(cand)
        with np.errstate(over="ignore"):
            h = (x ^ b[0]) * a[0]
        if int(h) >> (64 - kbits) == 5:
            break
    out = oph_minhash_segments(
        np.array([x], dtype=np.uint64), np.array([0], dtype=np.int64), P, seed
    )[0]
    hv = np.uint64(h)
    for j in range(P):
        hops = (j - 5) % P
        with np.errstate(over="ignore"):
            want = hv if j == 5 else hv + np.uint64(hops) * _POLY_M
        assert out[j] == want, (j, out[j], want)
