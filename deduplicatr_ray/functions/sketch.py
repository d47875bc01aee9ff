"""Approximate-distinct sketches as Ray Data AggregateFns (A7, optional).

HyperLogLog with 2^p uint8 registers, expressed as a commutative/associative
``AggregateFn`` (init / accumulate_block / merge / finalize) — the direct
Ray-Data analog of the reference's order-independent dir-hash SUM
accumulation (``src/deduplicatr/file.clj:~22-45``, approximate citation —
mount empty at survey time): partial states merge by elementwise max, so the
result is invariant to row order, batching and parallelism.

Flajolet et al., "HyperLogLog: the analysis of a near-optimal cardinality
estimation algorithm", AOFA 2007; small-range correction included.
"""

from __future__ import annotations

import numpy as np

from .hashing import TokenHasher, splitmix64


def hll_init(p: int = 12) -> np.ndarray:
    return np.zeros(1 << p, dtype=np.uint8)


def hll_add_hashes(reg: np.ndarray, hashes: np.ndarray) -> np.ndarray:
    """Fold uint64 hashes into registers (vectorized)."""
    if len(hashes) == 0:
        return reg
    p = int(np.log2(len(reg)))
    idx = (hashes >> np.uint64(64 - p)).astype(np.int64)
    rest = hashes << np.uint64(p)
    # rank = leading zeros of remaining 64-p bits + 1 (capped)
    # use bit_length via log2 on the complement trick: rank = 64-p+1 for rest==0
    nz = rest != 0
    rank = np.full(len(hashes), 64 - p + 1, dtype=np.uint8)
    if nz.any():
        # exact leading-zero count via integer ops (float log2 rounds values
        # just under a power of two UP, overstating the highest-bit position):
        # smear the top bit downward, then popcount == bit_length
        v = rest[nz].copy()
        for s in (1, 2, 4, 8, 16, 32):
            v |= v >> np.uint64(s)
        bitlen = np.unpackbits(v.view(np.uint8).reshape(-1, 8), axis=1).sum(
            axis=1, dtype=np.int64
        )
        rank[nz] = (64 - bitlen + 1).astype(np.uint8)
    np.maximum.at(reg, idx, rank)
    return reg


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


def hll_estimate(reg: np.ndarray) -> float:
    m = float(len(reg))
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.power(2.0, -reg.astype(np.float64)))
    zeros = float(np.count_nonzero(reg == 0))
    if est <= 2.5 * m and zeros > 0:
        est = m * np.log(m / zeros)  # small-range correction
    return float(est)


def approx_distinct_tokens_agg(
    text_col: str = "text", *, p: int = 12, seed: int = 1, name: str = "approx_distinct_tokens"
):
    """AggregateFn: approximate distinct-token count over a text column."""
    from ray.data.aggregate import AggregateFn

    from .textnorm import tokenize

    hasher = TokenHasher(seed)

    def accumulate_block(reg: np.ndarray, block) -> np.ndarray:
        reg = reg.copy()  # never mutate a shared partial
        for t in block[text_col].to_pylist():
            reg = hll_add_hashes(reg, splitmix64(hasher.hash_tokens(tokenize(t or ""))))
        return reg

    return AggregateFn(
        init=lambda k: hll_init(p),
        merge=hll_merge,
        accumulate_block=accumulate_block,
        finalize=lambda reg: int(round(hll_estimate(reg))),
        name=name,
    )
