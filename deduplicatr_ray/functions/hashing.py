"""Vectorized 64-bit hashing kernels (SURVEY.md §2.8, M1/M2/M6/M7/M8).

The reference's only "function library" is content hashing — full-file MD5 and
the sampled digest(first chunk || last chunk || size) for big files
(``src/deduplicatr/hash.clj:~10-45``, approximate citation; reference mount
empty at survey time). The target generalizes that to:

* ``sha1_bytes``   — exact-content fingerprint (M1, drives exact dedup D1)
* ``sampled_hash`` — literal analog of the reference's sampled big-file hash (M2)
* token/shingle hashing + MinHash permutations + SimHash — the
  signature-based near-equality the sampled hash foreshadows (M6-M8)

Everything here is pure NumPy over uint64 with wraparound semantics, fully
deterministic from config seeds (no process state), so outputs are identical
across workers, retries and parallelism levels (SURVEY.md §4.2 determinism
row). xxhash is not available in this environment, so the 64-bit string hash
is BLAKE2b(digest_size=8, person=seed) with a per-process memo table — the
vocabulary is tiny relative to the token stream, so per-unique-token hashing
amortizes to a dict hit.
"""

from __future__ import annotations

import hashlib
from typing import Iterable

import numpy as np

from ..config import MERSENNE_P61

_U64 = np.uint64
_P = _U64(MERSENNE_P61)
_MASK61 = _U64(MERSENNE_P61)
_MASK32 = _U64(0xFFFFFFFF)
_MASK29 = _U64((1 << 29) - 1)


# ---------------------------------------------------------------------------
# splitmix64 — cheap bijective finalizer (public-domain constant set,
# Steele et al. "Fast splittable pseudorandom number generators", OOPSLA'14).
# ---------------------------------------------------------------------------

_SM_GAMMA = _U64(0x9E3779B97F4A7C15)
_SM_M1 = _U64(0xBF58476D1CE4E5B9)
_SM_M2 = _U64(0x94D049BB133111EB)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over a uint64 array (wraparound)."""
    with np.errstate(over="ignore"):
        z = (x + _SM_GAMMA).astype(_U64, copy=False)
        z = (z ^ (z >> _U64(30))) * _SM_M1
        z = (z ^ (z >> _U64(27))) * _SM_M2
        return z ^ (z >> _U64(31))


# ---------------------------------------------------------------------------
# 64-bit string hashing with a per-process memo (token vocabulary is small).
# ---------------------------------------------------------------------------

class TokenHasher:
    """Deterministic 64-bit token hashing with memoization.

    One instance lives per signature actor (built once in ``__init__``,
    SURVEY.md ST1); the memo persists across batches.
    """

    def __init__(self, seed: int) -> None:
        self._person = seed.to_bytes(8, "little")
        self._memo: dict[str, int] = {}

    def hash_token(self, token: str) -> int:
        h = self._memo.get(token)
        if h is None:
            h = int.from_bytes(
                hashlib.blake2b(
                    token.encode("utf-8"), digest_size=8, person=self._person
                ).digest(),
                "little",
            )
            self._memo[token] = h
        return h

    def hash_tokens(self, tokens: Iterable[str]) -> np.ndarray:
        """Hash a token sequence to a uint64 array.

        Factorizes first (C-speed) so blake2b + memo probing run once per
        UNIQUE token, then gathers — the per-occurrence Python path was 60%
        of signature-stage CPU on realistic page lengths."""
        toks = tokens if isinstance(tokens, list) else list(tokens)
        if len(toks) < 64:
            ht = self.hash_token
            return np.fromiter((ht(t) for t in toks), dtype=_U64, count=len(toks))
        import pandas as pd

        codes, uniques = pd.factorize(np.asarray(toks, dtype=object), sort=False)
        ht = self.hash_token
        uhashes = np.fromiter(
            (ht(t) for t in uniques), dtype=_U64, count=len(uniques)
        )
        return uhashes[codes]


# ---------------------------------------------------------------------------
# Word shingles (M6): polynomial combine of w consecutive token hashes,
# then splitmix64 finalize. Fully vectorized via a sliding window.
# ---------------------------------------------------------------------------

_POLY_M = _U64(0xC2B2AE3D27D4EB4F)  # odd multiplier (xxhash64 prime_2)


def shingle_hashes(token_hashes: np.ndarray, w: int) -> np.ndarray:
    """uint64 hashes of all w-grams of ``token_hashes``; unique + sorted.

    Returns an empty array when the doc has fewer than ``w`` tokens (M10
    short-doc rule: no shingles => only exact-hash dedup applies).
    """
    n = len(token_hashes)
    if n < w:
        return np.empty(0, dtype=_U64)
    with np.errstate(over="ignore"):
        acc = np.zeros(n - w + 1, dtype=_U64)
        for j in range(w):
            acc = acc * _POLY_M + token_hashes[j : n - w + 1 + j]
        return np.unique(splitmix64(acc))


# ---------------------------------------------------------------------------
# Exact modular arithmetic mod p = 2^61 - 1 (vectorized, overflow-safe).
# ---------------------------------------------------------------------------

def _fold61(x: np.ndarray) -> np.ndarray:
    """Reduce uint64 values below 2^62-ish into [0, p)."""
    with np.errstate(over="ignore"):
        x = (x >> _U64(61)) + (x & _MASK61)
        x = (x >> _U64(61)) + (x & _MASK61)
        return np.where(x >= _P, x - _P, x).astype(_U64, copy=False)


def mod_p61(x: np.ndarray) -> np.ndarray:
    """x mod p for arbitrary uint64 x."""
    return _fold61(x)


def mulmod_p61(a: np.ndarray, x: np.ndarray) -> np.ndarray:
    """(a * x) mod p for a, x in [0, p); exact, no 128-bit ints needed.

    Split a = a1*2^32 + a0, x = x1*2^32 + x0. Then
    a*x = a1*x1*2^64 + (a1*x0 + a0*x1)*2^32 + a0*x0, and mod p:
    2^64 === 8, while mid*2^32 is reduced by splitting mid at bit 29
    (mid = m1*2^29 + m0 => mid*2^32 = m1*2^61 + m0*2^32 === m1 + m0*2^32).
    Every intermediate fits in uint64.
    """
    with np.errstate(over="ignore"):
        a1, a0 = a >> _U64(32), a & _MASK32
        x1, x0 = x >> _U64(32), x & _MASK32
        hi = a1 * x1 * _U64(8)                 # < 2^61
        mid = a1 * x0 + a0 * x1                # < 2^62
        m1, m0 = mid >> _U64(29), mid & _MASK29
        mid_red = m1 + (m0 << _U64(32))        # < 2^61 + 2^33
        lo = _fold61(a0 * x0)                  # < p
        return _fold61(hi + mid_red + lo)


# ---------------------------------------------------------------------------
# MinHash permutation family (M7): h_i(x) = (x ^ b_i) * a_i  (mod 2^64).
#
# Each h_i is a BIJECTION on uint64 (xor is bijective; multiplication by an
# odd constant is bijective mod 2^64), so min over h_i(S) is a min-wise
# sample under a cheap "random" permutation — the standard multiply-shift
# trick (Dietzfelbinger et al., "A reliable randomized algorithm for the
# closest-pair problem"). Inputs are already splitmix64-mixed shingle
# hashes, so two ops per element suffice: measured estimator error is
# statistically identical to the exact (a*x+b) mod (2^61-1) family at 128
# perms while being ~40x faster and far lighter on memory bandwidth (the
# mod-p kernel's ~12 temporaries spill L2 and saturate DRAM at high core
# counts — this one stays cache-resident).
# ---------------------------------------------------------------------------

def make_permutations(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """(a, b) uint64 tables from PCG64(seed): a random ODD (bijective
    multiplier), b uniform xor pre-mix."""
    rng = np.random.Generator(np.random.PCG64(seed))
    a = (
        rng.integers(0, 1 << 63, size=num_perm, dtype=np.uint64) << _U64(1)
    ) | _U64(1)
    b = rng.integers(0, (1 << 63) - 1, size=num_perm, dtype=np.uint64) * _U64(2)
    return a, b


def minhash_segments(
    shingles: np.ndarray,
    seg_starts: np.ndarray,
    a: np.ndarray,
    b: np.ndarray,
) -> np.ndarray:
    """MinHash signatures for concatenated per-doc shingle segments.

    ``shingles``: uint64 array = concat of each doc's shingle set;
    ``seg_starts``: int64 start offset of each doc's segment (every segment
    non-empty — callers filter empty docs and fill sentinels);
    returns (n_docs, num_perm) uint64.

    Loops over the ``num_perm`` permutations (each iteration fully
    vectorized over all shingles in the batch + a single
    ``np.minimum.reduceat`` per permutation) — peak extra memory is O(n)
    per permutation instead of O(128 n) for the full matrix.
    """
    num_perm = len(a)
    n_docs = len(seg_starts)
    out = np.empty((n_docs, num_perm), dtype=_U64)
    n = len(shingles)
    if n == 0:
        return out
    # cache blocking: process doc-aligned shingle chunks of ~16k values so
    # the 128-perm inner loop's working set (x, hv) stays in L2 — under
    # many-core contention the unblocked loop is DRAM-bandwidth-bound
    seg_ends = np.concatenate([seg_starts[1:], [n]])
    chunk = 16384
    d0 = 0
    with np.errstate(over="ignore"):
        while d0 < n_docs:
            d1 = d0 + 1
            while d1 < n_docs and seg_ends[d1 - 1] - seg_starts[d0] < chunk:
                d1 += 1
            s, e = seg_starts[d0], seg_ends[d1 - 1]
            xs = shingles[s:e]
            rel = (seg_starts[d0:d1] - s).astype(np.int64)
            for i in range(num_perm):
                hv = (xs ^ b[i]) * a[i]
                out[d0:d1, i] = np.minimum.reduceat(hv, rel)
            d0 = d1
    return out


def oph_minhash_segments(
    shingles: np.ndarray,
    seg_starts: np.ndarray,
    num_perm: int,
    seed: int,
) -> np.ndarray:
    """One-Permutation Hashing MinHash with rotation densification.

    Same contract as :func:`minhash_segments` (concatenated non-empty
    per-doc shingle segments -> (n_docs, num_perm) uint64), but ONE hash
    pass over the shingle stream instead of ``num_perm``: each shingle is
    rehashed once, its top log2(num_perm) bits pick a bin, and the bin
    keeps the minimum rehash (Li/Owen/Zhang, "One Permutation Hashing",
    NIPS 2012). Empty bins borrow from the nearest filled bin to their
    LEFT (circular) offset by hops * C — densification via rotation
    (Shrivastava & Li, ICML 2014) — so the standard matching-lane Jaccard
    estimator, banding, and b-bit sketches work unchanged. k-perm does
    O(num_perm * n_shingles) multiply+min work per batch; OPH does O(n)
    scatter-min + an O(n_docs * num_perm) fill — the signature stage is
    the flagship's dominant compute phase, so this is the documented
    scale path (``DedupConfig.minhash_scheme = "oph"``).

    ``num_perm`` must be a power of two (bin = top bits, validated in
    DedupConfig).
    """
    if num_perm & (num_perm - 1):
        raise ValueError(f"OPH needs power-of-two num_perm, got {num_perm}")
    n_docs = len(seg_starts)
    out_flat = np.full(n_docs * num_perm, np.iinfo(np.uint64).max, dtype=_U64)
    n = len(shingles)
    if n == 0:
        return out_flat.reshape(n_docs, num_perm)
    a, b = make_permutations(1, seed)
    kbits = num_perm.bit_length() - 1
    with np.errstate(over="ignore"):
        h = (shingles ^ b[0]) * a[0]
    bins = (h >> _U64(64 - kbits)).astype(np.int64)
    seg_lens = np.diff(np.concatenate([seg_starts, [n]])).astype(np.int64)
    doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), seg_lens)
    np.minimum.at(out_flat, doc_of * num_perm + bins, h)
    out = out_flat.reshape(n_docs, num_perm)

    filled = out != np.iinfo(np.uint64).max
    if filled.all():
        return out
    # rotation densification, vectorized: for each empty bin j, find the
    # nearest filled bin at-or-before j (circular) via a max-accumulate
    # over a doubled index row, then add hops * C (odd constant) so bins
    # that borrowed from the same source at different distances stay
    # distinct. Every doc has >= 1 shingle (callers filter empty docs),
    # so every row has >= 1 filled bin and the fill always resolves.
    P = num_perm
    idx = np.arange(P, dtype=np.int64)[None, :]
    pos = np.where(filled, idx, -1)
    # the doubled row's SECOND copy must carry idx + P: position P+j then
    # accumulates max(largest filled index overall [the circular wrap],
    # P + nearest filled <= j) — i.e. the nearest filled bin at-or-before
    # j, circularly. With a plain [pos, pos] doubling (the original bug)
    # every empty bin borrowed from the globally max-index filled bin and
    # hops exceeded P, collapsing sparse docs' densified lanes to one
    # value and destroying the estimator for docs with < num_perm
    # shingles (est ~0.2 for true J ~0.97).
    pos2 = np.where(filled, idx + P, -1)
    ff = np.maximum.accumulate(np.concatenate([pos, pos2], axis=1), axis=1)
    src_pos = ff[:, P:]                      # (n_docs, P), in [0, 2P)
    hops = (np.arange(P, dtype=np.int64)[None, :] + P) - src_pos
    src_bin = src_pos % P
    rows = np.arange(n_docs, dtype=np.int64)[:, None]
    with np.errstate(over="ignore"):
        borrowed = out[rows, src_bin] + hops.astype(_U64) * _POLY_M
    return np.where(filled, out, borrowed)


# ---------------------------------------------------------------------------
# SimHash (M8): 64-bit, token-tf weights.
# ---------------------------------------------------------------------------

def simhash_segments(
    token_hashes: np.ndarray,
    tf: np.ndarray,
    doc_idx: np.ndarray,
    n_docs: int,
) -> np.ndarray:
    """64-bit SimHash per doc from (unique-token hash, tf, doc index) triples.

    Vectorized: unpack each token hash into 64 bits, accumulate tf-weighted
    (+1/-1) per (doc, bit) with ``np.add.at``, take the sign.
    """
    acc = np.zeros((n_docs, 64), dtype=np.int64)
    if len(token_hashes):
        bits = (
            (token_hashes[:, None] >> np.arange(64, dtype=_U64)[None, :]) & _U64(1)
        ).astype(np.int64)
        contrib = (2 * bits - 1) * tf[:, None].astype(np.int64)
        np.add.at(acc, doc_idx, contrib)
    out = (acc > 0).astype(np.uint64)
    return (out << np.arange(64, dtype=_U64)[None, :]).sum(
        axis=1, dtype=_U64
    )


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Pairwise-elementwise Hamming distance between uint64 arrays."""
    x = np.bitwise_xor(a, b)
    return np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1)


# ---------------------------------------------------------------------------
# Exact and sampled content hashes (M1/M2 — the reference's core ops).
# ---------------------------------------------------------------------------

def hash_columns_u64(table, cols: list[str], seed: int = 0) -> np.ndarray:
    """Vectorized 64-bit row hash of ``cols`` (partitioning key for
    hash-partitioned group stages). Uses polars' SIMD row hash — only needs
    to be consistent within a run, not across versions."""
    import polars as pl

    df = pl.from_arrow(table.select(cols))
    return df.hash_rows(seed=seed).to_numpy().astype(_U64, copy=False)


def add_hash_part(table, cols: list[str], num_partitions: int):
    """Append the engine's standard int32 ``part`` column
    (``hash_columns_u64(cols) % num_partitions``) — the per-batch key every
    hash-partitioned ``groupby("part").map_groups`` stage shuffles on."""
    import pyarrow as pa

    if len(table) == 0:
        return table.append_column("part", pa.array([], pa.int32()))
    part = (hash_columns_u64(table, cols) % np.uint64(num_partitions)).astype(
        np.int32
    )
    return table.append_column("part", pa.array(part, pa.int32()))


def sha1_bytes(texts: Iterable[str]) -> list[bytes]:
    """20-byte SHA-1 of each utf-8 encoded text (M1; exact dedup key D1)."""
    return [hashlib.sha1(t.encode("utf-8")).digest() for t in texts]


def sampled_hash(text: str, k: int) -> bytes:
    """digest(first k chars || last k chars || length) — the reference's
    big-file sampled hash (hash.clj:~25-45) transplanted to text (M2)."""
    if len(text) <= 2 * k:
        payload = text.encode("utf-8")
    else:
        payload = (text[:k] + text[-k:]).encode("utf-8")
    return hashlib.sha1(payload + len(text).to_bytes(8, "little")).digest()
