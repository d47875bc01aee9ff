"""Signature stage (M6/M7/M8, ST1): EXTRACTED -> SIGNATURES.

Stateful actor-pool ``map_batches`` stage (BASELINE.json:15 "actor pools
holding hasher state"): the MinHash permutation tables, SimHash bit masks and
the token-hash memo are built ONCE per actor in ``__init__`` and reused for
every batch. The per-batch body is vectorized NumPy — per-doc shingle sets
are concatenated into one array and reduced with ``np.minimum.reduceat``.

This generalizes the reference's per-file digest (``hash.clj:~10-45``,
approximate citation — mount empty at survey time) to signature-based
near-equality, the same trade its sampled big-file hash makes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import CANONICAL, DedupConfig
from ..functions.hashing import TokenHasher, make_permutations, minhash_segments
from ..functions.textnorm import tokenize

# Sentinel minhash value for docs with no shingles (M10). Banding excludes
# docs with n_shingles == 0 explicitly, so the sentinel is cosmetic — short
# docs are handled by the exact-hash path only.
EMPTY_SENTINEL = np.uint64(0xFFFFFFFFFFFFFFFF)


_POLY_BAND = np.uint64(0x9E3779B97F4A7C15)


def band_hashes_from_minhash(minhash: np.ndarray, cfg: DedupConfig) -> np.ndarray:
    """(n, num_perm) minhash -> (n, bands) band hashes (poly-mix of each
    band's rows_per_band values + splitmix64 finalize)."""
    from ..functions.hashing import splitmix64

    n = len(minhash)
    m = minhash.reshape(n, cfg.bands, cfg.rows_per_band)
    with np.errstate(over="ignore"):
        acc = np.zeros((n, cfg.bands), dtype=np.uint64)
        for r in range(cfg.rows_per_band):
            acc = acc * _POLY_BAND + m[:, :, r]
        return splitmix64(acc)


def pack_sketch(minhash: np.ndarray, cfg: DedupConfig) -> np.ndarray:
    """(n, num_perm) minhash -> (n, sketch_width) packed b-bit verification
    sketch (Li & Koenig, "b-bit minwise hashing", WWW 2010): the low
    ``bbit_bits`` of each lane; at b=4 two lanes share a byte (low nibble =
    even lane, high nibble = odd lane)."""
    if cfg.bbit_bits == 8:
        return (minhash & np.uint64(0xFF)).astype(np.uint8)
    if cfg.bbit_bits != 4:
        raise ValueError(f"bbit_bits must be 4 or 8, got {cfg.bbit_bits}")
    lanes = (minhash & np.uint64(0xF)).astype(np.uint8)
    return lanes[:, 0::2] | (lanes[:, 1::2] << 4)


def sketch_eq_mean(a: np.ndarray, b: np.ndarray, cfg: DedupConfig) -> np.ndarray:
    """Mean per-lane agreement between packed sketch row-pairs
    ((m, sketch_width) uint8 each) — the raw b-bit match rate the
    bias-corrected Jaccard estimate is derived from."""
    if cfg.bbit_bits == 8:
        return (a == b).mean(axis=1)
    lo = ((a & 0xF) == (b & 0xF)).sum(axis=1)
    hi = ((a >> 4) == (b >> 4)).sum(axis=1)
    return (lo + hi) / cfg.num_perm


class SignatureActor:
    """Callable class for ``map_batches(..., concurrency=N)`` actor pools.

    ``keep_minhash=False`` (the flagship setting) drops the 1 KiB/doc raw
    minhash column after folding it into per-band hashes (bands x 8 B) —
    the only downstream consumers are banding (band_hashes) and
    verification (sig8), so the materialized SIGNATURES table shrinks ~4x.
    """

    def __init__(self, cfg: DedupConfig = CANONICAL, keep_minhash: bool = True) -> None:
        self.cfg = cfg
        self.keep_minhash = keep_minhash
        self.hasher = TokenHasher(cfg.token_hash_seed)
        self.perm_a, self.perm_b = make_permutations(cfg.num_perm, cfg.perm_seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Whole-batch vectorized body: ONE token-hash pass over the flat
        token stream, batch-level sliding-window shingling with boundary
        masking, and reduceat-based SimHash — no per-doc NumPy calls.

        MinHash is taken over the MULTISET of w-gram hashes (min over a
        multiset equals min over its set, so signatures are identical to
        set semantics); ``n_shingles`` is therefore the w-gram WINDOW count
        (0 iff the doc has < w tokens, the M10 short-doc gate).
        """
        cfg = self.cfg
        w = cfg.shingle_w
        texts = batch["text"].to_pylist()
        n = len(texts)

        toks_per_doc = [tokenize(t) for t in texts]
        n_tokens = np.fromiter(
            (len(t) for t in toks_per_doc), dtype=np.int64, count=n
        )
        flat_tokens: list[str] = [t for doc in toks_per_doc for t in doc]
        th_flat = self.hasher.hash_tokens(flat_tokens)
        tok_bounds = np.concatenate([[0], np.cumsum(n_tokens)])
        nt = len(th_flat)

        # --- shingles: one poly-combine over the flat stream; windows that
        # cross doc boundaries are masked out via a +1/-1 range delta.
        n_shingles = np.maximum(n_tokens - w + 1, 0)
        minhash = np.full((n, cfg.num_perm), EMPTY_SENTINEL, dtype=np.uint64)
        nonempty = np.flatnonzero(n_shingles > 0)
        if nt >= w and len(nonempty):
            from ..functions.hashing import _POLY_M, splitmix64

            with np.errstate(over="ignore"):
                acc = np.zeros(nt - w + 1, dtype=np.uint64)
                for j in range(w):
                    acc = acc * _POLY_M + th_flat[j : nt - w + 1 + j]
            sh_all = splitmix64(acc)
            delta = np.zeros(nt - w + 2, dtype=np.int64)
            vs = tok_bounds[:-1][nonempty]
            delta[vs] += 1
            delta[vs + n_shingles[nonempty]] -= 1
            valid = np.cumsum(delta[:-1]) > 0
            sh_flat = sh_all[valid]
            starts = np.concatenate(
                [[0], np.cumsum(n_shingles[nonempty])[:-1]]
            ).astype(np.int64)
            if cfg.minhash_scheme == "oph":
                from ..functions.hashing import oph_minhash_segments

                minhash[nonempty] = oph_minhash_segments(
                    sh_flat, starts, cfg.num_perm, cfg.perm_seed
                )
            else:
                minhash[nonempty] = minhash_segments(
                    sh_flat, starts, self.perm_a, self.perm_b
                )

        # --- SimHash: tf-weighted sign-of-sum == sum over token OCCURRENCES,
        # so no per-doc unique: unpack bits of every token hash and reduceat.
        # Chunked on doc boundaries (~16k tokens) so the bit matrix stays
        # ~1 MB — the unchunked version streams tens of MB per batch through
        # DRAM and saturates bandwidth at high core counts.
        simhash = np.zeros(n, dtype=np.uint64)
        has_tokens = np.flatnonzero(n_tokens > 0)
        if len(has_tokens):
            weights = (np.uint64(1) << np.arange(64, dtype=np.uint64))[None, :]
            ht_starts = tok_bounds[:-1][has_tokens]
            ht_ends = tok_bounds[1:][has_tokens]
            nh = len(has_tokens)
            chunk = 16384
            d0 = 0
            while d0 < nh:
                d1 = d0 + 1
                while d1 < nh and ht_ends[d1 - 1] - ht_starts[d0] < chunk:
                    d1 += 1
                s, e = ht_starts[d0], ht_ends[d1 - 1]
                bits = np.unpackbits(
                    th_flat[s:e].view(np.uint8).reshape(-1, 8),
                    axis=1,
                    bitorder="little",
                )
                sums = np.add.reduceat(
                    bits, (ht_starts[d0:d1] - s).astype(np.int64), axis=0,
                    dtype=np.int64,
                )
                majority = (2 * sums) > n_tokens[has_tokens[d0:d1]][:, None]
                simhash[has_tokens[d0:d1]] = (
                    majority.astype(np.uint64) * weights
                ).sum(axis=1, dtype=np.uint64)
                d0 = d1

        sig8 = pack_sketch(minhash, cfg)
        cols: dict = {"url": batch["url"], "text_sha1": batch["text_sha1"]}
        if self.keep_minhash:
            cols["minhash"] = pa.FixedSizeListArray.from_arrays(
                pa.array(minhash.reshape(-1), pa.uint64()), cfg.num_perm
            )
        bh = band_hashes_from_minhash(minhash, cfg)
        cols["band_hashes"] = pa.FixedSizeListArray.from_arrays(
            pa.array(bh.reshape(-1), pa.uint64()), cfg.bands
        )
        cols["sig8"] = pa.FixedSizeListArray.from_arrays(
            pa.array(sig8.reshape(-1), pa.uint8()), cfg.sketch_width
        )
        cols["simhash"] = pa.array(simhash, pa.uint64())
        cols["n_shingles"] = pa.array(n_shingles, pa.int64())
        return pa.table(cols)


def signature_stage(
    extracted,
    cfg: DedupConfig = CANONICAL,
    *,
    batch_size: int = 256,
    concurrency: int | tuple[int, int] = (2, 8),
    keep_minhash: bool = False,
):
    """EXTRACTED Dataset -> SIGNATURES Dataset (actor pool, 1 CPU/actor).

    ``batch_size`` is kept small because rows carry full page text
    (SURVEY.md §4.2 block-sizing row).
    """
    return extracted.map_batches(
        SignatureActor,
        fn_constructor_kwargs={"cfg": cfg, "keep_minhash": keep_minhash},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
