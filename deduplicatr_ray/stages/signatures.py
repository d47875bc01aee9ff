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
from ..functions.hashing import (
    TokenHasher,
    make_permutations,
    minhash_segments,
    shingle_hashes,
    simhash_segments,
)
from ..functions.textnorm import tokenize

# Sentinel minhash value for docs with no shingles (M10): maximum uint64,
# never produced by the (mod p) permutation family, so short docs can never
# collide in an LSH band (they are handled by the exact-hash path only).
EMPTY_SENTINEL = np.uint64(0xFFFFFFFFFFFFFFFF)


class SignatureActor:
    """Callable class for ``map_batches(..., concurrency=N)`` actor pools."""

    def __init__(self, cfg: DedupConfig = CANONICAL) -> None:
        self.cfg = cfg
        self.hasher = TokenHasher(cfg.token_hash_seed)
        self.perm_a, self.perm_b = make_permutations(cfg.num_perm, cfg.perm_seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        texts = batch["text"].to_pylist()
        n = len(texts)

        shingle_segs: list[np.ndarray] = []
        tok_hash_parts: list[np.ndarray] = []
        tf_parts: list[np.ndarray] = []
        doc_idx_parts: list[np.ndarray] = []
        n_shingles = np.zeros(n, dtype=np.int64)

        for i, text in enumerate(texts):
            toks = tokenize(text)
            th = self.hasher.hash_tokens(toks)
            sh = shingle_hashes(th, cfg.shingle_w)
            n_shingles[i] = len(sh)
            shingle_segs.append(sh)
            if len(th):
                uniq, counts = np.unique(th, return_counts=True)
                tok_hash_parts.append(uniq)
                tf_parts.append(counts.astype(np.float64))
                doc_idx_parts.append(np.full(len(uniq), i, dtype=np.int64))

        # MinHash over the non-empty docs only, then scatter back.
        nonempty = np.flatnonzero(n_shingles > 0)
        minhash = np.full((n, cfg.num_perm), EMPTY_SENTINEL, dtype=np.uint64)
        if len(nonempty):
            concat = np.concatenate([shingle_segs[i] for i in nonempty])
            lens = np.array([n_shingles[i] for i in nonempty])
            starts = np.concatenate([[0], np.cumsum(lens)[:-1]]).astype(np.int64)
            minhash[nonempty] = minhash_segments(
                concat, starts, self.perm_a, self.perm_b
            )

        simhash = np.zeros(n, dtype=np.uint64)
        if tok_hash_parts:
            simhash = simhash_segments(
                np.concatenate(tok_hash_parts),
                np.concatenate(tf_parts),
                np.concatenate(doc_idx_parts),
                n,
            )

        sig8 = (minhash & np.uint64(0xFF)).astype(np.uint8)
        return pa.table(
            {
                "url": batch["url"],
                "text_sha1": batch["text_sha1"],
                "minhash": pa.FixedSizeListArray.from_arrays(
                    pa.array(minhash.reshape(-1), pa.uint64()), cfg.num_perm
                ),
                "sig8": pa.FixedSizeListArray.from_arrays(
                    pa.array(sig8.reshape(-1), pa.uint8()), cfg.num_perm
                ),
                "simhash": pa.array(simhash, pa.uint64()),
                "n_shingles": pa.array(n_shingles, pa.int64()),
            }
        )


def signature_stage(
    extracted,
    cfg: DedupConfig = CANONICAL,
    *,
    batch_size: int = 256,
    concurrency: int | tuple[int, int] = (2, 8),
):
    """EXTRACTED Dataset -> SIGNATURES Dataset (actor pool, 1 CPU/actor).

    ``batch_size`` is kept small because rows carry full page text
    (SURVEY.md §4.2 block-sizing row).
    """
    return extracted.map_batches(
        SignatureActor,
        fn_constructor_kwargs={"cfg": cfg},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
