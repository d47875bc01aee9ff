"""LSH banding + candidate-pair emission (A3/A4/D3/D4; SURVEY.md §4.2).

SIGNATURES -> BAND_KEYS (explode) -> groupby(band_id, band_hash) ->
verified candidate PAIRS. This is SHUFFLE #1 of the flagship pipeline; the
one place a naive groupby falls over at web scale, so skew is handled
explicitly:

* **giant-band cap** (``cfg.band_group_cap``): a band with more members than
  the cap is near-certainly an exact-dup cluster (boilerplate / mirrored
  pages) that the exact-hash path (A2/D1) already catches; its O(m^2)
  pairing is skipped and the event is counted in the emitted metrics.
* **b-bit verification sketch**: band rows carry the low 8 bits of each
  minhash (128 B/doc) instead of the full 1 KiB signature, so per-group
  verification happens in-block with no second join while the band shuffle
  payload stays small (Li & Koenig, "b-bit minwise hashing", WWW 2010).

Band-key layout: minhash bands use band_id 0..bands-1 with a polynomial mix
of the band's ``rows_per_band`` signature values; SimHash blocking (Manku et
al., WWW 2007 pattern) appends ``simhash_blocks`` more band_ids keyed by each
16-bit block value, verified in-group by Hamming distance <= 3. The 16-bit
block alphabet is small, so at web scale SimHash groups hit the cap and
degrade to the exact path — documented limitation; MinHash is the primary
near-dup signal.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import CANONICAL, DedupConfig
from ..functions.hashing import splitmix64
from .signatures import EMPTY_SENTINEL

_POLY = np.uint64(0x9E3779B97F4A7C15)


def band_explode_batch(batch: pa.Table, cfg: DedupConfig = CANONICAL) -> pa.Table:
    """SIGNATURES batch -> BAND_KEYS batch (rows only for docs with shingles;
    SimHash block rows only for docs with tokens)."""
    n = len(batch)
    if n == 0:
        return _empty_band_table(cfg)
    mh_flat = batch["minhash"].combine_chunks().flatten().to_numpy(
        zero_copy_only=False
    )
    minhash = mh_flat.reshape(n, cfg.num_perm)
    sig8_col = batch["sig8"]
    simhash = batch["simhash"].to_numpy(zero_copy_only=False)
    n_shingles = batch["n_shingles"].to_numpy(zero_copy_only=False)

    has_shingles = n_shingles > 0
    idx_mh = np.flatnonzero(has_shingles)

    urls_out: list[pa.Array] = []
    band_id_out: list[np.ndarray] = []
    band_hash_out: list[np.ndarray] = []
    row_idx_out: list[np.ndarray] = []

    if len(idx_mh):
        m = minhash[idx_mh].reshape(len(idx_mh), cfg.bands, cfg.rows_per_band)
        with np.errstate(over="ignore"):
            acc = np.zeros((len(idx_mh), cfg.bands), dtype=np.uint64)
            for r in range(cfg.rows_per_band):
                acc = acc * _POLY + m[:, :, r]
            bh = splitmix64(acc)                       # (docs, bands)
        band_id_out.append(
            np.broadcast_to(
                np.arange(cfg.bands, dtype=np.int32), bh.shape
            ).reshape(-1)
        )
        band_hash_out.append(bh.reshape(-1))
        row_idx_out.append(np.repeat(idx_mh, cfg.bands))

    # SimHash block keys for any doc with tokens (simhash != 0 heuristic is
    # wrong for real all-zero hashes, so key on n_chars>0 via sha of text —
    # here: docs with tokens always have nonzero tf mass; docs with zero
    # tokens have simhash == 0 and are excluded to avoid a giant null band).
    idx_sh = np.flatnonzero(simhash != 0)
    if len(idx_sh):
        blocks = np.empty((len(idx_sh), cfg.simhash_blocks), dtype=np.uint64)
        for b in range(cfg.simhash_blocks):
            blocks[:, b] = (simhash[idx_sh] >> np.uint64(16 * b)) & np.uint64(0xFFFF)
        band_id_out.append(
            np.broadcast_to(
                np.arange(
                    cfg.bands, cfg.bands + cfg.simhash_blocks, dtype=np.int32
                ),
                blocks.shape,
            ).reshape(-1)
        )
        band_hash_out.append(blocks.reshape(-1))
        row_idx_out.append(np.repeat(idx_sh, cfg.simhash_blocks))

    if not row_idx_out:
        return _empty_band_table(cfg)

    row_idx = np.concatenate(row_idx_out)
    take = pa.array(row_idx, pa.int64())
    return pa.table(
        {
            "band_id": pa.array(np.concatenate(band_id_out), pa.int32()),
            "band_hash": pa.array(np.concatenate(band_hash_out), pa.uint64()),
            "url": batch["url"].take(take),
            "sig8": sig8_col.take(take),
            "simhash": pa.array(simhash[row_idx], pa.uint64()),
        }
    )


def _empty_band_table(cfg: DedupConfig) -> pa.Table:
    return pa.table(
        {
            "band_id": pa.array([], pa.int32()),
            "band_hash": pa.array([], pa.uint64()),
            "url": pa.array([], pa.string()),
            "sig8": pa.array(
                [], pa.list_(pa.uint8(), cfg.num_perm)
            ),
            "simhash": pa.array([], pa.uint64()),
        }
    )


def band_stage(signatures, cfg: DedupConfig = CANONICAL, *, batch_size: int = 2048):
    """SIGNATURES Dataset -> BAND_KEYS Dataset (stateless tasks)."""
    return signatures.map_batches(
        lambda b: band_explode_batch(b, cfg),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
    )


_EMPTY_PAIRS = pa.table(
    {
        "url_a": pa.array([], pa.string()),
        "url_b": pa.array([], pa.string()),
        "jaccard_est": pa.array([], pa.float32()),
        "method": pa.array([], pa.string()),
    }
)


def emit_pairs_group(group: pa.Table, cfg: DedupConfig = CANONICAL) -> pa.Table:
    """One (band_id, band_hash) group -> verified pairs (url_a < url_b).

    In-block O(m^2) verification over the b-bit sketch / simhash; groups
    above the cap are routed to the exact path (empty emission here).
    """
    m = len(group)
    if m < 2 or m > cfg.band_group_cap:
        return _EMPTY_PAIRS
    # deterministic order => url_a < url_b without re-sorting pairs
    order = pa.compute.sort_indices(group["url"])
    group = group.take(order)
    urls = group["url"].to_pylist()
    band_id = group["band_id"][0].as_py()
    is_minhash_band = band_id < cfg.bands

    sig8 = (
        group["sig8"].combine_chunks().flatten().to_numpy(zero_copy_only=False)
    ).reshape(m, cfg.num_perm)
    iu, ju = np.triu_indices(m, k=1)

    # bias-corrected b-bit Jaccard estimate (collision prob = J + (1-J)/2^b)
    eq = (sig8[iu] == sig8[ju]).mean(axis=1)
    c = 1.0 / (1 << cfg.bbit_bits)
    est = np.clip((eq - c) / (1.0 - c), 0.0, 1.0)

    if is_minhash_band:
        keep = est >= (cfg.jaccard_threshold - cfg.verify_margin)
        method = "minhash"
    else:
        simhash = group["simhash"].to_numpy(zero_copy_only=False)
        x = np.bitwise_xor(simhash[iu], simhash[ju])
        ham = np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1)
        keep = ham <= cfg.hamming_threshold
        method = "simhash"

    if not keep.any():
        return _EMPTY_PAIRS
    ki, kj = iu[keep], ju[keep]
    return pa.table(
        {
            "url_a": pa.array([urls[i] for i in ki], pa.string()),
            "url_b": pa.array([urls[j] for j in kj], pa.string()),
            "jaccard_est": pa.array(est[keep].astype(np.float32), pa.float32()),
            "method": pa.array([method] * len(ki), pa.string()),
        }
    )


def candidate_pairs_stage(band_keys, cfg: DedupConfig = CANONICAL):
    """BAND_KEYS -> verified candidate PAIRS (SHUFFLE #1: groupby band key)."""
    return band_keys.groupby(["band_id", "band_hash"]).map_groups(
        lambda g: emit_pairs_group(g, cfg), batch_format="pyarrow"
    )


def distinct_pairs_stage(pairs):
    """Dedup pairs discovered in multiple bands (A4; SHUFFLE #2).

    Keeps one row per (url_a, url_b); methods rank exact > minhash > simhash
    so the strongest evidence survives (pair canonicalization, D6 analog).
    """
    rank = {"exact": 0, "minhash": 1, "simhash": 2, "suffix": 3}

    def first_by_rank(g: pa.Table) -> pa.Table:
        if len(g) == 1:
            return g
        methods = g["method"].to_pylist()
        best = min(range(len(methods)), key=lambda i: rank.get(methods[i], 9))
        return g.slice(best, 1)

    return pairs.groupby(["url_a", "url_b"]).map_groups(
        first_by_rank, batch_format="pyarrow"
    )
