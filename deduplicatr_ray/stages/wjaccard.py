"""Weighted-Jaccard near-duplicate family: documents as token
MULTISETS (tf vectors), similarity = sum(min(tf_a, tf_b)) /
sum(max(tf_a, tf_b)).

Plain (unweighted) MinHash treats "spam spam spam spam" and "spam" as
identical sets; weighted Jaccard does not — it is the right notion for
boilerplate- and repetition-heavy web text.

Two operators, the engine's standard anchor + scale-path pairing
(cf. ngram_jaccard_all / minhash_near_dups):

- ``weighted_jaccard_all`` — EXACT corpus-wide pairs via a token-postings
  join with an integer threshold test (``den*minsum >= num*(ta+tb-minsum)``
  — no floats, bit-exact vs the DuckDB oracle). Quadratic in per-token df
  by definition; this is the oracle anchor, not the scale path.
- ``wminhash_near_dups`` — Ioffe's Consistent Weighted Sampling (ICML
  2010): K independent samples per doc where
  ``P[sig_k(a) == sig_k(b)] == J_w(a, b)`` exactly; banded LSH over the
  samples for candidate generation, full-signature agreement as the
  similarity estimate. Sub-quadratic: work scales with docs x K plus
  band-bucket pair volume.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_U64 = np.uint64
_GOLD = _U64(0x9E3779B97F4A7C15)


def _doc_totals(t: pa.Table) -> np.ndarray:
    """(doc_id, token, tf) rows (doc-major) -> per-ROW total tf of its doc."""
    doc = t["doc_id"].to_numpy(zero_copy_only=False)
    tf = t["tf"].to_numpy(zero_copy_only=False)
    starts = np.flatnonzero(np.diff(doc, prepend=doc[0] - 1)) if len(doc) else np.empty(0, np.int64)
    sums = np.add.reduceat(tf, starts) if len(doc) else np.empty(0, np.int64)
    lens = np.diff(np.append(starts, len(doc)))
    return np.repeat(sums, lens)


def weighted_jaccard_all(
    docs,
    *,
    threshold_num: int = 7,
    threshold_den: int = 10,
    num_partitions: int | None = None,
):
    """EXACT corpus-wide tf-weighted Jaccard pairs (J_w >= num/den).

    Shape: per-batch exact (doc, token, tf) postings with the per-doc
    total riding each row (8 B — avoids any totals join), ONE
    hash-partition shuffle on token, per-partition vectorized pair
    emission (triu over each token run) pre-aggregated to per-pair
    partial minsums, then a small combinable pair groupby and the
    integer threshold filter. All arithmetic int64 (tf sums are doc
    lengths — no overflow at any realistic doc size).

    Output: ``id_a, id_b, n_min, n_union`` with
    ``J_w = n_min / n_union >= threshold``.
    """
    import pyarrow.compute as pc

    from ..functions.hashing import hash_columns_u64
    from .lsh import default_num_partitions
    from .textstats import term_counts_batch

    P = int(num_partitions or default_num_partitions())
    NUM, DEN = int(threshold_num), int(threshold_den)

    def postings(batch: pa.Table):
        t = term_counts_batch(batch)
        if len(t) == 0:
            return
        tot = _doc_totals(t)
        h = hash_columns_u64(t, ["token"])
        yield (
            t.append_column("total", pa.array(tot, pa.int64())).append_column(
                "part", pa.array((h % _U64(P)).astype(np.int32), pa.int32())
            )
        )

    def pair_block(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["part"])
        order = pc.sort_indices(
            g, sort_keys=[("token", "ascending"), ("doc_id", "ascending")]
        )
        g = g.take(order)
        tok = g["token"].combine_chunks()
        n = len(g)
        doc = g["doc_id"].to_numpy(zero_copy_only=False)
        tf = g["tf"].to_numpy(zero_copy_only=False)
        tot = g["total"].to_numpy(zero_copy_only=False)
        neq = pc.not_equal(tok.slice(1), tok.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        )
        starts = np.concatenate([[0], np.flatnonzero(neq) + 1])
        lens = np.diff(np.append(starts, n))
        ia_parts, ib_parts, m_parts, ta_parts, tb_parts = [], [], [], [], []
        # loop over token RUNS (vocab-sized, not row-sized); each run's
        # pair expansion is one vectorized triu
        for s, m in zip(starts, lens):
            if m < 2:
                continue
            i, j = np.triu_indices(int(m), 1)
            ia_parts.append(doc[s + i])
            ib_parts.append(doc[s + j])
            m_parts.append(np.minimum(tf[s + i], tf[s + j]))
            ta_parts.append(tot[s + i])
            tb_parts.append(tot[s + j])
        if not ia_parts:
            return pa.table(
                {
                    "id_a": pa.array([], pa.int64()),
                    "id_b": pa.array([], pa.int64()),
                    "mins": pa.array([], pa.int64()),
                    "ta": pa.array([], pa.int64()),
                    "tb": pa.array([], pa.int64()),
                }
            )
        ia = np.concatenate(ia_parts)
        ib = np.concatenate(ib_parts)
        mins = np.concatenate(m_parts)
        ta = np.concatenate(ta_parts)
        tb = np.concatenate(tb_parts)
        # pre-aggregate per pair within the partition (one lexsort +
        # reduceat) so the final shuffle carries pairs, not postings
        key_order = np.lexsort((ib, ia))
        ia, ib = ia[key_order], ib[key_order]
        mins, ta, tb = mins[key_order], ta[key_order], tb[key_order]
        new = np.concatenate(
            [[True], (ia[1:] != ia[:-1]) | (ib[1:] != ib[:-1])]
        )
        ps = np.flatnonzero(new)
        return pa.table(
            {
                "id_a": pa.array(ia[ps], pa.int64()),
                "id_b": pa.array(ib[ps], pa.int64()),
                "mins": pa.array(np.add.reduceat(mins, ps), pa.int64()),
                "ta": pa.array(ta[ps], pa.int64()),
                "tb": pa.array(tb[ps], pa.int64()),
            }
        )

    def pair_part(b: pa.Table) -> pa.Table:
        h = hash_columns_u64(b, ["id_a", "id_b"])
        return b.append_column(
            "part", pa.array((h % _U64(P)).astype(np.int32), pa.int32())
        )

    _EMPTY_PAIRS = pa.table(
        {
            "id_a": pa.array([], pa.int64()),
            "id_b": pa.array([], pa.int64()),
            "n_min": pa.array([], pa.int64()),
            "n_union": pa.array([], pa.int64()),
        }
    )

    def reduce_block(g: pa.Table):
        # one lexsort + reduceat instead of Ray's generic 2-key aggregate
        # (profiled: the global groupby(["id_a","id_b"]).aggregate() cost
        # 40+ s on ~2.5 M partial-pair rows at sf0.01)
        g = g.drop_columns(["part"])
        ia = g["id_a"].to_numpy(zero_copy_only=False)
        ib = g["id_b"].to_numpy(zero_copy_only=False)
        mins = g["mins"].to_numpy(zero_copy_only=False)
        ta = g["ta"].to_numpy(zero_copy_only=False)
        tb = g["tb"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ib, ia))
        ia, ib = ia[order], ib[order]
        mins, ta, tb = mins[order], ta[order], tb[order]
        new = np.concatenate([[True], (ia[1:] != ia[:-1]) | (ib[1:] != ib[:-1])])
        ps = np.flatnonzero(new)
        n_min = np.add.reduceat(mins, ps)
        union = ta[ps] + tb[ps] - n_min  # totals constant per doc
        keep = DEN * n_min >= NUM * union
        if not keep.any():
            return _EMPTY_PAIRS
        sel = ps[keep]
        return pa.table(
            {
                "id_a": pa.array(ia[sel], pa.int64()),
                "id_b": pa.array(ib[sel], pa.int64()),
                "n_min": pa.array(n_min[keep], pa.int64()),
                "n_union": pa.array(union[keep], pa.int64()),
            }
        )

    return (
        docs.map_batches(postings, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(pair_block, batch_format="pyarrow")
        .map_batches(pair_part, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(
            lambda g: reduce_block(g), batch_format="pyarrow"
        )
    )


# ---------------------------------------------------------------------------
# Consistent Weighted Sampling (Ioffe, "Improved Consistent Sampling,
# Weighted Minhash and L1 Sketching", ICML 2010)


def _unit(h: np.ndarray) -> np.ndarray:
    """uint64 hash -> uniform (0, 1] double (53 mantissa bits)."""
    return ((h >> _U64(11)).astype(np.float64) + 1.0) * (2.0**-53)


def cws_signatures(
    doc_idx: np.ndarray,
    tok_hash: np.ndarray,
    tf: np.ndarray,
    n_docs: int,
    *,
    num_perm: int = 64,
    seed: int = 1234,
) -> np.ndarray:
    """(n_docs, num_perm) uint64 CWS samples over doc-major flat postings.

    Per sample k and token t: r, c ~ Gamma(2,1) and beta ~ U(0,1) derived
    deterministically from splitmix64 streams of (token hash, k); the
    sampled token minimizes ``ln a = ln c - r*(floor(ln w/r + beta) -
    beta) - r`` and the emitted value hashes (token, quantized level), so
    ``P[sig_k(A) == sig_k(B)] = J_w(A, B)`` exactly. Vectorized over all
    postings per k (the Python loop is num_perm-sized, not row-sized).
    """
    from ..functions.hashing import splitmix64

    m = len(doc_idx)
    sig = np.zeros((n_docs, num_perm), np.uint64)
    if m == 0:
        return sig
    starts = np.flatnonzero(np.diff(doc_idx, prepend=doc_idx[0] - 1))
    seg_of = np.repeat(np.arange(len(starts)), np.diff(np.append(starts, m)))
    present = np.unique(doc_idx[starts])  # doc rows that have tokens
    lnw = np.log(tf.astype(np.float64))
    th = tok_hash.astype(_U64)
    for k in range(num_perm):
        with np.errstate(over="ignore"):  # uint64 wrap is the hash mix
            salt = _U64(k * 2 + 1) * _GOLD
        h = splitmix64(th ^ salt ^ _U64(seed))
        h2 = splitmix64(h)
        h3 = splitmix64(h2)
        h4 = splitmix64(h3)
        h5 = splitmix64(h4)
        r = -np.log(_unit(h) * _unit(h2))  # Gamma(2,1)
        c = -np.log(_unit(h3) * _unit(h4))  # Gamma(2,1)
        beta = _unit(h5)
        t_k = np.floor(lnw / r + beta)
        lna = np.log(c) - r * (t_k - beta) - r
        mins = np.minimum.reduceat(lna, starts)
        cand = np.flatnonzero(lna == mins[seg_of])
        _, first = np.unique(doc_idx[cand], return_index=True)
        arg = cand[np.sort(first)]
        val = splitmix64(
            th[arg] ^ splitmix64(t_k[arg].astype(np.int64).view(_U64))
        )
        sig[present, k] = val
    return sig


def wminhash_near_dups(
    docs,
    *,
    num_perm: int = 256,
    bands: int = 16,
    band_rows: int = 4,
    threshold: float = 0.7,
    group_cap: int = 1024,
    num_partitions: int | None = None,
    seed: int = 1234,
):
    """Weighted-MinHash near-dup pairs: CWS signatures -> banded LSH over
    the first ``bands * band_rows`` samples -> bias-corrected byte-packed
    agreement estimate over all ``num_perm`` samples, keep
    ``jw_est >= threshold``.

    Scale shape: one streaming signature pass (doc x num_perm work), one
    hash-partition band groupby whose rows carry the band key, the doc id
    and a 1-BYTE-per-sample estimate payload (the 8-bit packing of each
    sample; byte agreement = J + (1-J)/256, inverted exactly below — the
    same b-bit diet as the unweighted minhash path). The first version
    shipped the full 8 B samples per band: 64 bands x 2 KB = 128 KB/doc,
    69 s at sf0.1; this layout ships 16 x (256 B + keys) ~= 4 KB/doc and
    runs in ~3 s. Buckets above ``group_cap`` are skipped (skew policy,
    same as ann_lsh).

    Output: ``id_a, id_b, jw_est`` (bias-corrected; sd ~=
    sqrt(J(1-J)/num_perm) ~= 0.029 at the defaults, so accepts sit within
    ~2 sd below ``threshold`` — measured at sf0.01: recall 1.0 vs the
    exact anchor).
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Max

    from ..functions.hashing import hash_columns_u64, splitmix64
    from .lsh import default_num_partitions
    from .textstats import term_counts_batch

    P = int(num_partitions or default_num_partitions())
    K = int(num_perm)
    B = int(bands)
    ROWS = int(band_rows)
    assert B * ROWS <= K
    # byte-collision bias inversion: E[byte_eq] = J + (1 - J)/256
    _COLL = 1.0 / 256.0

    def signatures(batch: pa.Table):
        t = term_counts_batch(batch)
        if len(t) == 0:
            return
        doc = t["doc_id"].to_numpy(zero_copy_only=False)
        udoc, inv = np.unique(doc, return_inverse=True)
        th = hash_columns_u64(t, ["token"])
        sig = cws_signatures(
            inv,
            th,
            t["tf"].to_numpy(zero_copy_only=False),
            len(udoc),
            num_perm=K,
            seed=seed,
        )
        n = len(udoc)
        sig8 = (sig & _U64(0xFF)).astype(np.uint8)  # (n, K) estimate payload
        out_doc = np.repeat(udoc, B)
        bkey = np.zeros((n, B), np.uint64)
        for b in range(B):
            with np.errstate(over="ignore"):  # uint64 wrap is the hash mix
                acc = _U64(b * 2 + 1) * _GOLD
            for rr in range(ROWS):
                acc = splitmix64(sig[:, b * ROWS + rr] ^ acc)
            bkey[:, b] = acc
        flat_key = bkey.reshape(-1)
        yield pa.table(
            {
                "bkey": pa.array(flat_key.view(np.int64), pa.int64()),
                "doc_id": pa.array(out_doc, pa.int64()),
                "sig8": pa.Array.from_buffers(
                    pa.binary(K),
                    n * B,
                    [None, pa.py_buffer(np.repeat(sig8, B, axis=0).tobytes())],
                ),
                "part": pa.array(
                    (flat_key % _U64(P)).astype(np.int32), pa.int32()
                ),
            }
        )

    def verify_block(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["part"])
        n = len(g)
        order = pc.sort_indices(
            g, sort_keys=[("bkey", "ascending"), ("doc_id", "ascending")]
        )
        g = g.take(order)
        bk = g["bkey"].to_numpy(zero_copy_only=False)
        doc = g["doc_id"].to_numpy(zero_copy_only=False)
        sig8_arr = g["sig8"].combine_chunks()
        # zero-copy view of the fixed-size-binary data buffer
        off = sig8_arr.offset * K
        sig = np.frombuffer(sig8_arr.buffers()[1], dtype=np.uint8)[
            off : off + n * K
        ].reshape(n, K)
        starts = np.flatnonzero(np.concatenate([[True], bk[1:] != bk[:-1]]))
        lens = np.diff(np.append(starts, n))
        ia_p, ib_p, je_p = [], [], []
        for s, m in zip(starts, lens):
            if m < 2 or m > group_cap:
                continue
            # dedupe same doc reaching one bucket via several bands
            ud, ui = np.unique(doc[s : s + m], return_index=True)
            if len(ud) < 2:
                continue
            i, j = np.triu_indices(len(ud), 1)
            sa = sig[s + ui]
            raw = (sa[i] == sa[j]).mean(axis=1)
            je = (raw - _COLL) / (1.0 - _COLL)
            keep = je >= threshold
            if keep.any():
                ia_p.append(ud[i[keep]])
                ib_p.append(ud[j[keep]])
                je_p.append(je[keep])
        if not ia_p:
            return pa.table(
                {
                    "id_a": pa.array([], pa.int64()),
                    "id_b": pa.array([], pa.int64()),
                    "jw_est": pa.array([], pa.float64()),
                }
            )
        return pa.table(
            {
                "id_a": pa.array(np.concatenate(ia_p), pa.int64()),
                "id_b": pa.array(np.concatenate(ib_p), pa.int64()),
                "jw_est": pa.array(np.concatenate(je_p), pa.float64()),
            }
        )

    return (
        docs.map_batches(signatures, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(verify_block, batch_format="pyarrow")
        .groupby(["id_a", "id_b"])
        .aggregate(Max("jw_est", alias_name="jw_est"))
    )


def wminhash_verified(
    docs,
    *,
    threshold_num: int = 7,
    threshold_den: int = 10,
    est_margin: float = 0.15,
    id_col: str = "doc_id",
    **cws_kwargs,
):
    """Production weighted-Jaccard near-dup pairs: CWS banded candidates ->
    EXACT verification, the standard candidates-then-verify pattern (same
    shape as ngram_verify_join for unweighted Jaccard).

    Stage 1 runs the sub-quadratic CWS/LSH sketch pass with the estimate
    cut LOWERED by ``est_margin`` (the 256-sample estimator's sd is ~0.029
    at J=0.7, so 0.15 is a ~5-sigma recall margin). Stage 2 pulls only the
    candidate DOC-ID column to the driver (the small side — scales with
    near-dup content, not corpus size; same broadcast policy as
    ``ngram_verify_join``), filters the corpus to candidate docs, and runs
    the exact integer-threshold postings join over just those docs.

    Output ``(id_a, id_b, n_min, n_union)`` — bit-identical to
    ``weighted_jaccard_all`` whenever the banding recalls every
    ``J_w >= threshold`` pair (measured 1.0 at sf0.01), so the same DuckDB
    oracle verifies BOTH the anchor and this scale path.
    """
    import pyarrow.compute as pc

    est_cut = threshold_num / threshold_den - est_margin
    cands = wminhash_near_dups(docs, threshold=est_cut, **cws_kwargs)

    ids: set[int] = set()
    for b in cands.select_columns(["id_a", "id_b"]).iter_batches(
        batch_size=1 << 18, batch_format="pyarrow"
    ):
        ids.update(b["id_a"].to_pylist())
        ids.update(b["id_b"].to_pylist())
    if not ids:
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "id_a": pa.array([], pa.int64()),
                    "id_b": pa.array([], pa.int64()),
                    "n_min": pa.array([], pa.int64()),
                    "n_union": pa.array([], pa.int64()),
                }
            )
        )
    id_set = pa.array(sorted(ids), pa.int64())

    cand_docs = docs.map_batches(
        lambda t: t.filter(pc.is_in(t[id_col], value_set=id_set)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return weighted_jaccard_all(
        cand_docs, threshold_num=threshold_num, threshold_den=threshold_den
    )
