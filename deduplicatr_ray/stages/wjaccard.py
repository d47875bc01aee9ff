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


def weighted_jaccard_pairs(
    docs,
    cand_pairs,
    *,
    threshold_num: int = 7,
    threshold_den: int = 10,
    id_col: str = "doc_id",
    num_partitions: int | None = None,
):
    """EXACT tf-weighted Jaccard over CANDIDATE PAIRS only (the verify leg
    of the candidates-then-verify pattern; cf. ``ngram_verify_join``).

    ``weighted_jaccard_all`` restricted to candidate DOCS is still
    quadratic inside every shared-token posting run — template-heavy
    candidate sets (exactly the docs a near-dup pass surfaces) make the
    common-token runs span thousands of docs, so the triu expansion blows
    up even though the final pair set is tiny (profiled: 177 s over 4.2 k
    candidate docs at sf0.1 vs <2 s here). This operator is linear in
    ``|pairs| x doc_len`` instead.

    Identity used: multiset (weighted) Jaccard == plain SET Jaccard over
    occurrence-expanded elements ``{mix(token, k) : 0 <= k < tf}`` —
    ``|A ∩ B| = sum(min(tf_a, tf_b))`` and ``|A| = total_a`` exactly, so
    ``n_min``/``n_union`` stay bit-exact integers vs the DuckDB oracle
    (modulo 64-bit hash collisions, the same exposure as every hashed
    -token path in this engine).

    Shape: broadcast the distinct candidate-id column (the small side —
    scales with near-dup content, not corpus size), one streaming pass
    builds each candidate doc's occurrence set, then two hash-partition
    joins co-locate pairs with their A- then B-side sets (verify.py's
    pass-A/pass-B layout keyed on int64 ids); the per-block intersection
    is one lexsort + adjacent-equality count. Nothing quadratic anywhere.

    Output ``(id_a, id_b, n_min, n_union)`` with
    ``den * n_min >= num * n_union``.
    """
    import pyarrow.compute as pc
    import ray.data as rd

    from ..functions.hashing import hash_columns_u64, splitmix64
    from .lsh import default_num_partitions
    from .textstats import term_counts_batch

    P = int(num_partitions or default_num_partitions())
    PU = _U64(P)
    NUM, DEN = int(threshold_num), int(threshold_den)

    _EMPTY_OUT = pa.table(
        {
            "id_a": pa.array([], pa.int64()),
            "id_b": pa.array([], pa.int64()),
            "n_min": pa.array([], pa.int64()),
            "n_union": pa.array([], pa.int64()),
        }
    )

    # consumed twice (id broadcast + the pair-side shuffle feed): pin the
    # blocks so the candidate pipeline doesn't re-execute. Pairs are 16 B
    # each — object-store resident, distributed, bounded by dup content.
    cand_pairs = cand_pairs.materialize()

    # --- broadcast distinct candidate ids (small side) ---
    id_parts: list[np.ndarray] = []
    for b in cand_pairs.select_columns(["id_a", "id_b"]).iter_batches(
        batch_size=1 << 18, batch_format="pyarrow"
    ):
        id_parts.append(b["id_a"].to_numpy(zero_copy_only=False))
        id_parts.append(b["id_b"].to_numpy(zero_copy_only=False))
    if not id_parts or not sum(len(p) for p in id_parts):
        return rd.from_arrow(_EMPTY_OUT)
    id_set = pa.array(np.unique(np.concatenate(id_parts)), pa.int64())

    def occ_sets(batch: pa.Table):
        """candidate docs -> (key=doc_id, occ list<uint64>) occurrence sets."""
        batch = batch.filter(pc.is_in(batch[id_col], value_set=id_set))
        if id_col != "doc_id":
            batch = batch.rename_columns(
                ["doc_id" if c == id_col else c for c in batch.column_names]
            )
        t = term_counts_batch(batch)
        if len(t) == 0:
            return
        doc = t["doc_id"].to_numpy(zero_copy_only=False)
        tf = t["tf"].to_numpy(zero_copy_only=False)
        th = hash_columns_u64(t, ["token"])
        # occurrence expansion: token row with tf=w -> w elements mix(t, k)
        total = int(tf.sum())
        reps = np.repeat(th, tf)
        ends = np.cumsum(tf)
        k = np.arange(total, dtype=np.int64) - np.repeat(ends - tf, tf)
        with np.errstate(over="ignore"):
            vals = splitmix64(reps ^ ((k.astype(_U64) + _U64(1)) * _GOLD))
        # per-doc list boundaries (term_counts_batch rows are doc-major)
        starts = np.flatnonzero(np.diff(doc, prepend=doc[0] - 1))
        udoc = doc[starts]
        doc_lens = np.add.reduceat(tf, starts)
        offsets = np.concatenate([[0], np.cumsum(doc_lens)]).astype(np.int64)
        occ = pa.LargeListArray.from_arrays(
            pa.array(offsets, pa.int64()), pa.array(vals, pa.uint64())
        )
        yield pa.table({"key": pa.array(udoc, pa.int64()), "occ": occ})

    sets = docs.map_batches(
        occ_sets, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    occ_type = pa.large_list(pa.uint64())

    def tag_pair(b: pa.Table) -> pa.Table:
        h = hash_columns_u64(b, ["id_a"])
        n = len(b)
        return pa.table(
            {
                "part": pa.array((h % PU).astype(np.int32), pa.int32()),
                "key": b["id_a"],
                "id_a": b["id_a"],
                "id_b": b["id_b"],
                "occ": pa.nulls(n, occ_type),
                "occ_a": pa.nulls(n, occ_type),
            }
        )

    def tag_set(b: pa.Table) -> pa.Table:
        h = hash_columns_u64(b, ["key"])
        n = len(b)
        return pa.table(
            {
                "part": pa.array((h % PU).astype(np.int32), pa.int32()),
                "key": b["key"],
                "id_a": pa.nulls(n, pa.int64()),
                "id_b": pa.nulls(n, pa.int64()),
                "occ": b["occ"].cast(occ_type),
                "occ_a": pa.nulls(n, occ_type),
            }
        )

    def _attach(g: pa.Table, out_key: str):
        """Within one co-partition: gather each pair row's set by id match.
        Misses (doc without text) become empty sets."""
        is_set = pc.is_valid(g["occ"]).to_numpy(zero_copy_only=False)
        gs = g.filter(pa.array(is_set))
        gp = g.filter(pa.array(~is_set))
        if len(gp) == 0:
            return gp, None
        occ_col = gs["occ"].combine_chunks()
        ks = gs["key"].to_numpy(zero_copy_only=False)
        order = np.argsort(ks, kind="stable")
        ks = ks[order]
        q = gp[out_key].to_numpy(zero_copy_only=False)
        if len(ks):
            pos = np.minimum(np.searchsorted(ks, q), len(ks) - 1)
            hit = ks[pos] == q
            take_idx = np.where(hit, order[pos], -1)
        else:
            take_idx = np.full(len(gp), -1, np.int64)
        mask = take_idx >= 0
        gather = occ_col.take(pa.array(np.where(mask, take_idx, 0), pa.int64()))
        goffs = gather.offsets.to_numpy(zero_copy_only=False)
        lens = np.where(mask, np.diff(goffs), 0)
        if not mask.all():
            vals = gather.flatten().to_numpy(zero_copy_only=False)
            starts = goffs[:-1] - goffs[0]
            src = (
                np.concatenate(
                    [vals[s : s + l] for s, l in zip(starts, lens) if l]
                )
                if lens.sum()
                else np.empty(0, np.uint64)
            )
            gather = pa.LargeListArray.from_arrays(
                pa.array(
                    np.concatenate([[0], np.cumsum(lens)]).astype(np.int64),
                    pa.int64(),
                ),
                pa.array(src, pa.uint64()),
            )
        return gp, gather

    def pass_a(g: pa.Table) -> pa.Table:
        gp, occ_a = _attach(g, "id_a")
        n = len(gp)
        if n == 0:
            return pa.table(
                {
                    "part": pa.array([], pa.int32()),
                    "key": pa.array([], pa.int64()),
                    "id_a": pa.array([], pa.int64()),
                    "id_b": pa.array([], pa.int64()),
                    "occ": pa.nulls(0, occ_type),
                    "occ_a": pa.nulls(0, occ_type),
                }
            )
        h = hash_columns_u64(gp, ["id_b"])
        return pa.table(
            {
                "part": pa.array((h % PU).astype(np.int32), pa.int32()),
                "key": gp["id_b"],
                "id_a": gp["id_a"],
                "id_b": gp["id_b"],
                "occ": pa.nulls(n, occ_type),
                "occ_a": occ_a,
            }
        )

    def pass_b(g: pa.Table) -> pa.Table:
        gp, occ_b = _attach(g, "id_b")
        n = len(gp)
        if n == 0:
            return _EMPTY_OUT
        occ_a = gp["occ_a"].combine_chunks().cast(occ_type)
        len_a = np.diff(occ_a.offsets.to_numpy(zero_copy_only=False))
        len_b = np.diff(occ_b.offsets.to_numpy(zero_copy_only=False))
        val_a = occ_a.flatten().to_numpy(zero_copy_only=False)
        val_b = occ_b.flatten().to_numpy(zero_copy_only=False)
        pidx = np.concatenate(
            [
                np.repeat(np.arange(n, dtype=np.int64), len_a),
                np.repeat(np.arange(n, dtype=np.int64), len_b),
            ]
        )
        vals = np.concatenate([val_a, val_b])
        order = np.lexsort((vals, pidx))
        pidx, vals = pidx[order], vals[order]
        dup = (pidx[1:] == pidx[:-1]) & (vals[1:] == vals[:-1])
        inter = np.zeros(n, np.int64)
        np.add.at(inter, pidx[1:][dup], 1)
        union = len_a + len_b - inter
        keep = (union > 0) & (DEN * inter >= NUM * union)
        if not keep.any():
            return _EMPTY_OUT
        sel = pa.array(keep)
        return pa.table(
            {
                "id_a": gp["id_a"],
                "id_b": gp["id_b"],
                "n_min": pa.array(inter, pa.int64()),
                "n_union": pa.array(union, pa.int64()),
            }
        ).filter(sel)

    pairs_a = (
        cand_pairs.map_batches(
            tag_pair, batch_format="pyarrow", zero_copy_batch=True
        )
        .union(sets.map_batches(tag_set, batch_format="pyarrow"))
        .groupby("part")
        .map_groups(pass_a, batch_format="pyarrow")
    )
    return (
        pairs_a.union(sets.map_batches(tag_set, batch_format="pyarrow"))
        .groupby("part")
        .map_groups(pass_b, batch_format="pyarrow")
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
    emit: str = "est",
    length_bound: tuple[int, int] | None = None,
    salt_depth: int = 2,
    id_col: str = "doc_id",
):
    """Weighted-MinHash near-dup pairs: CWS signatures -> banded LSH over
    the first ``bands * band_rows`` samples -> bias-corrected byte-packed
    agreement estimate over all ``num_perm`` samples, keep
    ``jw_est >= threshold``.

    ``length_bound=(num, den)``: exact length-ratio prefilter at pair
    emission. ``J_w = sum(min tf)/sum(max tf) <= min(|A|,|B|)/max(|A|,|B|)``
    (total token counts), so a pair with ``den*min_len < num*max_len`` can
    NEVER reach ``J_w >= num/den`` — pruning it loses zero recall at that
    FINAL threshold. The verified path passes its exact threshold here: on
    the margin-lowered candidate cut this removes the (dominant) mass of
    length-mismatched template pairs BEFORE the byte-agreement estimate
    and the per-pair exact verify (measured at sf0.1: 630 k -> ~180 k
    candidates, same 603 verified pairs). Costs 8 B/band-row in the
    shuffle (the doc's total token count rides next to the 256 B sketch).

    Scale shape: one streaming signature pass (doc x num_perm work), one
    hash-partition band groupby whose rows carry the band key, the doc id
    and a 1-BYTE-per-sample estimate payload (the 8-bit packing of each
    sample; byte agreement = J + (1-J)/256, inverted exactly below — the
    same b-bit diet as the unweighted minhash path). The first version
    shipped the full 8 B samples per band: 64 bands x 2 KB = 128 KB/doc,
    69 s at sf0.1; this layout ships 16 x (256 B + keys) ~= 4 KB/doc and
    runs in ~3 s. Buckets above ``group_cap`` are salt-split on tail
    sample bytes and starred past ``salt_depth`` (never dropped — same
    hot-band policy as ``lsh._hot_group_pairs``).

    Output: ``id_a, id_b, jw_est`` (bias-corrected; sd ~=
    sqrt(J(1-J)/num_perm) ~= 0.029 at the defaults, so accepts sit within
    ~2 sd below ``threshold`` — measured at sf0.01: recall 1.0 vs the
    exact anchor).

    ``emit="distinct"`` returns DISTINCT ``(id_a, id_b)`` pairs only,
    deduped by a pair-hash partition + per-partition lexsort (Ray's
    generic 2-key ``aggregate(Max)`` costs 20-30 s on the ~500 k partial
    pairs a margin-lowered candidate cut produces — profiled at sf0.1;
    the vectorized dedup is <1 s). This is the candidate feed for
    ``wminhash_verified``, which re-scores pairs exactly anyway.
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
    LB_NUM, LB_DEN = (int(length_bound[0]), int(length_bound[1])) if length_bound else (0, 1)

    def signatures(batch: pa.Table):
        if id_col != "doc_id":
            batch = batch.rename_columns(
                ["doc_id" if c == id_col else c for c in batch.column_names]
            )
        t = term_counts_batch(batch)
        if len(t) == 0:
            return
        doc = t["doc_id"].to_numpy(zero_copy_only=False)
        udoc, inv = np.unique(doc, return_inverse=True)
        th = hash_columns_u64(t, ["token"])
        tf = t["tf"].to_numpy(zero_copy_only=False)
        sig = cws_signatures(
            inv,
            th,
            tf,
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
        cols = {
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
        if LB_NUM:  # length column only shipped when the bound is active
            ntot = np.bincount(inv, weights=tf).astype(np.int64)
            cols["n_tot"] = pa.array(np.repeat(ntot, B), pa.int64())
        yield pa.table(cols)

    def verify_block(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["part"])
        n = len(g)
        order = pc.sort_indices(
            g, sort_keys=[("bkey", "ascending"), ("doc_id", "ascending")]
        )
        g = g.take(order)
        bk = g["bkey"].to_numpy(zero_copy_only=False)
        doc = g["doc_id"].to_numpy(zero_copy_only=False)
        ntot = (
            g["n_tot"].to_numpy(zero_copy_only=False)
            if "n_tot" in g.column_names
            else None
        )
        sig8_arr = g["sig8"].combine_chunks()
        # zero-copy view of the fixed-size-binary data buffer
        off = sig8_arr.offset * K
        sig = np.frombuffer(sig8_arr.buffers()[1], dtype=np.uint8)[
            off : off + n * K
        ].reshape(n, K)
        starts = np.flatnonzero(np.concatenate([[True], bk[1:] != bk[:-1]]))
        lens = np.diff(np.append(starts, n))
        ia_p, ib_p, je_p = [], [], []

        # salting uses TAIL sample bytes (bands key on the FIRST
        # bands*band_rows samples, so tail lanes stay informative); when
        # banding consumes every sample (B*ROWS == K) no informative lane
        # exists and hot buckets go straight to the star
        eff_salt_depth = min(int(salt_depth), K - B * ROWS)

        def hot_bucket_pairs(rep_sig: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
            """Salt-split a hot bucket (same policy as lsh._hot_group_pairs):
            sub-split on tail sample bytes, star the leaves still hot after
            ``salt_depth`` levels. Never O(m^2), never an unconsidered
            bucket; the est (and, in the verified path, the exact re-score)
            still gates every considered pair. Starred leaves are covered
            through their min-id hub only — member pairs split apart here
            re-collide in the other bands (different key samples)."""
            oi: list[np.ndarray] = []
            oj: list[np.ndarray] = []

            def rec(ids: np.ndarray, depth: int) -> None:
                mm = len(ids)
                if mm < 2:
                    return
                if mm <= group_cap:
                    iu, ju = np.triu_indices(mm, 1)
                    oi.append(ids[iu])
                    oj.append(ids[ju])
                    return
                if depth < eff_salt_depth:
                    vals = rep_sig[ids, K - 1 - depth]
                    for v in np.unique(vals):
                        rec(ids[vals == v], depth + 1)
                    return
                oi.append(np.full(mm - 1, ids[0], np.int64))  # min-id star
                oj.append(ids[1:])

            rec(np.arange(len(rep_sig), dtype=np.int64), 0)
            if not oi:
                z = np.empty(0, np.int64)
                return z, z
            return np.concatenate(oi), np.concatenate(oj)

        for s, m in zip(starts, lens):
            if m < 2:
                continue
            # dedupe same doc reaching one bucket via several bands
            ud, ui = np.unique(doc[s : s + m], return_index=True)
            if len(ud) < 2:
                continue
            if len(ud) <= group_cap:
                i, j = np.triu_indices(len(ud), 1)
            else:
                i, j = hot_bucket_pairs(sig[s + ui])
                if len(i) == 0:
                    continue
            if LB_NUM:
                # exact prune BEFORE the (dominant) byte-agreement kernel:
                # J_w <= min_len/max_len, so den*min < num*max can't verify
                lu = ntot[s + ui]
                la, lb = lu[i], lu[j]
                ok = LB_DEN * np.minimum(la, lb) >= LB_NUM * np.maximum(la, lb)
                if not ok.any():
                    continue
                i, j = i[ok], j[ok]
            # chunked: a salted hot bucket can carry O(m * cap) pairs and
            # sa[i] copies K bytes per pair — bound the transient
            sa = sig[s + ui]
            CHUNK = 1 << 20
            for c0 in range(0, len(i), CHUNK):
                ic, jc = i[c0 : c0 + CHUNK], j[c0 : c0 + CHUNK]
                raw = (sa[ic] == sa[jc]).mean(axis=1)
                je = (raw - _COLL) / (1.0 - _COLL)
                keep = je >= threshold
                if keep.any():
                    ia_p.append(ud[ic[keep]])
                    ib_p.append(ud[jc[keep]])
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

    scored = (
        docs.map_batches(signatures, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(verify_block, batch_format="pyarrow")
    )
    if emit == "distinct":

        def pair_part(b: pa.Table) -> pa.Table:
            h = hash_columns_u64(b, ["id_a", "id_b"])
            return pa.table(
                {
                    "id_a": b["id_a"],
                    "id_b": b["id_b"],
                    "part": pa.array((h % _U64(P)).astype(np.int32), pa.int32()),
                }
            )

        def distinct_block(g: pa.Table) -> pa.Table:
            ia = g["id_a"].to_numpy(zero_copy_only=False)
            ib = g["id_b"].to_numpy(zero_copy_only=False)
            if len(ia) == 0:
                return pa.table(
                    {
                        "id_a": pa.array([], pa.int64()),
                        "id_b": pa.array([], pa.int64()),
                    }
                )
            order = np.lexsort((ib, ia))
            ia, ib = ia[order], ib[order]
            new = np.concatenate(
                [[True], (ia[1:] != ia[:-1]) | (ib[1:] != ib[:-1])]
            )
            return pa.table(
                {
                    "id_a": pa.array(ia[new], pa.int64()),
                    "id_b": pa.array(ib[new], pa.int64()),
                }
            )

        return (
            scored.map_batches(
                pair_part, batch_format="pyarrow", zero_copy_batch=True
            )
            .groupby("part")
            .map_groups(distinct_block, batch_format="pyarrow")
        )
    return scored.groupby(["id_a", "id_b"]).aggregate(
        Max("jw_est", alias_name="jw_est")
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
    at J=0.7, so 0.15 is a ~5-sigma recall margin), emitting DISTINCT
    candidate pairs. Stage 2 re-scores exactly those PAIRS with the exact
    per-pair occurrence-set join (``weighted_jaccard_pairs``) — verify
    work is linear in ``|pairs| x doc_len``. (An earlier revision ran
    ``weighted_jaccard_all`` over the candidate DOCS instead; on
    template-heavy candidate sets that re-quadratizes inside shared-token
    posting runs — 177 s vs <2 s at sf0.1.)

    Output ``(id_a, id_b, n_min, n_union)`` — bit-identical to
    ``weighted_jaccard_all`` whenever the candidate stage surfaces every
    ``J_w >= threshold`` pair (measured 1.0 at sf0.01), so the same DuckDB
    oracle verifies BOTH the anchor and this scale path. Candidate recall
    is probabilistic, not guaranteed: the estimator margin is ~5 sigma,
    and buckets past ``group_cap`` are salt-split with hot leaves covered
    through a star hub only (see ``wminhash_near_dups``) — member pairs
    of a starred leaf rely on the other bands to surface them.
    """
    est_cut = threshold_num / threshold_den - est_margin
    # wider banding than the est variant's 16: P(no band collides | J=0.7)
    # is 1.2e-2 at 16x4 but 1.5e-4 at 32x4, and the per-pair verify makes
    # the extra candidates cheap (measured at sf0.1: 598 -> 603 pairs
    # recovered for +4.5 s; 603 == the exact all-pairs join over the
    # candidate docs, the superset check).
    cws_kwargs.setdefault("bands", 32)
    # exact length-ratio prune at the FINAL threshold: zero recall loss for
    # the verified output, ~3.5x fewer candidates on template-heavy corpora
    cws_kwargs.setdefault("length_bound", (threshold_num, threshold_den))
    cands = wminhash_near_dups(
        docs, threshold=est_cut, emit="distinct", id_col=id_col, **cws_kwargs
    )
    return weighted_jaccard_pairs(
        docs,
        cands,
        threshold_num=threshold_num,
        threshold_den=threshold_den,
        id_col=id_col,
    )
