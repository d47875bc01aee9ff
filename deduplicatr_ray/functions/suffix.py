"""Suffix array + LCP kernels (D5's "optional suffix-array pass"), pure numpy.

``suffix_array`` is Manber–Myers prefix doubling: O(log n) rounds, each one
``np.lexsort`` over (rank, rank-shifted) — fully vectorized, no Python per
element. The rank snapshot per round doubles as an O(log n)-per-query LCP
oracle (``lcp_adjacent``): walk the snapshots high-to-low, extending the
match by 2^i wherever the round-i ranks agree — the classic
sparse-table-free LCP trick, vectorized over ALL adjacent suffix pairs at
once (Kasai's algorithm is O(n) but inherently sequential — a Python-level
loop per element, orders of magnitude slower here).

Alphabet is int32: bytes 0..255 plus one UNIQUE sentinel value per document
(256+i), so no common prefix can span a document boundary.
"""

from __future__ import annotations

import numpy as np


def suffix_array(s: np.ndarray) -> tuple[np.ndarray, list[np.ndarray]]:
    """int32 text -> (suffix array, rank snapshots).

    ``snapshots[i][p]`` is the rank of suffix p when comparing prefixes of
    length ``2**i``. The final ranks are all-distinct (unique per-doc
    sentinels guarantee termination before k >= n).
    """
    n = len(s)
    if n == 0:
        return np.empty(0, np.int64), []
    # int32 ranks: values < n < 2^31 at any sane partition size, and the
    # O(n log n) snapshot list is the kernel's memory footprint — int32
    # halves it (matters on dup-heavy partitions with millions of suffixes)
    order = np.argsort(s, kind="stable")
    r = np.empty(n, np.int32)
    sv = s[order]
    r[order] = np.concatenate(
        [[0], np.cumsum(sv[1:] != sv[:-1], dtype=np.int32)]
    )
    snapshots = [r.copy()]
    k = 1
    while k < n and r[order[-1]] != n - 1:
        key2 = np.full(n, -1, np.int32)
        key2[: n - k] = r[k:]
        order = np.lexsort((key2, r))
        k1, k2 = r[order], key2[order]
        neq = (k1[1:] != k1[:-1]) | (k2[1:] != k2[:-1])
        r = np.empty(n, np.int32)
        r[order] = np.concatenate([[0], np.cumsum(neq, dtype=np.int32)])
        snapshots.append(r.copy())
        k <<= 1
    sa = np.argsort(r, kind="stable")
    return sa, snapshots


def lcp_pairs(
    a: np.ndarray, b: np.ndarray, snapshots: list[np.ndarray], n: int
) -> np.ndarray:
    """Vectorized LCP for aligned suffix-position arrays a, b."""
    a = a.astype(np.int64).copy()
    b = b.astype(np.int64).copy()
    lcp = np.zeros(len(a), np.int64)
    for i in range(len(snapshots) - 1, -1, -1):
        h = snapshots[i]
        step = 1 << i
        inb = (a < n) & (b < n)
        ok = inb.copy()
        ok[inb] = h[a[inb]] == h[b[inb]]
        lcp[ok] += step
        a[ok] += step
        b[ok] += step
    return lcp


def lcp_adjacent(sa: np.ndarray, snapshots: list[np.ndarray]) -> np.ndarray:
    """LCP between each adjacent suffix pair in SA order (length n-1)."""
    n = len(sa)
    if n < 2:
        return np.empty(0, np.int64)
    return lcp_pairs(sa[:-1], sa[1:], snapshots, n)


def sa_doc_pairs(
    texts: list[str], doc_ids: np.ndarray, min_len: int, group_cap: int = 256
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Concatenated-SA substring detection over one group of docs.

    Returns (id_a, id_b, lcs_len) for every doc pair sharing a substring of
    >= ``min_len`` chars, where ``lcs_len`` is a LOWER BOUND on the true
    longest common substring (the max adjacent-LCP where the two docs abut
    in suffix order; the run minimum for non-abutting members). Runs whose
    distinct-doc count exceeds ``group_cap`` are dropped (boilerplate skew
    policy, same as LSH banding).
    """
    enc_parts: list[np.ndarray] = []
    doc_of_parts: list[np.ndarray] = []
    for i, t in enumerate(texts):
        bs = np.frombuffer(t.encode("utf-8", "surrogatepass"), np.uint8)
        enc = np.empty(len(bs) + 1, np.int32)
        enc[: len(bs)] = bs
        enc[len(bs)] = 256 + i  # unique per-doc sentinel
        enc_parts.append(enc)
        doc_of_parts.append(np.full(len(enc), i, np.int32))
    if not enc_parts:
        z = np.empty(0, np.int64)
        return z, z, z
    s = np.concatenate(enc_parts)
    doc_of = np.concatenate(doc_of_parts)
    sa, snaps = suffix_array(s)
    lcp = lcp_adjacent(sa, snaps)
    docs_sa = doc_of[sa]

    hit = lcp >= min_len
    if not hit.any():
        z = np.empty(0, np.int64)
        return z, z, z

    pair_best: dict[tuple[int, int], int] = {}

    def _offer(da: np.ndarray, db: np.ndarray, ln: np.ndarray) -> None:
        lo = np.minimum(da, db)
        hi = np.maximum(da, db)
        for a, b, l in zip(lo.tolist(), hi.tolist(), ln.tolist()):
            if a == b:
                continue
            k = (a, b)
            if l > pair_best.get(k, -1):
                pair_best[k] = l

    # adjacent cross-doc hits: tight per-pair length bound
    adj = hit & (docs_sa[:-1] != docs_sa[1:])
    _offer(docs_sa[:-1][adj], docs_sa[1:][adj], lcp[adj])

    # maximal runs of lcp >= min_len: every suffix pair within a run shares
    # >= run-min prefix -> every doc pair in the run is a hit
    d = np.diff(np.concatenate([[0], hit.astype(np.int8), [0]]))
    run_starts = np.flatnonzero(d == 1)
    run_ends = np.flatnonzero(d == -1)  # exclusive in lcp-index space
    for s0, e0 in zip(run_starts.tolist(), run_ends.tolist()):
        members = np.unique(docs_sa[s0 : e0 + 1])  # run spans e0-s0+1 suffixes
        m = len(members)
        if m < 2 or m > group_cap:
            continue
        run_min = int(lcp[s0:e0].min())
        iu, ju = np.triu_indices(m, k=1)
        _offer(
            members[iu],
            members[ju],
            np.full(len(iu), run_min, np.int64),
        )

    if not pair_best:
        z = np.empty(0, np.int64)
        return z, z, z
    keys = np.array(sorted(pair_best), np.int64)
    lens = np.array([pair_best[tuple(k)] for k in keys], np.int64)
    ids = np.asarray(doc_ids, np.int64)
    a, b = ids[keys[:, 0]], ids[keys[:, 1]]
    lo, hi = np.minimum(a, b), np.maximum(a, b)  # canonical id order
    return lo, hi, lens


def sa_duplicate_spans(
    texts: list[str], doc_ids: np.ndarray, min_len: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Byte spans duplicating EARLIER content, for span-level dedup
    (Lee et al., "Deduplicating Training Data Makes Language Models
    Better", ACL 2022 — the ExactSubstr removal pass).

    Returns (doc_id, start, end) byte spans: within every maximal run of
    adjacent suffixes sharing >= ``min_len`` bytes, the occurrence with the
    smallest (doc_id, offset) key is the canonical "first" and keeps its
    text; every other member suffix is marked duplicated for the run-min
    length. A long duplicate region is recovered as the UNION of the
    per-suffix marks of its successive positions (suffix p+k of the copy
    lands in a >= min_len run for every k up to region_len - min_len), so
    interval-merging the output reconstructs spans longer than min_len.
    Spans are byte offsets into the utf-8 encoding (exact for ASCII; a
    byte-level match may start mid-codepoint otherwise).
    """
    enc_parts: list[np.ndarray] = []
    doc_of_parts: list[np.ndarray] = []
    off_parts: list[np.ndarray] = []
    for i, t in enumerate(texts):
        bs = np.frombuffer(t.encode("utf-8", "surrogatepass"), np.uint8)
        enc = np.empty(len(bs) + 1, np.int32)
        enc[: len(bs)] = bs
        enc[len(bs)] = 256 + i
        enc_parts.append(enc)
        doc_of_parts.append(np.full(len(enc), i, np.int32))
        off_parts.append(np.arange(len(enc), dtype=np.int64))
    if not enc_parts:
        z = np.empty(0, np.int64)
        return z, z, z
    s = np.concatenate(enc_parts)
    doc_of = np.concatenate(doc_of_parts)
    local_off = np.concatenate(off_parts)
    ids = np.asarray(doc_ids, np.int64)

    sa, snaps = suffix_array(s)
    lcp = lcp_adjacent(sa, snaps)
    docs_sa = doc_of[sa]
    offs_sa = local_off[sa]
    ids_sa = ids[docs_sa]

    hit = lcp >= min_len
    if not hit.any():
        z = np.empty(0, np.int64)
        return z, z, z

    # fully vectorized run processing (a Python loop per run dominated at
    # scale: exact-dup clusters produce one run per shared position)
    d = np.diff(np.concatenate([[0], hit.astype(np.int8), [0]]))
    run_starts = np.flatnonzero(d == 1)  # lcp-index space
    run_ends = np.flatnonzero(d == -1)  # exclusive
    n_runs = len(run_starts)
    # run-min lcp: reduceat over the hit-compacted lcp array (contiguous
    # segments there, no gaps to leak through)
    lcph = lcp[hit]
    seg_lens = run_ends - run_starts
    seg_offs = np.concatenate([[0], np.cumsum(seg_lens)[:-1]])
    run_min = np.minimum.reduceat(lcph, seg_offs)
    # member suffix indices: run r spans suffixes [run_starts[r],
    # run_ends[r]] inclusive -> lens[r] = seg_lens[r] + 1
    lens = seg_lens + 1
    total = int(lens.sum())
    base = np.repeat(run_starts, lens)
    grp_off = np.repeat(np.cumsum(lens) - lens, lens)
    sidx = base + (np.arange(total, dtype=np.int64) - grp_off)
    run_id = np.repeat(np.arange(n_runs, dtype=np.int64), lens)
    m_ids = ids_sa[sidx]
    m_offs = offs_sa[sidx]
    # canonical per run = smallest (doc_id, offset): one lexsort, first
    # element of each run_id segment
    order = np.lexsort((m_offs, m_ids, run_id))
    rid_sorted = run_id[order]
    firsts = np.concatenate([[True], rid_sorted[1:] != rid_sorted[:-1]])
    mask = np.ones(total, bool)
    mask[order[firsts]] = False
    return (
        m_ids[mask],
        m_offs[mask],
        m_offs[mask] + np.repeat(run_min, lens)[mask],
    )
