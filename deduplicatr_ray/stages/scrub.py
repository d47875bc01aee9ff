"""Span-level duplicate-text removal (Lee et al. ACL 2022 ExactSubstr):
instead of dropping whole near-dup documents, cut the duplicated BYTE
SPANS out of every doc that repeats earlier content, keeping the first
occurrence.

Plan shape (all engine-standard patterns):

1. **route** — winnowing-fingerprint routing (same contract as
   ``suffix_array_pairs``): any two texts sharing >= ``guarantee_len``
   bytes co-locate in at least one partition;
2. **mark** — per partition, a concatenated suffix array emits
   ``(doc_id, start, end)`` spans duplicating smaller-(doc_id, offset)
   content (``functions/suffix.py sa_duplicate_spans``);
3. **merge** — spans are hash-partitioned by doc_id and interval-merged
   with one lexsort + vectorized sweep per partition (a doc's spans from
   different routing partitions meet here);
4. **cut** — docs and merged spans are co-partitioned by the same doc_id
   hash (union-tag idiom, cf. ``stages/verify.py``) and each partition
   rebuilds the scrubbed text; rows without spans pass through untouched,
   so the per-row byte assembly only runs on the duplicated sliver.

Spans are utf-8 byte offsets (exact for this ASCII corpus; byte-level
matches may split codepoints otherwise — documented in the kernel).

Scale cost, stated honestly: a doc's text ships to <= its
distinct-fingerprint partition count (~text_len/26 winnowed samples) —
but ONLY for docs holding a fingerprint value repeated corpus-wide (the
key-only pre-pass in ``_survivor_routes``; marked byte set provably
unchanged, hash-verified at sf0.01/sf0.1). Routed bytes are therefore
~duplicated-content x fanout, not corpus x fanout: a mostly-unique
corpus routes a sliver (sf0.1 measures 2.4x vs 10x unfiltered), while a
pathological all-duplicates corpus still pays the full fanout (~20x,
measured in the bench's ``scrub_amp``) — the same text amplification
Lee et al. pay via suffix-range sharding. Size ``num_partitions`` so one
partition's routed bytes (x ~13 B/suffix of kernel state) fits a worker.
The doc-level dedup family is the sub-linear path; this stage exists for
span-level cleanup of the survivors.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.hashing import splitmix64

_SPAN_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("start", pa.int64()), ("end", pa.int64())]
)
_EMPTY_SPANS = pa.table(
    {
        "doc_id": pa.array([], pa.int64()),
        "start": pa.array([], pa.int64()),
        "end": pa.array([], pa.int64()),
    }
)

# doc texts are << 2^32 bytes, so (doc ordinal << 32 | coord) linearizes
# per-doc coordinates for one global accumulate-based interval merge
_COORD = np.int64(1) << 32


def merge_intervals_block(g: pa.Table) -> pa.Table:
    """(doc_id, start, end) rows -> per-doc unioned intervals, vectorized:
    one lexsort, one running max, one reduceat."""
    import pyarrow.compute as pc

    n = len(g)
    if n == 0:
        return _EMPTY_SPANS
    order = pc.sort_indices(
        g, sort_keys=[("doc_id", "ascending"), ("start", "ascending")]
    )
    g = g.take(order)
    did = g["doc_id"].to_numpy(zero_copy_only=False)
    st = g["start"].to_numpy(zero_copy_only=False)
    en = g["end"].to_numpy(zero_copy_only=False)
    # per-doc ordinal (docs are contiguous after the sort)
    new_doc = np.concatenate([[True], did[1:] != did[:-1]])
    ordinal = np.cumsum(new_doc) - 1
    gs = ordinal * _COORD + st
    ge = ordinal * _COORD + en
    run_max = np.maximum.accumulate(ge)
    new_run = np.concatenate([[True], gs[1:] > run_max[:-1]])
    starts = np.flatnonzero(new_run)
    m_end = np.maximum.reduceat(ge, starts)
    return pa.table(
        {
            "doc_id": pa.array(did[starts], pa.int64()),
            "start": pa.array(gs[starts] - ordinal[starts] * _COORD, pa.int64()),
            "end": pa.array(m_end - ordinal[starts] * _COORD, pa.int64()),
        }
    )


def scrub_amplification(
    docs,
    *,
    w: int = 25,
    guarantee_len: int = 50,
    num_partitions: int | None = None,
) -> dict:
    """Measure the SA mark stage's actual text amplification on a given
    corpus: ``routed_bytes / corpus_bytes`` over the SHIPPED routing path
    (the repeated-fingerprint prefilter, so routed bytes are
    duplicated-content-proportional; a unique corpus measures ~0). The
    bench harness reports it on a pathological all-duplicates fixture —
    where the prefilter keeps everything — so the worst-case bound in the
    module docstring is a measured number, not an estimate."""
    import pyarrow.compute as pc

    from .lsh import default_num_partitions

    P = int(num_partitions or default_num_partitions())

    def nbytes(col: str):
        def f(b: pa.Table) -> pa.Table:
            n = pc.sum(pc.binary_length(b["text"])).as_py() or 0
            return pa.table({col: pa.array([int(n)], pa.int64())})

        return f

    routed = (
        _routed_docs(docs, w=w, guarantee_len=guarantee_len, P=P)
        .map_batches(nbytes("routed"), batch_format="pyarrow", zero_copy_batch=True)
        .materialize()
        .sum("routed")
        or 0
    )
    corpus = (
        docs.map_batches(nbytes("corpus"), batch_format="pyarrow", zero_copy_batch=True)
        .materialize()
        .sum("corpus")
        or 0
    )
    return {
        "routed_bytes": int(routed),
        "corpus_bytes": int(corpus),
        "amplification": round(routed / corpus, 3) if corpus else 0.0,
        "num_partitions": P,
    }


def _doc_part(b: pa.Table, P: int) -> "np.ndarray":
    """The ONE doc_id -> partition mapping every co-partition join in this
    module shares (splitmix64 % P as int32). Keeping it in one place is
    load-bearing: the union-tag joins only work because both sides tag
    with byte-identical partition math."""
    h = splitmix64(b["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64))
    return (h % np.uint64(P)).astype(np.int32)


def fingerprint_run_counts(
    text: str, *, w: int, guarantee_len: int
) -> tuple[np.ndarray, np.ndarray]:
    """Winnowed fingerprint values + their occurrence multiplicity in the
    RAW rolling-hash stream. A within-doc repeat of a >= guarantee_len
    region puts the same w-gram (hence the same rolling hash) at two
    positions of the raw stream, so every selected value inside the region
    counts >= 2 — including ADJACENT/PERIODIC repeats ('aaaa...', 'ab'*n)
    whose windowed-min runs collapse to one (counting min-RUNS here, the
    first version's bug, silently skipped exactly the repeated-character
    boilerplate ExactSubstr targets). ``fingerprint_doc``'s deduplicated
    value set cannot express multiplicity at all. Value set is identical
    to ``fingerprint_doc``'s (same winnowing)."""
    from ..functions.textstats import rolling_window_hashes

    window = guarantee_len - w + 1
    h = rolling_window_hashes(text, w)
    if len(h) == 0:
        return h, np.empty(0, np.int64)
    if len(h) <= window:
        vals = np.unique(h.min(keepdims=True))
    else:
        vals = np.unique(
            np.lib.stride_tricks.sliding_window_view(h, window).min(axis=1)
        )
    hs = np.sort(h)
    counts = (
        np.searchsorted(hs, vals, side="right")
        - np.searchsorted(hs, vals, side="left")
    ).astype(np.int64)
    return vals, counts


def _survivor_routes(docs, *, w: int, guarantee_len: int, P: int):
    """Key-only routing pre-pass: (doc_id, dest partition) pairs for docs
    holding a fingerprint VALUE with total multiplicity >= 2 corpus-wide.

    Any duplicated substring of >= guarantee_len bytes — across docs OR
    within one doc — implies such a value (the winnowing guarantee selects
    the same fingerprint inside both occurrences; within-doc repeats show
    up as >= 2 runs via ``fingerprint_run_counts``), so routing ONLY these
    (doc, residue) pairs preserves the marked byte set exactly while the
    shuffled text volume drops from corpus x fingerprint-fanout to
    ~duplicated-content x fanout. The pre-pass itself shuffles 20 B/row
    keys, never text."""

    def fp_rows(batch: pa.Table):
        vals, dids, cnts = [], [], []
        for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            v, c = fingerprint_run_counts(t or "", w=w, guarantee_len=guarantee_len)
            if len(v):
                vals.append(v)
                cnts.append(c)
                dids.append(np.full(len(v), d, np.int64))
        if not vals:
            return
        f = np.concatenate(vals)
        yield pa.table(
            {
                "fp": pa.array(f.view(np.int64), pa.int64()),
                "doc_id": pa.array(np.concatenate(dids), pa.int64()),
                "c": pa.array(np.concatenate(cnts), pa.int64()),
                "part": pa.array(
                    (f % np.uint64(P)).astype(np.int32), pa.int32()
                ),
            }
        )

    def survivors(g: pa.Table) -> pa.Table:
        fp = g["fp"].to_numpy(zero_copy_only=False)
        c = g["c"].to_numpy(zero_copy_only=False)
        order = np.argsort(fp, kind="stable")
        fs = fp[order]
        starts = np.flatnonzero(np.concatenate([[True], fs[1:] != fs[:-1]]))
        lens = np.diff(np.append(starts, len(fs)))
        totals = np.add.reduceat(c[order], starts)
        keep = order[np.repeat(totals >= 2, lens)]
        dest = int(g["part"][0].as_py())
        ud = np.unique(g["doc_id"].to_numpy(zero_copy_only=False)[keep])
        return pa.table(
            {
                "doc_id": pa.array(ud, pa.int64()),
                "dest": pa.array(np.full(len(ud), dest, np.int32), pa.int32()),
            }
        )

    return (
        docs.map_batches(fp_rows, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(
            lambda g: survivors(g),
            batch_format="pyarrow",
        )
    )


def _routed_docs(
    docs, *, w: int, guarantee_len: int, P: int, prefilter: bool = True
):
    """The SA mark stage's input: (part, doc_id, text) routed rows.

    ``prefilter=True`` (default): the repeated-fingerprint pre-pass above +
    a union-tag co-partition join on doc_id that ships each surviving doc's
    text once per destination. ``prefilter=False`` is the direct
    every-residue fanout (``fingerprint_route_batch``) — same marked byte
    set, kept as the comparison/verification path."""
    from ..functions.hashing import splitmix64
    from .textstats import fingerprint_route_batch

    if not prefilter:

        def route(batch: pa.Table) -> pa.Table:
            return fingerprint_route_batch(
                batch, w=w, guarantee_len=guarantee_len, num_partitions=P
            )

        return docs.map_batches(route, batch_format="pyarrow", zero_copy_batch=True)

    # materialized: dup-proportional, and keeps the pre-pass shuffle from
    # fusing with the join below
    routes = _survivor_routes(docs, w=w, guarantee_len=guarantee_len, P=P).materialize()

    def tag_docs(b: pa.Table) -> pa.Table:
        n = len(b)
        return pa.table(
            {
                "part2": pa.array(_doc_part(b, P), pa.int32()),
                "doc_id": b["doc_id"],
                "dest": pa.array(np.full(n, -1, np.int32), pa.int32()),
                "text": b["text"],
            }
        )

    def tag_routes(b: pa.Table):
        if len(b) == 0:
            return
        yield pa.table(
            {
                "part2": pa.array(_doc_part(b, P), pa.int32()),
                "doc_id": b["doc_id"],
                "dest": b["dest"],
                "text": pa.nulls(len(b), pa.string()),
            }
        )

    def emit(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        is_doc = pc.equal(g["dest"], -1)
        gd = g.filter(is_doc)
        gr = g.filter(pc.invert(is_doc))
        if len(gr) == 0:
            return pa.table(
                {
                    "part": pa.array([], pa.int32()),
                    "doc_id": pa.array([], pa.int64()),
                    "text": pa.array([], pa.string()),
                }
            )
        ids = gd["doc_id"].to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        pos = np.searchsorted(ids[order], gr["doc_id"].to_numpy(zero_copy_only=False))
        take = pa.array(order[pos], pa.int64())
        return pa.table(
            {
                "part": gr["dest"].cast(pa.int32()),
                "doc_id": gr["doc_id"],
                "text": gd["text"].take(take),
            }
        )

    return (
        docs.select_columns(["doc_id", "text"])
        .map_batches(tag_docs, batch_format="pyarrow", zero_copy_batch=True)
        .union(
            routes.map_batches(tag_routes, batch_format="pyarrow", zero_copy_batch=True)
        )
        .groupby("part2")
        .map_groups(
            lambda g: emit(g.drop_columns(["part2"])),
            batch_format="pyarrow",
        )
    )


def duplicate_spans(
    docs,
    *,
    w: int = 25,
    guarantee_len: int = 50,
    min_len: int = 50,
    num_partitions: int | None = None,
    merged: bool = True,
    prefilter: bool | None = None,
):
    """docs (doc_id, text) -> (doc_id, start, end) byte spans of content
    duplicating an earlier (doc_id, offset) occurrence; per-doc interval
    union applied when ``merged`` (the standalone API default).
    ``scrub_spans`` passes ``merged=False`` and folds the union into its
    own doc_id co-partition — one less all-to-all.

    ``prefilter=None`` (default) auto-enables the routing prefilter only
    when ``min_len >= guarantee_len`` — below the guarantee, spans are
    found through coincidental co-location the prefilter cannot see, so
    it falls back to full fanout; an explicit ``prefilter=True`` with
    ``min_len < guarantee_len`` raises instead of silently weakening."""
    from ..functions.suffix import sa_duplicate_spans
    from .lsh import default_num_partitions
    from .textstats import group_unique_docs

    if prefilter and min_len < guarantee_len:
        raise ValueError(
            "prefilter routing preserves the marked byte set only for "
            "min_len >= guarantee_len"
        )
    if prefilter is None:
        prefilter = min_len >= guarantee_len

    P = int(num_partitions or default_num_partitions())

    def mark(g: pa.Table) -> pa.Table:
        uids, texts = group_unique_docs(g)
        d, s, e = sa_duplicate_spans(texts, uids, min_len=min_len)
        # per-partition interval union BEFORE the shuffle: the per-suffix
        # marks of one duplicate region (one per position) collapse to a
        # handful of intervals per doc, ~100x less exchange volume
        return merge_intervals_block(
            pa.table(
                {
                    "doc_id": pa.array(d, pa.int64()),
                    "start": pa.array(s, pa.int64()),
                    "end": pa.array(e, pa.int64()),
                }
            )
        )

    def with_part(b: pa.Table) -> pa.Table:
        return b.append_column("part", pa.array(_doc_part(b, P), pa.int32()))

    # repartition the routed rows so the groupby's sorted output lands in
    # ~P blocks -> ~P concurrent mark tasks; without it the sort inherits
    # the read's block count (4) and the SA work runs 4-wide on a 32-CPU
    # box (profiled: 28s -> 6s at sf0.1)
    spans = (
        _routed_docs(docs, w=w, guarantee_len=guarantee_len, P=P, prefilter=prefilter)
        .repartition(P)
        .groupby("part")
        .map_groups(mark, batch_format="pyarrow")
    )
    if not merged:
        return spans
    return (
        spans.map_batches(with_part, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(
            lambda g: merge_intervals_block(g.drop_columns(["part"])),
            batch_format="pyarrow",
        )
    )


def scrub_spans(
    docs,
    *,
    w: int = 25,
    guarantee_len: int = 50,
    min_len: int = 50,
    num_partitions: int | None = None,
    prefilter: bool | None = None,
    broadcast_budget: int | None = None,
):
    """docs (doc_id, text) -> (doc_id, n_spans, n_bytes_removed, text)
    with duplicated spans cut out (first occurrence kept). Every doc of
    the input appears exactly once in the output.

    When the marked-span sliver fits ``broadcast_budget`` rows (default
    the scrub broadcast budget, env ``GRAFT_SCRUB_BCAST_MAX``), the
    doc-sorted span arrays are shipped once via ``ray.put`` and the cut
    is one row-local ``map_batches`` — document text never enters the
    cut's all-to-all. Past the budget (pathological all-dup corpora, cf.
    ``scrub_amplification``), the union-tag co-partition join cuts per
    partition; both tails share :func:`_cut_spans`."""
    from ..functions.hashing import splitmix64
    from .lsh import default_num_partitions

    P = int(num_partitions or default_num_partitions())

    # materialized: spans are tiny after the per-partition interval merge
    # (a handful of rows per duplicated doc), and the barrier keeps the
    # SA-heavy mark phase from sharing the streaming executor's CPU budget
    # with the cut phase's second all-to-all
    spans = duplicate_spans(
        docs,
        w=w,
        guarantee_len=guarantee_len,
        min_len=min_len,
        num_partitions=num_partitions,
        merged=False,  # the cut co-partition below does the interval union
        prefilter=prefilter,
    ).materialize()

    import ray

    from .paradedup import _broadcast_key_budget

    budget = (
        broadcast_budget
        if broadcast_budget is not None
        else _broadcast_key_budget()
    )
    if spans.count() <= budget:
        from .relational import pull_columns

        sp_id, sp_st, sp_en = pull_columns(
            spans, ["doc_id", "start", "end"]
        )
        o = np.argsort(sp_id, kind="stable")
        ref = ray.put((sp_id[o], sp_st[o], sp_en[o]))

        def cut_broadcast(batch: pa.Table) -> pa.Table:
            sp_id, sp_st, sp_en = ray.get(ref)
            ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            # gather this batch's span rows from the doc-sorted arrays
            lo = np.searchsorted(sp_id, ids, "left")
            hi = np.searchsorted(sp_id, ids, "right")
            lens = hi - lo
            m = int(lens.sum())
            take = (
                np.repeat(lo, lens)
                + np.arange(m)
                - np.repeat(np.cumsum(lens) - lens, lens)
            )
            return _cut_spans(
                batch.select(["doc_id", "text"]),
                sp_id[take],
                sp_st[take],
                sp_en[take],
            )

        return docs.map_batches(
            cut_broadcast, batch_format="pyarrow", zero_copy_batch=True
        )

    # union-tag co-partition: span rows carry (start, end); doc rows carry
    # text with start = -1 as the discriminator
    def tag_docs(b: pa.Table) -> pa.Table:
        n = len(b)
        return pa.table(
            {
                "part": pa.array(_doc_part(b, P), pa.int32()),
                "doc_id": b["doc_id"],
                "start": pa.array(np.full(n, -1, np.int64), pa.int64()),
                "end": pa.array(np.full(n, -1, np.int64), pa.int64()),
                "text": b["text"],
            }
        )

    def tag_spans(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "part": pa.array(_doc_part(b, P), pa.int32()),
                "doc_id": b["doc_id"],
                "start": b["start"],
                "end": b["end"],
                "text": pa.nulls(len(b), pa.string()),
            }
        )

    def cut(g: pa.Table) -> pa.Table:
        is_doc = (
            g["start"].to_numpy(zero_copy_only=False) < 0
        )
        gd = g.filter(pa.array(is_doc))
        gsp = g.filter(pa.array(~is_doc))
        return _cut_spans(
            gd,
            gsp["doc_id"].to_numpy(zero_copy_only=False),
            gsp["start"].to_numpy(zero_copy_only=False),
            gsp["end"].to_numpy(zero_copy_only=False),
        )

    return (
        docs.map_batches(tag_docs, batch_format="pyarrow", zero_copy_batch=True)
        .union(
            spans.map_batches(
                tag_spans, batch_format="pyarrow", zero_copy_batch=True
            )
        )
        .groupby("part")
        .map_groups(
            lambda g: cut(g.drop_columns(["part"])), batch_format="pyarrow"
        )
    )


def _cut_spans(
    gd: pa.Table, sp_id: np.ndarray, sp_st: np.ndarray, sp_en: np.ndarray
) -> pa.Table:
    """Shared cut kernel of ``scrub_spans``: remove the (unmerged) byte
    spans from their docs. ``gd`` holds (doc_id, text); the span arrays
    may reference only docs present in ``gd`` (others are ignored)."""
    n = len(gd)
    ids = gd["doc_id"].to_numpy(zero_copy_only=False)
    n_spans = np.zeros(n, np.int64)
    removed = np.zeros(n, np.int64)
    if len(sp_id) == 0 or n == 0:
        return pa.table(
            {
                "doc_id": gd["doc_id"],
                "n_spans": pa.array(n_spans, pa.int64()),
                "n_bytes_removed": pa.array(removed, pa.int64()),
                "text": gd["text"],
            }
        )
    order = np.argsort(ids, kind="stable")
    sids = ids[order]
    pos = np.searchsorted(sids, sp_id)
    row = order[np.minimum(pos, n - 1)]
    ok = ids[row] == sp_id  # spans whose doc is in this block
    # Arrow/Python split: only the span-bearing rows (the duplicated
    # sliver) cross into Python for byte assembly; the untouched
    # majority passes through as zero-copy Arrow and the two halves
    # are concatenated (consumers sort by doc_id, in-partition order
    # is not part of the contract)
    touched = np.unique(row[ok])
    untouched = np.ones(n, bool)
    untouched[touched] = False
    gd_un = gd.filter(pa.array(untouched))
    un_tbl = pa.table(
        {
            "doc_id": gd_un["doc_id"],
            "n_spans": pa.array(np.zeros(len(gd_un), np.int64), pa.int64()),
            "n_bytes_removed": pa.array(
                np.zeros(len(gd_un), np.int64), pa.int64()
            ),
            "text": gd_un["text"],
        }
    )
    t = len(touched)
    texts = gd["text"].take(pa.array(touched, pa.int64())).to_pylist()
    out_texts = list(texts)
    n_spans = np.zeros(t, np.int64)
    removed = np.zeros(t, np.int64)
    # per-row assembly, indexed by position within the touched sliver
    local = np.searchsorted(touched, row[ok])
    by_doc: dict[int, list[tuple[int, int]]] = {}
    for r, s0, e0 in zip(
        local.tolist(), sp_st[ok].tolist(), sp_en[ok].tolist()
    ):
        by_doc.setdefault(r, []).append((s0, e0))
    for r, ivs in by_doc.items():
        bs = texts[r].encode("utf-8", "surrogatepass")
        ivs.sort()

        # a byte-level SA match can start/end mid-codepoint; cutting
        # there would leave invalid UTF-8 (UnicodeDecodeError on
        # rebuild). Both edges SHRINK the removal (<= 3 bytes each),
        # so any partially-covered codepoint is kept whole: the start
        # advances past continuation bytes, the end retreats to the
        # split codepoint's lead byte.
        def _snap_fwd(p: int) -> int:
            while p < len(bs) and (bs[p] & 0xC0) == 0x80:
                p += 1
            return p

        def _snap_back(p: int) -> int:
            while 0 < p < len(bs) and (bs[p] & 0xC0) == 0x80:
                p -= 1
            return p

        # interval union (spans arrive unmerged; see duplicate_spans)
        merged_ivs: list[list[int]] = []
        for s0, e0 in ivs:
            s0 = _snap_fwd(s0)
            e0 = _snap_back(min(e0, len(bs)))
            if e0 <= s0:
                continue
            if merged_ivs and s0 <= merged_ivs[-1][1]:
                merged_ivs[-1][1] = max(merged_ivs[-1][1], e0)
            else:
                merged_ivs.append([s0, e0])
        kept: list[bytes] = []
        cur = 0
        cut_bytes = 0
        for s0, e0 in merged_ivs:
            kept.append(bs[cur:s0])
            cut_bytes += e0 - s0
            cur = e0
        kept.append(bs[cur:])
        out_texts[r] = b"".join(kept).decode("utf-8", "surrogatepass")
        n_spans[r] = len(merged_ivs)
        removed[r] = cut_bytes
    t_tbl = pa.table(
        {
            "doc_id": gd["doc_id"].take(pa.array(touched, pa.int64())),
            "n_spans": pa.array(n_spans, pa.int64()),
            "n_bytes_removed": pa.array(removed, pa.int64()),
            "text": pa.array(out_texts, pa.string()),
        }
    )
    return pa.concat_tables([un_tbl, t_tbl])
