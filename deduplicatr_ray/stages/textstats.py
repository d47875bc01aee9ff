"""Text-analysis stages over the ``documents`` table (task-brief operators:
language-ID, quality scoring, token counting, fingerprinting, suffix pairs).

All are stateless-or-actor ``map_batches`` stages; regexes/stopword tables
compile once per actor in ``__init__``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.textstats import (
    fingerprint_doc,
    predict_lang,
    quality_features,
    quality_score,
)


class TextStatsActor:
    """doc_id/text -> token counts + quality features + score + lang guess."""

    def __init__(self) -> None:
        # regexes are module-level precompiled; nothing heavy to build, but
        # the actor form keeps the slot open for model-backed scorers.
        pass

    def __call__(self, batch: pa.Table) -> pa.Table:
        # NULL text = empty doc (standard engine guard)
        texts = [t or "" for t in batch["text"].to_pylist()]
        feats = [quality_features(t) for t in texts]
        n_chars = [f[0] for f in feats]
        n_tokens = [f[1] for f in feats]
        n_punct = [f[2] for f in feats]
        mean_tok = [f[4] for f in feats]
        scores = [
            quality_score(c, t, p, m)
            for c, t, p, m in zip(n_chars, n_tokens, n_punct, mean_tok)
        ]
        langs = [predict_lang(t) for t in texts]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_chars": pa.array(n_chars, pa.int64()),
                "n_tokens": pa.array(n_tokens, pa.int64()),
                "n_punct": pa.array(n_punct, pa.int64()),
                "mean_token_len": pa.array(mean_tok, pa.float64()),
                "quality": pa.array(scores, pa.float64()),
                "lang_pred": pa.array(langs, pa.string()),
            }
        )


def textstats_stage(docs, *, concurrency: int | tuple[int, int] = (1, 8)):
    return docs.map_batches(
        TextStatsActor,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=2048,
        concurrency=concurrency,
        num_cpus=1,
    )


def token_count_stage(docs):
    """(doc_id, n_tokens) under the canonical tokenizer (SQL-oracle-checkable).

    Vectorized: pyarrow's RE2 regex-count kernel over the lowered column —
    no per-row Python. ``[a-z0-9]+`` has identical match semantics under
    RE2 and Python ``re`` (verified by the ``token_counts`` oracle hash)."""
    import pyarrow.compute as pc

    def fn(batch: pa.Table) -> pa.Table:
        counts = pc.count_substring_regex(
            pc.utf8_lower(batch["text"]), "[a-z0-9]+"
        )
        return pa.table(
            {"doc_id": batch["doc_id"], "n_tokens": pc.cast(counts, pa.int64())}
        )

    return docs.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# PII patterns (training-data scrub staple). RE2 syntax — identical match
# semantics in pyarrow's count_substring_regex and DuckDB's regexp_* (both
# RE2-backed), which is what makes pii_stats SQL-oracle-checkable.
PII_PATTERNS = {
    "n_emails": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "n_phones": r"\+?[0-9]{1,3}[-. ]?\(?[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}",
    "n_ipv4": r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b",
}


def pii_stats(docs):
    """Per-doc PII indicator counts (emails / phone-shaped / IPv4-shaped
    matches) + a ``has_pii`` flag — the scrub/filter pass every
    training-data pipeline runs before publication. Fully vectorized:
    one RE2 count kernel per pattern per batch, no per-row Python.

    Heuristic by design (regex PII detection always is); the point is the
    exact, oracle-checkable counting so downstream redaction/filter rates
    are reproducible.
    """
    import pyarrow.compute as pc

    def fn(batch: pa.Table) -> pa.Table:
        cols: dict = {"doc_id": batch["doc_id"]}
        total = None
        for name, pat in PII_PATTERNS.items():
            c = pc.cast(pc.count_substring_regex(batch["text"], pat), pa.int64())
            cols[name] = c
            total = c if total is None else pc.add(total, c)
        cols["has_pii"] = pc.greater(total, 0)
        return pa.table(cols)

    return docs.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def top_tokens(docs, *, k: int = 20):
    """Corpus vocabulary head: the ``k`` most frequent tokens under the
    canonical tokenizer, ties broken by token ascending (deterministic).

    Training-data staple (vocabulary audits, stopword discovery). Fully
    streaming: each batch pre-counts its tokens (RE2 split +
    ``pc.value_counts`` — no per-row Python), so the groupby shuffle moves
    O(distinct tokens per block) rows, not O(corpus tokens); the final
    sort+limit runs over the aggregated vocabulary only.

    Output: ``token, n`` (int64), descending by ``n``.
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(batch["text"]), "[^a-z0-9]+"
        ).combine_chunks()
        flat = toks.flatten()
        flat = flat.filter(pc.not_equal(flat, ""))
        vc = pc.value_counts(flat)
        if len(vc) == 0:
            return pa.table(
                {"token": pa.array([], pa.string()), "cnt": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "token": vc.field("values"),
                "cnt": pc.cast(vc.field("counts"), pa.int64()),
            }
        )

    return (
        docs.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("token")
        .aggregate(Sum("cnt", alias_name="n"))
        .sort(["n", "token"], descending=[True, False])
        .limit(k)
    )


# --- char-trigram LM quality scoring (perplexity filtering, the CCNet /
# C4 pattern: score each doc by a small LM trained on in-domain text and
# filter the tail; Wenzek et al., "CCNet", LREC 2020 — public method) ---

_ALPHA_CLASSES = 27  # a-z + space/other
_BYTE_CLASS = np.zeros(256, np.int64)
for _c in range(ord("a"), ord("z") + 1):
    _BYTE_CLASS[_c] = _c - ord("a") + 1
_TRI_BINS = _ALPHA_CLASSES**3


def _class_codes(texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """texts -> (flat class codes, per-text lengths). Lowercase a-z map to
    1..26, everything else to 0 — a 27-symbol alphabet keeps the trigram
    table at 27^3 = 19,683 cells (broadcastable anywhere)."""
    bs = "\x00".join(t.lower() if t else "" for t in texts).encode(
        "utf-8", "replace"
    )
    arr = np.frombuffer(bs, np.uint8)
    lens = np.array([len((t.lower() if t else "").encode("utf-8", "replace"))
                     for t in texts], np.int64)
    return _BYTE_CLASS[arr], lens


def _trigram_codes(codes: np.ndarray) -> np.ndarray:
    return (
        codes[:-2] * (_ALPHA_CLASSES * _ALPHA_CLASSES)
        + codes[1:-1] * _ALPHA_CLASSES
        + codes[2:]
    )


def charlm_train(docs, *, sample_mod: int = 4, text_col: str = "text",
                 id_col: str = "doc_id"):
    """Distributed trigram-count pass over a deterministic doc sample
    (``hash = doc_id % sample_mod == 0``): each batch emits one DENSE
    bincount vector row (27^3 cells, ~157 KB — constant per batch), the
    driver folds them. Returns (logp, ctx_logden) float32 arrays for
    ``charlm_score_stage`` (add-one smoothed conditional trigram model)."""
    import pyarrow as pa

    def partial(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False)
        keep = ids % sample_mod == 0
        texts = [
            t for t, k in zip(b[text_col].to_pylist(), keep.tolist()) if k
        ]
        counts = np.zeros(_TRI_BINS, np.int64)
        if texts:
            codes, lens = _class_codes(texts)
            if len(codes) >= 3:
                tri = _trigram_codes(codes)
                # drop trigrams spanning the \x00 separators (class 0 is
                # legal; the separator also maps to 0 — acceptable blur at
                # text boundaries, deterministic)
                counts = np.bincount(tri, minlength=_TRI_BINS)
        return pa.table({"counts": pa.array([counts.tobytes()], pa.large_binary())})

    total = np.zeros(_TRI_BINS, np.int64)
    for b in docs.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_size=1, batch_format="pyarrow"):
        for buf in b["counts"].to_pylist():
            total += np.frombuffer(buf, np.int64)
    ctx = total.reshape(_ALPHA_CLASSES * _ALPHA_CLASSES, _ALPHA_CLASSES).sum(
        axis=1
    )
    logp = np.log(total + 1.0) .astype(np.float32)
    ctx_logden = np.log(
        ctx + float(_ALPHA_CLASSES)
    ).astype(np.float32)  # add-one smoothing denominator per 2-char context
    return logp, ctx_logden


def charlm_score_stage(docs, logp: np.ndarray, ctx_logden: np.ndarray, *,
                       text_col: str = "text", id_col: str = "doc_id"):
    """Score each doc by mean negative log2 P(c3 | c1 c2) — bits per char
    under the broadcast trigram model (lower = more in-distribution).
    Docs with < 3 usable chars get null. One broadcast, vectorized
    bincount-style gathers per batch."""
    import ray

    ref = ray.put((logp, ctx_logden))

    def fn(b: pa.Table) -> pa.Table:
        lp, cd = ray.get(ref)
        texts = b[text_col].to_pylist()
        n = len(texts)
        out = np.full(n, np.nan, np.float64)
        codes, lens = _class_codes(texts)
        # per-text spans inside the concatenated code array (+1 separators)
        starts = np.zeros(n, np.int64)
        if n > 1:
            starts[1:] = np.cumsum(lens[:-1] + 1)
        for i in range(n):
            seg = codes[starts[i] : starts[i] + lens[i]]
            if len(seg) < 3:
                continue
            tri = _trigram_codes(seg)
            bits = (cd[tri // _ALPHA_CLASSES] - lp[tri]) / np.log(2.0)
            out[i] = float(bits.mean())
        return pa.table(
            {
                id_col: b[id_col],
                "bits_per_char": pa.array(out, pa.float64(), from_pandas=True),
            }
        )

    return docs.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def charlm_quality(docs, *, sample_mod: int = 4):
    """Train-then-score in one call: (doc_id, bits_per_char).

    ``docs`` is consumed twice (training fold, then scoring) — pin the
    blocks so a lazy upstream plan (parquet scan, filter chain) executes
    once, not once per pass."""
    docs = docs.materialize()
    logp, ctx_logden = charlm_train(docs, sample_mod=sample_mod)
    return charlm_score_stage(docs, logp, ctx_logden)


def mg_trim(tokens: pa.Array, counts: np.ndarray, capacity: int) -> pa.Table:
    """Misra–Gries trim of a (token, count) summary to ``capacity`` counters
    (mergeable-summaries formulation, Agarwal et al. PODS 2012): subtract
    the (capacity+1)-th largest count from every counter and drop the
    non-positive ones. Surviving counts are lower bounds with per-summary
    error <= n_block/(capacity+1)."""
    if len(counts) <= capacity:
        return pa.table(
            {"token": tokens, "cnt": pa.array(counts.astype(np.int64), pa.int64())}
        )
    thresh = np.partition(counts, len(counts) - capacity - 1)[
        len(counts) - capacity - 1
    ]
    kept = counts - thresh
    keep = kept > 0
    return pa.table(
        {
            "token": tokens.filter(pa.array(keep)),
            "cnt": pa.array(kept[keep].astype(np.int64), pa.int64()),
        }
    )


def heavy_tokens(docs, *, k: int = 20, capacity: int = 1 << 16):
    """Approximate heavy hitters over the token stream: Misra–Gries
    summaries of at most ``capacity`` counters per block, merged by a
    combining ``groupby(token).Sum``. Counts are exact lower bounds with
    total undercount <= corpus_tokens/(capacity+1) per contributing block
    trim; any token with true frequency above that bound is guaranteed to
    surface (the property exact ``top_tokens`` can't give with bounded
    state — at web scale the vocabulary is unbounded, an MG summary is
    not). With ``capacity`` >= per-block distinct tokens no trim occurs
    and the result equals the exact top-k (the verification-scale oracle
    setting).

    Output: ``token, n`` descending, ties broken by token ascending.
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(batch["text"]), "[^a-z0-9]+"
        ).combine_chunks()
        flat = toks.flatten()
        flat = flat.filter(pc.not_equal(flat, ""))
        vc = pc.value_counts(flat)
        if len(vc) == 0:
            return pa.table(
                {"token": pa.array([], pa.string()), "cnt": pa.array([], pa.int64())}
            )
        return mg_trim(
            vc.field("values"),
            vc.field("counts").to_numpy(zero_copy_only=False),
            capacity,
        )

    return (
        docs.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("token")
        .aggregate(Sum("cnt", alias_name="n"))
        .sort(["n", "token"], descending=[True, False])
        .limit(k)
    )


def token_doc_freq(docs, *, k: int = 20):
    """Document frequency head: the ``k`` tokens present in the most
    documents (the IDF building block), ties broken by token ascending.

    Exact distinct-doc counting WITHOUT a distinct shuffle: a token can
    repeat only within a row, and a row lives in exactly one batch — so
    deduplicating (doc, token) pairs per batch (one lexsort) makes the
    downstream ``groupby(token).Sum`` an exact document-frequency count.

    Output: ``token, df`` (int64), descending by ``df``.
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(batch["text"]), "[^a-z0-9]+"
        ).combine_chunks()
        doc_ids = np.repeat(
            batch["doc_id"].to_numpy(zero_copy_only=False),
            np.diff(toks.offsets.to_numpy(zero_copy_only=False)),
        )
        flat = toks.flatten()
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(nonempty))
        doc_ids = doc_ids[nonempty]
        if len(flat) == 0:
            return pa.table(
                {"token": pa.array([], pa.string()), "c": pa.array([], pa.int64())}
            )
        # per-batch (doc, token) dedup -> each (doc, token) contributes 1
        t = pa.table({"token": flat, "doc": pa.array(doc_ids, pa.int64())})
        t = t.take(
            pc.sort_indices(
                t, sort_keys=[("token", "ascending"), ("doc", "ascending")]
            )
        )
        tok = t["token"].combine_chunks()
        doc = t["doc"].to_numpy(zero_copy_only=False)
        n = len(t)
        first = np.empty(n, np.bool_)
        first[0] = True
        neq_tok = pc.not_equal(tok.slice(1), tok.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        )
        first[1:] = neq_tok | (doc[1:] != doc[:-1])
        starts = np.flatnonzero(first)
        tok_first = tok.take(pa.array(starts, pa.int64()))
        # count distinct docs per token within the batch (runs of tok_first)
        m = len(starts)
        tnew = np.empty(m, np.bool_)
        tnew[0] = True
        tnew[1:] = pc.not_equal(
            tok_first.slice(1), tok_first.slice(0, m - 1)
        ).to_numpy(zero_copy_only=False)
        tstarts = np.flatnonzero(tnew)
        counts = np.diff(np.append(tstarts, m))
        return pa.table(
            {
                "token": tok_first.take(pa.array(tstarts, pa.int64())),
                "c": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    return (
        docs.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("token")
        .aggregate(Sum("c", alias_name="df"))
        .sort(["df", "token"], descending=[True, False])
        .limit(k)
    )


def term_counts_batch(batch: pa.Table) -> pa.Table:
    """Per-batch exact (doc_id, token, tf) rows under the corpus-standard
    lexer (a doc never spans batches, so per-batch counts are global) —
    one RE2 split + one lexsort + a run scan; shared by ``doc_tfidf`` and
    the weighted-Jaccard family."""
    import pyarrow.compute as pc

    toks = pc.split_pattern_regex(
        pc.utf8_lower(batch["text"]), "[^a-z0-9]+"
    ).combine_chunks()
    doc_ids = np.repeat(
        batch["doc_id"].to_numpy(zero_copy_only=False),
        np.diff(toks.offsets.to_numpy(zero_copy_only=False)),
    )
    flat = toks.flatten()
    nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    flat = flat.filter(pa.array(nonempty))
    doc_ids = doc_ids[nonempty]
    if len(flat) == 0:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "token": pa.array([], pa.string()),
                "tf": pa.array([], pa.int64()),
            }
        )
    t = pa.table({"doc_id": pa.array(doc_ids, pa.int64()), "token": flat})
    t = t.take(
        pc.sort_indices(
            t, sort_keys=[("doc_id", "ascending"), ("token", "ascending")]
        )
    )
    tok = t["token"].combine_chunks()
    doc = t["doc_id"].to_numpy(zero_copy_only=False)
    n = len(t)
    first = np.empty(n, np.bool_)
    first[0] = True
    neq_tok = pc.not_equal(tok.slice(1), tok.slice(0, n - 1)).to_numpy(
        zero_copy_only=False
    )
    first[1:] = neq_tok | (doc[1:] != doc[:-1])
    starts = np.flatnonzero(first)
    tf = np.diff(np.append(starts, n))
    idx = pa.array(starts, pa.int64())
    return pa.table(
        {
            "doc_id": pa.array(doc[starts], pa.int64()),
            "token": tok.take(idx),
            "tf": pa.array(tf.astype(np.int64), pa.int64()),
        }
    )


def doc_tfidf_top_terms(
    docs, *, k: int = 3, n_docs: int | None = None, num_partitions: int | None = None
):
    """Per-document keyword extraction: the ``k`` highest-TF-IDF tokens of
    every document (``tfidf = tf * ln(N / df)``), ties broken by token.

    Training-data staple (topic hints, per-doc fingerprint labels, search
    features). Scale shape — two all-to-alls, both inherent to tf-idf:

    1. Per-batch ``(doc_id, token, tf)`` term counts (RE2 split + one
       lexsort; exact, since a doc never spans batches).
    2. ONE hash shuffle on ``token``: every (doc, token) row for a token
       lands in the same partition, so ``df`` is a segment length there —
       no separate df table, no df join. ``idf`` is computed once per
       DISTINCT token with ``math.log`` (libm — bit-identical to DuckDB's
       ``ln``, unlike numpy's SIMD log) and broadcast to rows by segment
       id; the Python loop is vocab/P-sized, not row-sized.
    3. Per-doc top-k via ``grouped_top_k`` (second shuffle, on doc_id).

    Output: ``doc_id, token, tf, tfidf, rank`` (rank 1..k per doc).
    """
    import math

    import pyarrow.compute as pc

    from ..functions.hashing import add_hash_part
    from .lsh import default_num_partitions
    from .relational import grouped_top_k

    P = num_partitions or default_num_partitions()
    if n_docs is None:
        n_docs = docs.count()
    N = int(n_docs)

    def with_part(b: pa.Table) -> pa.Table:
        return add_hash_part(b, ["token"], P)

    def score_block(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["part"])
        n = len(g)
        if n == 0:
            return g.append_column("tfidf", pa.array([], pa.float64()))
        g = g.take(pc.sort_indices(g, sort_keys=[("token", "ascending")]))
        tok = g["token"].combine_chunks()
        neq = pc.not_equal(tok.slice(1), tok.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        )
        starts = np.concatenate(([0], np.flatnonzero(neq) + 1))
        df = np.diff(np.append(starts, n))  # exact: (doc, token) rows unique
        idf = np.fromiter(
            (math.log(N / int(d)) for d in df), np.float64, len(df)
        )
        seg = np.zeros(n, np.int64)
        seg[starts] = 1
        seg_id = np.cumsum(seg) - 1
        tf = g["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        return g.append_column("tfidf", pa.array(tf * idf[seg_id], pa.float64()))

    scored = (
        docs.map_batches(term_counts_batch, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(with_part, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(score_block, batch_format="pyarrow")
    )
    return grouped_top_k(
        scored, by="doc_id", order_by="tfidf", k=k, descending=True, tie_by="token"
    )


def fingerprint_stage(docs, *, w: int = 25, guarantee_len: int = 50):
    """Explode winnowed rolling-hash fingerprints: one row per (doc_id, fp).

    Feeds the exact-substring candidate pass (D5): docs sharing a substring
    of >= guarantee_len chars are guaranteed to share a fingerprint
    (winnowing property, Schleimer et al. 2003).
    """

    def fn(batch: pa.Table) -> pa.Table:
        ids: list[int] = []
        fps: list[np.ndarray] = []
        for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            # t or "": NULL text must not crash (fingerprint_route_batch,
            # the sibling D5 consumer, already guards the same way)
            f = fingerprint_doc(t or "", w=w, guarantee_len=guarantee_len)
            if len(f):
                ids.extend([d] * len(f))
                fps.append(f)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "fingerprint": pa.array(
                    np.concatenate(fps) if fps else np.empty(0, np.uint64),
                    pa.uint64(),
                ),
            }
        )

    return docs.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


_EMPTY_SUFFIX_PAIRS = pa.table(
    {
        "id_a": pa.array([], pa.int64()),
        "id_b": pa.array([], pa.int64()),
        "method": pa.array([], pa.string()),
    }
)


def suffix_pairs_block(block: pa.Table, group_cap: int = 256) -> pa.Table:
    """WHOLE fingerprint groups -> distinct doc pairs (vectorized block fn).

    Groups above ``group_cap`` distinct docs (boilerplate n-grams) are
    dropped — same skew policy as LSH banding: they would emit O(m^2) pairs
    for content the exact/minhash paths already cluster.
    """
    import pyarrow.compute as pc

    n = len(block)
    if n < 2:
        return _EMPTY_SUFFIX_PAIRS
    order = pc.sort_indices(
        block, sort_keys=[("fingerprint", "ascending"), ("doc_id", "ascending")]
    )
    block = block.take(order)
    fp = block["fingerprint"].to_numpy(zero_copy_only=False)
    did = block["doc_id"].to_numpy(zero_copy_only=False)
    boundary = np.flatnonzero(fp[1:] != fp[:-1]) + 1
    starts = np.concatenate([[0], boundary])
    ends = np.concatenate([boundary, [n]])
    out: set[tuple[int, int]] = set()
    for s, e in zip(starts, ends):
        if e - s < 2:
            continue
        ids = np.unique(did[s:e])
        m = len(ids)
        if m < 2 or m > group_cap:
            continue
        iu, ju = np.triu_indices(m, k=1)
        out.update(zip(ids[iu].tolist(), ids[ju].tolist()))
    if not out:
        return _EMPTY_SUFFIX_PAIRS
    arr = np.array(sorted(out), dtype=np.int64)
    return pa.table(
        {
            "id_a": pa.array(arr[:, 0], pa.int64()),
            "id_b": pa.array(arr[:, 1], pa.int64()),
            "method": pa.array(["suffix"] * len(arr), pa.string()),
        }
    )


def suffix_candidate_pairs(docs, *, w: int = 25, guarantee_len: int = 50, group_cap: int = 256):
    """Exact-substring candidate pairs (D5, method='suffix').

    The north-star's "optional suffix-array pass" detects docs sharing a
    substring of >= L chars. For a FIXED L, two suffixes have LCP >= L iff
    their first-L-char grams are equal — so sorting/bucketing all L-grams is
    exactly equivalent to scanning suffix-array LCP runs at threshold L,
    while being linear-work, streaming, and shuffle-friendly. Winnowing
    (Schleimer et al., SIGMOD 2003) samples the L-gram stream with the
    guarantee that any shared run of >= ``guarantee_len`` chars still shares
    a sampled fingerprint, cutting shuffle volume ~1/w with NO false
    negatives at the guarantee length. Pairing then follows the engine's
    standard pattern: hash-partition whole fingerprint groups, vectorized
    block pairing, distinct.
    """
    import numpy as _np

    from .lsh import default_num_partitions

    fps = fingerprint_stage(docs, w=w, guarantee_len=guarantee_len)
    P = default_num_partitions()

    def with_part(b: pa.Table) -> pa.Table:
        part = (
            b["fingerprint"].to_numpy(zero_copy_only=False) % _np.uint64(P)
        ).astype(_np.int32)
        return b.append_column("part", pa.array(part, pa.int32()))

    def block(g: pa.Table) -> pa.Table:
        return suffix_pairs_block(g.drop_columns(["part"]), group_cap)

    pairs = (
        fps.map_batches(with_part, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(block, batch_format="pyarrow")
    )

    # distinct across partitions: a doc pair can share fingerprints that land
    # in different partitions; dedupe on (id_a, id_b)
    def dpart(b: pa.Table) -> pa.Table:
        ha = b["id_a"].to_numpy(zero_copy_only=False).astype(_np.uint64)
        hb = b["id_b"].to_numpy(zero_copy_only=False).astype(_np.uint64)
        from ..functions.hashing import splitmix64

        with _np.errstate(over="ignore"):
            part = (splitmix64(ha * _np.uint64(0x9E3779B97F4A7C15) ^ hb) % _np.uint64(P)).astype(_np.int32)
        return b.append_column("part", pa.array(part, pa.int32()))

    def dfirst(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        g = g.drop_columns(["part"])
        n = len(g)
        if n < 2:
            return g
        order = pc.sort_indices(
            g, sort_keys=[("id_a", "ascending"), ("id_b", "ascending")]
        )
        g = g.take(order)
        a = g["id_a"].to_numpy(zero_copy_only=False)
        b2 = g["id_b"].to_numpy(zero_copy_only=False)
        same = (a[1:] == a[:-1]) & (b2[1:] == b2[:-1])
        starts = np.concatenate([[0], np.flatnonzero(~same) + 1])
        return g.take(pa.array(starts, pa.int64()))

    return (
        pairs.map_batches(dpart, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(dfirst, batch_format="pyarrow")
    )


def fingerprint_route_batch(
    batch: pa.Table, *, w: int, guarantee_len: int, num_partitions: int
) -> pa.Table:
    """Shared winnowing-fingerprint router (suffix-array family): each
    doc's text is shipped to every DISTINCT partition one of its sampled
    fingerprints hashes to, guaranteeing co-location of any pair sharing
    >= ``guarantee_len`` bytes. One routing contract, two consumers
    (``suffix_array_pairs`` here, ``stages/scrub.py duplicate_spans``)."""
    parts: list[int] = []
    ids: list[int] = []
    texts: list[str] = []
    for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
        f = fingerprint_doc(t or "", w=w, guarantee_len=guarantee_len)
        if not len(f):
            continue
        for p in np.unique(f % np.uint64(num_partitions)).tolist():
            parts.append(int(p))
            ids.append(d)
            texts.append(t)
    return pa.table(
        {
            "part": pa.array(parts, pa.int32()),
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )


def group_unique_docs(g: pa.Table) -> tuple[np.ndarray, list[str]]:
    """Routed partition group -> (unique doc_ids, their texts): a doc can
    reach a partition via several fingerprints; the SA kernels want each
    text once."""
    ids = g["doc_id"].to_numpy(zero_copy_only=False)
    _, first = np.unique(ids, return_index=True)
    first = np.sort(first)
    return ids[first], [g["text"][int(i)].as_py() for i in first]


def default_eval_source(docs) -> str:
    """Held-out eval slice selection shared by the decontamination ops and
    the training export: the max ``source`` value (deterministic; swap the
    rule HERE if eval membership becomes an explicit list)."""
    import pyarrow.compute as pc

    vals: set[str] = set()
    for b in docs.select_columns(["source"]).iter_batches(
        batch_size=1 << 18, batch_format="pyarrow"
    ):
        vals.update(pc.unique(b["source"].combine_chunks()).to_pylist())
    return max(vals)


def suffix_array_pairs(
    docs,
    *,
    w: int = 25,
    guarantee_len: int = 50,
    min_len: int = 25,
    group_cap: int = 256,
    num_partitions: int | None = None,
    prefilter: bool = False,
):
    """TRUE suffix-array substring pass (D5's "optional suffix-array pass").

    Routing reuses the winnowing guarantee: each doc's text is shipped to
    every DISTINCT partition one of its sampled fingerprints hashes to, so
    any pair sharing >= ``guarantee_len`` chars co-locates in at least one
    partition (no false negatives at the guarantee length — the same
    contract as ``suffix_candidate_pairs``). Inside each partition a
    concatenated suffix array + LCP scan (``functions/suffix.py``, pure
    numpy prefix doubling) finds every co-located pair sharing >=
    ``min_len`` chars and reports a variable-length ``lcs_len`` lower bound
    — which fixed-L winnowing cannot produce. The text-duplication factor
    (<= distinct fingerprint partitions per doc) is the stage's documented
    scale cost; cf. the substring-dedup design in Lee et al.,
    "Deduplicating Training Data Makes Language Models Better" (ACL 2022),
    which also shards full text into suffix-array chunks.

    With ``min_len <= w`` the output pair set is a SUPERSET of
    ``suffix_candidate_pairs`` (every shared sampled w-gram fingerprint is
    a shared w-char substring, found exactly here), minus hash-collision
    false positives the candidate pass can emit.
    """
    import numpy as _np

    from ..functions.suffix import sa_doc_pairs
    from .lsh import default_num_partitions

    P = int(num_partitions or default_num_partitions())
    if prefilter and min_len < guarantee_len:
        raise ValueError(
            "prefilter routing preserves the pair set only for "
            "min_len >= guarantee_len (below the guarantee, pairs are found "
            "by coincidental co-location that the prefilter cannot see)"
        )

    def sa_block(g: pa.Table) -> pa.Table:
        uids, texts = group_unique_docs(g)
        a, b, l = sa_doc_pairs(
            texts, uids, min_len=min_len, group_cap=group_cap
        )
        return pa.table(
            {
                "id_a": pa.array(a, pa.int64()),
                "id_b": pa.array(b, pa.int64()),
                "lcs_len": pa.array(l, pa.int64()),
            }
        )

    # routing: the scrub module's shared router — prefilter=True gates the
    # SA shuffle on the key-only repeated-fingerprint pre-pass (exact for
    # min_len >= guarantee_len: any qualifying pair shares a fingerprint
    # VALUE, so both docs reach that value's residue group)
    from .scrub import _routed_docs

    pairs = (
        _routed_docs(
            docs, w=w, guarantee_len=guarantee_len, P=P, prefilter=prefilter
        )
        .repartition(P)  # ~P mark tasks; the sort otherwise inherits the
        .groupby("part")  # read's block count and the SA runs few-wide
        .map_groups(sa_block, batch_format="pyarrow")
    )

    # distinct across partitions (a pair can co-locate in several), keeping
    # the best lcs_len bound
    from ray.data.aggregate import Max

    return (
        pairs.groupby(["id_a", "id_b"])
        .aggregate(Max("lcs_len", alias_name="lcs_len"))
        .sort(["id_a", "id_b"])
    )


def word_repetition_stage(docs):
    """Gopher-style per-doc repetition quality stats (Rae et al. 2021,
    appendix A1.1 repetition filters): duplicate-token fraction,
    most-common-token fraction, most-common-bigram fraction. Documents with
    excessive repetition are low-quality boilerplate/spam; these three
    fractions are the standard filter features at web scale.

    One Python invocation per batch, fully vectorized: tokenize with the
    same ``[a-z0-9]+`` lexer as ``textstats_stage`` (Arrow regex kernel),
    then ONE lexsort of (doc, token) + run-length scans for distinct and
    max-count, and the same for (doc, bigram) built with an Arrow
    element-wise join of adjacent tokens. No shuffle: every stat is
    row-local, so the stage streams.

    Output per doc: ``n_tokens``, ``n_distinct`` (int64) and
    ``dup_token_frac`` (1 - distinct/total), ``top_token_frac``
    (max token count / total), ``top_bigram_frac`` (max bigram count /
    (n_tokens - 1)) as float64; all 0.0 for empty docs. Expression trees
    mirror ``oracle_sql()['word_repetition']`` so doubles are bit-identical.
    """
    return docs.map_batches(
        _repetition_table, batch_format="pyarrow", zero_copy_batch=True
    )


def _flat_tokens(batch: pa.Table) -> tuple[np.ndarray, pa.Array]:
    """Shared tokenize prologue: (doc_idx, flat token array) under the
    corpus-standard ``[a-z0-9]+`` lexer. The SQL oracles mirror this
    tokenizer, so every consumer (repetition kernel, n-gram builder, the
    sequence packer) MUST go through this one function."""
    import pyarrow.compute as pc

    n = len(batch)
    toks = pc.split_pattern_regex(
        pc.utf8_lower(batch["text"]), "[^a-z0-9]+"
    ).combine_chunks()
    flat = toks.flatten()
    doc_idx = np.repeat(
        np.arange(n, dtype=np.int64),
        np.diff(toks.offsets.to_numpy(zero_copy_only=False)),
    )
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    return doc_idx[keep], flat.filter(pa.array(keep))


def _repetition_table(batch: pa.Table) -> pa.Table:
    """Batch kernel shared by ``word_repetition_stage`` and
    ``quality_filter_stage`` — see the former's docstring for semantics."""
    import pyarrow.compute as pc

    n = len(batch)
    doc_idx, flat = _flat_tokens(batch)

    n_tokens = np.bincount(doc_idx, minlength=n).astype(np.int64)

    def _run_stats(d: np.ndarray, vals: pa.Array) -> tuple[np.ndarray, np.ndarray]:
        """(doc ids, value column) -> per-doc (n_distinct, max_count)
        via one lexsort + adjacent-equality run scan."""
        nd = np.zeros(n, np.int64)
        mx = np.zeros(n, np.int64)
        m = len(d)
        if m == 0:
            return nd, mx
        t = pa.table({"d": pa.array(d, pa.int64()), "v": vals})
        order = pc.sort_indices(
            t, sort_keys=[("d", "ascending"), ("v", "ascending")]
        )
        oi = order.to_numpy(zero_copy_only=False)
        ds = d[oi]
        vs = vals.take(order)
        if m > 1:
            same = (
                pc.equal(vs.slice(1), vs.slice(0, m - 1))
                .to_numpy(zero_copy_only=False)
                & (ds[1:] == ds[:-1])
            )
            starts = np.concatenate([[0], np.flatnonzero(~same) + 1])
        else:
            starts = np.array([0], np.int64)
        run_len = np.diff(np.concatenate([starts, [m]]))
        run_doc = ds[starts]
        np.add.at(nd, run_doc, 1)
        np.maximum.at(mx, run_doc, run_len)
        return nd, mx

    n_distinct, max_tok = _run_stats(doc_idx, flat)

    # bigrams: adjacent tokens of the same doc, joined with ' '
    m = len(flat)
    max_bi = np.zeros(n, np.int64)
    if m > 1:
        adj = doc_idx[1:] == doc_idx[:-1]
        if adj.any():
            bg = pc.binary_join_element_wise(
                flat.slice(0, m - 1), flat.slice(1), " "
            ).filter(pa.array(adj))
            _, max_bi = _run_stats(doc_idx[:-1][adj], bg)

    nt_f = n_tokens.astype(np.float64)
    with np.errstate(invalid="ignore", divide="ignore"):
        dup_frac = np.where(n_tokens > 0, 1.0 - n_distinct / nt_f, 0.0)
        top_frac = np.where(n_tokens > 0, max_tok / nt_f, 0.0)
        top_bi = np.where(n_tokens > 1, max_bi / (nt_f - 1.0), 0.0)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array(n_tokens, pa.int64()),
            "n_distinct": pa.array(n_distinct, pa.int64()),
            "dup_token_frac": pa.array(dup_frac, pa.float64()),
            "top_token_frac": pa.array(top_frac, pa.float64()),
            "top_bigram_frac": pa.array(top_bi, pa.float64()),
        }
    )


def _ngram_strings(batch: pa.Table, n_gram: int) -> tuple[np.ndarray, pa.Array]:
    """(doc_idx, gram) for every word ``n_gram``-gram of every doc in the
    batch, as SPACE-JOINED STRINGS (exact string identity — no hashes, so
    membership tests match a SQL string join bit-for-bit). Vectorized:
    one Arrow regex split + one element-wise n-way join of shifted slices."""
    import pyarrow.compute as pc

    doc_idx, flat = _flat_tokens(batch)
    m = len(flat)
    if m < n_gram:
        return np.empty(0, np.int64), pa.array([], pa.string())
    k = m - n_gram + 1
    # all n_gram positions must belong to the same doc
    same = doc_idx[: k] == doc_idx[n_gram - 1 :]
    parts = [flat.slice(i, k) for i in range(n_gram)]
    grams = pc.binary_join_element_wise(*parts, " ")
    return doc_idx[:k][same], grams.filter(pa.array(same))


def decontaminate(docs, *, eval_source: str | None = None, n_gram: int = 13):
    """Benchmark decontamination: find TRAINING docs sharing any word
    ``n_gram``-gram with the held-out EVAL slice (``source ==
    eval_source``; default = max source value). The standard 13-gram
    overlap check used before LLM training (cf. GPT-3 appendix C /
    Dodge et al. 2021 C4 analysis).

    Broadcast pattern, no shuffle: the eval slice's distinct gram set
    (small side) is collected once and shipped via ``ray.put``; every
    training batch filters its grams with one Arrow ``is_in`` hash probe.
    Exact string grams (not hashes) so the result hash-matches the DuckDB
    string-join oracle. At 100 TB the eval side is benchmarks (MBs) while
    the corpus streams — exactly this shape.

    Output: ``(doc_id, n_hits)`` — distinct contaminated grams per
    training doc, docs with >= 1 hit, ordered by doc_id.
    """
    import pyarrow.compute as pc
    import ray

    if eval_source is None:
        eval_source = default_eval_source(docs)

    # --- small side: distinct eval grams, collected + broadcast ---
    def eval_grams(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.equal(batch["source"], eval_source))
        _, grams = _ngram_strings(batch, n_gram)
        return pa.table({"g": pc.unique(grams)})

    gram_parts: list[pa.Array] = []
    for b in docs.map_batches(
        eval_grams, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_size=1 << 18, batch_format="pyarrow"):
        gram_parts.append(b["g"].combine_chunks())
    if gram_parts:
        eval_set = pc.unique(pa.concat_arrays(gram_parts))
    else:
        eval_set = pa.array([], pa.string())
    eval_ref = ray.put(eval_set)

    class HitCounter:
        """Per-batch: training grams -> is_in probe -> per-doc distinct
        hit count. Eval set deserialized once per actor."""

        def __init__(self, ref) -> None:
            self.eval_set = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            batch = batch.filter(
                pc.not_equal(batch["source"], eval_source)
            )
            d, grams = _ngram_strings(batch, n_gram)
            if len(d) == 0:
                return pa.table(
                    {
                        "doc_id": pa.array([], pa.int64()),
                        "n_hits": pa.array([], pa.int64()),
                    }
                )
            hit = pc.is_in(grams, value_set=self.eval_set).to_numpy(
                zero_copy_only=False
            )
            d = d[hit]
            grams = grams.filter(pa.array(hit))
            if len(d) == 0:
                return pa.table(
                    {
                        "doc_id": pa.array([], pa.int64()),
                        "n_hits": pa.array([], pa.int64()),
                    }
                )
            # distinct (doc, gram): one lexsort + run scan
            t = pa.table({"d": pa.array(d, pa.int64()), "g": grams})
            order = pc.sort_indices(
                t, sort_keys=[("d", "ascending"), ("g", "ascending")]
            )
            oi = order.to_numpy(zero_copy_only=False)
            ds = d[oi]
            gs = grams.take(order)
            m = len(ds)
            if m > 1:
                same = (
                    pc.equal(gs.slice(1), gs.slice(0, m - 1)).to_numpy(
                        zero_copy_only=False
                    )
                    & (ds[1:] == ds[:-1])
                )
                starts = np.concatenate([[0], np.flatnonzero(~same) + 1])
            else:
                starts = np.array([0], np.int64)
            run_doc = ds[starts]
            ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            uniq, cnt = np.unique(run_doc, return_counts=True)
            return pa.table(
                {
                    "doc_id": pa.array(ids[uniq], pa.int64()),
                    "n_hits": pa.array(cnt.astype(np.int64), pa.int64()),
                }
            )

    # NOTE deliberately unsorted: Ray's sort emits zero-column empty blocks
    # that break a downstream Dataset.join (pyarrow can't find the key
    # field in a schema-less block) — terminal queries sort for display
    return docs.map_batches(
        HitCounter,
        fn_constructor_args=(eval_ref,),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 8),
        num_cpus=1,
    )


def quality_filter_stage(
    docs,
    *,
    min_tokens: int = 20,
    max_dup_token_frac: float = 0.6,
    max_top_token_frac: float = 0.15,
):
    """Composed C4/Gopher-style quality filter chain: one streaming pass
    labels every doc keep/drop with the FIRST failing rule as ``reason``
    (rule order is part of the contract — a doc failing several rules
    reports the earliest, like the C4 pipeline's ordered filters):

    1. ``too_short``  — fewer than ``min_tokens`` word tokens
    2. ``repetitive`` — duplicate-token fraction above ``max_dup_token_frac``
    3. ``top_heavy``  — most-common-token fraction above ``max_top_token_frac``
    4. ``ok``         — keeps the doc

    Reuses the vectorized ``_repetition_table`` kernel (one lexsort per
    batch) plus an ``np.select`` cascade; row-local, so no shuffle —
    at 100 TB this runs at read throughput. Output:
    ``(doc_id, n_tokens, keep bool, reason string)`` per doc.
    """

    def fn(batch: pa.Table) -> pa.Table:
        rep = _repetition_table(batch)
        n_tokens = rep["n_tokens"].to_numpy(zero_copy_only=False)
        dup_frac = rep["dup_token_frac"].to_numpy(zero_copy_only=False)
        top_frac = rep["top_token_frac"].to_numpy(zero_copy_only=False)
        reason = np.select(
            [
                n_tokens < min_tokens,
                dup_frac > max_dup_token_frac,
                top_frac > max_top_token_frac,
            ],
            ["too_short", "repetitive", "top_heavy"],
            default="ok",
        )
        return pa.table(
            {
                "doc_id": rep["doc_id"],
                "n_tokens": rep["n_tokens"],
                "keep": pa.array(reason == "ok", pa.bool_()),
                "reason": pa.array(reason, pa.string()),
            }
        )

    return docs.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def decontaminate_bloom(
    docs,
    *,
    eval_source: str | None = None,
    n_gram: int = 13,
    n_bits: int = 1 << 23,
    k_hashes: int = 3,
    num_partitions: int | None = None,
):
    """Bloom-prefiltered decontamination — EXACT results, broadcast
    reduced to a fixed-size bitmap.

    ``decontaminate`` broadcasts the eval slice's distinct gram STRINGS;
    at a large eval-suite scale that broadcast grows with the suite. This
    variant builds a Bloom filter of the eval grams' 64-bit hashes
    distributedly (one ``n_bits/8``-byte bitmap per block, OR-folded) and
    broadcasts only the bitmap; training grams that MISS are definitely
    clean, and the surviving sliver (true hits + ~(1-e^(-kn/m))^k false
    positives) is confirmed with an exact distributed string join against
    the eval gram table (``hash_semi_join``), so the output row-matches
    ``decontaminate`` exactly (same SQL oracle).

    Output: ``(doc_id, n_hits)`` — distinct contaminated grams per
    training doc, docs with >= 1 hit.
    """
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Count

    from ..functions.hashing import hash_columns_u64

    if eval_source is None:
        eval_source = default_eval_source(docs)

    def eval_grams(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.equal(batch["source"], eval_source))
        _, grams = _ngram_strings(batch, n_gram)
        return pa.table({"eg": pc.unique(grams)})

    # materialized once: consumed by BOTH the bloom build and the exact
    # confirmation join (it is only the eval slice's distinct grams)
    ev = docs.map_batches(
        eval_grams, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    from .relational import bloom_probe, build_bloom_bitmap

    bloom_ref = ray.put(
        build_bloom_bitmap(ev, "eg", n_bits=n_bits, k_hashes=k_hashes)
    )

    class BloomProbe:
        """training batch -> (doc_id, g) rows surviving the bloom probe.
        Bitmap deserialized once per actor (zero-copy plasma view)."""

        def __init__(self, ref) -> None:
            self.bm = ray.get(ref)

        def __call__(self, batch: pa.Table):
            # GENERATOR: yields only nonempty tables. A 0-row output block
            # (even schema-bearing) breaks Ray's hash-join aggregator
            # ("No match ... FieldRef" in finalize), so misses emit nothing.
            batch = batch.filter(pc.not_equal(batch["source"], eval_source))
            d, grams = _ngram_strings(batch, n_gram)
            if len(d) == 0:
                return
            gt = pa.table({"g": grams})
            h = hash_columns_u64(gt, ["g"])
            hit = bloom_probe(self.bm, h, n_bits=n_bits, k_hashes=k_hashes)
            if not hit.any():
                return
            d = d[hit]
            grams = grams.filter(pa.array(hit))
            # distinct (doc, gram) within the batch (a doc lives in exactly
            # one batch, so this is globally distinct): lexsort + run scan
            t = pa.table({"d": pa.array(d, pa.int64()), "g": grams})
            order = pc.sort_indices(
                t, sort_keys=[("d", "ascending"), ("g", "ascending")]
            )
            oi = order.to_numpy(zero_copy_only=False)
            ds_ = d[oi]
            gs = grams.take(order)
            m = len(ds_)
            if m > 1:
                same = (
                    pc.equal(gs.slice(1), gs.slice(0, m - 1)).to_numpy(
                        zero_copy_only=False
                    )
                    & (ds_[1:] == ds_[:-1])
                )
                starts = np.concatenate([[0], np.flatnonzero(~same) + 1])
            else:
                starts = np.array([0], np.int64)
            take = pa.array(starts, pa.int64())
            ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            yield pa.table(
                {
                    "doc_id": pa.array(ids[ds_[starts]], pa.int64()),
                    "g": gs.take(take),
                }
            )

    # materialized: the bloom-hit sliver is tiny (true hits + FP rate of
    # the corpus grams), and the barrier keeps the probe's actor pool from
    # contending with the join's shuffle aggregators in one plan
    cand = docs.map_batches(
        BloomProbe,
        fn_constructor_args=(bloom_ref,),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 8),
        num_cpus=1,
    ).materialize()
    if cand.count() == 0:
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_hits": pa.array([], pa.int64()),
                }
            )
        )

    # exact confirmation via the engine's union-tag partition join (cf.
    # stages/verify.py) rather than Dataset.join: candidate and eval grams
    # are co-partitioned by hash(gram) and membership is one Arrow is_in
    # per partition — robust to empty blocks, no join-actor spawn cost
    from .lsh import default_num_partitions

    P = int(num_partitions or default_num_partitions())

    def tag_cand(b: pa.Table) -> pa.Table:
        h = hash_columns_u64(b, ["g"])
        return pa.table(
            {
                "part": pa.array(
                    (h % np.uint64(P)).astype(np.int32), pa.int32()
                ),
                "doc_id": b["doc_id"],
                "g": b["g"],
            }
        )

    def tag_ev(b: pa.Table) -> pa.Table:
        h = hash_columns_u64(b, ["eg"])
        n = len(b)
        return pa.table(
            {
                "part": pa.array(
                    (h % np.uint64(P)).astype(np.int32), pa.int32()
                ),
                "doc_id": pa.array(np.full(n, -1, np.int64), pa.int64()),
                "g": b["eg"],
            }
        )

    def confirm(grp: pa.Table) -> pa.Table:
        is_ev = pc.equal(grp["doc_id"], -1)
        evg = grp.filter(is_ev)["g"].combine_chunks()
        cnd = grp.filter(pc.invert(is_ev))
        if len(cnd) == 0 or len(evg) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "g": pa.array([], pa.string()),
                }
            )
        keep = pc.is_in(cnd["g"].combine_chunks(), value_set=evg)
        out = cnd.filter(keep)
        return pa.table({"doc_id": out["doc_id"], "g": out["g"]})

    verified = (
        cand.map_batches(tag_cand, batch_format="pyarrow", zero_copy_batch=True)
        .union(
            ev.map_batches(tag_ev, batch_format="pyarrow", zero_copy_batch=True)
        )
        .groupby("part")
        .map_groups(
            lambda grp: confirm(grp.drop_columns(["part"])),
            batch_format="pyarrow",
        )
    )
    return verified.groupby("doc_id").aggregate(Count(alias_name="n_hits"))


def dup_rate_by_source(docs):
    """Corpus-health metric: per-source exact-duplicate rate — the first
    number a data curator checks per crawl/provider before dedup.

    One shuffle of distinct (source, text-hash) pairs: each batch dedupes
    locally (a text repeated within a batch contributes once), the
    combining ``groupby`` yields exact distinct counts, and doc totals
    ride the same rows as a partial-count column. ``dup_rate`` uses the
    identical float expression tree as the SQL oracle.

    Output: ``source, n_docs, n_unique, dup_rate`` (exact-text identity;
    sha1 stands in for DISTINCT text with ~2^-80 collision odds at any
    realistic corpus).
    """
    import hashlib

    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Sum

    def partial(batch: pa.Table) -> pa.Table:
        src = batch["source"].to_pylist()
        texts = batch["text"].to_pylist()
        seen: dict[tuple[str, bytes], int] = {}
        for s_, t_ in zip(src, texts):
            k = (s_, hashlib.sha1((t_ or "").encode()).digest())
            seen[k] = seen.get(k, 0) + 1
        ks = list(seen)
        return pa.table(
            {
                "source": pa.array([k[0] for k in ks], pa.string()),
                "h": pa.array([k[1] for k in ks], pa.binary(20)),
                "c": pa.array([seen[k] for k in ks], pa.int64()),
            }
        )

    per_hash = (
        docs.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["source", "h"])
        .aggregate(Sum("c", alias_name="n"))
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "source": b["source"],
                "one": pa.array(np.ones(len(b), np.int64), pa.int64()),
                "n": b["n"],
            }
        )

    agg = (
        per_hash.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("source")
        .aggregate(
            Sum("one", alias_name="n_unique"), Sum("n", alias_name="n_docs")
        )
    )

    def rate(b: pa.Table) -> pa.Table:
        nd = b["n_docs"].to_numpy(zero_copy_only=False).astype(np.float64)
        nu = b["n_unique"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "source": b["source"],
                "n_docs": b["n_docs"],
                "n_unique": b["n_unique"],
                "dup_rate": pa.array(1.0 - nu / nd, pa.float64()),
            }
        )

    return agg.map_batches(
        rate, batch_format="pyarrow", zero_copy_batch=True
    ).sort("source")


def _token_windows(batch: pa.Table, W: int):
    """Cut each doc's token stream into consecutive ``W``-token windows
    (final window may be partial). Returns ``None`` for a token-less batch,
    else ``(wtext, wdoc, wwin, wtok)``: per-window joined string (ONE
    ``pc.binary_join`` over a ListArray — no per-window Python), batch row
    index, window index within the doc, and token count."""
    import pyarrow.compute as pc

    doc_idx, flat = _flat_tokens(batch)
    m = len(doc_idx)
    if m == 0:
        return None
    run_starts = np.flatnonzero(np.diff(doc_idx, prepend=-1))
    run_lens = np.diff(np.append(run_starts, m))
    pos = np.arange(m, dtype=np.int64) - np.repeat(run_starts, run_lens)
    w_start = np.flatnonzero(pos % W == 0)
    offsets = np.append(w_start, m).astype(np.int32)
    wins = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), flat)
    wtext = pc.binary_join(wins, " ")
    return wtext, doc_idx[w_start], pos[w_start] // W, np.diff(offsets).astype(np.int64)


def _window_keys(wtext: pa.Array, P: int) -> tuple[pa.Array, pa.Array, pa.Array]:
    """The window identity, defined ONCE for every consumer (dedup
    accounting AND scrub removal must agree or they silently diverge):
    128-bit key = two independent 64-bit row hashes of the joined window
    string (int64 bit-pattern views), plus the int32 hash partition."""
    from ..functions.hashing import hash_columns_u64

    wtbl = pa.table({"w": wtext})
    wh = hash_columns_u64(wtbl, ["w"], seed=0)
    wh2 = hash_columns_u64(wtbl, ["w"], seed=0x9E3779B9)
    return (
        pa.array(wh.view(np.int64), pa.int64()),
        pa.array(wh2.view(np.int64), pa.int64()),
        pa.array((wh % np.uint64(P)).astype(np.int32), pa.int32()),
    )


def window_dedup_stage(docs, *, window: int = 25, num_partitions: int | None = None):
    """C4-style span-level dedup accounting at fixed ``window``-token
    windows: corpus-wide, every occurrence of a window's exact token
    sequence other than its first (lexicographically minimal
    ``(doc_id, win_idx)``) occurrence counts as duplicated text. C4 removes
    repeated three-sentence spans; this corpus has no sentence boundaries,
    so the span unit is a fixed token window — same keep-first-globally
    semantics, SQL-oracle-expressible.

    Shape (one all-to-all + one small combinable aggregate):

    1. Row-local, vectorized: ``_flat_tokens`` -> cut each doc's token
       stream into consecutive ``window``-token windows (final window may
       be partial), re-join each window with ONE ``pc.binary_join`` over a
       ListArray (no per-window Python), and key it with a 128-bit hash
       (two independent 64-bit row hashes — at web scale (~10^12 windows /
       100 TB) a single 64-bit key would collide ~1e5 times; 128 bits makes
       false merges negligible). Only ``(wh, wh2, doc_id, win_idx, wtok)``
       — 36 B/row, never the text — enters the shuffle.
    2. Hash-partition groupby on the key: per partition one lexsort marks
       every non-first occurrence of a key run as duplicated, then
       pre-aggregates per doc (partial sums), so the final ``groupby`` is
       over <= docs-per-partition rows, not windows.
    3. ``groupby(doc_id).sum`` of the partials.

    Output per doc (docs with >= 1 token): ``doc_id, n_windows,
    dup_windows, tokens_total, tokens_kept``.
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from .lsh import default_num_partitions

    P = num_partitions or default_num_partitions()
    W = window

    def to_windows(batch: pa.Table):
        w = _token_windows(batch, W)
        if w is None:
            return
        wtext, wdoc, wwin, wtok = w
        # int64 bit-pattern views inside: uint64 >= 2**63 columns fall
        # back to pickled blocks in Ray's shuffle
        wh, wh2, part = _window_keys(wtext, P)
        yield pa.table(
            {
                "wh": wh,
                "wh2": wh2,
                "doc_id": batch["doc_id"].take(pa.array(wdoc, pa.int64())),
                "win_idx": pa.array(wwin, pa.int64()),
                "wtok": pa.array(wtok, pa.int64()),
                "part": part,
            }
        )

    def mark_block(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["part"])
        n = len(g)
        order = pc.sort_indices(
            g,
            sort_keys=[
                ("wh", "ascending"),
                ("wh2", "ascending"),
                ("doc_id", "ascending"),
                ("win_idx", "ascending"),
            ],
        )
        g = g.take(order)
        wh = g["wh"].to_numpy(zero_copy_only=False)
        wh2 = g["wh2"].to_numpy(zero_copy_only=False)
        first = np.ones(n, bool)
        first[1:] = (wh[1:] != wh[:-1]) | (wh2[1:] != wh2[:-1])
        doc = g["doc_id"].to_numpy(zero_copy_only=False)
        wtok = g["wtok"].to_numpy(zero_copy_only=False)
        udoc, inv = np.unique(doc, return_inverse=True)
        k = len(udoc)
        # float64 bincount weights are exact for these magnitudes (< 2**53)
        return pa.table(
            {
                "doc_id": pa.array(udoc, pa.int64()),
                "n_windows": pa.array(np.bincount(inv, minlength=k), pa.int64()),
                "dup_windows": pa.array(
                    np.bincount(inv, weights=~first, minlength=k).astype(np.int64),
                    pa.int64(),
                ),
                "tokens_total": pa.array(
                    np.bincount(inv, weights=wtok, minlength=k).astype(np.int64),
                    pa.int64(),
                ),
                "tokens_kept": pa.array(
                    np.bincount(inv, weights=wtok * first, minlength=k).astype(
                        np.int64
                    ),
                    pa.int64(),
                ),
            }
        )

    return (
        docs.map_batches(to_windows, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(mark_block, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(
            Sum("n_windows", alias_name="n_windows"),
            Sum("dup_windows", alias_name="dup_windows"),
            Sum("tokens_total", alias_name="tokens_total"),
            Sum("tokens_kept", alias_name="tokens_kept"),
        )
    )


def _rebuild_kept_windows(batch, wtext, wdoc, keep):
    """Shared cut tail of ``window_scrub_stage``: given the windows of
    ``batch`` and a per-window ``keep`` mask, re-join each doc's kept
    windows. Docs with zero tokens are dropped (they have no windows)."""
    import pyarrow.compute as pc

    nd = len(batch)
    nwin = np.bincount(wdoc, minlength=nd)
    ndrop = np.bincount(wdoc[~keep], minlength=nd)
    off2 = np.concatenate([[0], np.cumsum(nwin - ndrop)]).astype(np.int32)
    lists = pa.ListArray.from_arrays(
        pa.array(off2, pa.int32()), wtext.filter(pa.array(keep))
    )
    clean = pc.binary_join(lists, " ")
    has_tok = nwin > 0
    sel = pa.array(has_tok)
    return pa.table(
        {
            "doc_id": batch["doc_id"].filter(sel),
            "clean_text": clean.filter(sel),
            "n_windows": pa.array(nwin[has_tok].astype(np.int64), pa.int64()),
            "dup_windows": pa.array(
                ndrop[has_tok].astype(np.int64), pa.int64()
            ),
        }
    )


_WINDOW_SCRUB_EMPTY = pa.table(
    {
        "doc_id": pa.array([], pa.int64()),
        "clean_text": pa.array([], pa.string()),
        "n_windows": pa.array([], pa.int64()),
        "dup_windows": pa.array([], pa.int64()),
    }
)


def window_scrub_stage(
    docs,
    *,
    window: int = 25,
    num_partitions: int | None = None,
    broadcast_budget: int | None = None,
):
    """C4-style span REMOVAL at fixed ``window``-token windows: every
    window whose exact token sequence occurred earlier (keep-first by
    ``(doc_id, win_idx)``, as in ``window_dedup_stage``) is dropped, and
    each doc is rebuilt from its kept windows.

    Two passes so the all-to-all never carries text (the ``scrub_spans``
    route->mark->cut shape):

    1. the window-key shuffle of ``window_dedup_stage``, emitting ONLY the
       dropped ``(doc_id, win_idx)`` rows — the duplicated sliver, which is
       materialized (small by definition: it is the dup rate times the
       window count);
    2. the cut. When the sliver fits ``broadcast_budget`` keys (default
       the scrub broadcast budget, env ``GRAFT_SCRUB_BCAST_MAX``), the
       dropped set is compacted to ``code(doc) * span + win_idx`` int64
       keys, broadcast once via ``ray.put``, and the cut is one row-local
       ``map_batches`` (re-tokenize, searchsorted membership, rebuild) —
       document text never enters an all-to-all. Past the budget, or if
       the packed-key space would overflow int64, a union-tag partition
       join on ``hash(doc_id)`` does the same cut per partition.

    Output per doc (docs with >= 1 token): ``doc_id, clean_text,
    n_windows, dup_windows``; ``clean_text == ''`` when every window was
    dropped. ``clean_text`` is the token-normalized rebuild (lowered,
    ``[a-z0-9]+`` lexer, single-space joins) — the same normalization the
    window identity is defined over.
    """
    import pyarrow.compute as pc

    from ..functions.hashing import hash_columns_u64
    from .lsh import default_num_partitions

    P = num_partitions or default_num_partitions()
    W = window

    def to_keys(batch: pa.Table):
        w = _token_windows(batch, W)
        if w is None:
            return
        wtext, wdoc, wwin, _ = w
        wh, wh2, part = _window_keys(wtext, P)
        yield pa.table(
            {
                "wh": wh,
                "wh2": wh2,
                "doc_id": batch["doc_id"].take(pa.array(wdoc, pa.int64())),
                "win_idx": pa.array(wwin, pa.int64()),
                "part": part,
            }
        )

    def dropped_block(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["part"])
        n = len(g)
        order = pc.sort_indices(
            g,
            sort_keys=[
                ("wh", "ascending"),
                ("wh2", "ascending"),
                ("doc_id", "ascending"),
                ("win_idx", "ascending"),
            ],
        )
        g = g.take(order)
        wh = g["wh"].to_numpy(zero_copy_only=False)
        wh2 = g["wh2"].to_numpy(zero_copy_only=False)
        first = np.ones(n, bool)
        first[1:] = (wh[1:] != wh[:-1]) | (wh2[1:] != wh2[:-1])
        dup = pa.array(~first)
        return pa.table(
            {"doc_id": g["doc_id"].filter(dup), "win_idx": g["win_idx"].filter(dup)}
        )

    # the duplicated sliver — materialized so its all-to-all completes
    # before the rebuild's (cf. decontaminate_bloom's cand barrier)
    dropped = (
        docs.map_batches(to_keys, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(dropped_block, batch_format="pyarrow")
        .materialize()
    )

    import ray

    from .paradedup import _broadcast_key_budget

    budget = (
        broadcast_budget
        if broadcast_budget is not None
        else _broadcast_key_budget()
    )
    if dropped.count() <= budget:
        from .relational import pull_columns

        dd, dw = pull_columns(dropped, ["doc_id", "win_idx"])
        udd = np.unique(dd)
        span = int(dw.max(initial=0)) + 1
        # packed-key space must fit int64; pathological (giant-doc) inputs
        # fall through to the partition-join tail below
        if len(udd) * span < 1 << 62:
            packed = np.sort(
                np.searchsorted(udd, dd).astype(np.int64) * span + dw
            )
            ref = ray.put((udd, packed, span))

            def cut_broadcast(batch: pa.Table) -> pa.Table:
                w = _token_windows(batch, W)
                if w is None:
                    return _WINDOW_SCRUB_EMPTY
                wtext, wdoc, wwin, _ = w
                udd, packed, span = ray.get(ref)
                doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
                wdocid = doc_ids[wdoc]
                keep = np.ones(len(wdocid), bool)
                if len(packed):
                    code = np.minimum(
                        np.searchsorted(udd, wdocid), len(udd) - 1
                    )
                    cand = (udd[code] == wdocid) & (wwin < span)
                    if cand.any():
                        k = code[cand].astype(np.int64) * span + wwin[cand]
                        pos = np.minimum(
                            np.searchsorted(packed, k), len(packed) - 1
                        )
                        keep[cand] = packed[pos] != k
                return _rebuild_kept_windows(batch, wtext, wdoc, keep)

            return docs.select_columns(["doc_id", "text"]).map_batches(
                cut_broadcast, batch_format="pyarrow", zero_copy_batch=True
            )

    def tag_docs(b: pa.Table) -> pa.Table:
        h = hash_columns_u64(b, ["doc_id"], seed=7)
        n = len(b)
        return pa.table(
            {
                "part": pa.array((h % np.uint64(P)).astype(np.int32), pa.int32()),
                "doc_id": b["doc_id"],
                "win_idx": pa.array(np.full(n, -1, np.int64), pa.int64()),
                "text": b["text"],
            }
        )

    def tag_dropped(b: pa.Table):
        if len(b) == 0:
            return
        h = hash_columns_u64(b, ["doc_id"], seed=7)
        n = len(b)
        yield pa.table(
            {
                "part": pa.array((h % np.uint64(P)).astype(np.int32), pa.int32()),
                "doc_id": b["doc_id"],
                "win_idx": b["win_idx"],
                "text": pa.array([""] * n, pa.string()),
            }
        )

    def rebuild(grp: pa.Table) -> pa.Table:
        is_doc = pc.equal(grp["win_idx"], -1)
        docs_t = grp.filter(is_doc)
        drop_t = grp.filter(pc.invert(is_doc))
        batch = pa.table({"doc_id": docs_t["doc_id"], "text": docs_t["text"]})
        w = _token_windows(batch, W)
        if w is None:
            return _WINDOW_SCRUB_EMPTY
        wtext, wdoc, wwin, _ = w
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        wdocid = doc_ids[wdoc]
        dd = drop_t["doc_id"].to_numpy(zero_copy_only=False)
        dw = drop_t["win_idx"].to_numpy(zero_copy_only=False)
        alld = np.concatenate([wdocid, dd])
        _, codes = np.unique(alld, return_inverse=True)
        span = int(max(wwin.max(initial=0), dw.max(initial=0))) + 1
        wkey = codes[: len(wdocid)].astype(np.int64) * span + wwin
        dkey = codes[len(wdocid):].astype(np.int64) * span + dw
        keep = ~np.isin(wkey, dkey)
        return _rebuild_kept_windows(batch, wtext, wdoc, keep)

    return (
        docs.select_columns(["doc_id", "text"])
        .map_batches(tag_docs, batch_format="pyarrow", zero_copy_batch=True)
        .union(
            dropped.map_batches(
                tag_dropped, batch_format="pyarrow", zero_copy_batch=True
            )
        )
        .groupby("part")
        .map_groups(
            lambda grp: rebuild(grp.drop_columns(["part"])),
            batch_format="pyarrow",
        )
    )


def canonical_text_array(texts: pa.Array) -> pa.Array:
    """CCNet-style canonical form: lower + digit-fold (every digit -> 0) +
    whitespace collapse + trim. All RE2 kernels — identical semantics to
    the DuckDB regexp_replace mirror (verified by the oracle hash)."""
    import pyarrow.compute as pc

    return pc.utf8_trim_whitespace(
        pc.replace_substring_regex(
            pc.replace_substring_regex(pc.utf8_lower(texts), "[0-9]", "0"),
            r"\s+",
            " ",
        )
    )


def canonical_dup_groups(docs, *, num_partitions: int | None = None):
    """Canonical-form dedup (the CCNet trick): docs identical after
    lower/digit-fold/whitespace-collapse form one group — catches the
    casing, counter and timestamp variants byte-exact dedup misses, at
    near-exact-dedup cost (row-local normalize, key-only groupby).

    Shape: per batch, normalize (vectorized RE2) and key with a 128-bit
    hash (two 64-bit row hashes — canonical strings never enter the
    shuffle); one hash-partition groupby marks groups; per-doc metadata
    (count, char mass) pre-aggregates in the same pass.

    Output: one row per DUPLICATED canonical form: ``keep_id`` (min
    doc_id), ``n_docs``, ``total_chars``.
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Min, Sum

    from ..functions.hashing import hash_columns_u64
    from .lsh import default_num_partitions

    P = num_partitions or default_num_partitions()

    def keyed(batch: pa.Table) -> pa.Table:
        ct = pa.table({"c": canonical_text_array(batch["text"])})
        h1 = hash_columns_u64(ct, ["c"], seed=0)
        h2 = hash_columns_u64(ct, ["c"], seed=0x9E3779B9)
        return pa.table(
            {
                "h1": pa.array(h1.view(np.int64), pa.int64()),
                "h2": pa.array(h2.view(np.int64), pa.int64()),
                "doc_id": batch["doc_id"],
                "n_chars": batch["n_chars"],
                "part": pa.array(
                    (h1 % np.uint64(P)).astype(np.int32), pa.int32()
                ),
            }
        )

    def groups(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["part"])
        n = len(g)
        order = pc.sort_indices(
            g,
            sort_keys=[
                ("h1", "ascending"),
                ("h2", "ascending"),
                ("doc_id", "ascending"),
            ],
        )
        g = g.take(order)
        h1 = g["h1"].to_numpy(zero_copy_only=False)
        h2 = g["h2"].to_numpy(zero_copy_only=False)
        first = np.ones(n, bool)
        first[1:] = (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1])
        starts = np.flatnonzero(first)
        lens = np.diff(np.append(starts, n))
        keep = lens >= 2
        if not keep.any():
            return pa.table(
                {
                    "keep_id": pa.array([], pa.int64()),
                    "n_docs": pa.array([], pa.int64()),
                    "total_chars": pa.array([], pa.int64()),
                }
            )
        ids = g["doc_id"].to_numpy(zero_copy_only=False)
        chars = g["n_chars"].to_numpy(zero_copy_only=False)
        sums = np.add.reduceat(chars, starts)
        return pa.table(
            {
                # doc_ids are sorted within a run, so the run head is min
                "keep_id": pa.array(ids[starts[keep]], pa.int64()),
                "n_docs": pa.array(lens[keep].astype(np.int64), pa.int64()),
                "total_chars": pa.array(sums[keep].astype(np.int64), pa.int64()),
            }
        )

    return (
        docs.map_batches(keyed, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(groups, batch_format="pyarrow")
    )


def canonical_dup_assign(docs, *, num_partitions: int | None = None):
    """Per-doc canonical assignment under the CCNet canonical form: every
    doc -> min doc_id of its canonical-text group (== itself when unique).
    Same key-only shuffle as ``canonical_dup_groups``; output has one row
    per input doc, so it stays well-formed on dup-free corpora."""
    import pyarrow.compute as pc

    from ..functions.hashing import hash_columns_u64
    from .lsh import default_num_partitions

    P = num_partitions or default_num_partitions()

    def keyed(batch: pa.Table) -> pa.Table:
        ct = pa.table({"c": canonical_text_array(batch["text"])})
        h1 = hash_columns_u64(ct, ["c"], seed=0)
        h2 = hash_columns_u64(ct, ["c"], seed=0x9E3779B9)
        return pa.table(
            {
                "h1": pa.array(h1.view(np.int64), pa.int64()),
                "h2": pa.array(h2.view(np.int64), pa.int64()),
                "doc_id": batch["doc_id"],
                "part": pa.array(
                    (h1 % np.uint64(P)).astype(np.int32), pa.int32()
                ),
            }
        )

    def assign(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["part"])
        n = len(g)
        order = pc.sort_indices(
            g,
            sort_keys=[
                ("h1", "ascending"),
                ("h2", "ascending"),
                ("doc_id", "ascending"),
            ],
        )
        g = g.take(order)
        h1 = g["h1"].to_numpy(zero_copy_only=False)
        h2 = g["h2"].to_numpy(zero_copy_only=False)
        first = np.ones(n, bool)
        first[1:] = (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1])
        seg = np.cumsum(first) - 1
        ids = g["doc_id"].to_numpy(zero_copy_only=False)
        canon = ids[np.flatnonzero(first)][seg]  # run head = run min (sorted)
        return pa.table(
            {
                "doc_id": g["doc_id"],
                "canonical_id": pa.array(canon, pa.int64()),
            }
        )

    return (
        docs.map_batches(keyed, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(assign, batch_format="pyarrow")
    )
