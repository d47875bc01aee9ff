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
        texts = batch["text"].to_pylist()
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
    """(doc_id, n_tokens) under the canonical tokenizer (SQL-oracle-checkable)."""
    from ..functions.textstats import TOKEN_RE

    def fn(batch: pa.Table) -> pa.Table:
        counts = [len(TOKEN_RE.findall(t.lower())) for t in batch["text"].to_pylist()]
        return pa.table(
            {"doc_id": batch["doc_id"], "n_tokens": pa.array(counts, pa.int64())}
        )

    return docs.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


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
            f = fingerprint_doc(t, w=w, guarantee_len=guarantee_len)
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


def suffix_candidate_pairs(docs, *, w: int = 25, guarantee_len: int = 50, group_cap: int = 256):
    """Exact-substring candidate pairs via fingerprint groupby (method='suffix').

    Same skew policy as LSH banding: fingerprint groups above ``group_cap``
    (boilerplate n-grams) are dropped — they would emit O(m^2) pairs for
    content the exact/minhash paths already cluster.
    """

    fps = fingerprint_stage(docs, w=w, guarantee_len=guarantee_len)

    def emit(group: pa.Table) -> pa.Table:
        m = len(group)
        empty = pa.table(
            {
                "id_a": pa.array([], pa.int64()),
                "id_b": pa.array([], pa.int64()),
                "method": pa.array([], pa.string()),
            }
        )
        if m < 2 or m > group_cap:
            return empty
        ids = sorted(set(group["doc_id"].to_pylist()))
        if len(ids) < 2:
            return empty
        import itertools

        pairs = list(itertools.combinations(ids, 2))
        return pa.table(
            {
                "id_a": pa.array([p[0] for p in pairs], pa.int64()),
                "id_b": pa.array([p[1] for p in pairs], pa.int64()),
                "method": pa.array(["suffix"] * len(pairs), pa.string()),
            }
        )

    pairs = fps.groupby("fingerprint").map_groups(emit, batch_format="pyarrow")

    def first(g: pa.Table) -> pa.Table:
        return g.slice(0, 1)

    return pairs.groupby(["id_a", "id_b"]).map_groups(first, batch_format="pyarrow")
