"""DSIR — Data Selection via Importance Resampling (Xie et al., NeurIPS
2023): score every document with the log importance weight
``log p_target(x) - log p_raw(x)`` under hashed n-gram bag-of-features
models, the standard cheap proxy for "does this raw-web doc look like the
target distribution" used to select pretraining data.

Ray-Data-first shape (two passes, both streaming):

1. FIT — one scan builds the target and raw (background) feature-count
   vectors: per batch, tokens + in-doc bigrams hash into ``n_buckets``
   fixed buckets and a ``np.bincount`` partial (one ``n_buckets``-long
   int64 vector per block, independent of row count) is emitted; the
   driver folds the fixed-size partials (the ``build_bloom_bitmap``
   pattern — O(blocks x n_buckets x 8 B), swap in a tree reduce at
   10^5+ blocks). Laplace-smoothed log-ratios are then broadcast ONCE via
   ``ray.put``.
2. SCORE — a second scan computes each doc's mean log-ratio over its
   features with one ``np.add.reduceat`` segment sum — row-local,
   vectorized, no shuffle at all.

The input is consumed twice; at scale both passes re-stream off Parquet
(nothing is pinned), and the only driver state is the two fixed-size count
vectors.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_BIGRAM_SALT = np.uint64(0xC2B2AE3D27D4EB4F)  # xxhash64 prime 2


def _feature_buckets(batch: pa.Table, n_buckets: int) -> tuple[np.ndarray, np.ndarray]:
    """(doc_idx, bucket) for every unigram + in-doc-adjacent bigram of the
    batch under the corpus-standard lexer. Bigrams never cross doc bounds."""
    from ..functions.hashing import hash_columns_u64, splitmix64
    from .textstats import _flat_tokens

    doc_idx, flat = _flat_tokens(batch)
    if len(doc_idx) == 0:
        return doc_idx, np.empty(0, np.int64)
    th = hash_columns_u64(pa.table({"t": flat}), ["t"], seed=0)
    same_doc = doc_idx[1:] == doc_idx[:-1]
    with np.errstate(over="ignore"):
        bg = splitmix64(th[:-1] * _BIGRAM_SALT ^ th[1:])[same_doc]
    feats = np.concatenate([th, bg])
    fdoc = np.concatenate([doc_idx, doc_idx[:-1][same_doc]])
    buckets = (feats % np.uint64(n_buckets)).astype(np.int64)
    return fdoc, buckets


def dsir_fit(
    docs,
    *,
    target_col: str = "lang",
    target_value: str = "en",
    n_buckets: int = 1 << 14,
) -> np.ndarray:
    """One scan -> the smoothed per-bucket log-ratio vector
    ``log p_target(b) - log p_raw(b)`` (float64[n_buckets]). Raw =
    the whole input (the DSIR paper's raw pool); target = rows where
    ``target_col == target_value``."""

    def partials(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        fdoc, buckets = _feature_buckets(batch, n_buckets)
        cnt_all = np.bincount(buckets, minlength=n_buckets).astype(np.int64)
        is_t = pc.equal(
            batch[target_col], pa.scalar(target_value)
        ).to_numpy(zero_copy_only=False)
        is_t = np.asarray(is_t, dtype=bool)
        if len(fdoc):
            tmask = is_t[fdoc]
            cnt_t = np.bincount(
                buckets[tmask], minlength=n_buckets
            ).astype(np.int64)
        else:
            cnt_t = np.zeros(n_buckets, np.int64)
        return pa.table(
            {
                "cnt_all": pa.array([cnt_all.tobytes()], pa.large_binary()),
                "cnt_t": pa.array([cnt_t.tobytes()], pa.large_binary()),
            }
        )

    total_all = np.zeros(n_buckets, np.int64)
    total_t = np.zeros(n_buckets, np.int64)
    for b in docs.map_batches(
        partials, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_size=64, batch_format="pyarrow"):
        for buf in b["cnt_all"].to_pylist():
            total_all += np.frombuffer(buf, np.int64)
        for buf in b["cnt_t"].to_pylist():
            total_t += np.frombuffer(buf, np.int64)
    # Laplace(0.5) smoothing keeps empty buckets finite on both sides
    log_p_t = np.log(total_t + 0.5) - np.log(total_t.sum() + 0.5 * n_buckets)
    log_p_a = np.log(total_all + 0.5) - np.log(
        total_all.sum() + 0.5 * n_buckets
    )
    return log_p_t - log_p_a


def dsir_score(docs, log_ratio: np.ndarray, *, micro: bool = True):
    """Second scan: per doc, the MEAN per-feature log importance ratio
    (length-normalized, the paper's unit-feature convention). Output
    ``doc_id, n_features, dsir_logw_micro`` (int64 microunits — the
    feature order within a doc is fixed by the text, so the float sum is
    deterministic under any partitioning and the rounded value is
    golden-pinnable). Docs with zero features score 0."""
    import ray

    n_buckets = len(log_ratio)
    ref = ray.put(log_ratio)

    def score(batch: pa.Table) -> pa.Table:
        lr = ray.get(ref)
        n = len(batch)
        fdoc, buckets = _feature_buckets(batch, n_buckets)
        nfeat = np.bincount(fdoc, minlength=n).astype(np.int64)
        sums = np.zeros(n, np.float64)
        if len(fdoc):
            # fdoc is non-decreasing for unigrams but the appended bigrams
            # restart the doc walk — one stable argsort regroups features
            # per doc without changing in-doc order (determinism)
            order = np.argsort(fdoc, kind="stable")
            fdoc_s = fdoc[order]
            vals = lr[buckets[order]]
            starts = np.flatnonzero(
                np.concatenate(([True], fdoc_s[1:] != fdoc_s[:-1]))
            )
            present = fdoc_s[starts]
            sums[present] = np.add.reduceat(vals, starts)
        mean = np.where(nfeat > 0, sums / np.maximum(nfeat, 1), 0.0)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_features": pa.array(nfeat, pa.int64()),
                "dsir_logw_micro": pa.array(
                    np.round(mean * 1e6).astype(np.int64), pa.int64()
                ),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


def dsir_weights(
    docs,
    *,
    target_col: str = "lang",
    target_value: str = "en",
    n_buckets: int = 1 << 14,
):
    """Fit + score in one call (two streaming scans of ``docs``)."""
    lr = dsir_fit(
        docs,
        target_col=target_col,
        target_value=target_value,
        n_buckets=n_buckets,
    )
    return dsir_score(docs.drop_columns([target_col]), lr)
