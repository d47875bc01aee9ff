"""Data-mixture resampling — the "mixture weights" step every LLM
training-data pipeline runs after cleaning: per-source up/down-sampling to
hit target proportions (Pile/LLaMA-style epoch multipliers).

Both stages are row-local ``map_batches`` (NO shuffle — the whole point of
deterministic hash sampling is that mixture re-weighting costs one streaming
pass at any corpus size), vectorized, and integer-exact so the SQL oracles
hash-match bit-for-bit:

- copy count of doc d from source s with weight w:
  ``floor(w) + (1 if r(d) < round(frac(w) * M) else 0)`` where
  ``r(d) = ((d % M) * (A % M) + C) % M`` — a multiplicative-congruential
  residue mod the prime ``M = 1000003``. Reducing ``d`` mod M BEFORE the
  multiply keeps every product < 2**40, so the arithmetic never overflows
  int64 for ANY doc_id (the SQL mirror has the same property; docs whose
  ids are congruent mod M share a fate, which is irrelevant for sampling).
- fractional thresholds are precomputed as integers once (driver side) and
  broadcast in the task closure — no floats anywhere in the row path.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

MIX_MOD = 1000003  # prime
MIX_MUL = 2654435761  # Knuth multiplicative constant
MIX_ADD = 104729

# default demo mixture: exercise upsampling (2.5x), downsampling (0.25x)
# and the pass-through default in one plan
DEFAULT_WEIGHTS = {"src0": 2.5, "src1": 0.25}
DEFAULT_WEIGHT = 1.0


def weight_thresholds(
    weights: dict[str, float] | None, default: float
) -> tuple[dict[str, tuple[int, int]], tuple[int, int]]:
    """weight -> (base_copies, int threshold in [0, MIX_MOD)) — the only
    float->int conversion, done ONCE driver-side so workers are all-integer."""

    def conv(w: float) -> tuple[int, int]:
        if w < 0:
            raise ValueError(f"mixture weight must be >= 0, got {w}")
        base = int(w)
        return base, int(round((w - base) * MIX_MOD))

    weights = DEFAULT_WEIGHTS if weights is None else weights
    return {s: conv(w) for s, w in weights.items()}, conv(default)


def _residue(doc_ids: np.ndarray) -> np.ndarray:
    return ((doc_ids % MIX_MOD) * (MIX_MUL % MIX_MOD) + MIX_ADD) % MIX_MOD


def _base_thr(
    batch: pa.Table,
    per_source: dict[str, tuple[int, int]],
    dflt: tuple[int, int],
) -> tuple[np.ndarray, np.ndarray]:
    """Per-row (base_copies, threshold) — the Python dict lookup runs once
    per DISTINCT source in the batch (source vocab is tiny), rows get
    their values by one vectorized gather."""
    src = np.asarray(batch["source"].to_pylist(), dtype=object)
    uniq, inv = np.unique(src, return_inverse=True)
    base_u = np.fromiter(
        (per_source.get(s, dflt)[0] for s in uniq), np.int64, len(uniq)
    )
    thr_u = np.fromiter(
        (per_source.get(s, dflt)[1] for s in uniq), np.int64, len(uniq)
    )
    return base_u[inv], thr_u[inv]


def mixture_plan(
    docs, *, weights: dict[str, float] | None = None, default: float = DEFAULT_WEIGHT
):
    """(doc_id, source, n_copies) for EVERY doc — the materialized sampling
    decision (0 = dropped, 2+ = upsampled epochs). Row-local, zero shuffles."""
    per_source, dflt = weight_thresholds(weights, default)

    def plan(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        r = _residue(ids)
        base, thr = _base_thr(batch, per_source, dflt)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "source": batch["source"],
                "n_copies": pa.array(base + (r < thr), pa.int64()),
            }
        )

    return docs.map_batches(plan, batch_format="pyarrow", zero_copy_batch=True)


def mixture_expand(
    docs, *, weights: dict[str, float] | None = None, default: float = DEFAULT_WEIGHT
):
    """Materialized mixture: one (doc_id, source, epoch) row per sampled
    copy (epoch = 0..n_copies-1, the repetition index a packer or shuffler
    keys on). Row-local ``np.repeat`` expansion — upsampling never shuffles;
    the downstream seeded shuffle (stages/pack.py) owns ordering."""
    per_source, dflt = weight_thresholds(weights, default)

    def expand(batch: pa.Table):
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        r = _residue(ids)
        base, thr = _base_thr(batch, per_source, dflt)
        copies = base + (r < thr)
        total = int(copies.sum())
        if total == 0:
            return
        row = np.repeat(np.arange(len(ids), dtype=np.int64), copies)
        # epoch = position within each doc's run
        starts = np.concatenate([[0], np.cumsum(copies)[:-1]])
        epoch = np.arange(total, dtype=np.int64) - np.repeat(starts, copies)
        take = pa.array(row, pa.int64())
        # all input columns pass through (text rides along for consumers
        # like mixture_chunks); epoch is appended
        yield batch.take(take).append_column("epoch", pa.array(epoch, pa.int64()))

    return docs.map_batches(expand, batch_format="pyarrow", zero_copy_batch=True)


def mixture_source_summary(
    docs, *, weights: dict[str, float] | None = None, default: float = DEFAULT_WEIGHT
):
    """Per-source mixture audit: docs in, copies out, realized rate — the
    sanity table checked against the target weights before a training run.
    One combinable aggregate over the row-local plan."""
    from ray.data.aggregate import Count, Sum

    agg = (
        mixture_plan(docs, weights=weights, default=default)
        .groupby("source")
        .aggregate(Count(alias_name="n_docs"), Sum("n_copies", alias_name="n_copies"))
    )

    def rate(b: pa.Table) -> pa.Table:
        nd = b["n_docs"].to_numpy(zero_copy_only=False).astype(np.float64)
        nc = b["n_copies"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "source": b["source"],
                "n_docs": b["n_docs"],
                "n_copies": b["n_copies"],
                "realized_rate": pa.array(nc / nd, pa.float64()),
            }
        )

    return agg.map_batches(rate, batch_format="pyarrow", zero_copy_batch=True)


MAX_COPIES = 8


def mixture_chunks(
    docs,
    *,
    weights: dict[str, float] | None = None,
    default: float = DEFAULT_WEIGHT,
    chunk_tokens: int = 512,
    max_copies: int = MAX_COPIES,
):
    """Composed mixture -> packing: expand docs by their mixture copy
    counts, then lay every copy out in the concatenated training stream
    with the engine's distributed prefix scan (``stages/pack.py``) — the
    "epoch multipliers then pack" step of a real training-data build.

    The packer's ordering key must be unique, so copies pack under
    ``packed_id = doc_id * max_copies + epoch`` (stream order =
    ``(doc_id, epoch)``); fails loudly if a weight rounds up to
    >= ``max_copies`` copies or a doc_id would overflow the composite.

    Output per copy: ``doc_id, epoch, n_tokens, start_offset,
    first_chunk, last_chunk``.
    """
    from .pack import token_chunk_stage

    per_source, dflt = weight_thresholds(weights, default)
    hi = max(b + (1 if t > 0 else 0) for b, t in [*per_source.values(), dflt])
    if hi > max_copies:
        raise ValueError(
            f"mixture weight needs up to {hi} copies; raise max_copies (={max_copies})"
        )
    M = int(max_copies)

    exp = mixture_expand(docs, weights=weights, default=default)

    def pack_id(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ids) and int(ids.max()) >= (1 << 62) // M:
            raise ValueError("doc_id too large for the packed composite id")
        packed = ids * M + b["epoch"].to_numpy(zero_copy_only=False)
        return pa.table(
            {"doc_id": pa.array(packed, pa.int64()), "text": b["text"]}
        )

    layout = token_chunk_stage(
        exp.map_batches(pack_id, batch_format="pyarrow", zero_copy_batch=True),
        chunk_tokens=chunk_tokens,
    )

    def unpack(b: pa.Table) -> pa.Table:
        p = b["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pa.array(p // M, pa.int64()),
                "epoch": pa.array(p % M, pa.int64()),
                "n_tokens": b["n_tokens"],
                "start_offset": b["start_offset"],
                "first_chunk": b["first_chunk"],
                "last_chunk": b["last_chunk"],
            }
        )

    return layout.map_batches(unpack, batch_format="pyarrow", zero_copy_batch=True)
