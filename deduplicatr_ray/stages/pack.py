"""Sequence packing for training export: concat-and-chunk token layout.

LLM training consumes documents as one concatenated token stream cut into
fixed-size chunks (e.g. 512/2048/8192 tokens); the pipeline must tell every
doc WHERE it lands — its global token ``start_offset`` and the chunk range
it spans — so shard writers and attention-mask builders can work
independently. Computing that is a global ORDERED PREFIX SUM over the
corpus, which Ray Data has no primitive for; this stage implements the
classic two-level scan:

1. **count** — one vectorized pass computes per-doc token counts, tagged
   with a coarse ``bucket = doc_id // id_bucket``;
2. **bucket totals** — a tiny shuffle sums tokens per bucket
   (``n_buckets = max_doc_id / id_bucket`` rows reach the driver, ~16 B
   each — at 10^12 docs and the default bucket width that is ~2 GB spread
   over a groupby, and the driver pull can be raised to a second scan
   level long before it matters);
3. **driver prefix** — an exclusive cumsum over the sorted bucket totals
   (numpy, O(n_buckets)) is broadcast once via ``ray.put``;
4. **in-bucket scan** — ``groupby(bucket).map_groups`` sorts each bucket
   by doc_id and adds its local exclusive cumsum to the broadcast bucket
   base. One Python call per bucket, vectorized inside.

Offsets are invariant to partitioning/parallelism: the order is defined by
``doc_id``, not by block placement.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


# Knuth multiplicative constant for the deterministic pseudo-shuffle key:
# skey = (doc_id * KNUTH + seed) mod 2^32. Products stay < 2^62 for
# doc_id < 2^30, so BIGINT arithmetic is exact on BOTH sides (numpy int64
# here, DuckDB BIGINT in the oracle) — no hash function to mirror. Not
# crypto-quality randomness: a fixed seedable scramble that breaks the
# doc_id ordering correlation in training order, which is what shuffled
# packing needs.
SHUFFLE_KNUTH = 2654435761
_SHUFFLE_MOD = 1 << 32


def token_chunk_stage(
    docs,
    *,
    chunk_tokens: int = 512,
    id_bucket: int = 1 << 12,
    shuffle_seed: int | None = None,
    tokenizer=None,
):
    """docs (doc_id, text) -> one row per doc:

    ``doc_id, n_tokens, start_offset, first_chunk, last_chunk`` where
    ``start_offset`` is the doc's position in the concatenated token
    stream and ``first_chunk``/``last_chunk`` are the ``chunk_tokens``-
    sized training chunks the doc touches (empty docs occupy zero tokens:
    ``last_chunk == first_chunk``).

    Stream order is ``doc_id`` ascending by default; with
    ``shuffle_seed`` set, order is the deterministic pseudo-shuffle key
    ``(doc_id * SHUFFLE_KNUTH + seed) mod 2^32`` (ties broken by doc_id)
    — training-order randomization without a ``random_shuffle``
    materialization, seedable and exactly reproducible in SQL
    (``oracle_sql()['token_chunks_shuffled']``).

    Tokenizer defaults to the corpus-standard ``[a-z0-9]+`` lexer (Arrow
    regex kernel), matching ``oracle_sql()['token_chunks']``. Pass
    ``tokenizer`` — a zero-arg FACTORY returning a ``list[str] ->
    np.ndarray[int64]`` counter (see ``functions/tokenizers.py``) — to
    count with the training run's real vocab instead: the factory runs
    once per map ACTOR (vocab load in ``__init__``, counting per batch),
    so a multi-MB merge table is never re-built per batch.
    """
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Sum

    def counts_table(batch: pa.Table, n_tokens: np.ndarray) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        if shuffle_seed is None:
            skey = ids
            bucket = ids // id_bucket
        else:
            # the exactness contract above requires doc_id < 2^30 (products
            # stay < 2^62 in int64); fail loudly instead of silently
            # overflowing to negative skey/bucket values
            if len(ids) and int(ids.max()) >= 1 << 30:
                raise ValueError(
                    "shuffled packing requires doc_id < 2^30 for exact "
                    f"int64 skey arithmetic (got max doc_id {int(ids.max())})"
                )
            skey = (ids * SHUFFLE_KNUTH + shuffle_seed) % _SHUFFLE_MOD
            # equal-width key ranges give ~uniform buckets (skey is
            # near-uniform on [0, 2^32)); bucket count honors id_bucket
            # so the caller's per-bucket-size knob works in BOTH orders
            # (the old hard-coded 1<<12 buckets silently ignored it and
            # left per-bucket group size unbounded at corpus scale).
            # Bucket granularity does not change output: global order is
            # (bucket asc, skey asc) == skey asc at any width.
            n_buckets = max(1, _SHUFFLE_MOD // max(1, id_bucket))
            bucket = skey // (_SHUFFLE_MOD // n_buckets)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": pa.array(n_tokens, pa.int64()),
                "skey": pa.array(skey, pa.int64()),
                "bucket": pa.array(bucket, pa.int64()),
            }
        )

    if tokenizer is None:

        def count_fn(batch: pa.Table) -> pa.Table:
            from .textstats import _flat_tokens

            doc_idx, _flat = _flat_tokens(batch)
            n_tokens = np.bincount(doc_idx, minlength=len(batch)).astype(
                np.int64
            )
            return counts_table(batch, n_tokens)

        counts = docs.map_batches(
            count_fn, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()  # consumed twice: bucket totals + in-bucket scan
    else:

        class TokenCounter:
            def __init__(self) -> None:
                self.tok = tokenizer()  # once per actor

            def __call__(self, batch: pa.Table) -> pa.Table:
                texts = [t or "" for t in batch["text"].to_pylist()]
                return counts_table(batch, np.asarray(self.tok(texts), np.int64))

        counts = docs.map_batches(
            TokenCounter,
            batch_format="pyarrow",
            zero_copy_batch=True,
            concurrency=(1, 8),
        ).materialize()

    # bucket totals -> exclusive prefix on the driver (tiny: one row per
    # id_bucket-wide doc_id range)
    bt = (
        counts.groupby("bucket")
        .aggregate(Sum("n_tokens", alias_name="tot"))
        .to_pandas()
        .sort_values("bucket")
    )
    buckets = bt["bucket"].to_numpy(np.int64)
    base = np.concatenate([[0], np.cumsum(bt["tot"].to_numpy(np.int64))[:-1]])
    base_ref = ray.put((buckets, base))

    def scan_bucket(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        bks, bas = ray.get(base_ref)
        order = pc.sort_indices(
            g, sort_keys=[("skey", "ascending"), ("doc_id", "ascending")]
        )
        g = g.take(order)
        nt = g["n_tokens"].to_numpy(zero_copy_only=False)
        b = int(g["bucket"][0].as_py())
        start = bas[np.searchsorted(bks, b)] + np.concatenate(
            [[0], np.cumsum(nt)[:-1]]
        )
        first = start // chunk_tokens
        last = np.where(
            nt > 0, (start + nt - 1) // chunk_tokens, first
        )
        return pa.table(
            {
                "doc_id": g["doc_id"],
                "n_tokens": g["n_tokens"],
                "start_offset": pa.array(start, pa.int64()),
                "first_chunk": pa.array(first, pa.int64()),
                "last_chunk": pa.array(last, pa.int64()),
            }
        )

    # deliberately unsorted: offsets are doc_id-defined regardless of row
    # order, and consumers that need display order sort at the query layer
    # (engine convention — an embedded global sort would charge every
    # pipeline composition an extra all-to-all)
    return counts.groupby("bucket").map_groups(
        scan_bucket, batch_format="pyarrow"
    )
