"""End-to-end training-data export: the pipeline a user actually runs
before LLM training, composed from the engine's own stages —

    quality filter  ->  dedup (canonical per cluster)  ->
    benchmark decontamination  ->  [optional ExactSubstr span scrub]  ->
    sequence packing  ->  sharded Parquet

Every step is the corresponding production operator (not a re-derivation):
``quality_filter_stage`` (row-local C4/Gopher chain), the flagship
``dedup_pipeline`` (one all-to-all carrying near+exact evidence),
``decontaminate`` / ``decontaminate_bloom`` (13-gram eval-overlap probe;
string broadcast for toy eval slices, fixed-size bloom bitmap + exact
confirm join once the eval slice is real — selected by the ``bloom=``
knob, default by eval doc count), ``semi_join_auto`` (keep-id broadcast
below the key budget so the corpus text skips the join all-to-all;
streaming hash join past it — nothing corpus-sized is ever broadcast or
pulled to the driver), and ``token_chunk_stage`` (distributed prefix
scan).

Scale shape: two row-local passes, the flagship's single all-to-all, two
``semi_join_auto`` survivor filters on ``doc_id`` (row-local broadcast
probes below the key budget — no exchange at all; past it, a hash join
whose exchange carries 8 B keys + the text column of surviving rows
only), the packer's tiny bucket shuffle. Output is written partitioned
by ``chunk_shard`` so a failed export resumes per-shard.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _canonical_doc_ids(clusters):
    """CLUSTERS Dataset (url doc://{id}, is_canonical) -> (doc_id) Dataset
    of canonical rows, vectorized url parse."""
    import pyarrow.compute as pc

    def fn(batch: pa.Table) -> pa.Table:
        keep = batch.filter(pc.equal(batch["is_canonical"], True))
        ids = pc.cast(
            pc.utf8_slice_codeunits(keep["url"], 6, 1 << 30), pa.int64()
        )
        # named canon_id: Ray's hash join requires differently-named
        # key columns on the two sides
        return pa.table({"canon_id": ids})

    return clusters.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def training_export(
    sf_dir: str,
    *,
    chunk_tokens: int = 512,
    shard_chunks: int = 64,
    out_dir: str | None = None,
    clusters=None,
    bloom: bool | None = None,
    bloom_eval_docs: int = 10_000,
    scrub: bool = False,
    tokenizer=None,
    vocab_id: str | None = None,
):
    """-> Dataset of kept docs with their training-chunk layout:

    ``doc_id, n_tokens, start_offset, first_chunk, last_chunk,
    chunk_shard`` — only docs that (a) pass the quality chain, (b) are
    their dedup cluster's canonical representative, and (c) share no
    13-gram with the held-out eval slice (which is itself excluded as
    non-training data). Offsets are doc_id-ordered over exactly the kept
    set, so the stream is densely packed after filtering.

    With ``out_dir`` set the layout is also written as Parquet partitioned
    by ``chunk_shard`` (= first_chunk // ``shard_chunks``): one directory
    per contiguous chunk range, the resumable-output unit.

    ``tokenizer``: zero-arg counting factory for the packing stage (see
    ``functions/tokenizers.py``); e.g. ``bpe_factory(path)`` to count
    under a user-supplied merges.txt vocab, or
    ``cfg.tokenizer_factory()``. None = the regex lexer.
    """
    import pyarrow.compute as pc

    from ..sources.pages import docs_as_pages, read_parquet_auto
    from ..stages.pack import token_chunk_stage
    from ..stages.relational import semi_join_auto
    from ..stages.textstats import (
        decontaminate,
        decontaminate_bloom,
        default_eval_source,
        quality_filter_stage,
    )
    from .flagship import dedup_pipeline

    docs = read_parquet_auto(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "text"]
    )

    # (a) quality chain -> surviving doc_ids (row-local pass).
    # id-only intermediates are materialized (8 B/doc, spill-safe at any
    # scale) so each phase's actor pool — the flagship's signature pool,
    # the join's shuffle aggregators — executes alone; fusing them into one
    # plan can deadlock a small session on actor-minimum CPU reservations.
    qf_ids = quality_filter_stage(docs).map_batches(
        lambda b: b.filter(b["keep"]).select(["doc_id"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()

    # (b) dedup canonicals (flagship pipeline over the pages adapter, or a
    # caller-provided CLUSTERS dataset to reuse an already-built one)
    if clusters is None:
        clusters = dedup_pipeline(docs_as_pages(sf_dir)).clusters
    canon_ids = _canonical_doc_ids(clusters).materialize()

    # (c) contaminated + eval doc_ids, excluded. decontaminate() flags
    # training docs overlapping the eval slice; the eval slice itself is
    # held out by definition (its rows are not training data).
    eval_source = default_eval_source(docs)
    # which decontamination variant: the plain op broadcasts the eval
    # slice's distinct gram STRINGS (fast when the eval slice is toy-sized;
    # no shuffle, no actor spawn); at a real eval-suite size that broadcast
    # grows with the suite, so switch to decontaminate_bloom — fixed-size
    # bitmap broadcast + exact confirm join, results-invariant (same SQL
    # oracle). Default: decide by eval-slice doc count (cheap source-column
    # scan; gram volume is ~rows x avg tokens).
    if bloom is None:
        def _eval_rows(b: pa.Table) -> pa.Table:
            n = pc.sum(pc.equal(b["source"], eval_source)).as_py() or 0
            return pa.table({"n": pa.array([int(n)], pa.int64())})

        n_eval = (
            docs.select_columns(["source"])
            .map_batches(_eval_rows, batch_format="pyarrow", zero_copy_batch=True)
            .sum("n")
        )
        bloom = bool(n_eval and n_eval > bloom_eval_docs)
    decont = decontaminate_bloom if bloom else decontaminate
    # the contaminated set is small by construction (benchmark-overlap
    # docs), so the anti-filter is a broadcast probe, not a shuffle join
    from ..stages.relational import pull_columns

    (cont_raw,) = pull_columns(
        decont(docs, eval_source=eval_source), ["doc_id"]
    )
    cont_ids = np.sort(cont_raw)
    import ray

    cont_ref = ray.put(cont_ids)

    # join partition count scales with the id-set size: Ray's hash join
    # spawns one shuffle aggregator ACTOR per partition (seconds of fixed
    # spawn cost), so small corpora get few partitions and the fixed cost
    # amortizes only where the data justifies it (~1M keys/partition)
    from ..stages.lsh import default_num_partitions

    n_keys = qf_ids.count()
    P_join = int(
        np.clip(n_keys // 1_000_000 + 8, 8, default_num_partitions())
    )

    kept_ids = semi_join_auto(
        qf_ids,
        canon_ids,
        on="doc_id",
        right_on="canon_id",
        num_partitions=P_join,
    )

    def drop_contaminated(b: pa.Table) -> pa.Table:
        cids = ray.get(cont_ref)
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        if len(cids) == 0:
            return b
        pos = np.searchsorted(cids, ids)
        pos = np.minimum(pos, len(cids) - 1)
        return b.filter(pa.array(cids[pos] != ids))

    kept_ids = kept_ids.map_batches(
        drop_contaminated, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    kept_docs = semi_join_auto(
        docs.map_batches(
            lambda b: b.filter(pc.not_equal(b["source"], eval_source)).select(
                ["doc_id", "text"]
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        kept_ids.map_batches(
            lambda b: pa.table({"keep_id": b["doc_id"]}),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        on="doc_id",
        right_on="keep_id",
        num_partitions=P_join,
    )

    if scrub:
        # span-level cleanup of the SURVIVORS (Lee et al. ExactSubstr):
        # doc-level dedup keeps one doc per near-dup cluster, the scrub
        # then cuts residual duplicated spans ACROSS kept docs before the
        # stream is packed. Doc-id set is unchanged (every kept doc stays,
        # possibly shorter), so only token counts/offsets move.
        from ..stages.scrub import scrub_spans

        kept_docs = scrub_spans(kept_docs.materialize()).select_columns(
            ["doc_id", "text"]
        )

    layout = token_chunk_stage(
        kept_docs, chunk_tokens=chunk_tokens, tokenizer=tokenizer
    )

    def with_shard(b: pa.Table) -> pa.Table:
        shard = b["first_chunk"].to_numpy(zero_copy_only=False) // shard_chunks
        return b.append_column("chunk_shard", pa.array(shard, pa.int64()))

    layout = layout.map_batches(
        with_shard, batch_format="pyarrow", zero_copy_batch=True
    )
    if out_dir is not None:
        # vocab marker: chunk boundaries depend on the tokenizer, so
        # shards written under two different vocabs in one out_dir are
        # silent corruption. Refuse to mix (the marker is the actual
        # mismatch protection — see functions/tokenizers.py seam docs).
        import json
        import os

        vid = vocab_id or ("regex-lexer" if tokenizer is None else "custom")
        marker = os.path.join(out_dir, "_vocab.json")
        if os.path.exists(marker):
            prev = json.load(open(marker)).get("vocab_id")
            if prev != vid:
                raise ValueError(
                    f"{out_dir} was written under vocab_id={prev!r}; this "
                    f"run uses {vid!r} — chunk boundaries would mix two "
                    f"tokenizations. Use a fresh out_dir (or the same "
                    f"--merges file)."
                )
        # materialize so the write and any caller-side consumption (e.g.
        # the CLI's summary aggregate) execute the plan tail ONCE
        layout = layout.materialize()
        layout.write_parquet(out_dir, partition_cols=["chunk_shard"])
        os.makedirs(out_dir, exist_ok=True)
        with open(marker, "w") as f:
            json.dump({"vocab_id": vid, "chunk_tokens": chunk_tokens}, f)
    return layout
