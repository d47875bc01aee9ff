"""CLI entry point (SURVEY.md §3.3): resumable runs + reference-style report.

``python -m deduplicatr_ray.cli run --input pages_dir_or_file --ckpt dir``
is the sandbox analog of ``ray job submit -- python -m deduplicatr_ray.cli
run ...`` on a real cluster (BASELINE.json:14). The CLI owns the Ray session
(guarded init, always shutdown); library code never does.

``report`` prints duplicate groups biggest-first — the analog of the
reference's stdout sink (``src/deduplicatr/core.clj:~20-40``, approximate
citation — mount empty at survey time).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _init_ray(num_cpus: int | None, address: str = "local") -> None:
    """``local`` starts a single-node session (the sandbox default);
    ``auto`` attaches to a running cluster — the mode ``ray job submit``
    uses (jobs/README.md). ``num_cpus`` only applies to local sessions."""
    import ray

    if not ray.is_initialized():
        kwargs = dict(
            address=address,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
        if address == "local":
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def cmd_run(args: argparse.Namespace) -> int:
    import os

    import ray

    from .pipelines.flagship import dedup_pipeline, dedup_pipeline_partitioned
    from .sources.pages import read_pages

    from .config import CANONICAL, DedupConfig

    cfg = (
        DedupConfig.tuned(args.threshold)
        if getattr(args, "threshold", None) is not None
        else CANONICAL
    )
    if getattr(args, "scheme", None):
        import dataclasses

        cfg = dataclasses.replace(cfg, minhash_scheme=args.scheme)
    _init_ray(args.num_cpus, args.address)
    try:
        t0 = time.monotonic()
        if args.partitions and args.ckpt:
            import glob
            import os

            inp = args.input
            if os.path.isdir(inp):
                files = sorted(
                    f
                    for pat in (
                        "*.parquet", "*.warc", "*.warc.gz", "*.wet",
                        "*.wet.gz",
                    )
                    for f in glob.glob(os.path.join(inp, pat))
                )
            else:
                files = [inp]
            res = dedup_pipeline_partitioned(
                files,
                cfg,
                checkpoint_dir=args.ckpt,
                run_id=args.run_id,
                num_partitions=args.partitions,
            )
        elif args.input.endswith((".warc", ".warc.gz", ".wet", ".wet.gz")) or (
            os.path.isdir(args.input)
            and any(
                f.endswith((".warc", ".warc.gz", ".wet", ".wet.gz"))
                for f in os.listdir(args.input)
            )
        ):
            # Common Crawl-native ingest: WARC file(s) straight into the
            # flagship (lang filter is a post-extract concern — WARC
            # carries no language metadata)
            from .sources.warc import read_warc

            res = dedup_pipeline(
                read_warc(args.input, on_error=args.warc_errors),
                cfg,
                checkpoint_dir=args.ckpt,
                run_id=args.run_id,
                components=args.components,
            )
        else:
            pages = read_pages(args.input, lang=args.lang)
            res = dedup_pipeline(
                pages,
                cfg,
                checkpoint_dir=args.ckpt,
                run_id=args.run_id,
                components=args.components,
            )
        n_docs = res.clusters.count()
        if args.output:
            res.clusters.write_parquet(args.output)
        wall = time.monotonic() - t0
        dup_docs = res.stats["docs_in_clusters"]
        print(
            json.dumps(
                {
                    "docs": n_docs,
                    "docs_per_sec": round(n_docs / wall, 1),
                    "wall_sec": round(wall, 2),
                    "dup_docs": dup_docs,
                    "dup_rate": round(dup_docs / max(1, n_docs), 4),
                    "n_clusters": res.stats["n_clusters"],
                    "config_hash": res.stats["config_hash"],
                }
            )
        )
        return 0
    finally:
        ray.shutdown()


def cmd_report(args: argparse.Namespace) -> int:
    """Top duplicate clusters, biggest first (reference report analog)."""
    import ray
    import ray.data as rd

    _init_ray(args.num_cpus, args.address)
    try:
        clusters = rd.read_parquet(args.clusters)
        from .pipelines.flagship import cluster_summary

        top = cluster_summary(clusters).limit(args.top).take_all()
        for row in top:
            if row["members"] < 2:
                continue
            print(f"{row['members']:6d} members  cluster {row['canonical_url']}")
        return 0
    finally:
        ray.shutdown()


def cmd_dirs(args: argparse.Namespace) -> int:
    """Duplicate directories/files, biggest first — the reference CLI's
    headline output (``duplicates.clj:~10-60`` analog): commutative-sum
    rollup over a path hierarchy, dup grouping, nested pruning."""
    import ray

    from .sources.pages import read_parquet_auto
    from .stages.dirtree import dir_dup_groups, dir_rollup

    _init_ray(args.num_cpus, args.address)
    try:
        levels = args.levels.split(",")
        ds = read_parquet_auto(args.input)
        names = ds.schema().names
        hash_col, bytes_col = args.hash_col, args.bytes_col
        missing = [c for c in levels + [hash_col, bytes_col] if c not in names]
        if missing:
            # documents-shaped convenience mapping: source/lang/bucket/name.
            # The mapping OWNS the output schema, so any user-supplied
            # --levels/--hash-col/--bytes-col are overridden (say so).
            if {"doc_id", "text"} <= set(names):
                from .stages.dirtree import DOC_LEVELS, documents_to_file_table

                ds = documents_to_file_table(ds)
                if (levels, hash_col, bytes_col) != (
                    DOC_LEVELS,
                    "hash64",
                    "n_bytes",
                ):
                    print(
                        "documents-shaped input: using levels "
                        f"{','.join(DOC_LEVELS)} with hash64/n_bytes "
                        "(supplied column flags ignored)",
                        file=sys.stderr,
                    )
                levels = list(DOC_LEVELS)
                hash_col, bytes_col = "hash64", "n_bytes"
            else:
                print(f"missing columns: {missing}", file=sys.stderr)
                return 2
        s = dir_rollup(ds, levels, hash_col=hash_col, bytes_col=bytes_col)
        dups = dir_dup_groups(s, leaf_depth=len(levels))
        top = (
            dups.sort("n_bytes", descending=True).limit(args.top).take_all()
        )
        for row in top:
            kind = "dir " if row["depth"] < len(levels) else "file"
            print(
                f"{row['n_bytes']:10d} bytes  {row['filecount']:5d} files  "
                f"x{row['n_dups']}  {kind} {row['path']}"
            )
        return 0
    finally:
        ray.shutdown()


def cmd_export(args: argparse.Namespace) -> int:
    """End-to-end training export (pipelines/training.py): quality filter
    -> dedup canonical -> 13-gram decontamination -> sequence packing,
    written as chunk_shard-partitioned Parquet (per-shard resumable)."""
    import ray

    from .pipelines.training import training_export

    tokenizer = None
    vocab_id = None
    if args.merges is not None:
        import hashlib

        from .functions.tokenizers import bpe_factory, load_merges

        try:
            load_merges(args.merges)  # validate BEFORE ray.init
        except (OSError, ValueError) as e:
            raise SystemExit(f"--merges: {e}")
        tokenizer = bpe_factory(args.merges)
        # content digest identifies the vocab for the out_dir marker:
        # re-exporting into the same dir under a different merges file is
        # a hard error (mixed chunk boundaries), same file is a no-op
        vocab_id = hashlib.sha1(
            open(args.merges, "rb").read()
        ).hexdigest()[:16]

    _init_ray(args.num_cpus, args.address)
    try:
        t0 = time.monotonic()
        layout = training_export(
            args.input,
            chunk_tokens=args.chunk_tokens,
            shard_chunks=args.shard_chunks,
            out_dir=args.output,
            tokenizer=tokenizer,
            vocab_id=vocab_id,
        )
        from ray.data.aggregate import Count, Max, Sum

        agg = layout.aggregate(
            Count(alias_name="docs_kept"),
            Sum("n_tokens", alias_name="total_tokens"),
            Max("last_chunk", alias_name="max_chunk"),
        )
        # an all-filtered export aggregates an empty layout -> None
        agg = agg or {"docs_kept": 0, "total_tokens": 0, "max_chunk": None}
        agg["wall_sec"] = round(time.monotonic() - t0, 3)
        agg["out_dir"] = args.output
        print(json.dumps(agg, default=int))
        return 0
    finally:
        ray.shutdown()


def cmd_scrub(args: argparse.Namespace) -> int:
    """Span-level duplicate-text removal to Parquet: ExactSubstr byte spans
    (``scrub_spans``) or C4-style fixed-token windows (``window_scrub``)."""
    import ray

    from .sources.pages import read_parquet_auto

    _init_ray(args.num_cpus, args.address)
    try:
        t0 = time.monotonic()
        docs = read_parquet_auto(args.input, columns=["doc_id", "text"])
        if args.mode == "exact-substring":
            from .stages.scrub import scrub_spans

            # scrub_spans consumes its input three times (survivor routes,
            # span mark, cut co-partition); pin the blocks so the parquet
            # scan runs once — Ray spills past object-store capacity, which
            # beats 3x input I/O at the CLI's single-corpus scale
            out = scrub_spans(docs.materialize(), min_len=args.min_len)
            removed_col = "n_bytes_removed"
        else:
            from .stages.textstats import window_scrub_stage

            out = window_scrub_stage(docs, window=args.window)
            removed_col = "dup_windows"
        out = out.materialize()
        out.write_parquet(args.output)
        from ray.data.aggregate import Count, Sum

        agg = out.aggregate(
            Count(alias_name="docs"), Sum(removed_col, alias_name="removed")
        ) or {"docs": 0, "removed": 0}
        agg["mode"] = args.mode
        agg["wall_sec"] = round(time.monotonic() - t0, 3)
        agg["out_dir"] = args.output
        print(json.dumps(agg, default=int))
        return 0
    finally:
        ray.shutdown()


def cmd_mix(args: argparse.Namespace) -> int:
    """Data-mixture resampling to Parquet: expand docs by per-source
    weights ("src=2.5" upsamples, "src=0.25" downsamples; unlisted sources
    use --default) and write one row per sampled copy."""
    import ray

    from .sources.pages import read_parquet_auto
    from .stages.mix import mixture_expand, mixture_source_summary

    weights = {}
    for spec in args.weight or []:
        s, sep, w = spec.partition("=")
        try:
            if not sep or not s:
                raise ValueError
            weights[s] = float(w)
            if weights[s] < 0:  # fail clean pre-Ray, not a deep traceback
                raise ValueError
        except ValueError:
            raise SystemExit(
                f"--weight expects SOURCE=FLOAT with FLOAT >= 0, got {spec!r}"
            )
    if args.default is not None and args.default < 0:
        raise SystemExit(f"--default must be >= 0, got {args.default!r}")

    _init_ray(args.num_cpus, args.address)
    try:
        t0 = time.monotonic()
        docs = read_parquet_auto(
            args.input, columns=["doc_id", "source", "text"]
        )
        mixture_expand(docs, weights=weights, default=args.default).write_parquet(
            args.output
        )
        summary = mixture_source_summary(
            read_parquet_auto(args.input, columns=["doc_id", "source"]),
            weights=weights,
            default=args.default,
        ).to_pandas()
        print(
            json.dumps(
                {
                    "sources": summary.to_dict(orient="records"),
                    "wall_sec": round(time.monotonic() - t0, 3),
                    "out_dir": args.output,
                },
                default=str,
            )
        )
        return 0
    finally:
        ray.shutdown()


def cmd_tiers(args: argparse.Namespace) -> int:
    """Tiered dedup cascade report (exact -> near -> window) to stdout:
    per-tier docs_in / docs_removed / docs_out over successive survivors."""
    import ray

    from .pipelines.tiers import dedup_tiers
    from .sources.pages import read_parquet_auto

    _init_ray(args.num_cpus, args.address)
    try:
        t0 = time.monotonic()
        docs = read_parquet_auto(args.input, columns=["doc_id", "text", "lang"])
        tbl = dedup_tiers(
            docs, window=args.window, window_dup_frac=args.window_dup_frac
        )
        out = {
            "tiers": tbl.to_pylist(),
            "wall_sec": round(time.monotonic() - t0, 3),
        }
        print(json.dumps(out, default=int))
        return 0
    finally:
        ray.shutdown()


def cmd_against(args: argparse.Namespace) -> int:
    """Cross-corpus dedup: flag new-corpus docs duplicating the existing
    corpus (exact or near, one union flagship run); write per-doc verdicts
    (``doc_id, dup_against``) to Parquet and print summary counts."""
    import ray

    from .pipelines.against import dedup_against
    from .sources.pages import read_parquet_auto

    _init_ray(args.num_cpus, args.address)
    try:
        t0 = time.monotonic()
        new = read_parquet_auto(args.new, columns=["doc_id", "text", "lang"])
        existing = read_parquet_auto(
            args.existing, columns=["doc_id", "text", "lang"]
        )
        out = dedup_against(new, existing).materialize()
        out.write_parquet(args.output)
        from ray.data.aggregate import Count, Sum

        agg = out.aggregate(
            Count(alias_name="new_docs"),
            Sum("dup_against", alias_name="dups_of_existing"),
        ) or {"new_docs": 0, "dups_of_existing": 0}
        agg["wall_sec"] = round(time.monotonic() - t0, 3)
        agg["out_dir"] = args.output
        print(json.dumps(agg, default=int))
        return 0
    finally:
        ray.shutdown()


def cmd_compact(args: argparse.Namespace) -> int:
    """Storage-level crawl dedup: rewrite --input WARC files under
    --output, replacing responses whose content --against already
    stores with WARC 1.1 revisit stubs (CDX over the output keeps every
    capture's true digest). Prints the per-file manifest totals."""
    import ray

    from .sources.warc import compact_warc, warc_cdx_index

    _init_ray(args.num_cpus, args.address)
    try:
        t0 = time.monotonic()
        old_idx = warc_cdx_index(args.against, on_error=args.warc_errors)
        man = compact_warc(
            args.input,
            old_idx,
            args.output,
            bad_records="skip" if args.warc_errors == "salvage" else "raise",
        ).to_pandas()
        out = {
            c: int(man[c].sum())
            for c in ["n_records", "n_stored", "n_revisit", "bytes_in", "bytes_out"]
        }
        out["files"] = len(man)
        out["saved_pct"] = round(
            100.0 * (1 - out["bytes_out"] / max(1, out["bytes_in"])), 2
        )
        out["wall_sec"] = round(time.monotonic() - t0, 3)
        out["out_dir"] = args.output
        print(json.dumps(out))
        return 0
    finally:
        ray.shutdown()


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="deduplicatr_ray")
    p.add_argument("--num-cpus", type=int, default=None)
    p.add_argument(
        "--address",
        default="local",
        help="'local' starts a single-node session; 'auto' attaches to a "
        "running cluster (what `ray job submit` entrypoints use)",
    )
    sub = p.add_subparsers(dest="cmd", required=True)

    pr = sub.add_parser("run", help="run the flagship dedup pipeline")
    pr.add_argument("--input", required=True, help="pages parquet file/dir")
    pr.add_argument("--ckpt", default=None, help="checkpoint root dir")
    pr.add_argument("--run-id", default="run0")
    pr.add_argument("--output", default=None, help="clusters parquet out dir")
    pr.add_argument("--lang", default=None, help="optional lang filter pushdown")
    pr.add_argument(
        "--threshold",
        type=float,
        default=None,
        help="target Jaccard threshold: banding (bands x rows) is "
        "auto-tuned to catch threshold-pairs with p >= 0.99 while "
        "minimizing sub-threshold collisions (config.optimal_bands); "
        "default keeps the frozen canonical config (tau=0.7, 32x4)",
    )
    pr.add_argument(
        "--scheme",
        default=None,
        choices=["kperm", "oph"],
        help="MinHash scheme: kperm = frozen canonical (num_perm "
        "independent hashes); oph = one-permutation hashing with "
        "rotation densification — one hash pass per shingle, ~8x faster "
        "signature kernel at equal estimator variance (the scale path)",
    )
    pr.add_argument(
        "--components",
        default="auto",
        choices=["auto", "driver", "hashes", "distributed"],
        help="A6 connected-components implementation (see "
        "pipelines/flagship.py:cluster_from_signatures); 'distributed' "
        "keeps everything off the driver for 10^9+ forest edges",
    )
    pr.add_argument(
        "--partitions",
        type=int,
        default=0,
        help="with --ckpt: run the signature prefix as N partition-level "
        "checkpoints (per-partition throughput + dup-rate metrics, "
        "partition-granular resume)",
    )
    pr.add_argument(
        "--warc-errors",
        default="raise",
        choices=["raise", "skip", "salvage"],
        help="WARC-input corruption posture: raise = fail the task "
        "(checkpointed runs); skip = drop unparseable FILES; salvage = "
        "keep good RECORDS inside damaged files (gzip-member + WARC/ "
        "boundary resync — one flipped byte costs one record)",
    )
    pr.set_defaults(fn=cmd_run)

    pp = sub.add_parser("report", help="print top duplicate clusters")
    pp.add_argument("--clusters", required=True, help="clusters parquet dir")
    pp.add_argument("--top", type=int, default=20)
    pp.set_defaults(fn=cmd_report)

    pd = sub.add_parser(
        "dirs", help="print duplicate directories/files, biggest first"
    )
    pd.add_argument("--input", required=True, help="file-table parquet")
    pd.add_argument(
        "--levels",
        default="source,lang,bucket,name",
        help="comma-separated hierarchy columns, outermost first; the last "
        "is the file name (documents-shaped inputs are auto-mapped)",
    )
    pd.add_argument("--hash-col", default="hash64")
    pd.add_argument("--bytes-col", default="n_bytes")
    pd.add_argument("--top", type=int, default=20)
    pd.set_defaults(fn=cmd_dirs)

    pe = sub.add_parser(
        "export",
        help="end-to-end training export: filter -> dedup -> decontaminate "
        "-> pack -> sharded parquet",
    )
    pe.add_argument(
        "--input", required=True, help="sf dir containing documents.parquet"
    )
    pe.add_argument("--output", required=True, help="export parquet out dir")
    pe.add_argument("--chunk-tokens", type=int, default=512)
    pe.add_argument("--shard-chunks", type=int, default=64)
    pe.add_argument(
        "--merges",
        default=None,
        help="BPE merges.txt (GPT-2/HF layout) to count tokens under; "
        "default: the [a-z0-9]+ regex lexer",
    )
    pe.set_defaults(fn=cmd_export)

    ps = sub.add_parser(
        "scrub",
        help="span-level duplicate removal: ExactSubstr byte spans or "
        "C4-style fixed-token windows",
    )
    ps.add_argument("--input", required=True, help="documents parquet file/dir")
    ps.add_argument("--output", required=True, help="scrubbed parquet out dir")
    ps.add_argument(
        "--mode",
        default="exact-substring",
        choices=["exact-substring", "window"],
        help="exact-substring keeps original bytes in a 'text' column (one "
        "row per input doc); window emits the token-normalized rebuild as "
        "'clean_text' and omits token-less docs — the two outputs are NOT "
        "drop-in interchangeable",
    )
    ps.add_argument("--min-len", type=int, default=50, help="exact-substring span floor")
    ps.add_argument("--window", type=int, default=25, help="window mode token width")
    ps.set_defaults(fn=cmd_scrub)

    pm = sub.add_parser(
        "mix",
        help="data-mixture resampling: expand docs by per-source weights",
    )
    pm.add_argument("--input", required=True, help="documents parquet file/dir")
    pm.add_argument("--output", required=True, help="expanded parquet out dir")
    pm.add_argument(
        "--weight",
        action="append",
        metavar="SOURCE=FLOAT",
        help="per-source weight (repeatable)",
    )
    pm.add_argument("--default", type=float, default=1.0)
    pm.set_defaults(fn=cmd_mix)

    pt = sub.add_parser(
        "tiers",
        help="tiered dedup cascade report: exact -> near -> window removal "
        "counts over successive survivor sets",
    )
    pt.add_argument("--input", required=True, help="documents parquet file/dir")
    pt.add_argument("--window", type=int, default=25)
    pt.add_argument(
        "--window-dup-frac",
        type=float,
        default=0.5,
        help="tier-3 removal bar: dup_windows > frac * n_windows",
    )
    pt.set_defaults(fn=cmd_tiers)

    pa_ = sub.add_parser(
        "against",
        help="cross-corpus dedup: flag --new docs that exactly/nearly "
        "duplicate --existing docs (one union flagship run)",
    )
    pa_.add_argument("--new", required=True, help="new-corpus parquet file/dir")
    pa_.add_argument(
        "--existing", required=True, help="existing-corpus parquet file/dir"
    )
    pa_.add_argument("--output", required=True, help="verdicts parquet out dir")
    pa_.set_defaults(fn=cmd_against)

    pc = sub.add_parser(
        "compact",
        help="storage-level crawl dedup: rewrite --input WARCs with "
        "revisit stubs for content --against already stores",
    )
    pc.add_argument("--input", required=True, help="new-crawl WARC file/dir")
    pc.add_argument(
        "--against", required=True, help="prior-crawl WARC file/dir (indexed)"
    )
    pc.add_argument("--output", required=True, help="compacted WARC out dir")
    pc.add_argument(
        "--warc-errors",
        default="raise",
        choices=["raise", "skip", "salvage"],
        help="corruption posture for BOTH the index pass and the rewrite",
    )
    pc.set_defaults(fn=cmd_compact)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
