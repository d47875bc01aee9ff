#!/usr/bin/env python
"""Benchmark harness (driver contract + BASELINE.md scaling evidence).

Default mode: runs the headline pipelines over ``$GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) under ``ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS)`` (default 32) and prints ONE JSON line::

    {"metric": ..., "value": <flagship wall sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": 0.1, "num_cpus": 32,
     "docs_per_sec": ..., "rows": {...}}

``--scaling`` mode: runs the identical flagship job twice in FRESH
processes — ``ray.init(num_cpus=8)`` then ``ray.init(num_cpus=32)`` — on the
same deterministic input (sf documents replicated ``--replicas`` times as
pages), and reports throughput at both plus scaling efficiency
``eff = (thru_4N / thru_N) / 4`` (BASELINE.json:14 N-vs-4N proxy per
SURVEY.md §4.4). All Ray/log noise goes to stderr; stdout carries exactly
one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

DEFAULT_SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
DEFAULT_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

# headline pipelines benched in default mode (subset of __ray_entry__.queries())
BENCH_QUERIES = [
    "dedup_clusters",        # flagship: extract -> signatures -> LSH -> clusters
    "dedup_clusters_distributed",  # A6 scale tail: never-on-driver components
    "exact_dup_assign",      # A2/D1 exact dedup groupby
    "minhash_near_dups",     # D3 MinHash+LSH verified pairs
    "simhash_near_dups",     # D4
    "suffix_dups",           # D5 winnowed fingerprint substring candidates
    "doc_stats_by_lang",     # A5 grouped aggregate
    "top_docs_by_chars",     # O1/O3 sort+limit
    "token_counts",          # text analysis
    "window_dedup",          # C4-style fixed-window span dedup accounting
    "window_scrub",          # C4-style window removal (route->mark->cut)
    "mixture_expand",        # data-mixture resampling (zero-shuffle row path)
    "canonical_dup_assign",  # CCNet canonical-form dedup (key-only groupby)
    "wminhash_near_dups",    # weighted-Jaccard near-dups (Ioffe CWS + LSH)
    "text_quality",          # lang-ID + quality scoring
    "knn_brute",             # similarity search baseline
    "ann_lsh_dups",          # similarity search scale path
    "ann_ivf_knn_wide",      # IVF at a wide (all-vectors) query set
    "cluster_summary",       # A1/O1 cluster summary
    "top_tokens",            # vocabulary head (partial-count shuffle)
    "dir_dup_groups",        # reference headline: duplicate directories
    "events_asof",           # as-of join (user-partitioned merge)
    "doc_len_quantiles",     # exact grouped quantiles
    "word_repetition",       # Gopher repetition filter features
    "decontaminate",         # 13-gram eval-overlap check (broadcast)
    "quality_filter",        # composed C4-style keep/drop chain
    "token_chunks",          # sequence packing (distributed prefix scan)
    "scrub_spans",           # ExactSubstr span-level duplicate removal
    "training_export",       # composed end-to-end export (reuses clusters)
    "url_dedup",             # canonical-URL dedup (Arrow regex + keyed min)
    "sampled_hash_assign",   # M2 sampled-hash prefilter (keyed_min_assign)
    "paragraph_dedup",       # MassiveText sub-doc exact dedup (key-only)
    "dsir_weights",          # DSIR importance weights (two zero-shuffle scans)
    "media_features",        # REAL multimodal decode (WAV/PNG/JPEG/GIF/y4m...)
    "media_near_dups",       # media features -> exact-cosine dup pairs
    "media_probe",           # container metadata WITHOUT decode (MP4/MP3/Ogg/WebM)
    "warc_extract",          # Common Crawl WARC ingest -> byte-exact extract
    "warc_cdx",              # CDX sidecar: offsets + entity digests per record
    "cdx_dedup_against",     # cross-crawl digest dedup, content never shuffled
    "warc_compact",          # storage-level rewrite: revisit stubs for dups
    "host_dup_rate",         # per-host cross-crawl dup rates from CDX verdicts
    "surt_keys",             # SURT sort keys (the CDXJ shard order)
    "robots_compliance",     # RFC 9309 retroactive crawl-consent flags
    "link_graph",            # href extraction -> host edges (pre-aggregated)
    "host_rank",             # PageRank power iteration, edges distributed
    "wat_link_graph",        # WAT sidecar write+read -> identical edges
    "host_degrees",          # web-graph degree/volume summary per host
    "anchor_texts",          # anchor-text corpus extraction
    "main_content",          # boilerplate removal (block link-density scoring)
    "declared_canonical_dups",  # <link rel=canonical> dedup clusters
]

FLAGSHIP = "dedup_clusters"


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    if base.startswith("sf"):
        try:
            return float(base[2:])
        except ValueError:
            pass
    return -1.0


def _consume(res) -> int:
    """Fully execute a query result; return its row count."""
    import ray.data

    if isinstance(res, ray.data.Dataset):
        n = 0
        for b in res.iter_batches(batch_format="pyarrow", batch_size=8192):
            n += len(b)
        return n
    try:
        return len(res)
    except TypeError:
        return 0


def _silence_stdout() -> int:
    """Send fd1 to stderr so Ray log noise can't pollute the JSON line;
    return a dup of the real stdout to write the JSON to."""
    real = os.dup(1)
    os.dup2(2, 1)
    sys.stdout = os.fdopen(os.dup(1), "w")
    return real


def _emit(real_fd: int, payload: dict) -> None:
    os.write(real_fd, (json.dumps(payload) + "\n").encode())


def _patch_hash_shuffle_empty_partitions() -> None:
    """ray 2.49 edge case: a hash-shuffle partition that received zero rows
    finalizes as a schema-less empty table, and ``sort_by(key)`` on it raises
    ArrowInvalid. Skip the sort for column-less blocks. Must run in EVERY
    process that can host a HashShuffleAggregator actor (worker setup hook),
    not just the driver."""
    from ray.data._internal.execution.operators import hash_shuffle as _hs

    def _finalize(self, partition_id):
        block = self._partition_block_builders[partition_id].build()
        if self._should_sort and block.num_columns:
            block = block.sort_by([(k, "ascending") for k in self._key_columns])
        return block

    _hs.Concat.finalize = _finalize


def _init_ray(num_cpus: int) -> None:
    import ray

    strat = os.environ.get("GRAFT_SHUFFLE")
    if not ray.is_initialized():
        kwargs = {}
        if strat == "hash":
            kwargs["runtime_env"] = {
                "worker_process_setup_hook": _patch_hash_shuffle_empty_partitions
            }
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
            **kwargs,
        )
    # optional shuffle-strategy override for A/B runs: the flagship's
    # all-to-all is a groupby on a precomputed hash-partition id, so Ray's
    # HASH_SHUFFLE (2.49+) can route blocks without the global sort the
    # default SORT_SHUFFLE_PULL_BASED performs.
    if strat:
        from ray.data.context import DataContext, ShuffleStrategy

        ctx = DataContext.get_current()
        ctx.shuffle_strategy = {
            "hash": ShuffleStrategy.HASH_SHUFFLE,
            "sort": ShuffleStrategy.SORT_SHUFFLE_PULL_BASED,
            "push": ShuffleStrategy.SORT_SHUFFLE_PUSH_BASED,
        }[strat]
        if strat == "hash":
            # hash shuffle runs long-lived aggregator ACTORS that each pin a
            # CPU; the defaults (200 partitions / 64 aggregators) starve every
            # other stage on a small cluster and the job hangs. Cap both so
            # aggregators use at most ~1/4 of the CPUs.
            ctx.max_hash_shuffle_aggregators = max(2, num_cpus // 4)
            ctx.default_hash_shuffle_parallelism = max(8, num_cpus * 2)
            _patch_hash_shuffle_empty_partitions()


def scaled_pages(sf_dir: str, replicas: int):
    """sf documents amplified ``replicas``x as a WEB-PAGE-SIZED pages Dataset.

    Deterministic (pure function of the parquet + replica index). Each base
    doc's text is the concatenation of a 7-doc sliding window (~2 KB — the
    typical extracted length of a Common-Crawl page; the raw sf docs are
    ~300 chars, 5-10x shorter than real pages, which under-weights per-doc
    compute relative to scheduling in scaling measurements). Replicas keep
    identical text, so they form known exact-dup clusters. 256 input blocks
    so both parallelism levels see >= 4x partitions per CPU.

    ODD replicas carry raw ``html`` bytes with ``text = NULL`` — the M4
    extractor runs in the hot path on ~half the corpus (VERDICT r1 "What's
    missing" #4). The html template round-trips the frozen extractor
    (FIXTURES.md §3: body escaped, whitespace already collapsed in the sf
    text), so html replicas stay byte-identical exact dups of text replicas
    and the cluster structure is unchanged.
    """
    import html as _htmlmod

    import pyarrow as pa
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "lang"],
        override_num_blocks=256,
    )

    def expand(batch: pa.Table) -> pa.Table:
        n = len(batch)
        doc_ids = batch["doc_id"].to_pylist()
        base = [t or "" for t in batch["text"].to_pylist()]
        texts = [
            " ".join(base[i + k] for k in range(7) if i + k < n) if base[i] else ""
            for i in range(n)
        ]
        text_arr = pa.array(texts, pa.string())
        htmls = [
            (
                "<html><head><title>d</title><script>var q=0;</script>"
                f"<style>p{{margin:0}}</style></head><body><p>"
                f"{_htmlmod.escape(t)}</p><!-- crawl --></body></html>"
            ).encode("utf-8")
            for t in texts
        ]
        html_arr = pa.array(htmls, pa.binary())
        parts = []
        for r in range(replicas):
            as_html = r % 2 == 1
            parts.append(
                pa.table(
                    {
                        "url": pa.array(
                            [f"doc://r{r}/{d}" for d in doc_ids], pa.string()
                        ),
                        "warc_ts": pa.nulls(n, pa.timestamp("us")),
                        "html": html_arr if as_html else pa.nulls(n, pa.binary()),
                        "text": pa.nulls(n, pa.string()) if as_html else text_arr,
                        "lang": batch["lang"].cast(pa.string()),
                    }
                )
            )
        return pa.concat_tables(parts)

    return ds.map_batches(expand, batch_format="pyarrow", zero_copy_batch=True)


def prepare_corpus(sf_dir: str, replicas: int) -> str:
    """Materialize the replicated corpus to Parquet ONCE (untimed) so both
    scaling legs read literally the same files — and so read blocks carry
    honest (post-expansion) sizes, letting Ray bundle tasks correctly."""
    import shutil

    # tmpfs: the scaling comparison measures the ENGINE, not this box's one
    # virtual disk (a real N-node cluster has N disks; /tmp here is a single
    # vda that caps read scaling at ~2x)
    base = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    path = f"{base}/graft_bench_corpus_v3_{os.path.basename(sf_dir.rstrip('/'))}_r{replicas}"
    marker = path + ".complete"
    if os.path.exists(marker):
        return path
    if os.path.exists(path):
        shutil.rmtree(path)
    scaled_pages(sf_dir, replicas).write_parquet(path)
    with open(marker, "w") as f:
        f.write("ok")
    return path


def run_single(sf_dir: str, num_cpus: int, replicas: int) -> dict:
    """One fresh-process flagship run over the replicated corpus (scaling leg)."""
    _init_ray(num_cpus)
    import ray.data as rd

    from deduplicatr_ray.pipelines.flagship import dedup_pipeline

    corpus = prepare_corpus(sf_dir, replicas)
    runs = int(os.environ.get("GRAFT_BENCH_RUNS", "2"))
    wall, n_rows = float("inf"), 0
    for _ in range(runs):  # best-of-N: one-box plasma/page-cache noise is ~25%
        pages = rd.read_parquet(corpus)
        t0 = time.perf_counter()
        result = dedup_pipeline(pages, sig_batch_size=256)
        n = _consume(result.clusters)
        w = time.perf_counter() - t0
        if w < wall:
            wall, n_rows = w, n

    import ray

    ray.shutdown()
    return {
        "num_cpus": num_cpus,
        "docs": n_rows,
        "wall_sec": round(wall, 3),
        "docs_per_sec": round(n_rows / wall, 1),
    }


PHASE_NAMES = ["read_extract", "signatures", "band_forest", "components", "assign"]


def run_phased(sf_dir: str, num_cpus: int, replicas: int) -> dict:
    """One fresh-process flagship run SPLIT at materialize barriers so each
    phase's wall can be compared across parallelism levels (VERDICT r1 #3:
    per-phase efficiency breakdown — shows WHERE scaling is lost).

    The barriers make the total slower than the streaming plan `run_single`
    times (phases can't overlap here); the per-phase ratios, not the total,
    are the product of this mode.
    """
    _init_ray(num_cpus)
    import ray
    import ray.data as rd

    from deduplicatr_ray.config import CANONICAL
    from deduplicatr_ray.pipelines.flagship import default_sig_concurrency
    from deduplicatr_ray.stages.cluster import assign_clusters_corpus_roots
    from deduplicatr_ray.stages.extract import extract_stage
    from deduplicatr_ray.stages.lsh import band_stage, candidate_pairs_stage
    from deduplicatr_ray.stages.signatures import signature_stage
    from deduplicatr_ray.state.unionfind import (
        components_hashes,
        forest_reduce_stage,
    )

    corpus = prepare_corpus(sf_dir, replicas)
    phases: dict[str, float] = {}

    def mark(name: str, t0: float) -> float:
        t1 = time.perf_counter()
        phases[name] = round(t1 - t0, 3)
        return t1

    t = time.perf_counter()
    extracted = rd.read_parquet(corpus)
    extracted = extract_stage(extracted).materialize()
    t = mark("read_extract", t)
    sigs = signature_stage(
        extracted,
        CANONICAL,
        batch_size=256,
        concurrency=default_sig_concurrency(),
    ).materialize()
    t = mark("signatures", t)
    edges = forest_reduce_stage(
        candidate_pairs_stage(
            band_stage(sigs, CANONICAL, keys_only=True), CANONICAL, emit="forest"
        )
    ).materialize()
    t = mark("band_forest", t)
    keys, root_h = components_hashes(edges)
    t = mark("components", t)
    clusters, _n = assign_clusters_corpus_roots(
        extracted.select_columns(["url"]), keys, root_h
    )
    n_rows = _consume(clusters)
    mark("assign", t)

    total = round(sum(phases.values()), 3)
    ray.shutdown()
    return {
        "num_cpus": num_cpus,
        "docs": n_rows,
        "wall_sec": total,
        "docs_per_sec": round(n_rows / total, 1),
        "phases": phases,
    }


def run_bench(sf_dir: str, num_cpus: int) -> dict:
    """Default mode: time each headline query over the sf dir."""
    _init_ray(num_cpus)
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    secs: dict[str, float] = {}
    rows: dict[str, int] = {}
    for name in BENCH_QUERIES:
        t0 = time.perf_counter()
        rows[name] = _consume(qs[name](sf_dir))
        secs[name] = round(time.perf_counter() - t0, 3)

    # scrub routing amplification on a pathological all-duplicates fixture
    # (every doc replicated 4x, exact copies): the measured number for the
    # stage's documented text-amplification caveat (scrub.py module doc)
    scrub_amp = _scrub_amp_fixture(sf_dir)

    import ray

    ray.shutdown()
    n_docs = rows.get(FLAGSHIP, 0)
    fl = secs.get(FLAGSHIP, 0.0) or 1e-9
    return {
        "metric": "flagship_dedup_wall",
        "value": secs.get(FLAGSHIP, 0.0),
        "unit": "sec",
        "queries": secs,
        "sf": _sf_of(sf_dir),
        "num_cpus": num_cpus,
        "docs_per_sec": round(n_docs / fl, 1),
        "rows": rows,
        "scrub_amp": scrub_amp,
        "total_sec": round(sum(secs.values()), 3),
    }


def _scrub_amp_fixture(sf_dir: str) -> dict:
    """routed_bytes/corpus_bytes of the scrub routing stage over a corpus
    where EVERY doc is a 4x exact replica — the worst duplication shape."""
    import pyarrow as pa
    import ray.data as rd

    from deduplicatr_ray.stages.scrub import scrub_amplification

    base = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def replicate(b: pa.Table) -> pa.Table:
        ids = b["doc_id"]
        n = len(b)
        import numpy as np

        parts = []
        for r in range(4):
            parts.append(
                pa.table(
                    {
                        "doc_id": pa.array(
                            ids.to_numpy(zero_copy_only=False) * 4 + r,
                            pa.int64(),
                        ),
                        "text": b["text"],
                    }
                )
            )
        return pa.concat_tables(parts)

    t0 = time.perf_counter()
    amp = scrub_amplification(
        base.map_batches(replicate, batch_format="pyarrow", zero_copy_batch=True)
    )
    amp["wall_sec"] = round(time.perf_counter() - t0, 3)
    return amp


def run_scaling(
    sf_dir: str, cpus_lo: int, cpus_hi: int, replicas: int, phases: bool = False
) -> dict:
    """Fresh subprocesses at N and 4N CPUs on the same input.

    Legs are INTERLEAVED (lo, hi, lo, hi, ...) and the best wall per level
    is kept — the sandbox VM's host-level throughput drifts +-20% over
    minutes, which would otherwise bias whichever leg ran second.

    With ``phases=True`` each leg runs the barrier-split pipeline
    (``run_phased``) and the report adds per-phase walls + per-phase
    efficiency — the evidence for WHICH stage loses scaling on this box."""
    runs = int(os.environ.get("GRAFT_BENCH_RUNS", "2"))
    legs: dict = {}
    env = dict(os.environ, GRAFT_BENCH_RUNS="1")
    mode_flag = ["--phased-run"] if phases else ["--single-run"]
    for _ in range(runs):
        for cpus in (cpus_lo, cpus_hi):
            proc = subprocess.run(
                [
                    sys.executable,
                    os.path.abspath(__file__),
                    *mode_flag,
                    "--cpus",
                    str(cpus),
                    "--sf-dir",
                    sf_dir,
                    "--replicas",
                    str(replicas),
                ],
                stdout=subprocess.PIPE,
                stderr=subprocess.DEVNULL,
                check=True,
                env=env,
            )
            leg = json.loads(proc.stdout.decode().strip().splitlines()[-1])
            if cpus not in legs or leg["wall_sec"] < legs[cpus]["wall_sec"]:
                legs[cpus] = leg
    lo, hi = legs[cpus_lo], legs[cpus_hi]
    ratio = cpus_hi / cpus_lo
    eff = (hi["docs_per_sec"] / lo["docs_per_sec"]) / ratio
    out = {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "queries": {
            f"flagship_cpus{cpus_lo}": lo["wall_sec"],
            f"flagship_cpus{cpus_hi}": hi["wall_sec"],
        },
        "sf": _sf_of(sf_dir),
        "num_cpus": cpus_hi,
        "docs": hi["docs"],
        "replicas": replicas,
        "throughput": {
            f"cpus{cpus_lo}": lo["docs_per_sec"],
            f"cpus{cpus_hi}": hi["docs_per_sec"],
        },
        "cpu_ratio": ratio,
    }
    if phases:
        out["phases"] = {
            f"cpus{cpus_lo}": lo["phases"],
            f"cpus{cpus_hi}": hi["phases"],
        }
        out["phase_efficiency"] = {
            p: round((lo["phases"][p] / hi["phases"][p]) / ratio, 3)
            for p in PHASE_NAMES
            if hi["phases"].get(p)
        }
    return out


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    ap.add_argument("--cpus", type=int, default=DEFAULT_CPUS)
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--scaling-cpus", default="8,32", help="lo,hi for --scaling")
    ap.add_argument(
        "--replicas",
        type=int,
        default=320,
        help="corpus amplification for scaling legs (1.6M docs: big enough "
        "that per-stage barrier overheads amortize, as they would on a real "
        "cluster's hours-long runs)",
    )
    ap.add_argument(
        "--phases",
        action="store_true",
        help="with --scaling: barrier-split legs reporting per-phase efficiency",
    )
    ap.add_argument("--single-run", action="store_true", help=argparse.SUPPRESS)
    ap.add_argument("--phased-run", action="store_true", help=argparse.SUPPRESS)
    args = ap.parse_args()

    real_fd = _silence_stdout()
    if args.single_run:
        _emit(real_fd, run_single(args.sf_dir, args.cpus, args.replicas))
    elif args.phased_run:
        _emit(real_fd, run_phased(args.sf_dir, args.cpus, args.replicas))
    elif args.scaling:
        lo, hi = (int(x) for x in args.scaling_cpus.split(","))
        _emit(real_fd, run_scaling(args.sf_dir, lo, hi, args.replicas, args.phases))
    else:
        _emit(real_fd, run_bench(args.sf_dir, args.cpus))


if __name__ == "__main__":
    main()
