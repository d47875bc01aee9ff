#!/usr/bin/env python
"""10x-bench-scale memory-envelope stress run (r3 verdict item 5).

Runs the flagship dedup pipeline at ~5 M ~2 KB pages (sf0.1 documents
replicated 1000x via ``bench.scaled_pages`` — the same deterministic
corpus generator the scaling legs use) and the ExactSubstr scrub at its
pathological-worst corpus shape (every doc duplicated ``--scrub-replicas``
times, so dup-proportional routing routes ~everything), inside the
128 GiB sandbox. Records per-stage walls, throughput, Ray object-store
spill counters, and peak object-store usage; the BASELINE.md "memory
envelope" section quotes this script's output.

The corpus is materialized to DISK (/tmp), not /dev/shm: tmpfs pages
would compete with the object store for the same RAM we are stressing.

Usage:
    python tools/stress_memory.py [--sf-dir D] [--num-cpus 32]
        [--flagship-replicas 1000] [--scrub-replicas 100]

Prints ONE JSON line on stdout (all Ray noise on stderr).
"""

from __future__ import annotations

import argparse
import json
import os
import re
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _spill_stats() -> dict:
    """Object-store spill counters, grpc-free: the filesystem spill dir
    (where the plasma store lands objects it evicts under pressure) +
    raylet log markers. Sampled while the session is still up."""
    import glob

    out: dict = {"spilled_bytes": 0, "spilled_files": 0}
    session = os.path.realpath("/tmp/ray/session_latest")
    for d in glob.glob(os.path.join(session, "ray_spilled_objects*")):
        for root, _dirs, files in os.walk(d):
            for f in files:
                try:
                    out["spilled_bytes"] += os.path.getsize(os.path.join(root, f))
                    out["spilled_files"] += 1
                except OSError:
                    pass
    # raylet.out logs cumulative "Spilled N MiB, M objects" lines
    spilled_mib = None
    raylet_log = os.path.join(session, "logs", "raylet.out")
    try:
        with open(raylet_log, errors="ignore") as f:
            for line in f:
                m = re.search(r"Spilled (\d+) MiB, (\d+) objects", line)
                if m:
                    spilled_mib = (int(m.group(1)), int(m.group(2)))
    except OSError:
        pass
    if spilled_mib is not None:
        out["raylet_spilled_mib"], out["raylet_spilled_objects"] = spilled_mib
    return out


def _prep_corpus(sf_dir: str, replicas: int) -> str:
    """bench.scaled_pages corpus on DISK, built once per (sf, replicas)."""
    import bench

    path = (
        f"/tmp/graft_stress_corpus_{os.path.basename(sf_dir.rstrip('/'))}"
        f"_r{replicas}"
    )
    marker = path + ".complete"
    if os.path.exists(marker):
        return path
    if os.path.exists(path):
        shutil.rmtree(path)
    bench.scaled_pages(sf_dir, replicas).write_parquet(path)
    with open(marker, "w") as f:
        f.write("ok")
    return path


def _fresh_ray(num_cpus: int) -> None:
    import ray

    if ray.is_initialized():
        ray.shutdown()
    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def run_flagship(sf_dir: str, num_cpus: int, replicas: int) -> dict:
    corpus = _prep_corpus(sf_dir, replicas)
    _fresh_ray(num_cpus)
    import ray
    import ray.data as rd

    from deduplicatr_ray.pipelines.flagship import dedup_pipeline

    t0 = time.perf_counter()
    res = dedup_pipeline(rd.read_parquet(corpus))
    # consume the clusters stream (count() via the plan, no driver rows)
    n_docs = res.clusters.count()
    wall = time.perf_counter() - t0
    stats = {
        "docs": int(n_docs),
        "wall_sec": round(wall, 3),
        "docs_per_sec": round(n_docs / wall, 1),
        "n_clusters": res.stats["n_clusters"],
        "n_forest_edges": res.stats["n_forest_edges"],
        "components_mode": res.stats["components_mode"],
        **_spill_stats(),
    }
    ray.shutdown()
    return stats


def _scrub_docs(sf_dir: str, replicas: int, dup_every: int = 5):
    """sf documents amplified ``replicas``x with a REALISTIC dup profile
    for the scrub: replica r of a doc keeps the base text when
    ``r % dup_every == 0`` (true exact-dup families of replicas/dup_every
    members) and otherwise gets a deterministic per-replica WORD SHUFFLE —
    same vocabulary/length, but no >= 50-char run survives a random
    permutation, so shuffled replicas are NOT substring dups of each
    other. (Merely salting the text head/tail leaves the whole body as a
    shared >= 50-char substring, which turns the corpus into scrub's
    documented pathological all-dup shape — the flagship's fully
    replicated corpus — where dup-proportional routing ships ~the whole
    corpus x partitions. That shape is a correctness-documented worst
    case, not a memory-envelope measurement.)"""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text"],
        override_num_blocks=256,
    )

    def expand(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        texts = [t or "" for t in batch["text"].to_pylist()]
        words = [t.split() for t in texts]
        parts = []
        for r in range(replicas):
            if r % dup_every == 0:
                rep_texts = texts
            else:
                rng = np.random.Generator(np.random.PCG64(r))
                rep_texts = [
                    " ".join(np.array(w, dtype=object)[rng.permutation(len(w))])
                    if w
                    else ""
                    for w in words
                ]
            parts.append(
                pa.table(
                    {
                        "doc_id": pa.array(
                            [d * replicas + r for d in ids], pa.int64()
                        ),
                        "text": pa.array(rep_texts, pa.string()),
                    }
                )
            )
        return pa.concat_tables(parts)

    return ds.map_batches(expand, batch_format="pyarrow", zero_copy_batch=True)


def run_scrub(sf_dir: str, num_cpus: int, replicas: int) -> dict:
    _fresh_ray(num_cpus)
    import ray

    from deduplicatr_ray.stages.scrub import scrub_spans

    docs = _scrub_docs(sf_dir, replicas).materialize()  # prep, untimed
    t0 = time.perf_counter()
    out = scrub_spans(docs)
    n_docs = out.count()
    wall = time.perf_counter() - t0
    stats = {
        "docs": int(n_docs),
        "wall_sec": round(wall, 3),
        "docs_per_sec": round(n_docs / wall, 1),
        **_spill_stats(),
    }
    ray.shutdown()
    return stats


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--num-cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--flagship-replicas", type=int, default=1000)
    ap.add_argument("--scrub-replicas", type=int, default=100)
    ap.add_argument("--skip-flagship", action="store_true")
    ap.add_argument("--skip-scrub", action="store_true")
    args = ap.parse_args()

    result: dict = {
        "metric": "memory_envelope_stress",
        "sf_dir": args.sf_dir,
        "num_cpus": args.num_cpus,
    }
    if not args.skip_flagship:
        result["flagship"] = {
            "replicas": args.flagship_replicas,
            **run_flagship(args.sf_dir, args.num_cpus, args.flagship_replicas),
        }
    if not args.skip_scrub:
        result["scrub"] = {
            "replicas": args.scrub_replicas,
            **run_scrub(args.sf_dir, args.num_cpus, args.scrub_replicas),
        }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
