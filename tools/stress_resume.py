#!/usr/bin/env python
"""Kill/resume endurance at the 5M-doc stress scale (r4 verdict item 5).

Runs the PARTITIONED checkpointed flagship (`dedup_pipeline_partitioned`:
per-input-group signature checkpoints + per-band-key-group pair checkpoints,
`pipelines/flagship.py:262`, `pipelines/checkpoint.py:123`) over the same
5M-page corpus as the memory-envelope stress (`tools/stress_memory.py`),
three legs, each in a FRESH subprocess with its own Ray session:

  A. uninterrupted run -> cluster-set hash (order-independent uint64 sum
     over (url, cluster_id, cluster_size) rows, computed distributed);
  B. identical run under a different run_id, SIGKILLed by this parent the
     moment the lineage manifest shows the pair stage in flight (>=1
     ``pairs/group=`` entry recorded, not all of them) — the whole process
     group dies, mid-shuffle, no cleanup;
  C. resume: the same command re-run against B's checkpoint dir. Completed
     manifest entries are skipped (J3 set-difference), only the missing
     pair groups + tail recompute.

Asserts hash(A) == hash(C) and equal (docs, n_clusters); reports walls and
the recomputed-entry counts the BASELINE.md endurance section quotes.

Usage:
    python tools/stress_resume.py [--sf-dir D] [--num-cpus 32]
        [--replicas 1000] [--partitions 8] [--pairs-groups 4]
    python tools/stress_resume.py --worker ...   (internal: one leg)

Prints ONE JSON line on stdout (all Ray noise on stderr).
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _corpus_files(sf_dir: str, replicas: int) -> list[str]:
    from tools.stress_memory import _prep_corpus

    path = _prep_corpus(sf_dir, replicas)
    return sorted(
        os.path.join(path, f) for f in os.listdir(path) if f.endswith(".parquet")
    )


def _cluster_set_hash(clusters) -> int:
    """Order-independent content hash of the cluster assignment: uint64
    wraparound sum of per-row hashes over (url, cluster_id, cluster_size).
    Runs as a map_batches pass — no driver rows."""
    import numpy as np
    import pyarrow as pa

    from deduplicatr_ray.functions.hashing import hash_columns_u64

    def _h(b: pa.Table) -> pa.Table:
        s = hash_columns_u64(b, ["url", "cluster_id", "cluster_size"], seed=7)
        # one uint64 partial per batch; the driver folds them (wraparound)
        return pa.table(
            {"h": pa.array([int(np.sum(s, dtype=np.uint64))], pa.uint64())}
        )

    tot = 0
    for row in clusters.map_batches(
        _h, batch_format="pyarrow", zero_copy_batch=True
    ).iter_rows():
        tot = (tot + int(row["h"])) & 0xFFFFFFFFFFFFFFFF  # wraparound
    return tot


def run_worker(args) -> int:
    import ray

    ray.init(
        address="local",
        num_cpus=args.num_cpus,
        include_dashboard=False,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from deduplicatr_ray.pipelines.flagship import dedup_pipeline_partitioned

    files = _corpus_files(args.sf_dir, args.replicas)
    t0 = time.perf_counter()
    res = dedup_pipeline_partitioned(
        files,
        checkpoint_dir=args.ckpt_dir,
        run_id=args.run_id,
        num_partitions=args.partitions,
        pairs_groups=args.pairs_groups,
    )
    docs = res.clusters.count()
    wall = time.perf_counter() - t0
    out = {
        "docs": int(docs),
        "wall_sec": round(wall, 3),
        "docs_per_sec": round(docs / wall, 1),
        "n_clusters": res.stats["n_clusters"],
        "n_forest_edges": res.stats["n_forest_edges"],
        "components_mode": res.stats["components_mode"],
        "cluster_set_hash": _cluster_set_hash(res.clusters),
    }
    print(json.dumps(out))
    sys.stdout.flush()
    ray.shutdown()
    return 0


def _manifest_entries(ckpt_dir: str, run_id: str) -> list[str]:
    path = os.path.join(ckpt_dir, run_id, "_lineage.json")
    try:
        with open(path) as f:
            return sorted(json.load(f)["entries"].keys())
    except (OSError, ValueError, KeyError):
        return []


def _spawn(args, run_id: str) -> subprocess.Popen:
    cmd = [
        sys.executable,
        os.path.abspath(__file__),
        "--worker",
        "--sf-dir", args.sf_dir,
        "--num-cpus", str(args.num_cpus),
        "--replicas", str(args.replicas),
        "--partitions", str(args.partitions),
        "--pairs-groups", str(args.pairs_groups),
        "--ckpt-dir", args.ckpt_dir,
        "--run-id", run_id,
    ]
    return subprocess.Popen(
        cmd,
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
        start_new_session=True,  # own process group: SIGKILL takes Ray too
    )


def _wait_json(proc: subprocess.Popen) -> dict:
    out, _ = proc.communicate()
    if proc.returncode != 0:
        raise RuntimeError(f"worker leg failed rc={proc.returncode}: {out[-2000:]}")
    return json.loads(out.strip().splitlines()[-1])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--num-cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--replicas", type=int, default=1000)
    ap.add_argument("--partitions", type=int, default=8)
    ap.add_argument("--pairs-groups", type=int, default=4)
    ap.add_argument("--ckpt-dir", default="/tmp/graft_resume_ckpt")
    ap.add_argument("--run-id", default="leg")
    ap.add_argument("--worker", action="store_true")
    args = ap.parse_args()

    if args.worker:
        return run_worker(args)

    import shutil

    _corpus_files(args.sf_dir, args.replicas)  # build once, outside the walls
    if os.path.exists(args.ckpt_dir):
        shutil.rmtree(args.ckpt_dir)

    # ---- leg A: uninterrupted ----
    a = _wait_json(_spawn(args, "full"))

    # ---- leg B: kill mid-pair-stage ----
    proc = _spawn(args, "killed")
    killed_with: list[str] = []
    while True:
        if proc.poll() is not None:
            raise RuntimeError(
                "leg B finished before the kill window — pair stage too fast; "
                "raise --replicas"
            )
        entries = _manifest_entries(args.ckpt_dir, "killed")
        pairs_done = [e for e in entries if e.startswith("pairs/group=")]
        if 0 < len(pairs_done) < args.pairs_groups:
            killed_with = entries
            os.killpg(proc.pid, signal.SIGKILL)
            break
        time.sleep(1.0)
    proc.wait()
    time.sleep(5.0)  # let the orphaned Ray session's sockets/shm drain

    # ---- leg C: resume against B's checkpoints ----
    t0 = time.perf_counter()
    c = _wait_json(_spawn(args, "killed"))
    resume_wall = round(time.perf_counter() - t0, 3)
    final_entries = _manifest_entries(args.ckpt_dir, "killed")
    recomputed = sorted(set(final_entries) - set(killed_with))

    ok = (
        a["cluster_set_hash"] == c["cluster_set_hash"]
        and a["docs"] == c["docs"]
        and a["n_clusters"] == c["n_clusters"]
    )
    print(
        json.dumps(
            {
                "metric": "kill_resume_endurance",
                "sf_dir": args.sf_dir,
                "num_cpus": args.num_cpus,
                "replicas": args.replicas,
                "docs": a["docs"],
                "cluster_set_equal": ok,
                "n_clusters": (a["n_clusters"], c["n_clusters"]),
                "cluster_set_hash": (a["cluster_set_hash"], c["cluster_set_hash"]),
                "components_mode": (a["components_mode"], c["components_mode"]),
                "full_wall_sec": a["wall_sec"],
                "resume_wall_sec": resume_wall,
                "entries_at_kill": len(killed_with),
                "entries_total": len(final_entries),
                "entries_recomputed_on_resume": recomputed,
                "manifest_at_kill": killed_with,
            }
        )
    )
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
