"""Media decode-stage stress + scaling evidence (BASELINE.md).

Builds a large synthetic mixed-media table (unique seed rows replicated
inside map_batches with fresh ids — generation stays off the driver's
critical path), then times the REAL-decode feature stage at two CPU
counts in fresh subprocesses (the same two-parallelism protocol
bench.py --scaling uses). Prints ONE JSON line.

    python tools/stress_media.py [--rows 60000] [--cpus 8,32]
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys

_LEG = r"""
import json, sys, time
import numpy as np
import pyarrow as pa
import ray

rows, cpus = int(sys.argv[1]), int(sys.argv[2])
ray.init(address="local", num_cpus=cpus, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
import ray.data as rd
from deduplicatr_ray.stages.multimodal import gen_fake_media, media_feature_stage

SEED_ROWS = 600
seed = gen_fake_media(SEED_ROWS).to_arrow_refs()
seed_tbl = pa.concat_tables(ray.get(seed))
reps = -(-rows // SEED_ROWS)

def replicate(batch: pa.Table, reps=reps) -> pa.Table:
    out = []
    for r in range(reps):
        ids = pa.array(
            [f"{m}/rep{r:04d}" for m in batch["media_id"].to_pylist()]
        )
        out.append(batch.set_column(0, "media_id", ids))
    return pa.concat_tables(out)

# 128 input blocks -> 128 replicate tasks -> enough parallel actor tasks
# for the decode pool. Pool floor = 3/4 of CPUs (the repo convention:
# Ray's actor autoscaler ramps too slowly from a small min, and a pool
# that takes EVERY cpu starves the upstream task operators).
pool = max(1, min((3 * cpus) // 4, cpus - 1))
base = rd.from_arrow(seed_tbl).repartition(128).map_batches(
    replicate, batch_format="pyarrow", zero_copy_batch=True, batch_size=8
)
t0 = time.monotonic()
n = media_feature_stage(
    base, decode="real", on_error="quarantine",
    batch_size=64, concurrency=(pool, pool),
).count()
wall = time.monotonic() - t0
print(json.dumps({"cpus": cpus, "rows": n, "wall": round(wall, 2),
                  "rows_per_sec": round(n / wall, 1)}))
ray.shutdown()
"""


def run_leg(rows: int, cpus: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", _LEG, str(rows), str(cpus)],
        capture_output=True, text=True, timeout=1800,
    )
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-2000:])
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=60000)
    ap.add_argument("--cpus", default="8,32")
    args = ap.parse_args()
    c1, c2 = (int(c) for c in args.cpus.split(","))
    legs = [run_leg(args.rows, c) for c in (c1, c2)]
    eff = (legs[1]["rows_per_sec"] / legs[0]["rows_per_sec"]) / (c2 / c1)
    print(json.dumps({
        "metric": "media_decode_scaling",
        "rows": args.rows,
        "legs": legs,
        "scaling_efficiency": round(eff, 3),
    }))


if __name__ == "__main__":
    main()
