"""PageRank stress: evidence for host_pagerank's documented scale shape
(edges distributed, driver/broadcast state host-sized) at a graph far
beyond bench scale.

Builds a deterministic power-law-ish host graph with Ray tasks
(HOSTS hosts, ~EDGES_PER_HOST out-edges each, preferential-attachment
flavored via a squared-uniform target draw so in-degree is skewed like
the real web, ~5% dangling hosts), then runs the distributed power
iteration and reports wall/edge-throughput plus the driver-held state
size. A 200k-host / 20-iteration dense numpy reference cross-check runs
at reduced size first so correctness travels with the measurement.

Usage: python tools/stress_pagerank.py [n_hosts] [edges_per_host]
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> int:
    n_hosts = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    eph = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    n_iter = 10
    import numpy as np
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", 32)),
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import pyarrow as pa
    import ray.data as rd

    from deduplicatr_ray.stages.linkgraph import (
        host_pagerank,
        pagerank_reference,
    )

    def block(seed: int, lo: int, hi: int, n: int) -> pa.Table:
        rng = np.random.Generator(np.random.PCG64(seed))
        src = rng.integers(lo, hi, size=(hi - lo) * eph)
        # squared-uniform target draw -> skewed in-degree (web-like);
        # top 95% of ids only, so ~5% of hosts dangle (never sources
        # here, never targets) to exercise the dangling-mass path
        dst = (rng.random(len(src)) ** 2 * int(n * 0.95)).astype(np.int64)
        keep = src != dst
        src, dst = src[keep], dst[keep]
        return pa.table(
            {
                "src_host": np.char.add(
                    "h", src.astype(np.uint64).astype("U12")
                ),
                "dst_host": np.char.add(
                    "h", dst.astype(np.uint64).astype("U12")
                ),
                "n_links": np.ones(len(src), np.int64),
            }
        )

    # correctness leg at reduced size vs the dense reference
    small_n = 200_000
    parts = 16
    step = small_n // parts
    small = rd.from_items(list(range(parts)), override_num_blocks=parts).map_batches(
        lambda b: pa.concat_tables(
            [
                block(int(i) + 1, int(i) * step, (int(i) + 1) * step, small_n)
                for i in b["item"].to_pylist()
            ]
        ),
        batch_format="pyarrow",
        batch_size=None,
    ).materialize()
    got = host_pagerank(small, n_iter=20).set_index("host")["rank"]
    ref = pagerank_reference(small.to_pandas(), n_iter=20)
    errs = max(abs(got[h] - r) / max(r, 1e-300) for h, r in ref.items())
    assert abs(got.sum() - 1.0) < 1e-9
    assert errs < 1e-9, errs

    # scale leg
    parts = 64
    step = n_hosts // parts
    edges = rd.from_items(
        list(range(parts)), override_num_blocks=parts
    ).map_batches(
        lambda b: pa.concat_tables(
            [
                block(int(i) + 101, int(i) * step, (int(i) + 1) * step, n_hosts)
                for i in b["item"].to_pylist()
            ]
        ),
        batch_format="pyarrow",
        batch_size=None,
    ).materialize()
    n_edges = edges.count()
    t0 = time.monotonic()
    ranks = host_pagerank(edges, n_iter=n_iter)
    wall = time.monotonic() - t0
    assert len(ranks) > 0.9 * n_hosts
    assert abs(ranks["rank"].sum() - 1.0) < 1e-9
    top = ranks.nlargest(3, "rank")
    out = {
        "n_hosts": int(len(ranks)),
        "n_edges": int(n_edges),
        "n_iter": n_iter,
        "wall_s": round(wall, 1),
        "edge_visits_per_s": round(n_edges * n_iter / wall),
        "driver_state_mb": round(
            (len(ranks) * 8 * 3 + ranks["host"].nbytes) / 2**20, 1
        ),
        "rank_mass_top3": round(float(top["rank"].sum()), 6),
        "small_ref_max_rel_err": float(f"{errs:.2e}"),
        "num_cpus": int(os.environ.get("RAY_GRAFT_CPUS", 32)),
    }
    print(json.dumps(out))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
