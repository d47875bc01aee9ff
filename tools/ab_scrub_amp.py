#!/usr/bin/env python
"""Same-window A/B of the scrub_amp envelope metric (r4 verdict item 6).

BENCH_r04 showed `scrub_amp` wall 4.74 -> 6.35 s at identical 19.83x
amplification vs r03 — inside the documented ±30% single-sample drift, but
worth ruling out a real regression. This runs `bench._scrub_amp_fixture`
(the all-exact-duplicates routing fixture) ALTERNATING between two repo
checkouts in one time window — same box, same minutes, interleaved so host
drift hits both legs equally. Each sample is a fresh subprocess owning its
own Ray session.

Usage:
    git worktree add /tmp/r4head <r4-commit>
    python tools/ab_scrub_amp.py --a /root/repo --b /tmp/r4head --samples 3

Prints ONE JSON line with per-leg samples, medians, and the ratio.
"""

from __future__ import annotations

import argparse
import json
import statistics
import subprocess
import sys

_WORKER = r"""
import json, sys
import ray
ray.init(address="local", num_cpus=int(sys.argv[2]),
         include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
import bench
print(json.dumps(bench._scrub_amp_fixture(sys.argv[1])))
ray.shutdown()
"""


def _sample(repo: str, sf_dir: str, num_cpus: int) -> dict:
    import os

    env = dict(os.environ, PYTHONPATH=repo)
    out = subprocess.run(
        [sys.executable, "-c", _WORKER, sf_dir, str(num_cpus)],
        cwd=repo,
        env=env,
        capture_output=True,
        text=True,
        check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--a", default="/root/repo")
    ap.add_argument("--b", required=True, help="worktree of the baseline commit")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--num-cpus", type=int, default=32)
    ap.add_argument("--samples", type=int, default=3)
    args = ap.parse_args()

    legs: dict[str, list[dict]] = {"a": [], "b": []}
    for _ in range(args.samples):  # interleaved: drift hits both equally
        legs["a"].append(_sample(args.a, args.sf_dir, args.num_cpus))
        legs["b"].append(_sample(args.b, args.sf_dir, args.num_cpus))

    med = {
        k: round(statistics.median(s["wall_sec"] for s in v), 3)
        for k, v in legs.items()
    }
    amp = {
        k: sorted({round(s["amplification"], 2) for s in v})
        for k, v in legs.items()
    }
    print(
        json.dumps(
            {
                "metric": "scrub_amp_ab",
                "sf_dir": args.sf_dir,
                "num_cpus": args.num_cpus,
                "a_repo": args.a,
                "b_repo": args.b,
                "a_walls": [s["wall_sec"] for s in legs["a"]],
                "b_walls": [s["wall_sec"] for s in legs["b"]],
                "a_median": med["a"],
                "b_median": med["b"],
                "ratio_a_over_b": round(med["a"] / med["b"], 3) if med["b"] else None,
                "amplification": amp,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
