"""Per-stage / per-partition Parquet checkpoints with lineage (S4/S5).

BASELINE.json:6 requires every stage to checkpoint per-partition state to
Parquet with lineage metadata so a killed ``ray job submit`` run resumes from
the last completed partition. The reference has no analog (single eager
in-memory walk, SURVEY.md §4.1) — this is new design:

* **stage-level checkpoints** (``checkpoint_dataset``): write to a temp dir,
  fsync-rename into place, then record a ``_lineage.json`` manifest entry
  with the config hash, row count and wall time. A stage directory without a
  manifest entry is garbage from a killed run and is recomputed (atomicity
  rule, SURVEY.md §7.5.4).
* **partition-level checkpoints** (``run_partitioned``): the expensive
  embarrassingly-parallel prefix (extract -> signatures) is run per
  input-fragment group; each completed group gets its own Parquet dir +
  manifest entry with per-partition throughput metrics, so resume is a
  set-difference on group ids (metadata only, J3) and a lost worker costs
  one partition, not the run.

A config-hash mismatch on resume raises — outputs are a pure function of
(input, config), so silently mixing configs would corrupt lineage.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Any, Callable

from ..config import CANONICAL, DedupConfig


class CheckpointManager:
    """Owns the manifest for one (checkpoint_dir, run_id)."""

    def __init__(self, root: str, run_id: str, cfg: DedupConfig = CANONICAL) -> None:
        self.base = os.path.join(root, run_id)
        self.cfg = cfg
        os.makedirs(self.base, exist_ok=True)
        self.manifest_path = os.path.join(self.base, "_lineage.json")
        self.manifest = self._load()

    def _load(self) -> dict[str, Any]:
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path) as f:
                m = json.load(f)
            if m.get("config_hash") != self.cfg.config_hash():
                raise ValueError(
                    f"checkpoint config mismatch: manifest {m.get('config_hash')} "
                    f"!= current {self.cfg.config_hash()} — use a new run_id"
                )
            return m
        m = {"config_hash": self.cfg.config_hash(), "entries": {}}
        self.manifest = m
        self._save()  # pin the config hash at run creation
        return m

    def _save(self) -> None:
        tmp = self.manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.manifest, f, indent=1, sort_keys=True)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self.manifest_path)  # atomic on POSIX

    def is_done(self, key: str) -> bool:
        return key in self.manifest["entries"]

    def record(self, key: str, **meta: Any) -> None:
        self.manifest["entries"][key] = meta
        self._save()

    def entry(self, key: str) -> dict[str, Any] | None:
        return self.manifest["entries"].get(key)

    def stage_dir(self, key: str) -> str:
        return os.path.join(self.base, key)


def _atomic_write(ds, final_dir: str) -> int:
    """write_parquet to a temp sibling, then rename into place; returns rows."""
    tmp_dir = final_dir + ".tmp"
    if os.path.exists(tmp_dir):
        shutil.rmtree(tmp_dir)
    if os.path.exists(final_dir):
        shutil.rmtree(final_dir)  # garbage from a killed run (no manifest entry)
    ds = ds.materialize()
    rows = ds.count()
    ds.write_parquet(tmp_dir)
    os.replace(tmp_dir, final_dir)
    return rows


def checkpoint_dataset(
    ds,
    checkpoint_dir: str,
    *,
    stage: str,
    run_id: str,
    cfg: DedupConfig = CANONICAL,
):
    """Stage-level checkpoint: reuse if recorded complete, else write+record."""
    import ray.data as rd

    mgr = CheckpointManager(checkpoint_dir, run_id, cfg)
    out_dir = mgr.stage_dir(stage)
    if mgr.is_done(stage):
        return rd.read_parquet(out_dir)
    t0 = time.monotonic()
    rows = _atomic_write(ds, out_dir)
    wall = time.monotonic() - t0
    mgr.record(
        stage,
        rows=rows,
        wall_sec=round(wall, 3),
        rows_per_sec=round(rows / wall, 1) if wall > 0 else None,
    )
    return rd.read_parquet(out_dir)


def run_partitioned(
    input_files: list[str],
    transform: Callable[[Any], Any],
    checkpoint_dir: str,
    *,
    stage: str,
    run_id: str,
    cfg: DedupConfig = CANONICAL,
    num_partitions: int = 8,
    metrics_fn: Callable[[Any], dict[str, Any]] | None = None,
    reader: Callable[[list[str]], Any] | None = None,
):
    """Partition-level checkpointed map prefix (S5).

    Splits ``input_files`` into ``num_partitions`` deterministic groups; each
    group runs ``transform(Dataset) -> Dataset`` and lands in its own Parquet
    dir + manifest entry (rows, wall clock, docs/sec — the per-partition
    metrics BASELINE.json:6 requires). Already-recorded groups are skipped, so
    a killed run resumes from the last completed partition. Returns the
    unioned Dataset over all partition dirs.

    ``reader`` maps a file group -> Dataset (default ``read_parquet``);
    pass ``sources.warc.read_warc`` to checkpoint a Common-Crawl WARC
    ingest at the same file-group granularity.
    """
    import ray.data as rd

    if reader is None:
        reader = rd.read_parquet

    mgr = CheckpointManager(checkpoint_dir, run_id, cfg)
    files = sorted(input_files)
    groups: list[list[str]] = [[] for _ in range(min(num_partitions, len(files)))]
    for i, f in enumerate(files):
        groups[i % len(groups)].append(f)

    dirs = []
    for gi, group in enumerate(groups):
        key = f"{stage}/part={gi:05d}"
        out_dir = mgr.stage_dir(key)
        dirs.append(out_dir)
        if mgr.is_done(key):
            continue
        t0 = time.monotonic()
        rows = _atomic_write(transform(reader(group)), out_dir)
        wall = time.monotonic() - t0
        extra: dict[str, Any] = {}
        if metrics_fn is not None:
            extra = metrics_fn(rd.read_parquet(out_dir))
        mgr.record(
            key,
            input_files=group,
            rows=rows,
            wall_sec=round(wall, 3),
            rows_per_sec=round(rows / wall, 1) if wall > 0 else None,
            **extra,
        )
    # read_parquet takes one dir or a list of FILES (not a list of dirs);
    # partitioning=None: dir names are manifest keys ("part=00000"), not
    # hive partitions — inference would graft a stray int32 "part" column
    part_files = [
        os.path.join(d, f)
        for d in dirs
        for f in sorted(os.listdir(d))
        if f.endswith(".parquet")
    ]
    return rd.read_parquet(part_files, partitioning=None)
