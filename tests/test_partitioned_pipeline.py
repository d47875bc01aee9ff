"""dedup_pipeline_partitioned: partition-granular resume + per-partition
metrics (BASELINE.json:6), and equivalence with the unpartitioned flagship."""

from __future__ import annotations

import json
import os

import pyarrow.parquet as pq
import pytest

from deduplicatr_ray.pipelines.flagship import (
    dedup_pipeline,
    dedup_pipeline_partitioned,
)
from deduplicatr_ray.sources.synthetic import gen_corpus


@pytest.fixture()
def mixed_files(tmp_path):
    pages, _ = gen_corpus("mixed")
    files = []
    rows_per = (len(pages) + 3) // 4
    for i in range(4):
        part = pages.slice(i * rows_per, rows_per)
        f = str(tmp_path / f"pages_{i}.parquet")
        pq.write_table(part, f)
        files.append(f)
    return files


def _cluster_map(res) -> dict:
    t = res.clusters.to_pandas()
    return dict(zip(t.url, t.cluster_id))


def test_partitioned_equals_unpartitioned(ray_session, mixed_files, tmp_path):
    import ray.data as rd

    ckpt = str(tmp_path / "ckpt")
    res_p = dedup_pipeline_partitioned(
        mixed_files, checkpoint_dir=ckpt, run_id="r1", num_partitions=3
    )
    res_u = dedup_pipeline(rd.read_parquet(mixed_files))
    assert _cluster_map(res_p) == _cluster_map(res_u)

    # manifest carries per-partition throughput + dup-rate metrics
    manifest = json.load(open(os.path.join(ckpt, "r1", "_lineage.json")))
    sig_entries = {k: v for k, v in manifest["entries"].items() if "part=" in k}
    assert len(sig_entries) == 3
    for e in sig_entries.values():
        assert e["rows"] > 0
        assert e["rows_per_sec"] > 0
        assert 0.0 <= e["exact_dup_rate"] < 1.0
        assert e["distinct_texts"] <= e["rows"]


def test_partitioned_resume_skips_done(ray_session, mixed_files, tmp_path):
    ckpt = str(tmp_path / "ckpt")
    res1 = dedup_pipeline_partitioned(
        mixed_files, checkpoint_dir=ckpt, run_id="r1", num_partitions=2
    )
    m1 = _cluster_map(res1)
    manifest_before = json.load(open(os.path.join(ckpt, "r1", "_lineage.json")))

    # second run: everything recorded -> wall entries unchanged (no recompute)
    res2 = dedup_pipeline_partitioned(
        mixed_files, checkpoint_dir=ckpt, run_id="r1", num_partitions=2
    )
    manifest_after = json.load(open(os.path.join(ckpt, "r1", "_lineage.json")))
    sig_keys = [k for k in manifest_before["entries"] if "part=" in k]
    for k in sig_keys:
        assert manifest_before["entries"][k] == manifest_after["entries"][k]
    assert _cluster_map(res2) == m1
