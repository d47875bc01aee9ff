"""Checkpoint / resume semantics (S4/S5; SURVEY.md §5.2.3 resume equivalence)."""

from __future__ import annotations

import json
import os
import shutil

import pyarrow.parquet as pq
import pytest

from deduplicatr_ray.config import DedupConfig
from deduplicatr_ray.pipelines.checkpoint import CheckpointManager, run_partitioned
from deduplicatr_ray.pipelines.flagship import dedup_pipeline
from deduplicatr_ray.sources.synthetic import gen_corpus
from deduplicatr_ray.stages.extract import extract_stage


def test_flagship_checkpoint_and_reuse(ray_session, tmp_path):
    import ray.data as rd

    pages, _ = gen_corpus("exact")
    ck = str(tmp_path / "ckpt")
    r1 = dedup_pipeline(rd.from_arrow(pages), checkpoint_dir=ck, run_id="r1")
    manifest = json.load(open(os.path.join(ck, "r1", "_lineage.json")))
    assert set(manifest["entries"]) == {"signatures", "pairs", "clusters"}
    for e in manifest["entries"].values():
        assert e["rows"] >= 0 and e["wall_sec"] >= 0
    sig_dir = os.path.join(ck, "r1", "signatures")
    mtime = max(os.path.getmtime(os.path.join(sig_dir, f)) for f in os.listdir(sig_dir))
    # second run resumes: mapping identical, signature files untouched
    r2 = dedup_pipeline(rd.from_arrow(pages), checkpoint_dir=ck, run_id="r1")
    assert r2.mapping == r1.mapping
    mtime2 = max(os.path.getmtime(os.path.join(sig_dir, f)) for f in os.listdir(sig_dir))
    assert mtime2 == mtime


def test_config_mismatch_raises(tmp_path):
    ck = str(tmp_path / "ckpt")
    CheckpointManager(ck, "r1", DedupConfig())
    with pytest.raises(ValueError, match="config mismatch"):
        CheckpointManager(ck, "r1", DedupConfig(jaccard_threshold=0.8))


def test_partitioned_resume_skips_done_and_recomputes_missing(ray_session, tmp_path):
    import pyarrow.parquet as papq

    pages, _ = gen_corpus("near")
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    files = []
    for i in range(6):
        f = str(in_dir / f"part{i}.parquet")
        papq.write_table(pages.slice(i * 50, 50), f)
        files.append(f)

    ck = str(tmp_path / "ckpt")
    calls = []

    def transform(ds):
        calls.append(1)
        return extract_stage(ds)

    out1 = run_partitioned(
        files, transform, ck, stage="extracted", run_id="r1", num_partitions=3
    )
    rows1 = out1.count()
    assert rows1 == 300 and len(calls) == 3

    # simulate a killed run: drop one partition's manifest entry + dir
    man_path = os.path.join(ck, "r1", "_lineage.json")
    man = json.load(open(man_path))
    victim = sorted(man["entries"])[1]
    del man["entries"][victim]
    json.dump(man, open(man_path, "w"))
    shutil.rmtree(os.path.join(ck, "r1", victim))

    calls.clear()
    out2 = run_partitioned(
        files, transform, ck, stage="extracted", run_id="r1", num_partitions=3
    )
    assert out2.count() == 300
    assert len(calls) == 1  # only the missing partition recomputed
    # resume equivalence: same url set
    u1 = sorted(r["url"] for r in out2.take_all())
    # fresh full run in a clean dir for comparison
    out3 = run_partitioned(
        files, lambda ds: extract_stage(ds), str(tmp_path / "ck2"),
        stage="extracted", run_id="r1", num_partitions=3,
    )
    u3 = sorted(r["url"] for r in out3.take_all())
    assert u1 == u3


def test_interrupted_write_without_manifest_is_recomputed(ray_session, tmp_path):
    import ray.data as rd
    from deduplicatr_ray.pipelines.checkpoint import checkpoint_dataset

    pages, _ = gen_corpus("edge")
    ck = str(tmp_path / "ckpt")
    # fake a killed run: stage dir exists but no manifest entry
    stale = os.path.join(ck, "r1", "extracted")
    os.makedirs(stale)
    open(os.path.join(stale, "garbage.parquet"), "w").write("not parquet")
    out = checkpoint_dataset(
        extract_stage(rd.from_arrow(pages)), ck, stage="extracted", run_id="r1"
    )
    assert out.count() == len(pages)
    # garbage replaced by real parquet
    pq.read_table(stale)
