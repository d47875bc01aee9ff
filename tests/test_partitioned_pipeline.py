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


def test_pairs_partitioned_resume_recomputes_only_missing_group(
    ray_session, mixed_files, tmp_path
):
    """Kill-after-pairs resume (r3 verdict item 7): drop ONE pair resume
    group from the manifest; the re-run recomputes exactly that group —
    signature partitions and the surviving pair groups stay untouched —
    and the final pair set + clusters are unchanged."""
    import shutil

    import pandas as pd

    ckpt = str(tmp_path / "ckpt")
    res1 = dedup_pipeline_partitioned(
        mixed_files,
        checkpoint_dir=ckpt,
        run_id="r1",
        num_partitions=2,
        pairs_groups=3,
    )
    m1 = _cluster_map(res1)
    p1 = (
        res1.pairs.to_pandas()
        .sort_values(["url_a", "url_b"])
        .reset_index(drop=True)
    )
    # manifest-key dirs ("group=0000") must not hive-leak into the schema
    assert set(p1.columns) == {"url_a", "url_b", "jaccard_est", "method"}
    man_path = os.path.join(ckpt, "r1", "_lineage.json")
    man = json.load(open(man_path))
    group_keys = sorted(k for k in man["entries"] if k.startswith("pairs/group="))
    assert len(group_keys) == 3
    assert all(man["entries"][k]["num_groups"] == 3 for k in group_keys)

    # simulate a run killed mid-pairs: group 1 unrecorded + dir gone
    victim = group_keys[1]
    del man["entries"][victim]
    json.dump(man, open(man_path, "w"))
    shutil.rmtree(os.path.join(ckpt, "r1", victim))

    def mtimes(keys):
        out = {}
        for k in keys:
            d = os.path.join(ckpt, "r1", k)
            out[k] = max(os.path.getmtime(os.path.join(d, f)) for f in os.listdir(d))
        return out

    survivors = [group_keys[0], group_keys[2]]
    sig_keys = [k for k in man["entries"] if "part=" in k]
    before = mtimes(survivors + sig_keys)

    res2 = dedup_pipeline_partitioned(
        mixed_files,
        checkpoint_dir=ckpt,
        run_id="r1",
        num_partitions=2,
        pairs_groups=3,
    )
    man2 = json.load(open(man_path))
    assert victim in man2["entries"]  # recomputed + re-recorded
    assert mtimes(survivors + sig_keys) == before  # nothing else touched
    assert _cluster_map(res2) == m1
    p2 = (
        res2.pairs.to_pandas()
        .sort_values(["url_a", "url_b"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(p1, p2)


def test_pairs_partitioned_group_layout_mismatch_raises(
    ray_session, mixed_files, tmp_path
):
    ckpt = str(tmp_path / "ckpt")
    dedup_pipeline_partitioned(
        mixed_files, checkpoint_dir=ckpt, run_id="r1", pairs_groups=3
    )
    with pytest.raises(ValueError, match="group layout mismatch"):
        dedup_pipeline_partitioned(
            mixed_files, checkpoint_dir=ckpt, run_id="r1", pairs_groups=4
        )


def test_pairs_partitioned_union_equals_whole_stage(ray_session, mixed_files, tmp_path):
    """Slicing the band-key space never loses or duplicates a pair: the
    distincted union over resume groups == the unsliced pair stage."""
    import ray.data as rd

    from deduplicatr_ray.pipelines.flagship import (
        pairs_from_signatures,
        pairs_partitioned,
        signatures_from_pages,
    )

    sigs = signatures_from_pages(rd.read_parquet(mixed_files)).materialize()
    whole = (
        pairs_from_signatures(sigs)
        .to_pandas()
        .sort_values(["url_a", "url_b"])
        .reset_index(drop=True)
    )
    sliced = (
        pairs_partitioned(sigs, checkpoint_dir=str(tmp_path / "ck2"), num_groups=5)
        .to_pandas()
        .sort_values(["url_a", "url_b"])
        .reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(
        whole[["url_a", "url_b", "jaccard_est", "method"]],
        sliced[["url_a", "url_b", "jaccard_est", "method"]],
    )


def test_pairs_partitioned_manifest_entry_without_dir_recomputes(
    ray_session, mixed_files, tmp_path
):
    """A manifest entry whose Parquet dir is GONE (partial rsync, disk
    cleanup) must recompute the group, not silently drop its pairs from
    the returned union (code-review finding)."""
    import shutil

    import pandas as pd

    ckpt = str(tmp_path / "ckpt")
    res1 = dedup_pipeline_partitioned(
        mixed_files,
        checkpoint_dir=ckpt,
        run_id="r1",
        num_partitions=2,
        pairs_groups=3,
    )
    p1 = (
        res1.pairs.to_pandas()
        .sort_values(["url_a", "url_b"])
        .reset_index(drop=True)
    )
    man_path = os.path.join(ckpt, "r1", "_lineage.json")
    man = json.load(open(man_path))
    group_keys = sorted(k for k in man["entries"] if k.startswith("pairs/group="))
    # delete a group's DIR but keep its manifest entry
    victim = group_keys[1]
    shutil.rmtree(os.path.join(ckpt, "r1", victim))

    res2 = dedup_pipeline_partitioned(
        mixed_files,
        checkpoint_dir=ckpt,
        run_id="r1",
        num_partitions=2,
        pairs_groups=3,
    )
    assert os.path.isdir(os.path.join(ckpt, "r1", victim))  # recomputed
    p2 = (
        res2.pairs.to_pandas()
        .sort_values(["url_a", "url_b"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(p1, p2)
