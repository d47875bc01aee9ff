"""End-to-end training export (pipelines/training.py): the kept set must
be exactly (quality-pass ∩ dedup-canonical) − contaminated − eval-slice,
and the chunk layout must be a dense doc_id-ordered packing."""

from __future__ import annotations

import numpy as np

SF = "/root/testdata/sf0.001"


def test_training_export_invariants(ray_session):
    import pyarrow.compute as pc

    from deduplicatr_ray.pipelines.flagship import dedup_pipeline
    from deduplicatr_ray.pipelines.training import training_export
    from deduplicatr_ray.sources.pages import docs_as_pages, read_parquet_auto
    from deduplicatr_ray.stages.textstats import decontaminate, quality_filter_stage

    out = training_export(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    kept = set(out["doc_id"])
    assert kept  # something survives at sf0.001

    docs = read_parquet_auto(
        f"{SF}/documents.parquet", columns=["doc_id", "source", "text"]
    )
    # independent reference sets from the component stages
    qf = quality_filter_stage(docs).to_pandas()
    quality_ok = set(qf[qf["keep"]]["doc_id"])

    clusters = dedup_pipeline(docs_as_pages(SF)).clusters.to_pandas()
    canonical = {
        int(u[6:]) for u in clusters[clusters["is_canonical"]]["url"]
    }

    src = docs.select_columns(["doc_id", "source"]).to_pandas()
    eval_source = src["source"].max()
    eval_ids = set(src[src["source"] == eval_source]["doc_id"])

    contaminated = set(
        decontaminate(docs, eval_source=eval_source).to_pandas()["doc_id"]
    )

    want = (quality_ok & canonical) - contaminated - eval_ids
    assert kept == want

    # dense packing: each doc starts where the previous ended, chunk ids
    # consistent with offsets at 512 tokens
    s = out
    assert (
        s["start_offset"].values[1:]
        == (s["start_offset"] + s["n_tokens"]).values[:-1]
    ).all()
    assert int(s["start_offset"].iloc[0]) == 0
    assert (s["first_chunk"] == s["start_offset"] // 512).all()
    nz = s[s["n_tokens"] > 0]
    assert (
        nz["last_chunk"]
        == (nz["start_offset"] + nz["n_tokens"] - 1) // 512
    ).all()


def test_training_export_bloom_set_equal(ray_session):
    """The bloom decontamination path (fixed-size bitmap broadcast + exact
    confirm join — the scale path for real eval suites) must produce the
    same export as the string-broadcast path, row for row."""
    from deduplicatr_ray.pipelines.flagship import dedup_pipeline
    from deduplicatr_ray.pipelines.training import training_export
    from deduplicatr_ray.sources.pages import docs_as_pages

    clusters = dedup_pipeline(docs_as_pages(SF)).clusters.materialize()
    plain = (
        training_export(SF, clusters=clusters, bloom=False)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    bloomed = (
        training_export(SF, clusters=clusters, bloom=True)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(plain.columns) == list(bloomed.columns)
    assert plain.equals(bloomed)


def test_training_export_writes_resumable_shards(ray_session, tmp_path):
    import os

    from deduplicatr_ray.pipelines.training import training_export

    out_dir = str(tmp_path / "export")
    res = training_export(SF, shard_chunks=2, out_dir=out_dir).to_pandas()
    shards = {
        d for d in os.listdir(out_dir) if d.startswith("chunk_shard=")
    }
    assert shards == {
        f"chunk_shard={int(v)}" for v in res["chunk_shard"].unique()
    }


def test_training_export_scrub_knob(ray_session):
    """scrub=True cuts residual duplicated spans across the kept docs but
    keeps the doc set and dense packing: same ids, token counts <= the
    unscrubbed export, offsets still gap-free."""
    from deduplicatr_ray.pipelines.training import training_export

    plain = (
        training_export(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    scrubbed = (
        training_export(SF, scrub=True)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert scrubbed["doc_id"].tolist() == plain["doc_id"].tolist()
    assert (scrubbed["n_tokens"] <= plain["n_tokens"]).all()
    s = scrubbed
    assert int(s["start_offset"].iloc[0]) == 0
    assert (
        s["start_offset"].values[1:]
        == (s["start_offset"] + s["n_tokens"]).values[:-1]
    ).all()


def test_training_export_vocab_marker_blocks_mixing(ray_session, tmp_path):
    """Exporting into an out_dir written under a DIFFERENT vocab must be a
    hard error (mixed chunk boundaries = silent corruption); same vocab
    re-export is allowed (code-review finding: the old config-lineage
    claim had no enforcement)."""
    import json
    import os

    import pytest

    from deduplicatr_ray.pipelines.training import training_export

    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "exp")
    training_export(sf, out_dir=out, vocab_id="vocabA")
    assert json.load(open(os.path.join(out, "_vocab.json")))["vocab_id"] == "vocabA"

    with pytest.raises(ValueError, match="vocab_id"):
        training_export(sf, out_dir=out, vocab_id="vocabB")

    # same vocab: allowed (resume/re-run)
    training_export(sf, out_dir=out, vocab_id="vocabA")
