"""Data-mixture resampling (stages/mix.py): deterministic per-source
up/down-sampling plans, expansion, and audit summary."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from deduplicatr_ray.stages.mix import (
    MIX_MOD,
    mixture_expand,
    mixture_plan,
    mixture_source_summary,
    weight_thresholds,
)


def _docs(n=400, sources=("a", "b", "c")):
    return pa.table(
        {
            "doc_id": pa.array(list(range(n)), pa.int64()),
            "source": pa.array([sources[i % len(sources)] for i in range(n)]),
        }
    )


def test_weight_thresholds_integer_split():
    per, dflt = weight_thresholds({"a": 2.5, "b": 0.25}, 1.0)
    assert per["a"][0] == 2 and abs(per["a"][1] - MIX_MOD // 2) <= 1
    assert per["b"][0] == 0 and abs(per["b"][1] - MIX_MOD // 4) <= 1
    assert dflt == (1, 0)


def test_mixture_plan_copy_counts_and_determinism(ray_session):
    import ray

    w = {"a": 2.5, "b": 0.25}
    t = _docs()
    out1 = mixture_plan(ray.data.from_arrow(t), weights=w).to_pandas()
    out2 = mixture_plan(ray.data.from_arrow(t), weights=w).to_pandas()
    out1 = out1.sort_values("doc_id").reset_index(drop=True)
    out2 = out2.sort_values("doc_id").reset_index(drop=True)
    assert out1.equals(out2)  # pure function of (doc_id, source)
    a = out1[out1.source == "a"]["n_copies"]
    b = out1[out1.source == "b"]["n_copies"]
    c = out1[out1.source == "c"]["n_copies"]
    assert set(a.unique()) <= {2, 3} and set(b.unique()) <= {0, 1}
    assert (c == 1).all()
    # realized rates near targets (n=133 or so per source; loose bands)
    assert 2.2 <= a.mean() <= 2.8
    assert 0.1 <= b.mean() <= 0.4


def test_mixture_expand_matches_plan(ray_session):
    import ray

    w = {"a": 2.5, "b": 0.25}
    t = _docs(120)
    plan = (
        mixture_plan(ray.data.from_arrow(t), weights=w)
        .to_pandas()
        .set_index("doc_id")["n_copies"]
    )
    exp = mixture_expand(ray.data.from_arrow(t), weights=w).to_pandas()
    got = exp.groupby("doc_id").size()
    for d, n in plan.items():
        assert got.get(d, 0) == n
    # epoch is 0..n-1 per doc
    mx = exp.groupby("doc_id")["epoch"].agg(["min", "max", "count"])
    assert (mx["min"] == 0).all()
    assert (mx["max"] == mx["count"] - 1).all()


def test_mixture_summary_rates(ray_session):
    import ray

    out = (
        mixture_source_summary(
            ray.data.from_arrow(_docs(300)), weights={"a": 2.0}, default=1.0
        )
        .to_pandas()
        .set_index("source")
    )
    assert out.loc["a", "n_copies"] == 2 * out.loc["a", "n_docs"]
    assert out.loc["a", "realized_rate"] == 2.0
    assert out.loc["b", "realized_rate"] == 1.0


def test_mixture_large_doc_ids_no_overflow(ray_session):
    import ray

    t = pa.table(
        {
            "doc_id": pa.array(
                [2**62, 2**62 + 1, 2**40, 7, 0], pa.int64()
            ),
            "source": pa.array(["a"] * 5),
        }
    )
    out = mixture_plan(
        ray.data.from_arrow(t), weights={"a": 1.5}
    ).to_pandas()
    assert set(out["n_copies"]) <= {1, 2}
    assert (out["n_copies"] >= 1).all()


def test_mixture_chunks_dense_layout(ray_session):
    import ray

    from deduplicatr_ray.stages.mix import mixture_chunks

    t = pa.table(
        {
            "doc_id": pa.array(list(range(30)), pa.int64()),
            "source": pa.array(["a" if i % 2 else "b" for i in range(30)]),
            "text": pa.array([f"tok{i} alpha beta gamma" for i in range(30)]),
        }
    )
    out = (
        mixture_chunks(
            ray.data.from_arrow(t), weights={"a": 3.0, "b": 1.0}, chunk_tokens=4
        )
        .to_pandas()
        .sort_values(["doc_id", "epoch"])
        .reset_index(drop=True)
    )
    # copies: odd ids (a) 3x, even ids (b) 1x
    counts = out.groupby("doc_id").size()
    assert all(counts[d] == (3 if d % 2 else 1) for d in range(30))
    # densely packed in (doc_id, epoch) order: each start = prev start + prev len
    assert out["start_offset"].iloc[0] == 0
    assert (
        out["start_offset"].iloc[1:].to_numpy()
        == (out["start_offset"] + out["n_tokens"]).iloc[:-1].to_numpy()
    ).all()
    # chunk spans consistent with 4-token chunks
    assert (out["first_chunk"] == out["start_offset"] // 4).all()


def test_mixture_chunks_max_copies_guard(ray_session):
    import pytest
    import ray

    from deduplicatr_ray.stages.mix import mixture_chunks

    t = pa.table(
        {
            "doc_id": pa.array([1], pa.int64()),
            "source": pa.array(["a"]),
            "text": pa.array(["x"]),
        }
    )
    with pytest.raises(ValueError):
        mixture_chunks(ray.data.from_arrow(t), weights={"a": 9.5})
