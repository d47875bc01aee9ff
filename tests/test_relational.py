"""Broadcast dimension join + grouped top-k (stages/relational.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from deduplicatr_ray.stages.relational import (
    broadcast_join,
    grouped_quantiles,
    grouped_top_k,
)


def _facts():
    return pa.table(
        {
            "k": pa.array([1, 2, 3, 2, 9], pa.int64()),
            "v": pa.array([10, 20, 30, 21, 90], pa.int64()),
        }
    )


def _dim():
    return pa.table(
        {
            "dk": pa.array([3, 1, 2], pa.int64()),
            "name": pa.array(["three", "one", "two"], pa.string()),
        }
    )


def test_broadcast_join_inner(ray_session):
    import ray

    out = (
        broadcast_join(
            ray.data.from_arrow(_facts()), _dim(), key="k", small_key="dk"
        )
        .to_pandas()
        .sort_values(["k", "v"])
        .reset_index(drop=True)
    )
    # k=9 has no dim row -> dropped
    assert out["k"].tolist() == [1, 2, 2, 3]
    assert out["name"].tolist() == ["one", "two", "two", "three"]


def test_broadcast_join_left_keeps_misses(ray_session):
    import ray

    out = (
        broadcast_join(
            ray.data.from_arrow(_facts()), _dim(), key="k", small_key="dk",
            how="left",
        )
        .to_pandas()
        .sort_values(["k", "v"])
        .reset_index(drop=True)
    )
    assert len(out) == 5
    assert out.loc[4, "k"] == 9
    assert out.loc[4, "name"] is None or out.loc[4, "name"] != out.loc[4, "name"]


def test_broadcast_join_rejects_dup_keys(ray_session):
    import ray

    dup = pa.table(
        {"dk": pa.array([1, 1], pa.int64()), "x": pa.array([0, 1], pa.int64())}
    )
    with pytest.raises(ValueError, match="duplicate keys"):
        broadcast_join(ray.data.from_arrow(_facts()), dup, key="k", small_key="dk")


def test_grouped_top_k_ranks_and_ties(ray_session):
    import ray

    t = pa.table(
        {
            "g": pa.array(["a", "a", "a", "a", "b"], pa.string()),
            "score": pa.array([5, 9, 9, 1, 7], pa.int64()),
            "id": pa.array([4, 2, 1, 3, 8], pa.int64()),
        }
    )
    out = (
        grouped_top_k(
            ray.data.from_arrow(t),
            by="g", order_by="score", k=2, descending=True, tie_by="id",
            num_partitions=4,
        )
        .to_pandas()
        .sort_values(["g", "rank"])
        .reset_index(drop=True)
    )
    # group a: score 9 twice -> tie broken by id (1 before 2); b has 1 row
    assert out["g"].tolist() == ["a", "a", "b"]
    assert out["id"].tolist() == [1, 2, 8]
    assert out["rank"].tolist() == [1, 2, 1]


def test_grouped_quantiles_disc_rule(ray_session):
    import ray

    t = pa.table(
        {
            "g": pa.array(["a"] * 10 + ["b"], pa.string()),
            "v": pa.array(list(range(1, 11)) + [42], pa.int64()),
        }
    )
    out = (
        grouped_quantiles(
            ray.data.from_arrow(t),
            by="g", value_col="v",
            qs={"p50": 0.5, "p90": 0.9, "p0": 0.0, "p100": 1.0},
            num_partitions=4,
        )
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    # DuckDB quantile_disc on 1..10: p50=5, p90=9, p0=1, p100=10
    assert out.loc[0, ["n", "p50", "p90", "p0", "p100"]].tolist() == [10, 5, 9, 1, 10]
    assert out.loc[1, ["n", "p50", "p90", "p0", "p100"]].tolist() == [1, 42, 42, 42, 42]


def test_grouped_top_k_ascending_k_larger_than_group(ray_session):
    import ray

    t = pa.table(
        {
            "g": pa.array(["x", "x"], pa.string()),
            "score": pa.array([4, 2], pa.int64()),
            "id": pa.array([1, 2], pa.int64()),
        }
    )
    out = (
        grouped_top_k(
            ray.data.from_arrow(t),
            by="g", order_by="score", k=10, descending=False, tie_by="id",
            num_partitions=2,
        )
        .to_pandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    assert out["score"].tolist() == [2, 4]
    assert out["rank"].tolist() == [1, 2]


def _semi_sides():
    left = pa.table(
        {
            "k": pa.array([1, 2, 3, 4], pa.int64()),
            "v": pa.array(["a", "b", "c", "d"], pa.string()),
        }
    )
    # key 2 repeats: multiplicity must not inflate the left side
    right = pa.table({"rk": pa.array([2, 2, 2, 4, 9], pa.int64())})
    return left, right


def test_hash_semi_join_semi_and_no_inflation(ray_session):
    import ray

    from deduplicatr_ray.stages.relational import hash_semi_join

    left, right = _semi_sides()
    out = (
        hash_semi_join(
            ray.data.from_arrow(left), ray.data.from_arrow(right),
            on="k", right_on="rk",
        )
        .to_pandas()
        .sort_values("k")
    )
    assert out["k"].tolist() == [2, 4]
    assert out["v"].tolist() == ["b", "d"]
    assert list(out.columns) == ["k", "v"]


def test_hash_semi_join_anti(ray_session):
    import ray

    from deduplicatr_ray.stages.relational import hash_semi_join

    left, right = _semi_sides()
    out = (
        hash_semi_join(
            ray.data.from_arrow(left), ray.data.from_arrow(right),
            on="k", right_on="rk", anti=True,
        )
        .to_pandas()
        .sort_values("k")
    )
    assert out["k"].tolist() == [1, 3]
    assert list(out.columns) == ["k", "v"]


def test_hash_semi_join_rejects_same_key_name(ray_session):
    import ray

    from deduplicatr_ray.stages.relational import hash_semi_join

    left, right = _semi_sides()
    with pytest.raises(ValueError, match="named differently"):
        hash_semi_join(
            ray.data.from_arrow(left),
            ray.data.from_arrow(left),
            on="k",
        )


def test_rollup_counts_levels(ray_session):
    import ray

    from deduplicatr_ray.stages.relational import rollup_counts

    t = pa.table(
        {
            "a": pa.array(["x", "x", "y"], pa.string()),
            "b": pa.array(["p", "q", "p"], pa.string()),
            "v": pa.array([1, 2, 4], pa.int64()),
        }
    )
    out = rollup_counts(
        ray.data.from_arrow(t), ["a", "b"], sum_col="v"
    ).to_pandas()
    # fine: (x,p)=1, (x,q)=2, (y,p)=4; level a: x=3, y=4; total: 7
    assert len(out) == 6
    rows = {
        (r["a"], r["b"]): (r["n"], r["total"])
        for _, r in out.iterrows()
    }
    assert rows[("x", "p")] == (1, 1)
    assert rows[("x", "q")] == (1, 2)
    assert rows[("y", "p")] == (1, 4)
    assert rows[("x", None)] == (2, 3)
    assert rows[("y", None)] == (1, 4)
    assert rows[(None, None)] == (3, 7)


def test_bloom_semi_join_matches_exact(ray_session):
    """Bloom prefilter must be results-invariant: semi and anti outputs
    equal the exact hash_semi_join on the same inputs (FP sliver removed
    by the verify join; definite misses short-circuit)."""
    import ray

    from deduplicatr_ray.stages.relational import bloom_semi_join, hash_semi_join

    left = pa.table(
        {
            "k": pa.array(list(range(200)), pa.int64()),
            "v": pa.array([f"v{i}" for i in range(200)], pa.string()),
        }
    )
    # right hits only multiples of 7, with duplicates
    right = pa.table({"rk": pa.array([7 * i for i in range(29)] * 3, pa.int64())})
    lds, rds = ray.data.from_arrow(left), ray.data.from_arrow(right)

    for anti in (False, True):
        want = (
            hash_semi_join(lds, rds, on="k", right_on="rk", anti=anti)
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        got = (
            bloom_semi_join(
                lds, rds, on="k", right_on="rk", anti=anti, n_bits=1 << 12
            )
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        assert got.equals(want), f"anti={anti}"


def test_semi_join_auto_broadcast_equals_hash(ray_session):
    """Both exchanges of semi_join_auto (keep-id broadcast vs streaming
    hash join) match hash_semi_join for semi AND anti, including NULL
    left keys (never match) and duplicate right keys."""
    import ray

    from deduplicatr_ray.stages.relational import (
        hash_semi_join,
        semi_join_auto,
    )

    left = pa.table(
        {
            "k": pa.array(
                [i if i % 11 else None for i in range(200)], pa.int64()
            ),
            "v": pa.array([f"v{i}" for i in range(200)], pa.string()),
        }
    )
    right = pa.table(
        {"rk": pa.array([7 * i for i in range(29)] * 3, pa.int64())}
    )
    lds, rds = ray.data.from_arrow(left), ray.data.from_arrow(right)

    for anti in (False, True):
        want = (
            hash_semi_join(lds, rds, on="k", right_on="rk", anti=anti)
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        for budget in (None, 0):  # None -> broadcast here; 0 -> hash path
            got = (
                semi_join_auto(
                    lds,
                    rds,
                    on="k",
                    right_on="rk",
                    anti=anti,
                    broadcast_budget=budget,
                )
                .to_pandas()
                .sort_values("k")
                .reset_index(drop=True)
            )
            assert got.equals(want), f"anti={anti} budget={budget}"


def test_quantile_sketch_exact_when_blocks_fit(ray_session):
    """With every per-block group slice within summary_size, the sketch
    output equals the exact grouped_quantiles row-for-row."""
    import ray

    from deduplicatr_ray.stages.relational import (
        grouped_quantile_sketch,
        grouped_quantiles,
    )

    rng = np.random.Generator(np.random.PCG64(3))
    t = pa.table(
        {
            "g": pa.array(rng.choice(["a", "b", "c"], 3000).tolist(), pa.string()),
            "v": pa.array(rng.integers(0, 10_000, 3000), pa.int64()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(5)
    qs = {"p50": 0.5, "p90": 0.9, "p99": 0.99}
    exact = (
        grouped_quantiles(ds, by="g", value_col="v", qs=qs)
        .to_pandas().sort_values("g").reset_index(drop=True)
    )
    sk = (
        grouped_quantile_sketch(ds, by="g", value_col="v", qs=qs)
        .to_pandas().sort_values("g").reset_index(drop=True)
    )
    assert sk.equals(exact)


def test_quantile_sketch_bounded_error_when_trimmed(ray_session):
    """Trimmed path: rank error bounded by sum of per-block segment
    half-widths (values = ranks, so value error == rank error)."""
    import ray

    from deduplicatr_ray.stages.relational import grouped_quantile_sketch

    n, blocks, S = 8000, 4, 64
    rng = np.random.Generator(np.random.PCG64(9))
    vals = rng.permutation(n).astype(np.int64)
    t = pa.table({"g": pa.array(["x"] * n, pa.string()), "v": pa.array(vals)})
    ds = ray.data.from_arrow(t).repartition(blocks)
    out = grouped_quantile_sketch(
        ds, by="g", value_col="v", qs={"p50": 0.5, "p90": 0.9}, summary_size=S
    ).to_pandas()
    assert out["n"].iloc[0] == n
    bound = blocks * (int(np.ceil(n / blocks / S)) // 2 + 1)
    assert abs(out["p50"].iloc[0] - (n // 2 - 1)) <= bound
    assert abs(out["p90"].iloc[0] - (int(np.ceil(0.9 * n)) - 1)) <= bound


def test_keyed_min_assign_matches_per_group_oracle(ray_session):
    """min(id) OVER (PARTITION BY key) — vectorized segment-min vs a pandas
    groupby-min oracle, across duplicate families, singletons, and ids
    arriving out of order."""
    import ray

    from deduplicatr_ray.stages.relational import keyed_min_assign

    rng = np.random.Generator(np.random.PCG64(7))
    n = 2000
    keys = [f"k{int(v)}" for v in rng.integers(0, 600, n)]  # ~3.3 rows/key
    ids = rng.permutation(n).astype(np.int64)
    t = pa.table({"doc_id": pa.array(ids), "key": pa.array(keys, pa.string())})
    ds = ray.data.from_arrow(t).repartition(8)

    out = (
        keyed_min_assign(ds, key="key", num_partitions=5)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    df = t.to_pandas()
    df["canonical_id"] = df.groupby("key")["doc_id"].transform("min")
    exp = df[["doc_id", "canonical_id"]].sort_values("doc_id").reset_index(drop=True)
    assert out["doc_id"].tolist() == exp["doc_id"].tolist()
    assert out["canonical_id"].tolist() == exp["canonical_id"].tolist()
    # every row present exactly once; singletons self-canonical
    assert len(out) == n


def test_keyed_min_assign_all_unique_and_all_same(ray_session):
    import ray

    from deduplicatr_ray.stages.relational import keyed_min_assign

    uniq = pa.table(
        {
            "doc_id": pa.array([5, 3, 9], pa.int64()),
            "key": pa.array(["a", "b", "c"], pa.string()),
        }
    )
    out = (
        keyed_min_assign(ray.data.from_arrow(uniq), key="key")
        .to_pandas()
        .sort_values("doc_id")
    )
    assert out["canonical_id"].tolist() == out["doc_id"].tolist()

    same = pa.table(
        {
            "doc_id": pa.array([7, 2, 4], pa.int64()),
            "key": pa.array(["x", "x", "x"], pa.string()),
        }
    )
    out2 = keyed_min_assign(ray.data.from_arrow(same), key="key").to_pandas()
    assert sorted(out2["canonical_id"].tolist()) == [2, 2, 2]


def test_keyed_min_assign_size_col(ray_session):
    """size_col emits count(*) OVER (PARTITION BY key) per row in the same
    segment pass — the SoftDeDup dup-weight input."""
    import ray

    from deduplicatr_ray.stages.relational import keyed_min_assign

    rng = np.random.Generator(np.random.PCG64(11))
    n = 1500
    keys = [f"k{int(v)}" for v in rng.integers(0, 400, n)]
    ids = rng.permutation(n).astype(np.int64)
    t = pa.table({"doc_id": pa.array(ids), "key": pa.array(keys, pa.string())})
    ds = ray.data.from_arrow(t).repartition(6)

    out = (
        keyed_min_assign(ds, key="key", size_col="group_size", num_partitions=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    df = t.to_pandas()
    df["canonical_id"] = df.groupby("key")["doc_id"].transform("min")
    df["group_size"] = df.groupby("key")["doc_id"].transform("size")
    exp = (
        df[["doc_id", "canonical_id", "group_size"]]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["doc_id"].tolist() == exp["doc_id"].tolist()
    assert out["canonical_id"].tolist() == exp["canonical_id"].tolist()
    assert out["group_size"].tolist() == exp["group_size"].tolist()
