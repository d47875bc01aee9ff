"""Directory rollup + duplicate-dir grouping (stages/dirtree.py) against
hand-built file trees with known answers (reference semantics: commutative
hash sums, name-independence, nested pruning)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from deduplicatr_ray.stages.dirtree import dir_dup_groups, dir_rollup

LEVELS = ["top", "sub", "name"]


def _files(rows):
    """rows: (top, sub, name, hash64, n_bytes)."""
    return pa.table(
        {
            "top": pa.array([r[0] for r in rows], pa.string()),
            "sub": pa.array([r[1] for r in rows], pa.string()),
            "name": pa.array([r[2] for r in rows], pa.string()),
            "hash64": pa.array([r[3] for r in rows], pa.uint64()),
            "n_bytes": pa.array([r[4] for r in rows], pa.int64()),
        }
    )


@pytest.fixture()
def tree():
    # a/x: files f1(h=10,3) f2(h=20,5); b/y: same CONTENTS, different names
    # c/z: different content
    return _files(
        [
            ("a", "x", "f1", 10, 3),
            ("a", "x", "f2", 20, 5),
            ("b", "y", "g1", 10, 3),
            ("b", "y", "g2", 20, 5),
            ("c", "z", "h1", 99, 7),
        ]
    )


def _rollup_df(ray, t, num_partitions=4):
    return (
        dir_rollup(
            ray.data.from_arrow(t), LEVELS, num_partitions=num_partitions
        )
        .to_pandas()
        .set_index("path")
        .sort_index()
    )


def test_rollup_sums_and_counts(ray_session, tree):
    import ray

    df = _rollup_df(ray, tree)
    # 3 top dirs + 3 sub dirs + 5 files
    assert len(df) == 11
    assert df.loc["a", "filecount"] == 2
    assert df.loc["a", "n_bytes"] == 8
    assert df.loc["a", "hash_sum"] == 30
    assert df.loc["a/x", "hash_sum"] == 30
    assert df.loc["a/x/f1", ["filecount", "n_bytes", "hash_sum"]].tolist() == [
        1, 3, 10,
    ]
    assert df.loc["c", "hash_sum"] == 99
    assert set(df["depth"].unique()) == {1, 2, 3}


def test_rollup_name_and_order_independent(ray_session, tree):
    """Reference invariant: dir hash is a commutative sum — renaming files
    or permuting rows must not change any dir summary."""
    import ray

    base = _rollup_df(ray, tree)[["filecount", "n_bytes", "hash_sum"]]
    perm = tree.take(pa.array([4, 2, 0, 3, 1], pa.int64()))
    assert _rollup_df(ray, perm, num_partitions=2)[
        ["filecount", "n_bytes", "hash_sum"]
    ].equals(base)


def test_rollup_uint64_wraps(ray_session):
    import ray

    big = np.uint64(2**63)
    t = _files([("a", "x", "f1", big, 1), ("a", "x", "f2", big, 1)])
    df = _rollup_df(ray, t)
    assert df.loc["a", "hash_sum"] == 0  # 2^63 + 2^63 wraps mod 2^64


def test_dup_groups_and_nested_pruning(ray_session, tree):
    """a ≅ b (same content multiset) ⇒ one depth-1 group {a, b}; their
    descendants (a/x ≅ b/y, and the per-file matches) are pruned."""
    import ray

    s = dir_rollup(ray.data.from_arrow(tree), LEVELS, num_partitions=4)
    out = (
        dir_dup_groups(s, leaf_depth=3, num_partitions=4)
        .to_pandas()
        .sort_values("path")
        .reset_index(drop=True)
    )
    assert out["path"].tolist() == ["a", "b"]
    assert out["n_dups"].tolist() == [2, 2]
    assert out["hash_sum"].tolist() == [30, 30]


def test_dup_groups_without_pruning(ray_session, tree):
    import ray

    s = dir_rollup(ray.data.from_arrow(tree), LEVELS, num_partitions=4)
    out = dir_dup_groups(
        s, leaf_depth=3, prune_nested=False, num_partitions=4
    ).to_pandas()
    # {a, a/x, b, b/y} (tops and subs share (30,2,8)), {f1,g1}, {f2,g2},
    # plus c's single-file chain {c, c/z, c/z/h1} (the documented
    # dir-of-one-file quirk) -> 4 + 2 + 2 + 3 = 11 member rows
    assert len(out) == 11


def test_partial_match_survives_pruning(ray_session):
    """c/x matches a/x, but c is NOT a dup of a (extra file) ⇒ the subdir
    group must survive with BOTH members (nothing above them is dup)."""
    import ray

    t = _files(
        [
            ("a", "x", "f1", 10, 3),
            ("c", "x", "g1", 10, 3),
            ("c", "w", "extra", 50, 9),
        ]
    )
    s = dir_rollup(ray.data.from_arrow(t), LEVELS, num_partitions=4)
    out = (
        dir_dup_groups(s, leaf_depth=3, num_partitions=4)
        .to_pandas()
        .sort_values(["depth", "path"])
        .reset_index(drop=True)
    )
    # "a" (single-file dir chain) groups with "c/x" and the files? No:
    # a(h=10,fc=1,b=3) == c/x == a/x == both files -> one group of 5 nodes;
    # a is depth-1 dup dir -> a/x and a/x/f1 pruned; c/x dup dir -> g1
    # pruned. Survivors: a, c/x (files pruned, group recounted to 2).
    assert out["path"].tolist() == ["a", "c/x"]
    assert out["n_dups"].tolist() == [2, 2]


def test_no_dups_returns_empty_with_schema(ray_session):
    import ray

    t = _files([("a", "x", "f1", 1, 1), ("b", "y", "g1", 2, 1)])
    s = dir_rollup(ray.data.from_arrow(t), LEVELS, num_partitions=4)
    out = dir_dup_groups(s, leaf_depth=3, num_partitions=4)
    assert out.count() == 0
    # Dataset-level schema must survive emptiness (ray's to_pandas drops
    # columns on any 0-row dataset, so assert on the Dataset schema)
    assert out.schema().names == [
        "path", "depth", "filecount", "n_bytes", "hash_sum", "n_dups",
    ]


def test_rollup_slash_in_level_value_does_not_collide(ray_session):
    """A level VALUE containing '/' must not merge with a deeper node's
    joined path: source='a/b' (depth 1) and source='a', sub='b' (depth 2)
    used to collapse into one node with summed filecount/hash_sum
    (code-review finding, confirmed by repro). Level values are now
    '/'-escaped before joining."""
    import ray

    t = _files(
        [
            ("a/b", "x", "f1", 10, 3),
            ("a", "b", "f2", 20, 5),
        ]
    )
    df = (
        dir_rollup(ray.data.from_arrow(t), LEVELS, num_partitions=2)
        .to_pandas()
        .set_index("path")
    )
    # depth-1 'a%2Fb' (the escaped slashed source) and depth-2 'a/b' are
    # DISTINCT nodes with their own counts
    assert df.loc["a%2Fb", "filecount"] == 1
    assert df.loc["a%2Fb", "hash_sum"] == 10
    assert df.loc["a/b", "filecount"] == 1
    assert df.loc["a/b", "hash_sum"] == 20


def test_documents_to_file_table_null_text(ray_session):
    """NULL text must hash as '' with 0 bytes, not crash (code-review
    finding, confirmed by repro)."""
    import ray

    from deduplicatr_ray.stages.dirtree import documents_to_file_table

    t = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["hello", None], pa.string()),
            "source": pa.array(["s", "s"], pa.string()),
            "lang": pa.array(["en", "en"], pa.string()),
        }
    )
    out = documents_to_file_table(ray.data.from_arrow(t)).to_pandas()
    assert len(out) == 2
    assert out.sort_values("name")["n_bytes"].tolist() == [5, 0]
