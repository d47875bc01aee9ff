"""Unit tests for the vectorized pair-block primitives (post-rewrite):
forest emission, representative collapse, exact star blocks, distinct
blocks, forest reduction, and numpy components."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from deduplicatr_ray.config import CANONICAL
from deduplicatr_ray.stages.exact import exact_pairs_block
from deduplicatr_ray.stages.lsh import distinct_pairs_block, emit_pairs_block


def _band_group(urls: list[str], sig8_rows: list[np.ndarray], shas: list[int]):
    """sig8_rows are PACKED sketch rows (cfg.sketch_width bytes each)."""
    cfg = CANONICAL
    m = len(urls)
    return pa.table(
        {
            "band_id": pa.array([0] * m, pa.int32()),
            "band_hash": pa.array([1] * m, pa.uint64()),
            "url": pa.array(urls),
            "sig8": pa.FixedSizeListArray.from_arrays(
                pa.array(np.concatenate(sig8_rows).astype(np.uint8)),
                cfg.sketch_width,
            ),
            "simhash": pa.array(np.zeros(m, np.uint64)),
            "sha64": pa.array(np.array(shas, np.uint64)),
        }
    )


def test_forest_mode_emits_spanning_tree_not_clique():
    cfg = CANONICAL
    s = np.zeros(cfg.sketch_width, np.uint8)
    g = _band_group(
        [f"u/{i}" for i in range(5)], [s] * 5, list(range(100, 105))
    )
    allp = emit_pairs_block(g, emit="all")
    forest = emit_pairs_block(g, emit="forest")
    assert len(allp) == 10  # C(5,2): every pair verifies (identical sig8)
    assert len(forest) == 4  # spanning tree of 5 nodes


def test_rep_collapse_same_sha_no_pairs():
    cfg = CANONICAL
    s = np.zeros(cfg.sketch_width, np.uint8)
    # five rows, all the same content hash -> one representative -> no pairs
    g = _band_group([f"u/{i}" for i in range(5)], [s] * 5, [7] * 5)
    assert len(emit_pairs_block(g, emit="all")) == 0
    # two content groups -> pairing only between the two min-url reps
    g2 = _band_group([f"u/{i}" for i in range(4)], [s] * 4, [7, 7, 9, 9])
    out = emit_pairs_block(g2, emit="all")
    assert out["url_a"].to_pylist() == ["u/0"]
    assert out["url_b"].to_pylist() == ["u/2"]


def test_exact_pairs_block_star_form_multiple_groups():
    g = pa.table(
        {
            "url": pa.array(["u/3", "u/1", "u/2", "u/9", "u/8", "u/solo"]),
            "text_sha1": pa.array(
                [b"a" * 20, b"a" * 20, b"a" * 20, b"b" * 20, b"b" * 20, b"c" * 20],
                pa.binary(20),
            ),
        }
    )
    out = exact_pairs_block(g)
    rows = sorted(zip(out["url_a"].to_pylist(), out["url_b"].to_pylist()))
    assert rows == [("u/1", "u/2"), ("u/1", "u/3"), ("u/8", "u/9")]
    assert set(out["method"].to_pylist()) == {"exact"}


def test_distinct_pairs_block_strongest_method_wins():
    g = pa.table(
        {
            "url_a": pa.array(["a", "a", "a", "x"]),
            "url_b": pa.array(["b", "b", "b", "y"]),
            "jaccard_est": pa.array([0.8, 1.0, 0.9, 0.7], pa.float32()),
            "method": pa.array(["simhash", "exact", "minhash", "minhash"]),
        }
    )
    out = distinct_pairs_block(g)
    got = {
        (a, b): m
        for a, b, m in zip(
            out["url_a"].to_pylist(), out["url_b"].to_pylist(), out["method"].to_pylist()
        )
    }
    assert got == {("a", "b"): "exact", ("x", "y"): "minhash"}


def test_forest_reduce_and_components_hashes(ray_session):
    import ray.data as rd

    from deduplicatr_ray.state.unionfind import (
        components_hashes,
        forest_reduce_stage,
    )

    # two components: {a,b,c,d} (with a redundant cycle) and {x,y}
    pairs = pa.table(
        {
            "url_a": pa.array(["a", "b", "c", "a", "x"]),
            "url_b": pa.array(["b", "c", "d", "d", "y"]),
            "jaccard_est": pa.array([1.0] * 5, pa.float32()),
            "method": pa.array(["exact"] * 5),
        }
    )
    ds = rd.from_arrow(pairs)
    reduced = forest_reduce_stage(ds, num_partitions=2).materialize()
    assert reduced.count() <= 5
    keys, root_h = components_hashes(reduced)
    assert len(keys) == 6
    # roots: a,b,c,d share one label; x,y share another
    lab = dict(zip(keys.tolist(), root_h.tolist()))
    from deduplicatr_ray.functions.hashing import hash_columns_u64

    h = {
        u: int(hash_columns_u64(pa.table({"u": pa.array([u])}), ["u"])[0])
        for u in "abcdxy"
    }
    assert len({lab[h[u]] for u in "abcd"}) == 1
    assert len({lab[h[u]] for u in "xy"}) == 1
    assert lab[h["a"]] != lab[h["x"]]


def test_flagship_identical_under_emit_modes(ray_session):
    """Cluster assignments must be identical whether near pairs are emitted
    as full cliques or spanning forests (connectivity equivalence)."""
    import ray.data as rd

    from deduplicatr_ray.sources.synthetic import gen_corpus
    from deduplicatr_ray.pipelines.flagship import (
        pairs_from_signatures,
        signatures_from_pages,
    )
    from deduplicatr_ray.stages.lsh import band_stage, candidate_pairs_stage
    from deduplicatr_ray.state.unionfind import components_from_pairs

    pages, _ = gen_corpus("near")
    sigs = signatures_from_pages(rd.from_arrow(pages)).materialize()

    def clusters_for(emit: str) -> dict[str, str]:
        pairs = candidate_pairs_stage(band_stage(sigs), emit=emit).materialize()
        edges = [
            (a, b)
            for b_ in pairs.iter_batches(batch_size=4096, batch_format="pyarrow")
            for a, b in zip(b_["url_a"].to_pylist(), b_["url_b"].to_pylist())
        ]
        return components_from_pairs(edges)

    assert clusters_for("all") == clusters_for("forest")


def test_keys_only_bands_match_url_bands(ray_session):
    """The key-only clustering band path (band_stage(keys_only=True)) must
    produce the SAME connected components as the url-bearing reporting path
    (endpoints hashed by hash_columns_u64). The raw pair sets may differ —
    the representative collapse picks min-KEY vs min-URL reps — but the
    components, i.e. cluster membership, must be identical: urls can be
    dropped from the band all-to-all without changing clustering."""
    import ray.data as rd

    from deduplicatr_ray.functions.hashing import hash_columns_u64
    from deduplicatr_ray.pipelines.flagship import signatures_from_pages
    from deduplicatr_ray.sources.synthetic import gen_corpus
    from deduplicatr_ray.stages.lsh import band_stage, candidate_pairs_stage
    from deduplicatr_ray.state.unionfind import components_from_pairs

    pages, _ = gen_corpus("mixed")
    sigs = signatures_from_pages(rd.from_arrow(pages)).materialize()

    url_pairs = candidate_pairs_stage(band_stage(sigs), emit="all").materialize()
    key_pairs = candidate_pairs_stage(
        band_stage(sigs, keys_only=True), emit="all"
    ).materialize()

    def component_sets(ds, key_mode: bool) -> set[frozenset]:
        edges = []
        for b in ds.iter_batches(batch_size=8192, batch_format="pyarrow"):
            if key_mode:
                ha = b["ha"].to_pylist()
                hb = b["hb"].to_pylist()
            else:
                ha = hash_columns_u64(b, ["url_a"]).tolist()
                hb = hash_columns_u64(b, ["url_b"]).tolist()
            edges.extend(zip(ha, hb))
        lab = components_from_pairs(edges)
        groups: dict = {}
        for node, root in lab.items():
            groups.setdefault(root, set()).add(node)
        return {frozenset(g) for g in groups.values()}

    assert component_sets(key_pairs, True) == component_sets(url_pairs, False)
    # key-mode pairs ship no strings
    assert "url_a" not in key_pairs.schema().names


def test_distributed_components_matches_driver(ray_session):
    """Hash-to-min rounds must produce the same components + min-url labels
    as the exact driver union-find (A6 scale path, SURVEY.md §4.3)."""
    import pyarrow as pa
    import ray.data as rd

    from deduplicatr_ray.state.unionfind import (
        components_from_pairs,
        distributed_components,
    )

    edges = [
        ("b", "a"), ("c", "b"), ("e", "d"), ("f", "e"), ("a", "c"),
        ("p", "q"), ("q", "r"), ("r", "s"), ("s", "t"),  # chain: slow convergence
    ]
    pairs = pa.table(
        {
            "url_a": pa.array([e[0] for e in edges]),
            "url_b": pa.array([e[1] for e in edges]),
        }
    )
    want = components_from_pairs(edges)
    got_tbl = distributed_components(rd.from_arrow(pairs)).to_pandas()
    got = dict(zip(got_tbl.url, got_tbl.cluster_id))
    assert got == want


def test_distributed_mode_matches_driver_full_corpus(ray_session):
    """The fully distributed flagship path (label-propagation components +
    shuffle-join assignment, nothing on the driver) must row-match the
    driver path over a whole mixed synthetic corpus (VERDICT r1 item 1)."""
    import ray.data as rd

    from deduplicatr_ray.pipelines.flagship import dedup_pipeline
    from deduplicatr_ray.sources.synthetic import gen_corpus

    pages, _ = gen_corpus("mixed")
    cols = ["url", "cluster_id", "cluster_size", "is_canonical"]

    def run(mode):
        res = dedup_pipeline(rd.from_arrow(pages), components=mode)
        df = res.clusters.to_pandas()[cols]
        return res, df.sort_values("url").reset_index(drop=True)

    res_d, want = run("driver")
    for mode in ("hashes", "distributed", "shuffle"):
        res_m, got = run(mode)
        assert got.equals(want), f"{mode} clusters diverge from driver"
        assert res_m.stats["n_clusters"] == res_d.stats["n_clusters"]
        assert res_m.stats["docs_in_clusters"] == res_d.stats["docs_in_clusters"]


def test_auto_routes_to_shuffle_past_driver_budget(ray_session, monkeypatch):
    """components='auto' must route to the never-on-driver shuffle path when
    the forest-edge count exceeds the driver budget, with output identical
    to the driver path (VERDICT r3 item 2)."""
    import ray.data as rd

    from deduplicatr_ray.pipelines.flagship import dedup_pipeline
    from deduplicatr_ray.sources.synthetic import gen_corpus

    pages, _ = gen_corpus("mixed")
    cols = ["url", "cluster_id", "cluster_size", "is_canonical"]

    def run():
        res = dedup_pipeline(rd.from_arrow(pages), components="auto")
        df = res.clusters.to_pandas()[cols]
        return res, df.sort_values("url").reset_index(drop=True)

    res_d, want = run()
    assert res_d.stats["components_mode"] == "driver"  # default budget

    monkeypatch.setenv("GRAFT_DRIVER_EDGE_MAX", "0")  # force the route
    res_s, got = run()
    assert res_s.stats["components_mode"] == "shuffle"
    assert got.equals(want), "auto/shuffle clusters diverge from driver"
    assert res_s.stats["n_clusters"] == res_d.stats["n_clusters"]
    assert res_s.stats["docs_in_clusters"] == res_d.stats["docs_in_clusters"]


def test_shuffle_labels_partition_count_mismatch(ray_session):
    """assign_clusters_shuffle_labels must be self-consistent in P: the
    labels carry a part column from distributed_labels' OWN partition
    count, and the assignment used to reuse it verbatim while hashing the
    corpus with its own P — any mismatch (cluster resized between the two
    passes) silently emptied the member join and produced all-singleton
    output. The labels' part is now recomputed with the caller's P."""
    import ray.data as rd

    from deduplicatr_ray.stages.cluster import assign_clusters_shuffle_labels
    from deduplicatr_ray.state.unionfind import distributed_labels

    urls = [f"u/{i:03d}" for i in range(12)]
    from deduplicatr_ray.functions.hashing import hash_columns_u64

    ut = pa.table({"url": pa.array(urls)})
    h = hash_columns_u64(ut, ["url"])
    # chain 0-1-2, pair 5-6; rest singletons
    edges = pa.table(
        {
            "ha": pa.array(h[[0, 1, 5]], pa.uint64()),
            "hb": pa.array(h[[1, 2, 6]], pa.uint64()),
        }
    )
    labels = distributed_labels(rd.from_arrow(edges), num_partitions=4)
    clusters, n_clusters, docs_in = assign_clusters_shuffle_labels(
        rd.from_arrow(ut), labels, num_partitions=7
    )
    df = clusters.to_pandas().sort_values("url").reset_index(drop=True)
    assert n_clusters == 2 and docs_in == 5
    sizes = df.set_index("url")["cluster_size"]
    assert sizes["u/000"] == 3 and sizes["u/005"] == 2 and sizes["u/011"] == 1
