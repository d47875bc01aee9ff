"""Connected components (A6, ST2): pairs -> cluster mapping.

Two implementations behind one interface (SURVEY.md §4.3):

* ``components_from_pairs`` — driver-side union-find with path compression +
  union by size. Exact and O(pairs * alpha(n)); the candidate-pair set is
  orders of magnitude smaller than the corpus (it only contains verified
  duplicates), so this holds to ~1e8 pairs.
* ``distributed_components`` — iterated min-label propagation (hash-to-min)
  expressed as Ray Data groupby rounds, for when pairs no longer fit the
  driver (cf. BTS load-balanced distributed union-find, ICDE 2024;
  PAPERS.md). Labels move one cross-partition hop per round (same-partition
  sub-chains collapse inside each round's local fixpoint), so rounds scale
  with each component's PARTITION-HOP diameter — small in practice because
  band groups emit stars/forests, not long chains; non-convergence inside
  ``max_rounds`` raises instead of silently splitting a component.

Cluster ids are the lexicographic MIN url of each component — a pure
function of membership, so output is deterministic under any row order,
retry or parallelism level (SURVEY.md §4.2 determinism row). This is the
analog of the reference's order-independent commutative dir-hash sum
(``file.clj:~30-45``, approximate citation).
"""

from __future__ import annotations

from typing import Iterable


class UnionFind:
    """Path-compressed, size-united union-find over arbitrary hashables."""

    def __init__(self) -> None:
        self.parent: dict[str, str] = {}
        self.size: dict[str, int] = {}

    def find(self, x: str) -> str:
        parent = self.parent
        if x not in parent:
            parent[x] = x
            self.size[x] = 1
            return x
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    def union(self, a: str, b: str) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return
        if self.size[ra] < self.size[rb]:
            ra, rb = rb, ra
        self.parent[rb] = ra
        self.size[ra] += self.size[rb]


def components_from_pairs(pairs: Iterable[tuple[str, str]]) -> dict[str, str]:
    """url -> cluster_id (min url of its component) for every url in a pair."""
    uf = UnionFind()
    for a, b in pairs:
        uf.union(a, b)
    # min url per root, then resolve every member
    min_of_root: dict[str, str] = {}
    for x in uf.parent:
        r = uf.find(x)
        m = min_of_root.get(r)
        if m is None or x < m:
            min_of_root[r] = x
    return {x: min_of_root[uf.find(x)] for x in uf.parent}


def components_hashes(pairs_ds):
    """PAIRS Dataset -> (keys, root_h): numpy-only connected components.

    Workers hash edge endpoints to uint64 (polars, vectorized); the driver
    pulls ONLY the two hash columns (~16 B/edge — no Python strings) and
    runs min-label propagation with pointer jumping over int ids. Returns
    sorted member hashes ``keys`` and, aligned to them, the component label
    ``root_h`` (= min member hash). Canonical urls/sizes are computed
    DISTRIBUTEDLY afterwards (see ``assign_clusters_distributed``), so
    driver work is O(E) numpy, independent of url lengths.
    """
    import numpy as np
    import pyarrow as pa

    from ..functions.hashing import hash_columns_u64

    def to_hashes(b: pa.Table) -> pa.Table:
        if "ha" in b.column_names:  # emitted at pair creation (16 B/edge pull)
            return b.select(["ha", "hb"])
        return pa.table(
            {
                "ha": pa.array(hash_columns_u64(b, ["url_a"]), pa.uint64()),
                "hb": pa.array(hash_columns_u64(b, ["url_b"]), pa.uint64()),
            }
        )

    ha_parts, hb_parts = [], []
    for b in pairs_ds.map_batches(
        to_hashes, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
        ha_parts.append(b["ha"].to_numpy(zero_copy_only=False))
        hb_parts.append(b["hb"].to_numpy(zero_copy_only=False))
    if not ha_parts:
        return np.empty(0, np.uint64), np.empty(0, np.uint64)

    ha = np.concatenate(ha_parts)
    hb = np.concatenate(hb_parts)
    ids = np.unique(np.concatenate([ha, hb]))
    ea = np.searchsorted(ids, ha)
    eb = np.searchsorted(ids, hb)

    label = np.arange(len(ids), dtype=np.int64)
    while True:
        m = np.minimum(label[ea], label[eb])
        before = label.copy()
        np.minimum.at(label, ea, m)
        np.minimum.at(label, eb, m)
        while True:  # pointer jumping
            nl = label[label]
            if np.array_equal(nl, label):
                break
            label = nl
        if np.array_equal(before, label):
            break
    return ids, ids[label]


def forest_reduce_stage(pairs, *, num_partitions: int | None = None):
    """Connectivity-preserving distributed edge reduction.

    Hash-partition edges arbitrarily (by url_a), keep a spanning forest of
    each partition's edge set: the union of per-partition forests has the
    same connected components as the full edge list (any cycle within a
    partition is redundant there, and cross-partition cycles survive via
    their per-partition trees). Output <= (#distinct urls per partition - 1)
    rows per partition, so the driver union-find streams ~O(V) edges instead
    of O(E) — the classic edge-sample trick from distributed MST/CC.
    """
    import numpy as np
    import pyarrow as pa

    from ..functions.hashing import hash_columns_u64
    from ..stages.lsh import default_num_partitions

    P = num_partitions or default_num_partitions()

    def with_part(b: pa.Table) -> pa.Table:
        if "ha" in b.column_names:  # = hash(url_a); present in both pair modes
            ha = b["ha"].to_numpy(zero_copy_only=False)
        else:
            ha = hash_columns_u64(b, ["url_a"])
        part = (ha % np.uint64(P)).astype(np.int32)
        return b.append_column("part", pa.array(part, pa.int32()))

    def forest_block(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["part"])
        if "ha" in g.column_names:  # int endpoints: cheaper dict union-find
            ua = g["ha"].to_pylist()
            ub = g["hb"].to_pylist()
        else:
            ua = g["url_a"].to_pylist()
            ub = g["url_b"].to_pylist()
        uf = UnionFind()
        keep: list[int] = []
        find, parent = uf.find, uf.parent
        for i, (a, b) in enumerate(zip(ua, ub)):
            ra, rb = find(a), find(b)
            if ra != rb:
                uf.union(ra, rb)
                keep.append(i)
        if len(keep) == len(g):
            return g
        return g.take(pa.array(keep, pa.int64()))

    return (
        pairs.map_batches(with_part, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(forest_block, batch_format="pyarrow")
    )


def _part_join(left, right, fn):
    """Co-partitioned vectorized join: union two ``kind``-tagged Datasets
    that share a ``part`` column (both sides must have been tagged with
    the SAME partition count), group by PARTITION (not by key!) and run
    ``fn`` once per partition over the whole Arrow block. This is the
    engine's standard hash-partition + vectorized-block pattern
    (``stages/lsh.py`` pair emission uses the same shape) — one Python
    invocation per partition, numpy/searchsorted inside, instead of one
    ``map_groups`` call per key."""
    return (
        left.union(right)
        .groupby("part")
        .map_groups(fn, batch_format="pyarrow")
    )


def distributed_labels(pairs_ds, *, num_partitions=None, max_rounds: int = 50):
    """Pairs/edges Dataset -> labels Dataset ``(part, h, v)`` with ``v`` the
    component root hash per node — the min-label-propagation core of
    ``distributed_components``, exposed on its own so KEYS-ONLY edge lists
    (``(ha, hb)`` uint64 rows, no url strings) can be clustered with NOTHING
    ever landing on the driver. Round mechanics documented on
    ``distributed_components`` (which now delegates here)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from ..functions.hashing import hash_columns_u64
    from ..stages.lsh import default_num_partitions

    P = int(num_partitions or default_num_partitions())
    PU = np.uint64(P)
    K_EDGE, K_LABEL, K_OFFER = 0, 1, 2

    # ---- pass 0: symmetric uint64 edge list (both directions, keyed by
    # src % P, so every node sees all its edges in its own partition) ----
    def to_edges(b: pa.Table) -> pa.Table:
        if "ha" in b.column_names:  # emitted at pair creation
            ha = b["ha"].to_numpy(zero_copy_only=False)
            hb = b["hb"].to_numpy(zero_copy_only=False)
        else:
            ha = hash_columns_u64(b, ["url_a"])
            hb = hash_columns_u64(b, ["url_b"])
        src = np.concatenate([ha, hb])
        dst = np.concatenate([hb, ha])
        return pa.table(
            {
                "part": pa.array((src % PU).astype(np.int32), pa.int32()),
                "h": pa.array(src, pa.uint64()),
                "v": pa.array(dst, pa.uint64()),
                "kind": pa.array(np.full(len(src), K_EDGE, np.int8), pa.int8()),
                "changed": pa.array(np.zeros(len(src), np.int64), pa.int64()),
            }
        )

    edges = pairs_ds.map_batches(
        to_edges, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    if edges.count() == 0:
        return rd.from_arrow(
            pa.table(
                {
                    "part": pa.array([], pa.int32()),
                    "h": pa.array([], pa.uint64()),
                    "v": pa.array([], pa.uint64()),
                }
            )
        )

    def round_pass(g: pa.Table, first: bool) -> pa.Table:
        kind = g["kind"].to_numpy(zero_copy_only=False)
        h = g["h"].to_numpy(zero_copy_only=False)
        v = g["v"].to_numpy(zero_copy_only=False)
        part = int(g["part"][0].as_py())
        e = kind == K_EDGE
        src, dst = h[e], v[e]
        if first:
            l_node = np.unique(src)
            l_val = l_node.copy()
        else:
            lm = kind == K_LABEL
            order = np.argsort(h[lm])
            l_node = h[lm][order]
            l_val = v[lm][order].copy()
        start_val = l_val.copy()
        om = kind == K_OFFER
        if om.any():
            np.minimum.at(l_val, np.searchsorted(l_node, h[om]), v[om])
        si = np.searchsorted(l_node, src)
        dl = (dst % PU).astype(np.int32) == part
        if dl.any():
            di_l, si_l = np.searchsorted(l_node, dst[dl]), si[dl]
            for _ in range(64):
                before = l_val[di_l]
                np.minimum.at(l_val, di_l, l_val[si_l])
                if np.array_equal(before, l_val[di_l]):
                    break
        changed = l_val != start_val
        xm = (~dl) & (changed[si] | first)
        off_dst, off_val = dst[xm], l_val[si[xm]]
        keep = off_val < off_dst
        off_dst, off_val = off_dst[keep], off_val[keep]
        if len(off_dst):
            o = np.lexsort((off_val, off_dst))
            off_dst, off_val = off_dst[o], off_val[o]
            firsts = np.concatenate([[True], off_dst[1:] != off_dst[:-1]])
            off_dst, off_val = off_dst[firsts], off_val[firsts]
        n_l, n_o = len(l_node), len(off_dst)
        return pa.concat_tables(
            [
                g.filter(pa.array(e)),
                pa.table(
                    {
                        "part": pa.array(np.full(n_l, part, np.int32), pa.int32()),
                        "h": pa.array(l_node, pa.uint64()),
                        "v": pa.array(l_val, pa.uint64()),
                        "kind": pa.array(np.full(n_l, K_LABEL, np.int8), pa.int8()),
                        "changed": pa.array(changed.astype(np.int64), pa.int64()),
                    }
                ),
                pa.table(
                    {
                        "part": pa.array(
                            (off_dst % PU).astype(np.int32), pa.int32()
                        ),
                        "h": pa.array(off_dst, pa.uint64()),
                        "v": pa.array(off_val, pa.uint64()),
                        "kind": pa.array(np.full(n_o, K_OFFER, np.int8), pa.int8()),
                        "changed": pa.array(np.ones(n_o, np.int64), pa.int64()),
                    }
                ),
            ]
        )

    state = edges
    first = True
    n_changed = 1
    for _ in range(max_rounds):
        rp = (lambda f: lambda g: round_pass(g, f))(first)
        state = (
            state.groupby("part").map_groups(rp, batch_format="pyarrow").materialize()
        )
        n_changed = state.sum("changed")  # distributed fixpoint scalar
        first = False
        if not n_changed:
            break
    if n_changed:
        # labels propagate ONE cross-partition hop per round (min-label
        # push, no pointer jumping), so a component whose hash-partition
        # diameter exceeds max_rounds is NOT converged here — returning
        # the pending state would silently SPLIT that component into
        # multiple cluster ids. Fail loudly instead (code-review finding).
        raise RuntimeError(
            f"distributed_labels: {n_changed} labels still changing after "
            f"max_rounds={max_rounds} — a component's partition-hop "
            f"diameter exceeds the round budget; raise max_rounds (cost "
            f"is one small shuffle per extra round)"
        )

    def keep_labels(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return b.filter(pc.equal(b["kind"], K_LABEL)).select(["part", "h", "v"])

    return state.map_batches(
        keep_labels, batch_format="pyarrow", zero_copy_batch=True
    )


def distributed_components(
    pairs_ds, max_rounds: int = 50, num_partitions=None, full: bool = False
):
    """Min-label propagation over a PAIRS Dataset -> Dataset (url, cluster_id)
    with NOTHING ever materialized on the driver (A6 scale path).

    All per-round state is uint64 (node hash, label hash; 16 B/row shuffle
    payload — url strings only enter the two final passes). Each round is
    ONE partition-grouped vectorized pass over a single kind-tagged state
    table (edge / label / offer rows co-partitioned by ``node % P``):

    1. **fold** — pending offers are folded into the partition's label
       array with ``np.minimum.at``;
    2. **local fixpoint** — intra-partition edges propagate min labels to
       a LOCAL fixpoint (vectorized loop; a chain that lives inside one
       partition collapses in this round instead of one hop per round);
    3. **delta offers** — cross-partition edges whose src label changed
       this round (every edge in round 1) emit ``(dst, label)`` offers,
       deduped to the per-dst min before they enter the shuffle.

    The classic two-pass offer/min split costs two all-to-alls per round
    for the same shuffled bytes (edges re-enter the exchange either way);
    folding them into one kind-tagged pass halves the per-round fixed
    shuffle cost, and the measured round count drops further because
    offers are computed from post-fold labels.

    Fixpoint is a distributed ``Sum`` of the change flags (a scalar to the
    driver — never the label table); in-flight offers carry ``changed=1``
    so the loop cannot terminate while offers are pending. Converges in
    O(cross-partition component diameter) rounds; the flagship feeds
    forest-reduced edges (per-band stars joined by shared members), so the
    diameter is small in practice and bounded by ``max_rounds``. Cluster
    ids are the lexicographic min url per component, reduced distributedly
    (groupby-Min) and joined back partition-wise.

    ``full=True`` additionally carries the member url hash and the
    distributed per-component Count, returning
    ``(h uint64, url, cluster_id, cluster_size)`` — the input the
    shuffle-join corpus assignment (``assign_clusters_shuffle``) needs for
    the never-on-driver flagship path.

    cf. hash-to-min (Rastogi et al., "Finding Connected Components in
    Map-Reduce in Logarithmic Rounds", ICDE 2013) — this is the
    fixed-label-width variant that trades round count for O(1) per-node
    state.
    """
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from ..functions.hashing import hash_columns_u64
    from ..stages.lsh import default_num_partitions

    P = int(num_partitions or default_num_partitions())
    PU = np.uint64(P)

    # propagation rounds (shared with the keys-only flagship path)
    labels = distributed_labels(
        pairs_ds, num_partitions=P, max_rounds=max_rounds
    ).materialize()
    if labels.count() == 0:
        cols = {"url": pa.array([], pa.string()),
                "cluster_id": pa.array([], pa.string())}
        if full:
            cols = {"h": pa.array([], pa.uint64()), **cols,
                    "cluster_size": pa.array([], pa.int64())}
        return rd.from_arrow(pa.table(cols))

    def to_nodes(b: pa.Table) -> pa.Table:
        if "ha" in b.column_names:
            ha = b["ha"].to_numpy(zero_copy_only=False)
            hb = b["hb"].to_numpy(zero_copy_only=False)
        else:
            ha = hash_columns_u64(b, ["url_a"])
            hb = hash_columns_u64(b, ["url_b"])
        h = np.concatenate([ha, hb])
        urls = pa.chunked_array([b["url_a"], b["url_b"]]).combine_chunks()
        return pa.table(
            {
                "part": pa.array((h % PU).astype(np.int32), pa.int32()),
                "h": pa.array(h, pa.uint64()),
                "url": urls,
            }
        )

    # (part, h, url) node rows — one per edge-endpoint OCCURRENCE (cheap
    # lazy projection; member_pass dedups per partition, saving a whole
    # groupby shuffle vs materializing a deduped node table)
    nodes = pairs_ds.map_batches(
        to_nodes, batch_format="pyarrow", zero_copy_batch=True
    )

    # ---- resolve cluster ids: min url per component, all distributed ----
    from ray.data.aggregate import Min

    def member_pass(g: pa.Table) -> pa.Table:
        """join nodes (h, url) with final labels (h -> root) per partition"""
        import pyarrow.compute as pc

        is_node = pc.is_valid(g["url"]).to_numpy(zero_copy_only=False)
        h = g["h"].to_numpy(zero_copy_only=False)
        v = g["v"].to_numpy(zero_copy_only=False)
        l_node, l_val = h[~is_node], v[~is_node]
        order = np.argsort(l_node)
        l_node, l_val = l_node[order], l_val[order]
        gn = g.filter(pa.array(is_node))
        # node rows arrive one per edge-endpoint occurrence (the deduped
        # node table was folded away); keep each node's first row
        hn = h[is_node]
        _, first_idx = np.unique(hn, return_index=True)
        first_idx = np.sort(first_idx)
        gn = gn.take(pa.array(first_idx, pa.int64()))
        root = l_val[np.searchsorted(l_node, hn[first_idx])]
        # int64 bit-view: Ray's hash groupby coerces out-of-range uint64
        # keys to pickled Python objects; the view is bijective so
        # equality-grouping semantics are unchanged
        return pa.table(
            {
                "h": pa.array(hn[first_idx], pa.uint64()),
                "url": gn["url"],
                "root_h": pa.array(root.view(np.int64), pa.int64()),
            }
        )

    def tag_nodes(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "part": b["part"], "h": b["h"],
                "v": pa.nulls(len(b), pa.uint64()), "url": b["url"],
            }
        )

    def tag_labels(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "part": b["part"], "h": b["h"],
                "v": b["v"], "url": pa.nulls(len(b), pa.string()),
            }
        )

    members = _part_join(
        nodes.map_batches(tag_nodes, batch_format="pyarrow"),
        labels.map_batches(tag_labels, batch_format="pyarrow"),
        member_pass,
    ).materialize()

    from ray.data.aggregate import Count

    roots = members.groupby("root_h").aggregate(
        Min("url", alias_name="cluster_id"),
        Count(alias_name="cluster_size"),
    )

    def tag_members2(b: pa.Table) -> pa.Table:
        rh = b["root_h"].to_numpy(zero_copy_only=False).view(np.uint64)
        n = len(b)
        return pa.table(
            {
                "part": pa.array((rh % PU).astype(np.int32), pa.int32()),
                "root_h": b["root_h"],
                "h": b["h"],
                "url": b["url"],
                "cluster_id": pa.nulls(n, pa.string()),
                "cluster_size": pa.nulls(n, pa.int64()),
            }
        )

    def tag_roots(b: pa.Table) -> pa.Table:
        rh = b["root_h"].to_numpy(zero_copy_only=False).view(np.uint64)
        n = len(b)
        return pa.table(
            {
                "part": pa.array((rh % PU).astype(np.int32), pa.int32()),
                "root_h": b["root_h"],
                "h": pa.nulls(n, pa.uint64()),
                "url": pa.nulls(n, pa.string()),
                "cluster_id": b["cluster_id"],
                "cluster_size": pa.array(
                    b["cluster_size"].to_numpy(zero_copy_only=False), pa.int64()
                ),
            }
        )

    def assign_pass(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        is_m = pc.is_valid(g["url"]).to_numpy(zero_copy_only=False)
        rh = g["root_h"].to_numpy(zero_copy_only=False)
        gr = g.filter(pa.array(~is_m))
        r_h = rh[~is_m]
        r_cid = np.asarray(gr["cluster_id"].to_pylist(), dtype=object)
        r_sz = gr["cluster_size"].to_numpy(zero_copy_only=False)
        order = np.argsort(r_h)
        r_h, r_cid, r_sz = r_h[order], r_cid[order], r_sz[order]
        gm = g.filter(pa.array(is_m))
        pos = np.searchsorted(r_h, rh[is_m])
        cols = {
            "url": gm["url"],
            "cluster_id": pa.array(r_cid[pos], pa.string()),
        }
        if full:
            cols = {
                "h": gm["h"],
                **cols,
                "cluster_size": pa.array(r_sz[pos].astype(np.int64), pa.int64()),
            }
        return pa.table(cols)

    return _part_join(
        members.map_batches(tag_members2, batch_format="pyarrow"),
        roots.map_batches(tag_roots, batch_format="pyarrow"),
        assign_pass,
    )
