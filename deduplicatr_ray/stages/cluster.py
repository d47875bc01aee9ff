"""Cluster assignment (J1): broadcast-small-side join.

The union-find mapping contains ONLY urls that appear in at least one
verified pair — orders of magnitude smaller than the corpus — so it is
shipped once via ``ray.put`` and looked up per batch inside ``map_batches``
(no shuffle join; SURVEY.md §2.4 J1). Urls absent from the mapping are their
own singleton cluster.
"""

from __future__ import annotations

from collections import Counter

import pyarrow as pa


def _assign_fn(batch: pa.Table, *, maps_ref, roots_ref) -> pa.Table:
    """Fused label+finalize: url -> (cluster_id, size) in ONE pass.

    Both lookups are searchsorted over broadcast numpy arrays (zero-copy
    ``ray.get`` per batch); rows outside any component are their own
    singleton cluster."""
    import numpy as np
    import ray

    from ..functions.hashing import hash_columns_u64

    keys, root_h = ray.get(maps_ref)
    roots, root_urls, root_sizes = ray.get(roots_ref)
    root_urls = np.asarray(root_urls, dtype=object)

    n = len(batch)
    urls = np.asarray(batch["url"].to_pylist(), dtype=object)
    cids = urls.copy()
    sizes = np.ones(n, dtype=np.int64)
    if len(keys):
        h = hash_columns_u64(batch, ["url"])
        pos = np.minimum(np.searchsorted(keys, h), len(keys) - 1)
        matched = keys[pos] == h
        if matched.any():
            r = root_h[pos[matched]]
            rpos = np.searchsorted(roots, r)
            cids[matched] = root_urls[rpos]
            sizes[matched] = root_sizes[rpos]
    cols = {
        "url": batch["url"],
        "cluster_id": pa.array(cids, pa.string()),
        "cluster_size": pa.array(sizes, pa.int64()),
        "is_canonical": pa.array(urls == cids, pa.bool_()),
    }
    if "warc_ts" in batch.column_names:  # recency metadata rides along (§2.8)
        cols["warc_ts"] = batch["warc_ts"]
    return pa.table(cols)


def assign_clusters_distributed(url_ds, keys, root_h, edge_src=None):
    """(url Dataset, component hash maps, edges) -> (CLUSTERS Dataset, n).

    Canonical min-url per component is reduced DISTRIBUTEDLY over the edge
    list (every member appears in >= 1 edge, so the edge-endpoint min equals
    the member min); component sizes come from the driver's label array
    (np.unique counts). Assignment is then ONE fused broadcast pass over the
    corpus — no intermediate labeled materialization.

    The root-table broadcast assumes n_clusters fits the driver (true by
    orders of magnitude); at extreme cluster counts swap the final pass for
    a hash join on root_h — same plan shape.
    """
    import numpy as np
    import ray
    from ray.data.aggregate import Min

    if len(keys) == 0 or edge_src is None:
        roots_payload = (np.empty(0, np.uint64), [], np.empty(0, np.int64))
        n_clusters = 0
    else:
        ref1 = ray.put((keys, root_h))

        def edge_root_urls(b: pa.Table) -> pa.Table:
            keys_, root_ = ray.get(ref1)
            ra = root_[np.searchsorted(keys_, b["ha"].to_numpy(zero_copy_only=False))]
            rb = root_[np.searchsorted(keys_, b["hb"].to_numpy(zero_copy_only=False))]
            # int64 bit-pattern view: Ray's aggregate builds partial outputs
            # as Python ints, and uint64 values > 2^63 would overflow the
            # int64 conversion and silently fall back to PICKLED object
            # blocks (same trick as distributed_components)
            return pa.table(
                {
                    "root_h": pa.array(
                        np.concatenate([ra, rb]).view(np.int64), pa.int64()
                    ),
                    "url": pa.chunked_array(
                        [b["url_a"], b["url_b"]]
                    ).combine_chunks(),
                }
            )

        roots_tbl = (
            edge_src.map_batches(
                edge_root_urls, batch_format="pyarrow", zero_copy_batch=True
            )
            .groupby("root_h")
            .aggregate(Min("url", alias_name="cluster_id"))
            .to_pandas()
        )
        rh = roots_tbl["root_h"].to_numpy(np.int64).view(np.uint64)
        order = np.argsort(rh, kind="stable")  # _assign_fn needs uint64 order
        rh = rh[order]
        uroots, counts = np.unique(root_h, return_counts=True)
        sz = counts[np.searchsorted(uroots, rh)]
        roots_payload = (
            rh,
            roots_tbl["cluster_id"].to_numpy()[order].tolist(),
            sz.astype(np.int64),
        )
        n_clusters = len(roots_tbl)

    ref1b = ray.put((keys, root_h))
    ref2 = ray.put(roots_payload)
    clusters = url_ds.map_batches(
        _assign_fn,
        fn_kwargs={"maps_ref": ref1b, "roots_ref": ref2},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=16384,
    )
    return clusters, n_clusters


def assign_clusters_corpus_roots(url_ds, keys, root_h):
    """(url Dataset, component hash maps) -> (CLUSTERS Dataset, n_clusters).

    The key-only clustering path's assignment: edges carried NO url strings
    through the band all-to-all (``band_stage(keys_only=True)``), so the
    canonical min-url per component is reduced from the CORPUS — one
    column-pruned pass labels each url with its component root via the
    broadcast ``(keys, root_h)`` arrays, matched rows feed a distributed
    ``groupby(root).Min(url)`` (shuffles only clustered docs, bounded by the
    dup rate), and the resulting small root table is broadcast back into ONE
    fused assignment pass. Cluster membership and canonical urls are
    IDENTICAL to the url-bearing path: same components, same min over the
    same member urls.

    Component sizes come from the driver's label array (distinct member
    hashes per root) — no extra aggregate.
    """
    import numpy as np
    import ray
    from ray.data.aggregate import Min

    from ..functions.hashing import hash_columns_u64

    if len(keys) == 0:
        roots_payload = (np.empty(0, np.uint64), [], np.empty(0, np.int64))
        ref1 = ray.put((keys, root_h))
        ref2 = ray.put(roots_payload)
        clusters = url_ds.map_batches(
            _assign_fn,
            fn_kwargs={"maps_ref": ref1, "roots_ref": ref2},
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=16384,
        )
        return clusters, 0

    ref1 = ray.put((keys, root_h))

    def member_root_urls(b: pa.Table) -> pa.Table:
        import numpy as np

        keys_, root_ = ray.get(ref1)
        h = hash_columns_u64(b, ["url"])
        pos = np.minimum(np.searchsorted(keys_, h), len(keys_) - 1)
        matched = keys_[pos] == h
        take = pa.array(np.flatnonzero(matched), pa.int64())
        # int64 bit-pattern view — keeps Ray's groupby partials off the
        # pickled-object fallback for uint64 keys > 2^63 (see
        # edge_root_urls / distributed_components)
        return pa.table(
            {
                "root_h": pa.array(
                    root_[pos[matched]].view(np.int64), pa.int64()
                ),
                "url": b["url"].take(take),
            }
        )

    roots_tbl = (
        url_ds.select_columns(["url"])
        .map_batches(member_root_urls, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("root_h")
        .aggregate(Min("url", alias_name="cluster_id"))
        .to_pandas()
    )
    rh = roots_tbl["root_h"].to_numpy(np.int64).view(np.uint64)
    order = np.argsort(rh, kind="stable")  # _assign_fn needs uint64 order
    rh = rh[order]
    uroots, counts = np.unique(root_h, return_counts=True)
    sz = counts[np.searchsorted(uroots, rh)]
    roots_payload = (
        rh,
        roots_tbl["cluster_id"].to_numpy()[order].tolist(),
        sz.astype(np.int64),
    )
    ref2 = ray.put(roots_payload)
    clusters = url_ds.map_batches(
        _assign_fn,
        fn_kwargs={"maps_ref": ref1, "roots_ref": ref2},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=16384,
    )
    return clusters, len(roots_tbl)


def assign_clusters_shuffle_labels(url_ds, labels, *, num_partitions: int | None = None):
    """Never-on-driver assignment from KEYS-ONLY component labels.

    ``labels`` is ``distributed_labels`` output over hash-only edges —
    ``(part, h uint64, v uint64=root)``, no url strings anywhere. The url
    strings the cluster ids need are recovered from the CORPUS, entirely
    with hash-partitioned shuffle joins (no ``ray.put`` broadcast, no
    ``.to_pandas()`` root table — this is the piece the broadcast path
    ``assign_clusters_corpus_roots`` keeps on the driver):

    1. co-partition corpus urls with labels by ``hash(url) % P``; matched
       rows become the member table ``(h, root_h, url)`` — bounded by
       clustered-doc count, not corpus size;
    2. distributed ``groupby(root_h) -> (Min(url), Count)`` root table;
    3. co-partition members with roots by ``root_h % P`` to attach
       ``(cluster_id, cluster_size)``;
    4. ``assign_clusters_shuffle`` joins the corpus against the resolved
       members (urls absent from the member table are singletons).

    Returns ``(clusters Dataset, n_clusters, docs_in_clusters)``.
    """
    import numpy as np
    from ray.data.aggregate import Count, Min

    from ..functions.hashing import hash_columns_u64
    from ..stages.lsh import default_num_partitions

    P = int(num_partitions or default_num_partitions())
    PU = np.uint64(P)

    # ---- pass 1: member urls via corpus x labels co-partition join ----
    def tag_corpus(b: pa.Table) -> pa.Table:
        h = hash_columns_u64(b, ["url"])
        return pa.table(
            {
                "part": pa.array((h % PU).astype(np.int32), pa.int32()),
                "h": pa.array(h, pa.uint64()),
                "v": pa.nulls(len(b), pa.uint64()),
                "url": b["url"],
            }
        )

    def tag_labels(b: pa.Table) -> pa.Table:
        # recompute the partition from h with THIS call's P — the labels'
        # own part column was computed with distributed_labels' partition
        # count, and reusing it verbatim silently empties the join
        # whenever the two counts differ (e.g. cluster resized between
        # the component pass and the assignment pass)
        h = b["h"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.table(
            {
                "part": pa.array((h % PU).astype(np.int32), pa.int32()),
                "h": b["h"],
                "v": b["v"],
                "url": pa.nulls(len(b), pa.string()),
            }
        )

    def member_join(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        is_c = pc.is_valid(g["url"]).to_numpy(zero_copy_only=False)
        h = g["h"].to_numpy(zero_copy_only=False)
        l_h, l_root = h[~is_c], g["v"].to_numpy(zero_copy_only=False)[~is_c]
        order = np.argsort(l_h)
        l_h, l_root = l_h[order], l_root[order]
        gc = g.filter(pa.array(is_c))
        c_h = h[is_c]
        if len(l_h):
            pos = np.minimum(np.searchsorted(l_h, c_h), len(l_h) - 1)
            hit = l_h[pos] == c_h
        else:
            pos = np.zeros(len(c_h), np.int64)
            hit = np.zeros(len(c_h), bool)
        take = pa.array(np.flatnonzero(hit), pa.int64())
        # int64 bit-view keeps the root groupby off the uint64 pickled-
        # object fallback (same trick as distributed_components)
        return pa.table(
            {
                "h": pa.array(c_h[hit], pa.uint64()),
                "root_h": pa.array(l_root[pos[hit]].view(np.int64), pa.int64()),
                "url": gc["url"].take(take),
            }
        )

    members = (
        url_ds.select_columns(["url"])
        .map_batches(tag_corpus, batch_format="pyarrow", zero_copy_batch=True)
        .union(labels.map_batches(tag_labels, batch_format="pyarrow"))
        .groupby("part")
        .map_groups(member_join, batch_format="pyarrow")
        .materialize()  # small: clustered docs only; consumed twice below
    )
    docs_in_clusters = members.count()

    # ---- pass 2: distributed root table (min url + size per component) ----
    roots = (
        members.groupby("root_h")
        .aggregate(Min("url", alias_name="cluster_id"), Count(alias_name="cluster_size"))
        .materialize()
    )
    n_clusters = roots.count()

    # ---- pass 3: attach (cluster_id, size) to members by root_h % P ----
    def tag_members(b: pa.Table) -> pa.Table:
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

    def root_join(g: pa.Table) -> pa.Table:
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
        pos = np.searchsorted(r_h, rh[is_m])  # every member root is in roots
        return pa.table(
            {
                "h": gm["h"],
                "url": gm["url"],
                "cluster_id": pa.array(r_cid[pos], pa.string()),
                "cluster_size": pa.array(r_sz[pos].astype(np.int64), pa.int64()),
            }
        )

    members2 = (
        members.map_batches(tag_members, batch_format="pyarrow", zero_copy_batch=True)
        .union(roots.map_batches(tag_roots, batch_format="pyarrow"))
        .groupby("part")
        .map_groups(root_join, batch_format="pyarrow")
    )

    # ---- pass 4: corpus assignment (singletons fall out of the join) ----
    clusters = assign_clusters_shuffle(url_ds, members2, num_partitions=P)
    return clusters, n_clusters, docs_in_clusters


def assign_clusters_shuffle(url_ds, members, *, num_partitions: int | None = None):
    """Never-on-driver corpus assignment: hash-partitioned shuffle join.

    ``members`` is ``distributed_components(..., full=True)`` output —
    ``(h uint64, url, cluster_id, cluster_size)`` for every url in a
    verified pair. Corpus rows and member rows are co-partitioned by
    ``hash(url) % P`` (corpus side recomputes the same
    ``hash_columns_u64`` the pair stage used) and joined per partition
    with one sorted uint64 ``searchsorted`` — one Python call per
    PARTITION, vectorized inside, no broadcast, no driver pull. Urls
    absent from ``members`` are their own singleton cluster.

    This is the 10^12-doc path: the broadcast assigners above assume the
    member table fits every worker's heap; this one only assumes a sane
    partition count.
    """
    import numpy as np
    import ray

    from ..functions.hashing import hash_columns_u64
    from ..stages.lsh import default_num_partitions

    P = int(num_partitions or default_num_partitions())
    PU = np.uint64(P)
    try:
        has_ts = "warc_ts" in url_ds.schema().names
    except Exception:
        has_ts = False

    def tag_corpus(b: pa.Table) -> pa.Table:
        h = hash_columns_u64(b, ["url"])
        n = len(b)
        return pa.table(
            {
                "part": pa.array((h % PU).astype(np.int32), pa.int32()),
                "h": pa.array(h, pa.uint64()),
                "url": b["url"],
                "cluster_id": pa.nulls(n, pa.string()),
                "cluster_size": pa.nulls(n, pa.int64()),
                "warc_ts": (
                    b["warc_ts"] if has_ts else pa.nulls(n, pa.timestamp("us"))
                ),
            }
        )

    def tag_members(b: pa.Table) -> pa.Table:
        h = b["h"].to_numpy(zero_copy_only=False)
        n = len(b)
        return pa.table(
            {
                "part": pa.array((h % PU).astype(np.int32), pa.int32()),
                "h": b["h"],
                "url": pa.nulls(n, pa.string()),
                "cluster_id": b["cluster_id"],
                "cluster_size": b["cluster_size"],
                "warc_ts": pa.nulls(n, pa.timestamp("us")),
            }
        )

    def join_part(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        is_c = pc.is_valid(g["url"]).to_numpy(zero_copy_only=False)
        h = g["h"].to_numpy(zero_copy_only=False)
        gm = g.filter(pa.array(~is_c))
        m_h = h[~is_c]
        m_cid = np.asarray(gm["cluster_id"].to_pylist(), dtype=object)
        m_sz = gm["cluster_size"].to_numpy(zero_copy_only=False)
        order = np.argsort(m_h)
        m_h, m_cid, m_sz = m_h[order], m_cid[order], m_sz[order]
        gc = g.filter(pa.array(is_c))
        c_h = h[is_c]
        urls = np.asarray(gc["url"].to_pylist(), dtype=object)
        cids = urls.copy()
        sizes = np.ones(len(c_h), dtype=np.int64)
        if len(m_h):
            pos = np.minimum(np.searchsorted(m_h, c_h), len(m_h) - 1)
            hit = m_h[pos] == c_h
            cids[hit] = m_cid[pos[hit]]
            sizes[hit] = m_sz[pos[hit]].astype(np.int64)
        cols = {
            "url": gc["url"],
            "cluster_id": pa.array(cids, pa.string()),
            "cluster_size": pa.array(sizes, pa.int64()),
            "is_canonical": pa.array(urls == cids, pa.bool_()),
        }
        if has_ts:
            cols["warc_ts"] = gc["warc_ts"]
        return pa.table(cols)

    corpus = url_ds.map_batches(
        tag_corpus, batch_format="pyarrow", zero_copy_batch=True
    )
    mem = members.map_batches(
        tag_members, batch_format="pyarrow", zero_copy_batch=True
    )
    return corpus.union(mem).groupby("part").map_groups(
        join_part, batch_format="pyarrow"
    )
