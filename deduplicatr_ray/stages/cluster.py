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


class ClusterAssigner:
    """Actor-pool callable: resolves the broadcast mapping once per actor."""

    def __init__(self, mapping_ref) -> None:
        import ray

        mapping: dict[str, str] = ray.get(mapping_ref)
        self.mapping = mapping
        sizes = Counter(mapping.values())
        self.sizes = sizes

    def __call__(self, batch: pa.Table) -> pa.Table:
        mapping, sizes = self.mapping, self.sizes
        urls = batch["url"].to_pylist()
        cids = [mapping.get(u, u) for u in urls]
        return pa.table(
            {
                "url": batch["url"],
                "cluster_id": pa.array(cids, pa.string()),
                "cluster_size": pa.array(
                    [sizes.get(c, 1) for c in cids], pa.int64()
                ),
                "is_canonical": pa.array(
                    [u == c for u, c in zip(urls, cids)], pa.bool_()
                ),
            }
        )


def assign_clusters_stage(
    url_ds, mapping: dict[str, str], *, concurrency: int | tuple[int, int] = (2, 8)
):
    """Dataset with a ``url`` column + mapping -> CLUSTERS Dataset."""
    import ray

    ref = ray.put(mapping)
    return url_ds.select_columns(["url"]).map_batches(
        ClusterAssigner,
        fn_constructor_args=(ref,),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=8192,
        concurrency=concurrency,
        num_cpus=1,
    )
