"""Tiered deduplication report — the standard web-corpus cleaning cascade
(exact -> near -> sub-document), each tier running only on the previous
tier's survivors, with per-tier removal accounting. This is the composed
"how much does each dedup tier buy" report every large-scale corpus paper
publishes (RefinedWeb table 2, Gopher/MassiveText appendix); the engine's
production stages are reused unchanged:

* tier 1 ``exact``  — CCNet canonical-form exact dedup
  (``canonical_dup_assign``: key-only 128-bit shuffle, keep min doc_id);
* tier 2 ``near``   — the flagship MinHash/SimHash near-dup pipeline
  (``dedup_pipeline``) over the exact survivors; a doc is removed when it
  is a non-representative member of a cluster (representative = the
  cluster_id, i.e. min url — deterministic);
* tier 3 ``window`` — C4-style fixed-token-window span accounting
  (``window_dedup_stage``) over the near survivors; a doc is removed when
  more than ``window_dup_frac`` of its windows duplicate earlier corpus
  content (the "mostly duplicated residue" the first two tiers miss).

Survivor sets are carried as datasets and filtered with the engine's
``semi_join_auto`` (keep-id broadcast below the key budget, streaming
hash join past it — never an UNBOUNDED driver-side id list); the only
driver state is the per-tier COUNTS. Tier boundaries materialize the
survivor dataset because each tier both counts it and feeds it on — a
checkpointed production run would write each tier's survivors to
partitioned Parquet instead (``pipelines/checkpoint.py``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def dedup_tiers(
    docs,
    *,
    window: int = 25,
    window_dup_frac: float = 0.5,
    num_partitions: int | None = None,
):
    """``docs`` (doc_id, text, lang) -> 3-row Arrow table
    ``tier, docs_in, docs_removed, docs_out`` for the exact -> near ->
    window cascade."""
    import pyarrow.compute as pc

    from ..sources.pages import _docs_to_pages_batch
    from ..stages.relational import semi_join_auto
    from ..stages.textstats import canonical_dup_assign, window_dedup_stage
    from .flagship import dedup_pipeline

    docs = docs.materialize()
    n0 = docs.count()

    # ---- tier 1: exact (canonical form) --------------------------------
    def keep_self(b: pa.Table) -> pa.Table:
        keep = pc.equal(b["doc_id"], b["canonical_id"])
        return pa.table({"keep_id": b.filter(keep)["doc_id"]})

    keep1 = canonical_dup_assign(
        docs, num_partitions=num_partitions
    ).map_batches(keep_self, batch_format="pyarrow", zero_copy_batch=True)
    s1 = semi_join_auto(
        docs, keep1, on="doc_id", right_on="keep_id",
        num_partitions=num_partitions,
    ).materialize()
    n1 = s1.count()

    # ---- tier 2: near (flagship MinHash/SimHash over survivors) --------
    pages = s1.map_batches(
        _docs_to_pages_batch, batch_format="pyarrow", zero_copy_batch=True
    )
    clusters = dedup_pipeline(pages).clusters

    def keep_reps(b: pa.Table) -> pa.Table:
        """Survivors: unclustered docs + each cluster's representative
        (cluster_id == min member url). url -> doc_id by prefix strip."""
        keep = pc.or_kleene(
            pc.is_null(b["cluster_id"]),
            pc.equal(b["url"], b["cluster_id"]),
        )
        kept = b.filter(pc.fill_null(keep, True))
        ids = pc.cast(
            pc.utf8_slice_codeunits(kept["url"], len("doc://")), pa.int64()
        )
        return pa.table({"keep_id": ids})

    keep2 = clusters.map_batches(
        keep_reps, batch_format="pyarrow", zero_copy_batch=True
    )
    s2 = semi_join_auto(
        s1, keep2, on="doc_id", right_on="keep_id",
        num_partitions=num_partitions,
    ).materialize()
    n2 = s2.count()

    # ---- tier 3: window (C4 span accounting over near survivors) -------
    wd = window_dedup_stage(s2, window=window, num_partitions=num_partitions)

    def count_removed(b: pa.Table) -> pa.Table:
        dup = b["dup_windows"].to_numpy(zero_copy_only=False)
        tot = b["n_windows"].to_numpy(zero_copy_only=False)
        removed = int((dup > window_dup_frac * tot).sum())
        return pa.table({"removed": pa.array([removed], pa.int64())})

    removed3 = sum(
        r["removed"]
        for r in wd.map_batches(
            count_removed, batch_format="pyarrow", zero_copy_batch=True
        ).take_all()
    )
    n3 = n2 - removed3

    return pa.table(
        {
            "tier": pa.array(["1_exact", "2_near", "3_window"], pa.string()),
            "docs_in": pa.array([n0, n1, n2], pa.int64()),
            "docs_removed": pa.array(
                [n0 - n1, n1 - n2, removed3], pa.int64()
            ),
            "docs_out": pa.array([n1, n2, n3], pa.int64()),
        }
    )
