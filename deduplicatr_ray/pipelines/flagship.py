"""Flagship near-duplicate pipeline (SURVEY.md §3.2).

read pages -> extract (stateless tasks) -> signatures (actor pool)
-> {LSH band shuffle -> verified near pairs} U {exact-hash pairs}
-> distinct -> union-find -> broadcast cluster assignment.

The signatures Dataset is the single compact derivative every downstream
branch consumes (text is dropped after the signature stage); with a
checkpoint dir it is persisted per-partition to Parquet (S4) and re-read,
otherwise materialized in the object store.

Pairs are streamed to the driver union-find via ``iter_batches`` — verified
duplicate pairs are orders of magnitude fewer than docs (SURVEY.md §4.3);
``distributed_components`` drops in behind the same mapping interface when
they are not.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from ..config import CANONICAL, DedupConfig
from ..stages.exact import exact_pairs_stage
from ..stages.extract import extract_stage
from ..stages.lsh import band_stage, candidate_pairs_stage, distinct_pairs_stage
from ..stages.signatures import signature_stage

__all__ = [
    "DedupResult",
    "signatures_from_pages",
    "pairs_from_signatures",
    "dedup_pipeline",
    "cluster_summary",
    "implied_pairs",
]


@dataclass
class DedupResult:
    clusters: Any          # Dataset (CLUSTERS schema)
    # Dataset (PAIRS schema, distinct). LAZY: consuming it re-executes the
    # signature prefix + band shuffle with full pair emission. Callers that
    # consume pairs more than once (or alongside clusters) should pass
    # checkpoint_dir= to the pipeline so pairs come off Parquet instead.
    pairs: Any
    stats: dict[str, Any] = field(default_factory=dict)
    _mapping: dict[str, str] | None = None

    @property
    def mapping(self) -> dict[str, str]:
        """url -> cluster_id for every clustered url (derived on demand from
        the clusters Dataset; test/report seam, not a pipeline stage)."""
        if self._mapping is None:
            tbl = (
                self.clusters.filter(expr="cluster_size > 1")
                .select_columns(["url", "cluster_id"])
                .to_pandas()
            )
            self._mapping = dict(zip(tbl["url"], tbl["cluster_id"]))
        return self._mapping


def default_sig_concurrency() -> tuple[int, int]:
    """Actor-pool sizing for the signature stage: min = 3/4 of cluster CPUs
    (Ray's autoscaler ramps too slowly from a small min — measured 2.3x
    slower at 32 CPUs with min=2), max = CPUs, headroom left for the
    upstream read/extract tasks."""
    import ray

    cpus = 8
    if ray.is_initialized():
        cpus = int(ray.cluster_resources().get("CPU", 8))
    # clamp to the cluster: at 1-2 CPUs a pool min of 2 would deadlock
    # against the upstream read/extract tasks
    lo, hi = min(max(2, (3 * cpus) // 4), max(1, cpus - 1)), cpus
    try:
        from ray.data.context import DataContext, ShuffleStrategy

        if DataContext.get_current().shuffle_strategy == ShuffleStrategy.HASH_SHUFFLE:
            # Hash-shuffle aggregator ACTORS pin CPUs for the whole run; a
            # pool min at 3/4 of the cluster deadlocks against them (observed
            # at 8 CPUs: 6 pool + 1 read + 2 aggregator CPUs > 8 and every
            # operator backpressures forever). Leave them headroom.
            lo = max(2, cpus // 2)
            hi = max(lo, cpus - max(2, cpus // 8))
    except ImportError:  # older ray without ShuffleStrategy
        pass
    hi = max(1, min(hi, cpus))
    lo = max(1, min(lo, hi, max(1, cpus - 1)))
    return (lo, hi)


def signatures_from_pages(
    pages,
    cfg: DedupConfig = CANONICAL,
    *,
    sig_concurrency: int | tuple[int, int] | None = None,
    sig_batch_size: int = 256,
):
    """pages -> SIGNATURES Dataset (extract fused upstream, lazy)."""
    extracted = extract_stage(pages)
    return signature_stage(
        extracted,
        cfg,
        batch_size=sig_batch_size,
        concurrency=sig_concurrency or default_sig_concurrency(),
    )


def pairs_from_signatures(sigs, cfg: DedupConfig = CANONICAL):
    """SIGNATURES -> distinct verified PAIRS (near + exact evidence, D7).

    Exact evidence rides the band shuffle via the EXACT_BAND_ID content
    band, so this is one all-to-all + distinct."""
    bands = band_stage(sigs, cfg)
    return distinct_pairs_stage(candidate_pairs_stage(bands, cfg))


def pairs_partitioned(
    sigs,
    cfg: DedupConfig = CANONICAL,
    *,
    checkpoint_dir: str,
    run_id: str = "run0",
    num_groups: int = 4,
):
    """PARTITION-LEVEL checkpointed pair stage (S5 past the signature
    prefix; r3 verdict item 7).

    The band-key space is sliced into ``num_groups`` deterministic resume
    groups (hash of (band_id, band_hash) mod G — independent of the
    cluster-sized shuffle partition count, so resume on a different
    cluster recomputes exactly the missing groups). Each group runs its
    own bounded band shuffle over the checkpointed signatures and lands
    in its own Parquet dir + manifest entry with per-group pair counts
    and throughput; a killed run recomputes only missing groups, and each
    group's shuffle working set is ~1/G of the whole — the bound that
    matters at 100 TB, where one giant pair shuffle would have to finish
    in one attempt.

    A pair discovered by bands in DIFFERENT groups appears in both group
    files (exactly like a pair discovered in two bands pre-dates the A4
    distinct), so the returned Dataset applies a final lazy distinct over
    the union; per-group files are already group-locally distinct.

    ``sigs`` is re-executed once per group — pass the CHECKPOINTED
    signature Dataset (a Parquet re-read), never a streaming plan.
    """
    import os
    import time

    import ray.data as rd

    from .checkpoint import CheckpointManager, _atomic_write

    mgr = CheckpointManager(checkpoint_dir, run_id, cfg)
    dirs = []
    for g in range(num_groups):
        key = f"pairs/group={g:04d}"
        out_dir = mgr.stage_dir(key)
        dirs.append(out_dir)
        done = mgr.entry(key)
        if done is not None:
            if done.get("num_groups") != num_groups:
                raise ValueError(
                    f"pairs checkpoint group layout mismatch: manifest has "
                    f"num_groups={done.get('num_groups')}, caller asked "
                    f"{num_groups} — use a new run_id"
                )
            # manifest entry without its Parquet dir (partial rsync, disk
            # cleanup) must RECOMPUTE, not silently drop the group's pairs
            # — same guard as state/incremental.spill_index
            if os.path.isdir(out_dir):
                continue
        t0 = time.monotonic()
        grp = distinct_pairs_stage(
            candidate_pairs_stage(
                band_stage(sigs, cfg), cfg, emit="all", part_select=(g, num_groups)
            )
        )
        rows = _atomic_write(grp, out_dir)
        wall = time.monotonic() - t0
        mgr.record(
            key,
            rows=rows,
            wall_sec=round(wall, 3),
            pairs_per_sec=round(rows / wall, 1) if wall > 0 else None,
            num_groups=num_groups,
        )
    part_files = [
        os.path.join(d, f)
        for d in dirs
        if os.path.isdir(d)
        for f in sorted(os.listdir(d))
        if f.endswith(".parquet")
    ]
    if not part_files:
        from ..stages.lsh import _EMPTY_PAIRS

        return rd.from_arrow(_EMPTY_PAIRS.drop_columns(["ha", "hb"]))
    # partitioning=None: the dir names are manifest keys ("group=0000"),
    # not hive partitions — inference would graft a stray "group" column
    return distinct_pairs_stage(rd.read_parquet(part_files, partitioning=None))


def dedup_pipeline(
    pages,
    cfg: DedupConfig = CANONICAL,
    *,
    sig_concurrency: int | tuple[int, int] | None = None,
    sig_batch_size: int = 256,
    checkpoint_dir: str | None = None,
    run_id: str = "run0",
    components: str = "auto",
) -> DedupResult:
    """Full flagship pipeline; returns clusters + distinct pairs + mapping.

    Without a checkpoint dir the signature stage is NOT materialized: the
    whole read -> extract -> signatures -> band shuffle -> forest chain runs
    as ONE streaming plan (no mid-pipeline barrier — the signature actors
    feed banding as blocks complete). The final cluster-assignment pass
    reads only the ``url``/``warc_ts`` columns from ``pages`` again (a
    column-pruned re-scan is far cheaper than a full-signature
    materialization barrier).
    """
    sigs = signatures_from_pages(
        pages, cfg, sig_concurrency=sig_concurrency, sig_batch_size=sig_batch_size
    )
    if checkpoint_dir is not None:
        from .checkpoint import checkpoint_dataset

        sigs = checkpoint_dataset(
            sigs, checkpoint_dir, stage="signatures", run_id=run_id, cfg=cfg
        )
    return cluster_from_signatures(
        sigs,
        cfg,
        checkpoint_dir=checkpoint_dir,
        run_id=run_id,
        url_source=_url_projection(pages),
        components=components,
    )


def _url_projection(pages):
    """pages -> (url, warc_ts) Dataset for the assignment pass (column-pruned:
    only these two columns leave storage on the re-scan)."""
    import pyarrow as pa

    cols = None
    try:
        cols = pages.schema(fetch_if_missing=False)
    except Exception:
        cols = None
    names = cols.names if cols is not None else None
    if names is not None and "warc_ts" not in names:
        return pages.select_columns(["url"])
    return pages.select_columns(["url", "warc_ts"])


def dedup_pipeline_partitioned(
    input_files: list[str],
    cfg: DedupConfig = CANONICAL,
    *,
    checkpoint_dir: str,
    run_id: str = "run0",
    num_partitions: int = 8,
    pairs_groups: int = 4,
    reader=None,
) -> DedupResult:
    """Flagship with a PARTITION-LEVEL checkpointed signature prefix (S5):
    each input-file group lands in its own Parquet dir + manifest entry with
    per-partition throughput AND exact-dup-rate metrics (BASELINE.json:6);
    a killed run recomputes only missing partitions. The pair stage past the
    prefix is checkpointed per band-key resume group the same way
    (``pairs_partitioned``; set ``pairs_groups=0`` for the old whole-stage
    pair checkpoint). ``reader`` defaults to ``read_parquet``; WARC/WET
    inputs are auto-detected by extension and routed through
    ``sources.warc.read_warc`` (one checkpointed partition per file
    group — the resumable Common Crawl ingest path)."""
    from .checkpoint import run_partitioned

    if reader is None and input_files and str(input_files[0]).endswith(
        (".warc", ".warc.gz", ".wet", ".wet.gz")
    ):
        from ..sources.warc import read_warc as reader

    def sig_metrics(ds) -> dict:
        import pyarrow.compute as pc

        shas = set()
        rows = 0
        for b in ds.iter_batches(batch_size=65536, batch_format="pyarrow"):
            rows += len(b)
            shas.update(pc.unique(b["text_sha1"]).to_pylist())
        return {
            "distinct_texts": len(shas),
            "exact_dup_rate": round(1 - len(shas) / rows, 4) if rows else 0.0,
        }

    sigs = run_partitioned(
        input_files,
        lambda ds: signatures_from_pages(ds, cfg),
        checkpoint_dir,
        stage="signatures",
        run_id=run_id,
        cfg=cfg,
        num_partitions=num_partitions,
        metrics_fn=sig_metrics,
        reader=reader,
    )
    return cluster_from_signatures(
        sigs,
        cfg,
        checkpoint_dir=checkpoint_dir,
        run_id=run_id,
        pairs_groups=pairs_groups,
    )


# auto-mode driver budget: above this forest-edge count, ``auto`` routes to
# the never-on-driver "shuffle" path instead of pulling 16 B/edge hash
# arrays (and broadcasting the clustered-doc key arrays) through the driver.
# 5M forest edges ~= 80 MB driver arrays + <=160 MB broadcast — comfortably
# inside one node; past it the driver/broadcast payloads grow linearly with
# dup content while the shuffle path stays O(corpus/P) per task (r3 verdict
# item 2). Read at call time so tests/configs can force the route.
def driver_edge_budget() -> int:
    import os

    return int(os.environ.get("GRAFT_DRIVER_EDGE_MAX", 5_000_000))


# import-time compat alias (historical knob name; prefer driver_edge_budget())
DRIVER_EDGE_MAX = driver_edge_budget()


def cluster_from_signatures(
    sigs,
    cfg: DedupConfig = CANONICAL,
    *,
    checkpoint_dir: str | None = None,
    run_id: str = "run0",
    url_source=None,
    components: str = "auto",
    pairs_groups: int | None = None,
) -> DedupResult:
    """SIGNATURES Dataset -> DedupResult (the pipeline tail after the
    checkpointable signature prefix).

    Edge source: forest-mode band pairs (O(m) per hot band instead of
    O(m^2)) + exact star pairs, a distributed connectivity-preserving
    forest reduction of the near stream, components over hashed edges,
    fused broadcast assignment. The A4 distinct pass stays OFF the
    critical path (union-find is idempotent over duplicate edges).

    The clustering band shuffle is KEY-ONLY (``band_stage(keys_only=True)``):
    url strings never enter the all-to-all — band rows carry the uint64 url
    hash, pairs come out as ``(ha, hb)`` edges, and canonical min-urls are
    reduced from the corpus at assignment time
    (``assign_clusters_corpus_roots``). Cluster membership and canonical
    urls are identical to the url-bearing reporting path.

    ``components`` selects the A6 implementation:

    * ``"driver"`` / ``"hashes"`` — driver pulls ONLY uint64 edge hashes
      (16 B/edge) and runs numpy min-label propagation; canonical min-url
      per component is reduced DISTRIBUTEDLY from the corpus, so no url
      strings ever land on the driver (the two names are kept for
      config/test compat — the key-only path made them the same
      implementation);
    * ``"shuffle"`` — NOTHING touches the driver, over the SAME keys-only
      edges: min-label propagation rounds (``distributed_labels``) +
      hash-partitioned shuffle joins that recover canonical min-urls from
      the corpus (``assign_clusters_shuffle_labels``). No url strings in
      any shuffle, no broadcast, no driver edge pull — the 10^9+-edge
      path;
    * ``"distributed"`` — the url-bearing never-on-driver variant
      (``distributed_components`` + ``assign_clusters_shuffle``): member
      urls ride the band shuffle instead of being recovered from the
      corpus. Kept as explicit opt-in (costs a url-bearing all-to-all);
    * ``"auto"`` — driver when the materialized forest-edge count is
      within ``driver_edge_budget()`` (env ``GRAFT_DRIVER_EDGE_MAX``,
      default 5M), else ``shuffle``.

    The reporting ``pairs`` artifact is lazy and built from an
    ``emit="all"`` pass — it is the FULL verified-pair set (D3/D4
    semantics), not the clustering forest; consuming it re-runs the band
    shuffle with full pair emission (and re-executes the signature prefix
    when ``sigs`` is a streaming plan).
    """
    from ..state.unionfind import (
        components_hashes,
        forest_reduce_stage,
    )
    from ..stages.cluster import assign_clusters_corpus_roots

    url_ds = (
        url_source if url_source is not None else sigs.select_columns(["url"])
    )
    # full verified-pair reporting artifact (ADVICE r1: forest edges are
    # connectivity-equivalent but NOT the documented pairs semantics)
    if checkpoint_dir is not None and pairs_groups:
        # partition-level pair checkpoints: a killed run recomputes only
        # the missing band-key resume groups (r3 verdict item 7)
        pairs = pairs_partitioned(
            sigs,
            cfg,
            checkpoint_dir=checkpoint_dir,
            run_id=run_id,
            num_groups=pairs_groups,
        )
    else:
        pairs = distinct_pairs_stage(
            candidate_pairs_stage(band_stage(sigs, cfg), cfg, emit="all")
        )
        if checkpoint_dir is not None:
            from .checkpoint import checkpoint_dataset

            pairs = checkpoint_dataset(
                pairs, checkpoint_dir, stage="pairs", run_id=run_id, cfg=cfg
            )

    mode = components
    if mode == "distributed":
        import numpy as np

        from ..state.unionfind import distributed_components
        from ..stages.cluster import assign_clusters_shuffle
        from ..stages.lsh import default_num_partitions

        # the never-on-driver path needs member URLS in its node table, so
        # it derives its edges from the url-bearing band mode directly —
        # ONE signature pass + band shuffle (building the keys-only forest
        # first would re-execute the whole streaming prefix a second time)
        url_edges = forest_reduce_stage(
            candidate_pairs_stage(band_stage(sigs, cfg), cfg, emit="forest")
        ).materialize()
        n_edges = url_edges.count()
        # partition heuristic shared with training_export: every groupby
        # partition costs fixed task/shuffle overhead PER PROPAGATION
        # ROUND, so small edge sets get few partitions and the overhead
        # amortizes only where the data justifies it (~250k edges/part)
        P = int(
            np.clip(n_edges // 250_000 + 4, 4, default_num_partitions())
        )
        members = distributed_components(
            url_edges, full=True, num_partitions=P
        ).materialize()
        clusters = assign_clusters_shuffle(url_ds, members, num_partitions=P)

        # one row per cluster has url == cluster_id (the lexicographic-min
        # member), so counting clusters is a row-local pass over the
        # materialized members — no extra groupby shuffle
        def _count_roots(b):
            import pyarrow as pa
            import pyarrow.compute as pc

            n = pc.sum(pc.equal(b["url"], b["cluster_id"])).as_py() or 0
            return pa.table({"n": pa.array([int(n)], pa.int64())})

        n_clusters = int(
            members.map_batches(
                _count_roots, batch_format="pyarrow", zero_copy_batch=True
            ).sum("n")
            or 0
        )
        docs_in_clusters = members.count()
    elif mode in ("auto", "driver", "hashes", "shuffle"):
        bands = band_stage(sigs, cfg, keys_only=True)
        forest_pairs = candidate_pairs_stage(bands, cfg, emit="forest")
        # ONE band shuffle carries near + exact evidence (EXACT_BAND_ID
        # rows); the forest reduction dedups near edges repeated across
        # the 32 bands. Materialized once: consumed by driver components
        # AND the roots reduce (or by the distributed label rounds).
        edge_src = forest_reduce_stage(forest_pairs).materialize()
        n_edges = edge_src.count()
        if mode == "auto":
            mode = "driver" if n_edges <= driver_edge_budget() else "shuffle"
        if mode == "shuffle":
            # never-on-driver tail over the SAME keys-only edges: label
            # propagation rounds + shuffle-join assignment — no 16 B/edge
            # driver pull, no (keys, root_h) broadcast (r3 verdict item 2)
            import numpy as np

            from ..state.unionfind import distributed_labels
            from ..stages.cluster import assign_clusters_shuffle_labels
            from ..stages.lsh import default_num_partitions

            P = int(
                np.clip(n_edges // 250_000 + 4, 4, default_num_partitions())
            )
            labels = distributed_labels(edge_src, num_partitions=P)
            clusters, n_clusters, docs_in_clusters = (
                assign_clusters_shuffle_labels(url_ds, labels, num_partitions=P)
            )
        else:
            # driver holds uint64 arrays only (16 B/edge); min-url per
            # component is a distributed corpus reduce + ONE fused broadcast
            # assignment (J1)
            keys, root_h = components_hashes(edge_src)
            clusters, n_clusters = assign_clusters_corpus_roots(
                url_ds, keys, root_h
            )
            docs_in_clusters = int(len(keys))
    else:
        raise ValueError(f"unknown components mode: {components!r}")
    if checkpoint_dir is not None:
        from .checkpoint import checkpoint_dataset

        clusters = checkpoint_dataset(
            clusters, checkpoint_dir, stage="clusters", run_id=run_id, cfg=cfg
        )

    stats = {
        "docs_in_clusters": docs_in_clusters,
        "n_clusters": n_clusters,
        "n_forest_edges": int(n_edges),
        "components_mode": mode,
        "config_hash": cfg.config_hash(),
    }
    return DedupResult(clusters=clusters, pairs=pairs, stats=stats)


def cluster_summary(clusters):
    """A1 analog of the reference's commutative dir-summary accumulation:
    one row per cluster with member count + canonical url (+ most recent
    ``warc_ts`` as ``last_seen_ts`` recency metadata when the clusters
    table carries timestamps), sorted desc."""
    from ray.data.aggregate import Count, Max, Min

    aggs = [Count(alias_name="members"), Min("url", alias_name="canonical_url")]
    try:
        names = clusters.schema().names
    except Exception:
        names = []
    if "warc_ts" in names:
        aggs.append(Max("warc_ts", alias_name="last_seen_ts"))
    return (
        clusters.groupby("cluster_id")
        .aggregate(*aggs)
        .sort("members", descending=True)
    )


def implied_pairs(mapping: dict[str, str]) -> set[tuple[str, str]]:
    """All within-cluster pairs implied by a mapping (for recall accounting)."""
    from collections import defaultdict
    from itertools import combinations

    groups: dict[str, list[str]] = defaultdict(list)
    for url, cid in mapping.items():
        groups[cid].append(url)
    out: set[tuple[str, str]] = set()
    for members in groups.values():
        for a, b in combinations(sorted(members), 2):
            out.add((a, b))
    return out
