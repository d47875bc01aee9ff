"""Generic relational operators the dedup pipelines (and their users)
compose: broadcast dimension joins and grouped top-k.

The reference has no relational layer (it is a single-tree CLI;
SURVEY.md §2.4's joins J1-J3 are its only join-shaped steps); these two
operators generalize the engine's existing patterns into reusable pieces:

* ``broadcast_join`` is the J1 pattern (``stages/cluster.py``
  ``_assign_fn``) made generic: the SMALL side is shipped to the object
  store once via ``ray.put`` and every map task probes it with a sorted
  numpy ``searchsorted`` lookup — a per-batch vectorized hash-join probe
  with NO shuffle of the big side. This is how dimension tables (nation,
  region, per-cluster metadata) must be joined at 100 TB: the fact table
  streams, the dimension broadcasts.
* ``grouped_top_k`` is the O1-O3 family per group (SQL
  ``row_number() OVER (PARTITION BY ... ORDER BY ...) <= k``): one
  hash-partitioned shuffle on the group key, then a per-partition
  vectorized rank kernel (Arrow sort + segment-relative numpy ranks — no
  per-group Python).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def pull_columns(ds, cols, *, drop_null: bool = False):
    """Materialize a SMALL dataset's columns to driver numpy arrays (one
    per name in ``cols``, empty int64 arrays when the dataset is empty).

    This is the shared first step of every broadcast tail (scrub slivers,
    keep-id sets): the CALLER enforces a row budget before invoking, so
    only sliver-sized data ever crosses the driver. ``drop_null`` removes
    null rows per batch (any null in ``cols`` drops the row) — required
    for integer keys, which otherwise decay to float NaN in numpy.
    """
    parts = []
    for b in ds.iter_batches(batch_format="pyarrow"):
        t = b.select(cols)
        if drop_null:
            t = t.drop_null()
        parts.append(
            tuple(t[c].to_numpy(zero_copy_only=False) for c in cols)
        )
    if not parts:
        return tuple(np.empty(0, np.int64) for _ in cols)
    return tuple(
        np.concatenate([p[i] for p in parts]) for i in range(len(cols))
    )


def broadcast_join(
    ds,
    small: pa.Table,
    *,
    key: str,
    small_key: str | None = None,
    columns: list[str] | None = None,
    how: str = "inner",
):
    """Join a (big, streaming) Dataset against a small in-memory Arrow table.

    ``small`` is put in the object store ONCE; each batch probes it via
    ``np.searchsorted`` over the sorted key array (exact, vectorized).
    ``how``: ``"inner"`` drops probe misses, ``"left"`` keeps them with
    null payloads. Keys must be unique in ``small`` (dimension-table
    contract; duplicate keys raise at build time).
    """
    import ray

    sk = small_key or key
    cols = columns or [c for c in small.column_names if c != sk]
    keys_np = small[sk].to_numpy(zero_copy_only=False)
    order = np.argsort(keys_np, kind="stable")
    keys_sorted = keys_np[order]
    if len(keys_sorted) > 1 and (keys_sorted[1:] == keys_sorted[:-1]).any():
        raise ValueError(f"broadcast_join: duplicate keys in small side {sk!r}")
    payload = small.select(cols).take(pa.array(order, pa.int64()))
    ref = ray.put((keys_sorted, payload))

    def probe(b: pa.Table) -> pa.Table:
        keys_s, pay = ray.get(ref)
        probe_np = b[key].to_numpy(zero_copy_only=False).astype(keys_s.dtype)
        pos = np.searchsorted(keys_s, probe_np)
        pos_c = np.minimum(pos, len(keys_s) - 1)
        hit = (
            (keys_s[pos_c] == probe_np)
            if len(keys_s)
            else np.zeros(len(b), np.bool_)
        )
        if how == "inner":
            b = b.filter(pa.array(hit))
            idx = pa.array(pos_c[hit], pa.int64())
            for c in cols:
                b = b.append_column(c, pay[c].take(idx))
            return b
        idx = pa.array(
            np.where(hit, pos_c, 0).astype(np.int64), pa.int64(), mask=~hit
        )
        for c in cols:
            b = b.append_column(c, pay[c].take(idx))
        return b

    return ds.map_batches(probe, batch_format="pyarrow", zero_copy_batch=True)


def grouped_quantiles(
    ds,
    *,
    by: str,
    value_col: str,
    qs: dict[str, float],
    num_partitions: int | None = None,
):
    """Exact per-group discrete quantiles: one row per ``by`` group with a
    column per entry of ``qs`` (name → quantile in [0,1]) plus ``n``.

    Discrete-quantile rule matches DuckDB ``quantile_disc``:
    ``sorted[max(0, ceil(q*n) - 1)]`` (verified empirically; no
    interpolation, so integer inputs stay integers and the result is
    order- and float-accumulation-free — oracle-hashable).

    One shuffle on the group key; per-partition kernel is an Arrow sort +
    vectorized per-group index arithmetic. Whole groups co-reside (the
    partitioning assumption); for billion-row single groups use a
    sketch-based quantile instead.
    """
    import pyarrow.compute as pc

    from ..functions.hashing import add_hash_part
    from .lsh import default_num_partitions

    P = num_partitions or default_num_partitions()

    def with_part(b: pa.Table) -> pa.Table:
        return add_hash_part(b, [by], P)

    def block(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["part"])
        n = len(g)
        if n == 0:
            cols = {by: g[by], "n": pa.array([], pa.int64())}
            for name in qs:
                cols[name] = pa.array([], g[value_col].type)
            return pa.table(cols)
        g = g.take(
            pc.sort_indices(
                g, sort_keys=[(by, "ascending"), (value_col, "ascending")]
            )
        )
        grp = g[by].combine_chunks()
        neq = pc.not_equal(grp.slice(1), grp.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        )
        starts = np.concatenate(([0], np.flatnonzero(neq) + 1))
        counts = np.diff(np.append(starts, n))
        vals = g[value_col]
        cols = {
            by: grp.take(pa.array(starts, pa.int64())),
            "n": pa.array(counts.astype(np.int64), pa.int64()),
        }
        for name, q in qs.items():
            idx = starts + np.maximum(
                0, np.ceil(np.float64(q) * counts).astype(np.int64) - 1
            )
            cols[name] = vals.take(pa.array(idx, pa.int64()))
        return pa.table(cols)

    return (
        ds.map_batches(with_part, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(block, batch_format="pyarrow")
    )


def stratified_sample(ds, *, by: str, id_col: str, rates: dict, default_mod: int = 8):
    """Deterministic per-stratum sampling: keep rows where
    ``id % rates[stratum]`` == 0 (``default_mod`` for unlisted strata).
    Content-stable (re-runs and resumes pick identical rows — the property
    random sampling breaks for checkpointed pipelines) and fully
    streaming: a vectorized modulo filter per batch, no shuffle, no state.
    Up-/down-weighting per stratum is the standard training-data mixture
    knob (e.g. re-balancing languages)."""
    import pyarrow.compute as pc

    def pick(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False)
        keys = b[by].to_pylist()
        mods = np.array([int(rates.get(k, default_mod)) for k in keys], np.int64)
        return b.filter(pa.array(ids % mods == 0))

    return ds.map_batches(pick, batch_format="pyarrow", zero_copy_batch=True)


def grouped_quantile_sketch(
    ds,
    *,
    by: str,
    value_col: str,
    qs: dict[str, float],
    summary_size: int = 4096,
    num_partitions: int | None = None,
):
    """Mergeable per-group quantile SUMMARY (bounded-state analog of
    ``grouped_quantiles``): each block reduces every group it holds to at
    most ``summary_size`` weighted points (equi-depth segments, segment
    median as representative), and one groupby merges the weighted points
    into discrete quantiles. State per (block, group) is O(summary_size)
    regardless of rows — the path for billion-row groups where the exact
    operator's whole-group-in-one-partition assumption breaks.

    Rank error is bounded by ceil(n_block/summary_size)/2 per contributing
    block (one merge level, so errors add across blocks, not compound).
    Blocks whose group fits ``summary_size`` contribute EXACT points with
    weight 1 — when that holds everywhere (verification scale) the output
    equals ``grouped_quantiles`` row-for-row and shares its SQL oracle;
    the trimmed path is unit-tested with a tolerance instead.

    Output: one row per group — ``by``, ``n`` (total weight = true row
    count), one column per ``qs`` entry.
    """
    import pyarrow.compute as pc

    from ..functions.hashing import add_hash_part
    from .lsh import default_num_partitions

    P = num_partitions or default_num_partitions()
    S = int(summary_size)

    def partial(b: pa.Table) -> pa.Table:
        n = len(b)
        vt = b[value_col].type
        if n == 0:
            return pa.table(
                {
                    by: b[by],
                    "v": pa.array([], vt),
                    "w": pa.array([], pa.int64()),
                }
            )
        b = b.take(
            pc.sort_indices(
                b, sort_keys=[(by, "ascending"), (value_col, "ascending")]
            )
        )
        grp = b[by].combine_chunks()
        neq = pc.not_equal(grp.slice(1), grp.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        )
        starts = np.concatenate(([0], np.flatnonzero(neq) + 1))
        ends = np.append(starts[1:], n)
        take_idx: list[np.ndarray] = []
        weights: list[np.ndarray] = []
        for s, e in zip(starts, ends):
            m = e - s
            if m <= S:
                take_idx.append(np.arange(s, e))
                weights.append(np.ones(m, np.int64))
            else:
                bounds = np.round(np.linspace(0, m, S + 1)).astype(np.int64)
                seg_w = np.diff(bounds)
                keep = seg_w > 0
                reps = s + (bounds[:-1] + bounds[1:] - 1) // 2
                take_idx.append(reps[keep])
                weights.append(seg_w[keep])
        idx = np.concatenate(take_idx)
        return pa.table(
            {
                by: grp.take(pa.array(idx, pa.int64())),
                "v": b[value_col].take(pa.array(idx, pa.int64())),
                "w": pa.array(np.concatenate(weights), pa.int64()),
            }
        )

    def with_part(b: pa.Table) -> pa.Table:
        return add_hash_part(b, [by], P)

    def block(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["part"])
        n = len(g)
        vt = g["v"].type
        if n == 0:
            cols = {by: g[by], "n": pa.array([], pa.int64())}
            for name in qs:
                cols[name] = pa.array([], vt)
            return pa.table(cols)
        g = g.take(
            pc.sort_indices(g, sort_keys=[(by, "ascending"), ("v", "ascending")])
        )
        grp = g[by].combine_chunks()
        neq = pc.not_equal(grp.slice(1), grp.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        )
        starts = np.concatenate(([0], np.flatnonzero(neq) + 1))
        ends = np.append(starts[1:], n)
        w = g["w"].to_numpy(zero_copy_only=False)
        cumw = np.cumsum(w)
        base = np.concatenate(([0], cumw[ends[:-1] - 1]))
        totals = cumw[ends - 1] - base
        cols = {
            by: grp.take(pa.array(starts, pa.int64())),
            "n": pa.array(totals.astype(np.int64), pa.int64()),
        }
        vals = g["v"]
        for name, q in qs.items():
            idx = np.empty(len(starts), np.int64)
            for gi, (s, e) in enumerate(zip(starts, ends)):
                target = max(1, int(np.ceil(np.float64(q) * totals[gi])))
                idx[gi] = s + np.searchsorted(
                    cumw[s:e] - base[gi], target, side="left"
                )
            cols[name] = vals.take(pa.array(idx, pa.int64()))
        return pa.table(cols)

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(with_part, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(block, batch_format="pyarrow")
    )


def grouped_top_k(
    ds,
    *,
    by: str,
    order_by: str,
    k: int,
    descending: bool = True,
    tie_by: str | None = None,
    num_partitions: int | None = None,
):
    """Top-``k`` rows per ``by`` group, ranked on ``order_by`` (ties broken
    deterministically by ``tie_by`` ascending). Appends an int64 ``rank``
    column (1-based). One shuffle on the group key; per-partition kernel is
    an Arrow sort + vectorized segment-relative ranks.
    """
    import pyarrow.compute as pc

    from ..functions.hashing import add_hash_part
    from .lsh import default_num_partitions

    P = num_partitions or default_num_partitions()
    direction = "descending" if descending else "ascending"

    def with_part(b: pa.Table) -> pa.Table:
        return add_hash_part(b, [by], P)

    def block(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["part"])
        n = len(g)
        if n == 0:
            return g.append_column("rank", pa.array([], pa.int64()))
        sort_keys = [(by, "ascending"), (order_by, direction)]
        if tie_by:
            sort_keys.append((tie_by, "ascending"))
        g = g.take(pc.sort_indices(g, sort_keys=sort_keys))
        grp = g[by].combine_chunks()
        neq = pc.not_equal(grp.slice(1), grp.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        )
        starts = np.concatenate(([0], np.flatnonzero(neq) + 1))
        seg = np.zeros(n, np.int64)
        seg[starts] = 1
        seg_id = np.cumsum(seg) - 1
        rank = np.arange(n, dtype=np.int64) - starts[seg_id] + 1
        keep = rank <= k
        return g.filter(pa.array(keep)).append_column(
            "rank", pa.array(rank[keep], pa.int64())
        )

    return (
        ds.map_batches(with_part, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(block, batch_format="pyarrow")
    )


def keyed_min_assign(
    ds,
    *,
    key: str,
    id_col: str = "doc_id",
    out_col: str = "canonical_id",
    size_col: str | None = None,
    num_partitions: int | None = None,
):
    """Every row -> min(``id_col``) of its ``key`` group (the A2/D1
    canonical-assignment shape: ``min(id) OVER (PARTITION BY key)``).

    One hash-partitioned shuffle on ``key``, then a per-partition
    vectorized segment-min (Arrow sort + numpy run starts). The naive
    ``groupby(key).map_groups(...)`` alternative costs one Python call per
    DISTINCT key — at web scale that is one call per unique document, so
    this is the only shape of this operator that survives 100 TB.

    ``size_col``: when set, also emit the group size per row
    (``count(*) OVER (PARTITION BY key)``) — same segment pass, zero extra
    shuffle. This is the SoftDeDup-style duplication-weight input: a doc's
    sampling weight is ``1 / |its exact-dup group|``.

    ``key`` must be non-null (it is always a derived hash/canonical-form
    column here); null keys would sort together at the end and silently
    form a group, so they are rejected up front.
    """
    import pyarrow.compute as pc

    from ..functions.hashing import add_hash_part
    from .lsh import default_num_partitions

    P = num_partitions or default_num_partitions()

    def with_part(b: pa.Table) -> pa.Table:
        if b[key].null_count:
            raise ValueError(
                f"keyed_min_assign: null values in key column {key!r}"
            )
        return add_hash_part(b, [key], P)

    def block(g: pa.Table) -> pa.Table:
        ids_t = g[id_col].type
        n = len(g)
        if n == 0:
            cols = {id_col: pa.array([], ids_t), out_col: pa.array([], ids_t)}
            if size_col:
                cols[size_col] = pa.array([], pa.int64())
            return pa.table(cols)
        g = g.take(
            pc.sort_indices(
                g, sort_keys=[(key, "ascending"), (id_col, "ascending")]
            )
        )
        kcol = g[key].combine_chunks()
        neq = pc.not_equal(kcol.slice(1), kcol.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        )
        starts = np.concatenate(([0], np.flatnonzero(neq) + 1))
        seg = np.zeros(n, np.int64)
        seg[starts] = 1
        seg_id = np.cumsum(seg) - 1
        ids = g[id_col].to_numpy(zero_copy_only=False)
        cols = {id_col: g[id_col], out_col: pa.array(ids[starts][seg_id], ids_t)}
        if size_col:
            sizes = np.diff(np.append(starts, n))
            cols[size_col] = pa.array(sizes[seg_id], pa.int64())
        return pa.table(cols)

    return (
        ds.map_batches(with_part, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(block, batch_format="pyarrow")
    )


def hash_semi_join(
    left,
    right,
    *,
    on: str,
    right_on: str | None = None,
    anti: bool = False,
    num_partitions: int | None = None,
):
    """Distributed semi/anti join (SQL ``EXISTS`` / ``NOT EXISTS``): keep
    the left rows whose key appears (semi) or does not appear (anti) in
    ``right``. Output columns = the left side's columns, unchanged.

    Scale shape: the right side is first reduced to DISTINCT keys — a
    per-batch Arrow dedup partial, then a combining groupby — so the
    exchange carries O(distinct keys per block), and join multiplicity can
    never inflate the left side. The filter itself is Ray's native
    hash-shuffle ``Dataset.join`` on the key (inner for semi, left_outer +
    null-probe for anti). Both sides stream; nothing is broadcast or
    driver-materialized, so either side may be arbitrarily large — use
    ``broadcast_join``-style probing instead when the right key set is
    known small.
    """
    from ray.data.aggregate import Count

    from .lsh import default_num_partitions

    rkey = right_on or on
    if rkey == on:
        raise ValueError(
            "left and right key columns must be named differently "
            f"(both {on!r}); rename one side first"
        )
    P = num_partitions or default_num_partitions()
    out_cols = left.columns()

    def distinct_partial(b: pa.Table) -> pa.Table:
        return b.select([rkey]).group_by(rkey).aggregate([])

    def mark(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                rkey: b[rkey],
                "__in_right": pa.array(np.ones(len(b), np.int8), pa.int8()),
            }
        )

    keys = (
        right.map_batches(
            distinct_partial, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby(rkey)
        .aggregate(Count(alias_name="__c"))
        .map_batches(mark, batch_format="pyarrow", zero_copy_batch=True)
    )
    if anti:
        import pyarrow.compute as pc

        def keep_missing(b: pa.Table) -> pa.Table:
            return b.filter(pc.is_null(b["__in_right"]))

        joined = left.join(keys, "left_outer", P, on=(on,), right_on=(rkey,))
        joined = joined.map_batches(
            keep_missing, batch_format="pyarrow", zero_copy_batch=True
        )
    else:
        joined = left.join(keys, "inner", P, on=(on,), right_on=(rkey,))
    return joined.select_columns(out_cols)


def semi_join_auto(
    left,
    right,
    *,
    on: str,
    right_on: str | None = None,
    anti: bool = False,
    num_partitions: int | None = None,
    broadcast_budget: int | None = None,
):
    """EXISTS / NOT EXISTS that picks its exchange by right-side size.

    Below ``broadcast_budget`` keys (env ``GRAFT_JOIN_BCAST_MAX``, default
    5M = one 40 MB sorted int64 array) the right side's distinct non-null
    keys are broadcast once via ``ray.put`` and the filter is one
    row-local ``map_batches`` — the left side (typically corpus text)
    never enters an all-to-all. Past the budget, the streaming
    :func:`hash_semi_join`. Results are identical by construction
    (sorted-array membership vs hash join on the same key; left NULL keys
    never match, as in SQL). This is the right shape when the left side
    is large and MOSTLY KEPT — a bloom prefilter can't shrink that
    exchange (nearly every row is a hit), a broadcast keep-set removes it.

    The budget decision is made on a shuffle-free per-batch dedup of the
    right side (sum of per-batch distinct counts — an upper bound on the
    global distinct count), so a right side emitted with per-partition
    duplicate keys does not spuriously trip the hash fallback. The reduced
    key set is materialized; keep the right side key-only.
    """
    import os

    import pyarrow.compute as pc
    import ray

    rkey = right_on or on
    if rkey == on:
        # the hash fallback needs distinct names (Ray join column clash);
        # enforce it on BOTH exchanges so behavior never depends on size
        raise ValueError(
            "left and right key columns must be named differently "
            f"(both {on!r}); rename one side first"
        )
    right = right.map_batches(
        lambda b: b.select([rkey]).group_by(rkey).aggregate([]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()
    budget = (
        broadcast_budget
        if broadcast_budget is not None
        else int(os.environ.get("GRAFT_JOIN_BCAST_MAX", 5_000_000))
    )
    if right.count() > budget:
        return hash_semi_join(
            left,
            right,
            on=on,
            right_on=right_on,
            anti=anti,
            num_partitions=num_partitions,
        )
    (raw,) = pull_columns(right, [rkey], drop_null=True)
    keys = np.unique(raw)
    ref = ray.put(keys)

    def flt(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return b
        ks = ray.get(ref)
        col = b[on]
        hit = np.zeros(len(b), bool)
        if len(ks):
            valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
            ids = pc.drop_null(col).to_numpy(zero_copy_only=False)
            pos = np.minimum(np.searchsorted(ks, ids), len(ks) - 1)
            hit[valid] = ks[pos] == ids  # NULL keys never match (SQL)
        return b.filter(pa.array(~hit if anti else hit))

    return left.map_batches(flt, batch_format="pyarrow", zero_copy_batch=True)


_BLOOM_SEEDS = np.array(
    [0x9E3779B97F4A7C15, 0xBF58476D1CE4E5B9, 0x94D049BB133111EB, 0xD6E8FEB86659FD93],
    dtype=np.uint64,
)


def _bloom_positions(h: np.ndarray, i: int, n_bits: int) -> np.ndarray:
    """i-th probe position for each key hash (splitmix64 re-mix per probe;
    identical on the build and probe sides by construction)."""
    from ..functions.hashing import splitmix64

    with np.errstate(over="ignore"):
        return (splitmix64(h ^ _BLOOM_SEEDS[i]) % np.uint64(n_bits)).astype(np.int64)


def build_bloom_bitmap(ds, key: str, *, n_bits: int, k_hashes: int) -> np.ndarray:
    """Distributed Bloom build over ``ds[key]``: one fixed-size bitmap per
    block (``n_bits/8`` bytes regardless of row count), OR-folded on the
    driver. Shared by ``bloom_semi_join`` and the decontamination bloom
    path — build and probe sides MUST use the same seeds/probe count."""
    from ..functions.hashing import hash_columns_u64

    def block_bloom(b: pa.Table) -> pa.Table:
        bm = np.zeros(n_bits >> 3, np.uint8)
        if len(b):
            h = hash_columns_u64(b, [key])
            for i in range(k_hashes):
                pos = _bloom_positions(h, i, n_bits)
                np.bitwise_or.at(
                    bm, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8)
                )
        return pa.table({"bloom": pa.array([bm.tobytes()], pa.large_binary())})

    bitmap = np.zeros(n_bits >> 3, np.uint8)
    for b in ds.map_batches(
        block_bloom, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_size=1, batch_format="pyarrow"):
        for buf in b["bloom"].to_pylist():
            bitmap |= np.frombuffer(buf, np.uint8)
    return bitmap


def bloom_probe(
    bitmap: np.ndarray, h: np.ndarray, *, n_bits: int, k_hashes: int
) -> np.ndarray:
    """Membership mask for key hashes ``h`` against a ``build_bloom_bitmap``
    bitmap (True = possible member, False = definite miss)."""
    hit = np.ones(len(h), bool)
    for i in range(k_hashes):
        pos = _bloom_positions(h, i, n_bits)
        bit = (bitmap[pos >> 3] >> (pos & 7).astype(np.uint8)) & np.uint8(1)
        hit &= bit.astype(bool)
    return hit


def bloom_semi_join(
    left,
    right,
    *,
    on: str,
    right_on: str | None = None,
    anti: bool = False,
    n_bits: int = 1 << 23,
    k_hashes: int = 3,
    num_partitions: int | None = None,
):
    """Bloom-prefiltered semi/anti join — EXACT results, shuffle reduced.

    The at-scale EXISTS pattern: a Bloom filter of the right side's keys is
    built distributedly (one fixed-size bitmap per block, OR-folded — the
    fold payload is ``n_bits/8`` bytes per block regardless of row count)
    and broadcast once via ``ray.put``. Left rows that MISS the filter are
    definitely not in ``right``: for semi they are dropped before the join
    shuffle; for anti they are emitted immediately. Only the bloom HITS —
    true matches plus the ~(1-e^(-kn/m))^k false-positive sliver — enter
    the exact ``hash_semi_join``, so results are identical to the exact
    join while the all-to-all carries only the matching fraction of the
    left side. Wins whenever the left side is much larger than its
    matching subset (selective EXISTS over a fact table).

    Size ``n_bits`` ~ 10x the expected distinct right keys for ~1% FP at
    ``k_hashes=3``. The driver OR-fold is O(blocks * n_bits/8) — for
    10^5+-block runs swap in a tree reduce.
    """
    import ray

    from ..functions.hashing import hash_columns_u64

    rkey = right_on or on
    ref = ray.put(build_bloom_bitmap(right, rkey, n_bits=n_bits, k_hashes=k_hashes))

    def bloom_mask(b: pa.Table) -> np.ndarray:
        bm = ray.get(ref)
        return bloom_probe(
            bm, hash_columns_u64(b, [on]), n_bits=n_bits, k_hashes=k_hashes
        )

    def keep_hits(b: pa.Table) -> pa.Table:
        return b.filter(pa.array(bloom_mask(b))) if len(b) else b

    def keep_misses(b: pa.Table) -> pa.Table:
        return b.filter(pa.array(~bloom_mask(b))) if len(b) else b

    hits = left.map_batches(keep_hits, batch_format="pyarrow", zero_copy_batch=True)
    verified = hash_semi_join(
        hits, right, on=on, right_on=rkey, anti=anti, num_partitions=num_partitions
    )
    if anti:
        misses = left.map_batches(
            keep_misses, batch_format="pyarrow", zero_copy_batch=True
        )
        return misses.union(verified)
    return verified


def rollup_counts(
    ds,
    keys: list[str],
    *,
    sum_col: str | None = None,
    count_alias: str = "n",
    sum_alias: str = "total",
):
    """SQL ``GROUP BY ROLLUP(keys...)``: the count (and optional sum) at
    every prefix level of ``keys``, finest to grand total, with NULL in the
    rolled-up key columns.

    ONE scan of the input computes the finest groupby; every coarser level
    re-aggregates the (much smaller) next-finer RESULT, so the extra
    exchanges carry O(distinct fine groups) — at 100 TB the raw corpus is
    read once and the rollup tree costs what the fine result costs.
    Counts roll up as sums of the finer counts (additive by construction).
    """
    from ray.data.aggregate import Count, Sum

    key_types = {
        f.name: f.type for f in ds.schema().base_schema if f.name in keys
    }
    out_cols = list(keys) + [count_alias] + ([sum_alias] if sum_col else [])

    def pad_nulls(b: pa.Table, null_keys: tuple) -> pa.Table:
        for k in null_keys:
            b = b.append_column(k, pa.nulls(len(b), key_types[k]))
        return b.select(out_cols)

    aggs = [Count(alias_name=count_alias)]
    if sum_col:
        aggs.append(Sum(sum_col, alias_name=sum_alias))
    fine = ds.groupby(list(keys)).aggregate(*aggs)

    import functools

    out = fine.map_batches(
        functools.partial(pad_nulls, null_keys=()),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    cur = fine
    for i in range(len(keys) - 1, -1, -1):
        re_aggs = [Sum(count_alias, alias_name=count_alias)]
        if sum_col:
            re_aggs.append(Sum(sum_alias, alias_name=sum_alias))
        if i == 0:

            def add_all(b: pa.Table) -> pa.Table:
                return b.append_column(
                    "__all", pa.array(np.zeros(len(b), np.int8), pa.int8())
                )

            cur = (
                cur.map_batches(
                    add_all, batch_format="pyarrow", zero_copy_batch=True
                )
                .groupby("__all")
                .aggregate(*re_aggs)
                .drop_columns(["__all"])
            )
        else:
            cur = cur.groupby(list(keys[:i])).aggregate(*re_aggs)
        out = out.union(
            cur.map_batches(
                functools.partial(pad_nulls, null_keys=tuple(keys[i:])),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
        )
    return out


def mark_membership(
    left,
    right,
    *,
    on: str,
    right_on: str | None = None,
    flag: str = "in_right",
    num_partitions: int | None = None,
    broadcast_budget: int | None = None,
):
    """ADD a boolean ``flag`` column to ``left``: does this row's key
    appear in ``right``? The verdict-keeping sibling of
    :func:`semi_join_auto` (same budgeted exchange crossover, same SQL
    NULL-never-matches rule) for pipelines that must report BOTH
    populations — e.g. cross-crawl digest dedup, where dropped rows are
    the deliverable, not just the survivors.

    Below the broadcast budget: one ``ray.put`` of the right side's
    distinct keys + a row-local searchsorted per batch (no exchange of
    the left side). Past it: distinct-reduce the right, ``left_outer``
    hash join, flag = match validity."""
    import os

    import pyarrow.compute as pc
    import ray

    from .lsh import default_num_partitions

    rkey = right_on or on
    if rkey == on:
        raise ValueError(
            "left and right key columns must be named differently "
            f"(both {on!r}); rename one side first"
        )
    if flag in left.columns():
        raise ValueError(f"flag column {flag!r} already exists on left")
    right = right.map_batches(
        lambda b: b.select([rkey]).group_by(rkey).aggregate([]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()
    budget = (
        broadcast_budget
        if broadcast_budget is not None
        else int(os.environ.get("GRAFT_JOIN_BCAST_MAX", 5_000_000))
    )
    if right.count() <= budget:
        (raw,) = pull_columns(right, [rkey], drop_null=True)
        keys = np.unique(raw)
        ref = ray.put(keys)

        def add_flag(b: pa.Table) -> pa.Table:
            ks = ray.get(ref)
            hit = np.zeros(len(b), bool)
            if len(b) and len(ks):
                col = b[on]
                valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
                ids = pc.drop_null(col).to_numpy(zero_copy_only=False)
                pos = np.minimum(np.searchsorted(ks, ids), len(ks) - 1)
                hit[valid] = ks[pos] == ids
            return b.append_column(flag, pa.array(hit))

        return left.map_batches(
            add_flag, batch_format="pyarrow", zero_copy_batch=True
        )

    from ray.data.aggregate import Count

    P = num_partitions or default_num_partitions()
    out_cols = left.columns()
    keys_ds = right.groupby(rkey).aggregate(Count(alias_name="__c"))

    def to_flag(b: pa.Table) -> pa.Table:
        hit = pc.is_valid(b["__c"])
        return b.select(out_cols).append_column(flag, hit)

    joined = left.join(
        keys_ds.select_columns([rkey, "__c"]),
        "left_outer",
        P,
        on=(on,),
        right_on=(rkey,),
    )
    return joined.map_batches(
        to_flag, batch_format="pyarrow", zero_copy_batch=True
    )
