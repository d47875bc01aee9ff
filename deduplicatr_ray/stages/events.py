"""Event-stream operators: tumbling-window aggregate, gap sessionization,
as-of join.

The reference (a file-dedup CLI) has no event operators; these cover the
"windowed aggregate / as-of join" custom-operator family a web-scale
training-data pipeline needs (task brief, custom operators), expressed
Ray-Data-first:

* tumbling windows are a pure ``map_batches`` projection (window id is a
  per-row integer division — no state, no shuffle) followed by one native
  ``groupby().aggregate()`` whose AggregateFns pre-combine per block;
* sessionization and as-of join hash-partition by ``user_id`` (every
  partition holds WHOLE users — the partitioning assumption both kernels
  rely on) and run ONE vectorized kernel per partition block, the engine's
  standard pattern (see ``stages/lsh.py candidate_pairs_stage``). Skew is
  bounded by the hottest single user's event count, not by partition count.

All outputs are integers / timestamps so the driver's value-hash compare is
exact (no float-accumulation-order sensitivity; see BASELINE.md oracle
conventions). ``value`` sums are carried as ``floor(value * 100)`` int64
cents for the same reason.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

US_PER_HOUR = 3_600_000_000
US_PER_MINUTE = 60_000_000


def _part_by_user(ds, P: int):
    """Append an int32 ``part`` = user_id % P column (whole-user partitions)."""

    def with_part(b: pa.Table) -> pa.Table:
        part = (
            b["user_id"].to_numpy(zero_copy_only=False) % np.int64(P)
        ).astype(np.int32)
        return b.append_column("part", pa.array(part, pa.int32()))

    return ds.map_batches(with_part, batch_format="pyarrow", zero_copy_batch=True)


def windowed_event_agg(events, *, hours: int = 1):
    """Tumbling-window aggregate: per (window, event_type) count + cent-sum.

    ``events`` needs columns ``ts`` (timestamp[us]), ``event_type``,
    ``value`` (float64). Output: ``window_hour`` (int64, epoch-hours of the
    window start), ``event_type``, ``n_events``, ``sum_value_c`` (int64,
    sum of floor(value*100)).

    Scale: the window id is a stateless per-row projection, so the only
    exchange is the final aggregate — and Count/Sum combine partially per
    block before the shuffle, so bytes moved are O(distinct windows x
    types), not O(events).
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Sum

    div = np.int64(hours * US_PER_HOUR)

    def add_window(b: pa.Table) -> pa.Table:
        ts_us = pc.cast(b["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        # epoch-hours of the WINDOW START (not the window ordinal): the
        # ordinal times `hours` recovers the start for any window width
        wh = (ts_us // div) * np.int64(hours)
        value_c = np.floor(
            b["value"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        return pa.table(
            {
                "window_hour": pa.array(wh, pa.int64()),
                "event_type": b["event_type"],
                "value_c": pa.array(value_c, pa.int64()),
            }
        )

    return (
        events.map_batches(add_window, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["window_hour", "event_type"])
        .aggregate(
            Count(alias_name="n_events"),
            Sum("value_c", alias_name="sum_value_c"),
        )
    )


def hopping_event_agg(events, *, window_minutes: int = 60, hop_minutes: int = 15):
    """Hopping (sliding) window aggregate: per (window, event_type) count +
    cent-sum over OVERLAPPING windows of ``window_minutes`` advancing every
    ``hop_minutes`` (``hop`` must divide ``window``; each event lands in
    exactly window/hop windows).

    Output: ``window_start_min`` (int64 epoch-minutes of the window start),
    ``event_type``, ``n_events``, ``sum_value_c``.

    Scale: the fan-out is a stateless per-batch ``np.repeat`` projection
    (factor window/hop, a small constant) and the only exchange is the
    final partial-combining aggregate — the standard streaming
    sliding-window decomposition.
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Sum

    if window_minutes % hop_minutes:
        raise ValueError("hop_minutes must divide window_minutes")
    R = window_minutes // hop_minutes
    hop_us = np.int64(hop_minutes * US_PER_MINUTE)

    def expand(b: pa.Table) -> pa.Table:
        n = len(b)
        ts_us = pc.cast(b["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        k_hi = ts_us // hop_us  # latest window start at-or-before t
        off = np.tile(np.arange(R, dtype=np.int64), n)
        k = np.repeat(k_hi, R) - off
        idx = pa.array(np.repeat(np.arange(n, dtype=np.int64), R))
        value_c = np.floor(
            b["value"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        return pa.table(
            {
                "window_start_min": pa.array(k * hop_minutes, pa.int64()),
                "event_type": b["event_type"].take(idx),
                "value_c": pa.array(np.repeat(value_c, R), pa.int64()),
            }
        )

    return (
        events.map_batches(expand, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["window_start_min", "event_type"])
        .aggregate(
            Count(alias_name="n_events"),
            Sum("value_c", alias_name="sum_value_c"),
        )
    )


_EMPTY_SESSIONS = pa.table(
    {
        "user_id": pa.array([], pa.int64()),
        "n_events": pa.array([], pa.int64()),
        "n_sessions": pa.array([], pa.int64()),
    }
)


def sessionize(events, *, gap_minutes: int = 30, num_partitions: int | None = None):
    """Gap sessionization: per user, event count and number of sessions,
    where a new session starts after a gap STRICTLY greater than
    ``gap_minutes`` since the previous event (ties broken by event_id).

    ``events`` needs ``user_id``, ``ts``, ``event_id``. One shuffle
    (user-partitioned), one vectorized kernel per partition: lexsort +
    boolean gap flags + ``np.add.reduceat`` segment sums — no per-user
    Python loop.
    """
    import pyarrow.compute as pc

    from .lsh import default_num_partitions

    P = num_partitions or default_num_partitions()
    gap_us = np.int64(gap_minutes * US_PER_MINUTE)

    def block(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["part"])
        n = len(g)
        if n == 0:
            return _EMPTY_SESSIONS
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        ts = pc.cast(g["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, uid))
        uid, ts = uid[order], ts[order]
        new_user = np.empty(n, np.bool_)
        new_user[0] = True
        new_user[1:] = uid[1:] != uid[:-1]
        new_sess = np.empty(n, np.bool_)
        new_sess[0] = True
        new_sess[1:] = (ts[1:] - ts[:-1]) > gap_us
        new_sess |= new_user
        starts = np.flatnonzero(new_user)
        counts = np.diff(np.append(starts, n))
        sessions = np.add.reduceat(new_sess.astype(np.int64), starts)
        return pa.table(
            {
                "user_id": pa.array(uid[starts], pa.int64()),
                "n_events": pa.array(counts, pa.int64()),
                "n_sessions": pa.array(sessions, pa.int64()),
            }
        )

    return (
        _part_by_user(events, P)
        .groupby("part")
        .map_groups(block, batch_format="pyarrow")
    )


def running_user_totals(events, *, num_partitions: int | None = None):
    """Cumulative window aggregate — SQL's
    ``SUM(...) OVER (PARTITION BY user_id ORDER BY ts, event_id
    ROWS UNBOUNDED PRECEDING)``: per event, the running event count and
    running value total (cents) for its user up to and including it.

    One whole-user shuffle, then a per-partition vectorized kernel:
    lexsort + one global cumsum with per-user base subtraction (segment-
    relative cumulative sums) — no per-user or per-row Python. Value is
    floored to integer cents so the totals are exact and SQL-mirrorable.
    Output: ``event_id, user_id, running_n, running_value_c``.
    """
    import pyarrow.compute as pc

    from .lsh import default_num_partitions

    P = num_partitions or default_num_partitions()

    def block(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["part"])
        n = len(g)
        if n == 0:
            return pa.table(
                {
                    "event_id": pa.array([], pa.int64()),
                    "user_id": pa.array([], pa.int64()),
                    "running_n": pa.array([], pa.int64()),
                    "running_value_c": pa.array([], pa.int64()),
                }
            )
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        ts = pc.cast(g["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        val_c = np.floor(
            g["value"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        order = np.lexsort((eid, ts, uid))
        uid, eid, val_c = uid[order], eid[order], val_c[order]
        new_user = np.empty(n, np.bool_)
        new_user[0] = True
        new_user[1:] = uid[1:] != uid[:-1]
        starts = np.flatnonzero(new_user)
        seg = np.cumsum(new_user.astype(np.int64)) - 1
        idx = np.arange(n, dtype=np.int64)
        cum = np.cumsum(val_c)
        base = cum[starts] - val_c[starts]  # sum strictly before each segment
        return pa.table(
            {
                "event_id": pa.array(eid, pa.int64()),
                "user_id": pa.array(uid, pa.int64()),
                "running_n": pa.array(idx - starts[seg] + 1, pa.int64()),
                "running_value_c": pa.array(cum - base[seg], pa.int64()),
            }
        )

    return (
        _part_by_user(events, P)
        .groupby("part")
        .map_groups(block, batch_format="pyarrow")
    )


def _empty_range() -> pa.Table:
    return pa.table(
        {
            "event_id": pa.array([], pa.int64()),
            "user_id": pa.array([], pa.int64()),
            "ts": pa.array([], pa.timestamp("us")),
            "n_in_window": pa.array([], pa.int64()),
        }
    )


def range_join_events(
    events,
    *,
    left_type: str,
    right_type: str,
    window_minutes: int = 60,
    num_partitions: int | None = None,
):
    """Range (interval) join within an event stream: for every ``left_type``
    event at time ``t``, the COUNT of same-user ``right_type`` events in the
    half-open window ``(t - W, t]`` (left-exclusive, right-inclusive).

    Output: ``event_id, user_id, ts, n_in_window`` — one row per left event,
    zero-filled when no right event falls in the window (left-join
    semantics).

    Ray Data has no range join; this composes the engine's user-partitioned
    shuffle with a per-partition rank-difference kernel: give the right side
    a per-user cumulative count, then two backward ``pandas.merge_asof``
    probes (at ``t`` and at ``t - W``) turn the interval count into a
    difference of ranks — all vectorized C merges, no per-user Python loop.
    Both sides of a user always co-reside (the ``part`` column is
    ``user_id % P``), so block-local counting is exact.
    """
    from .lsh import default_num_partitions

    P = num_partitions or default_num_partitions()
    w_us = np.int64(window_minutes * US_PER_MINUTE)

    def block(g: pa.Table) -> pa.Table:
        import pandas as pd

        g = g.drop_columns(["part"])
        if len(g) == 0:
            return _empty_range()
        df = g.to_pandas()
        left = df.loc[
            df["event_type"] == left_type, ["event_id", "user_id", "ts"]
        ].sort_values("ts", kind="mergesort")
        if not len(left):
            return _empty_range()
        right = df.loc[df["event_type"] == right_type, ["user_id", "ts"]]
        right = right.sort_values(["user_id", "ts"], kind="mergesort")
        right["cum"] = right.groupby("user_id").cumcount() + 1
        right = right.sort_values("ts", kind="mergesort")

        def rank_at(probe_ts: pd.Series) -> np.ndarray:
            """count of right events with r.ts <= probe, per left row."""
            probe = left[["user_id"]].copy()
            probe["ts"] = probe_ts
            probe = probe.sort_values("ts", kind="mergesort")
            m = pd.merge_asof(
                probe,
                right,
                on="ts",
                by="user_id",
                direction="backward",
                allow_exact_matches=True,
            )
            # restore left's row order (probe was re-sorted by ts)
            return (
                m.set_index(probe.index)["cum"].reindex(left.index).fillna(0.0)
            ).to_numpy()

        ts_us = left["ts"].astype("datetime64[us]").astype(np.int64)
        hi = rank_at(left["ts"])
        lo = rank_at((ts_us - w_us).astype("datetime64[us]"))
        n = (hi - lo).astype(np.int64)
        return pa.table(
            {
                "event_id": pa.array(
                    left["event_id"].to_numpy().astype(np.int64), pa.int64()
                ),
                "user_id": pa.array(
                    left["user_id"].to_numpy().astype(np.int64), pa.int64()
                ),
                "ts": pa.array(left["ts"].astype("datetime64[us]")),
                "n_in_window": pa.array(n, pa.int64()),
            }
        )

    return (
        _part_by_user(events, P)
        .groupby("part")
        .map_groups(block, batch_format="pyarrow")
    )


def _empty_asof() -> pa.Table:
    return pa.table(
        {
            "event_id": pa.array([], pa.int64()),
            "user_id": pa.array([], pa.int64()),
            "ts": pa.array([], pa.timestamp("us")),
            "matched_event_id": pa.array([], pa.int64()),
            "lag_us": pa.array([], pa.int64()),
        }
    )


def asof_join_events(
    events,
    *,
    left_type: str,
    right_type: str,
    num_partitions: int | None = None,
):
    """As-of join within an event stream: for every ``left_type`` event,
    the most recent ``right_type`` event of the SAME user with
    ``right.ts <= left.ts`` (backward inclusive), or NULL if none.

    Output: ``event_id, user_id, ts, matched_event_id, lag_us`` — one row
    per left event; ``lag_us`` is the microsecond lag to the match.

    Ray Data has no as-of join; this composes one user-partitioned shuffle
    with a per-partition ``pandas.merge_asof`` (the vectorized C merge —
    both sides of a user always co-reside, so block-local merge is exact).
    """
    from .lsh import default_num_partitions

    P = num_partitions or default_num_partitions()

    def block(g: pa.Table) -> pa.Table:
        import pandas as pd

        g = g.drop_columns(["part"])
        if len(g) == 0:
            return _empty_asof()
        df = g.to_pandas()
        left = df.loc[
            df["event_type"] == left_type, ["event_id", "user_id", "ts"]
        ].sort_values("ts", kind="mergesort")
        if not len(left):
            return _empty_asof()
        right = df.loc[
            df["event_type"] == right_type, ["event_id", "user_id", "ts"]
        ].rename(columns={"event_id": "matched_event_id", "ts": "ts_r"})
        # merge_asof picks the LAST equal-ts right row, so sorting the tie
        # by event_id makes equal-timestamp matches deterministic (max id)
        right = right.sort_values(
            ["ts_r", "matched_event_id"], kind="mergesort"
        )
        m = pd.merge_asof(
            left,
            right,
            left_on="ts",
            right_on="ts_r",
            by="user_id",
            direction="backward",
            allow_exact_matches=True,
        )
        ts_us = m["ts"].astype("datetime64[us]").astype(np.int64).to_numpy()
        matched = m["matched_event_id"].to_numpy()
        miss = pd.isna(matched)
        matched_i = np.where(miss, 0, matched).astype(np.int64)
        ts_r_us = (
            m["ts_r"].astype("datetime64[us]").astype(np.int64).to_numpy()
        )
        lag = np.where(miss, 0, ts_us - ts_r_us).astype(np.int64)
        return pa.table(
            {
                "event_id": pa.array(
                    m["event_id"].to_numpy().astype(np.int64), pa.int64()
                ),
                "user_id": pa.array(
                    m["user_id"].to_numpy().astype(np.int64), pa.int64()
                ),
                "ts": pa.array(m["ts"].astype("datetime64[us]")),
                "matched_event_id": pa.array(matched_i, pa.int64(), mask=miss),
                "lag_us": pa.array(lag, pa.int64(), mask=miss),
            }
        )

    return (
        _part_by_user(events, P)
        .groupby("part")
        .map_groups(block, batch_format="pyarrow")
    )
