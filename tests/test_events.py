"""Event-stream operators: windowed aggregate, sessionization, as-of join
(stages/events.py) against hand-built streams with known answers."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from deduplicatr_ray.stages.events import (
    asof_join_events,
    hopping_event_agg,
    range_join_events,
    sessionize,
    windowed_event_agg,
)

MIN = 60_000_000  # us


def _ts(minutes: float) -> int:
    """Epoch-us for 2024-01-01 00:00 + minutes."""
    base = 1_704_067_200_000_000
    return base + int(minutes * MIN)


def _events(rows):
    """rows: (event_id, user_id, minutes, event_type, value)."""
    return pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "ts": pa.array([_ts(r[2]) for r in rows], pa.timestamp("us")),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
        }
    )


@pytest.fixture()
def stream():
    # user 1: events at 0, 10, 50, 55 min -> gap 40 > 30 splits into 2 sessions
    # user 2: single event -> 1 session
    return _events(
        [
            (1, 1, 0.0, "click", 1.25),
            (2, 1, 10.0, "click", 2.50),
            (3, 1, 50.0, "purchase", 99.99),
            (4, 1, 55.0, "view", 0.10),
            (5, 2, 5.0, "purchase", 10.00),
            (6, 2, 100.0, "click", 0.00),
        ]
    )


def test_sessionize_gap_splits(ray_session, stream):
    import ray

    out = (
        sessionize(ray.data.from_arrow(stream), gap_minutes=30, num_partitions=4)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert out["user_id"].tolist() == [1, 2]
    assert out["n_events"].tolist() == [4, 2]
    # user 2's two events are 95 min apart -> 2 sessions
    assert out["n_sessions"].tolist() == [2, 2]


def test_sessionize_exact_gap_is_same_session(ray_session):
    import ray

    ev = _events([(1, 7, 0.0, "click", 0.0), (2, 7, 30.0, "click", 0.0)])
    out = sessionize(ray.data.from_arrow(ev), gap_minutes=30, num_partitions=2).to_pandas()
    assert out["n_sessions"].tolist() == [1]  # strictly-greater gap rule


def test_windowed_agg_counts_and_cents(ray_session, stream):
    import ray

    out = (
        windowed_event_agg(ray.data.from_arrow(stream), hours=1)
        .to_pandas()
        .sort_values(["window_hour", "event_type"])
        .reset_index(drop=True)
    )
    h0 = _ts(0) // 3_600_000_000
    # hour 0 holds minutes 0..59 (users 1+2 except user 2's 100-min event)
    assert set(out["window_hour"]) == {h0, h0 + 1}
    click0 = out[(out.window_hour == h0) & (out.event_type == "click")]
    assert click0["n_events"].tolist() == [2]
    assert click0["sum_value_c"].tolist() == [125 + 250]
    purch0 = out[(out.window_hour == h0) & (out.event_type == "purchase")]
    assert purch0["n_events"].tolist() == [2]
    assert purch0["sum_value_c"].tolist() == [9999 + 1000]


def test_asof_backward_inclusive_and_null(ray_session, stream):
    import ray

    out = (
        asof_join_events(
            ray.data.from_arrow(stream),
            left_type="purchase",
            right_type="click",
            num_partitions=4,
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert out["event_id"].tolist() == [3, 5]
    # purchase 3 (user 1, t=50) matches click 2 (t=10): lag 40 min
    assert out.loc[0, "matched_event_id"] == 2
    assert out.loc[0, "lag_us"] == 40 * MIN
    # purchase 5 (user 2, t=5) has no prior click (user 2's click is LATER)
    assert np.isnan(out.loc[1, "matched_event_id"])


def test_hopping_windows_fan_out(ray_session):
    import ray

    # one event at t=base+20min, window 60 / hop 15: starts s = k*15 with
    # t-60 < s <= t -> s in {base-30, base-15, base, base+15} (4 windows)
    ev = _events([(1, 1, 20.0, "click", 1.00)])
    out = (
        hopping_event_agg(
            ray.data.from_arrow(ev), window_minutes=60, hop_minutes=15
        )
        .to_pandas()
        .sort_values("window_start_min")
        .reset_index(drop=True)
    )
    base_min = _ts(0) // MIN
    assert out["window_start_min"].tolist() == [
        base_min - 30, base_min - 15, base_min, base_min + 15,
    ]
    assert out["n_events"].tolist() == [1, 1, 1, 1]
    assert out["sum_value_c"].tolist() == [100] * 4


def test_hopping_requires_divisible_hop(ray_session):
    import ray

    ev = _events([(1, 1, 0.0, "click", 0.0)])
    with pytest.raises(ValueError, match="divide"):
        hopping_event_agg(
            ray.data.from_arrow(ev), window_minutes=60, hop_minutes=25
        )


def test_range_join_counts_window(ray_session, stream):
    import ray

    out = (
        range_join_events(
            ray.data.from_arrow(stream),
            left_type="purchase",
            right_type="click",
            window_minutes=30,
            num_partitions=4,
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert out["event_id"].tolist() == [3, 5]
    # purchase 3 (user 1, t=50): clicks at 0 and 10; window (20, 50] -> 0
    assert out.loc[0, "n_in_window"] == 0
    # purchase 5 (user 2, t=5): user 2's click is at t=100 (later) -> 0
    assert out.loc[1, "n_in_window"] == 0
    out2 = (
        range_join_events(
            ray.data.from_arrow(stream),
            left_type="purchase",
            right_type="click",
            window_minutes=60,
            num_partitions=4,
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    # window widened to (−10, 50]: both of user 1's clicks count
    assert out2["n_in_window"].tolist() == [2, 0]


def test_range_join_boundaries(ray_session):
    import ray

    # clicks exactly at t-W (excluded) and exactly at t (included)
    ev = _events(
        [
            (1, 5, 0.0, "click", 0.0),    # == t - W -> excluded
            (2, 5, 0.001, "click", 0.0),  # just inside
            (3, 5, 30.0, "click", 0.0),   # == t -> included
            (4, 5, 30.0, "purchase", 1.0),
        ]
    )
    out = range_join_events(
        ray.data.from_arrow(ev),
        left_type="purchase",
        right_type="click",
        window_minutes=30,
        num_partitions=2,
    ).to_pandas()
    assert out["n_in_window"].tolist() == [2]


def test_asof_exact_ts_matches(ray_session):
    import ray

    ev = _events(
        [(1, 3, 10.0, "click", 0.0), (2, 3, 10.5, "purchase", 1.0)]
    )
    # exact-time click for another user must NOT leak across users
    ev2 = _events([(9, 4, 10.5, "click", 0.0)])
    both = pa.concat_tables([ev, ev2])
    out = (
        asof_join_events(
            ray.data.from_arrow(both),
            left_type="purchase",
            right_type="click",
            num_partitions=2,
        )
        .to_pandas()
    )
    assert out["matched_event_id"].tolist() == [1]


def test_running_user_totals_cumulative(ray_session, stream):
    import ray

    from deduplicatr_ray.stages.events import running_user_totals

    out = (
        running_user_totals(ray.data.from_arrow(stream))
        .to_pandas()
        .sort_values(["user_id", "running_n"])
        .reset_index(drop=True)
    )
    assert len(out) == 6
    u1 = out[out["user_id"] == 1]
    assert u1["event_id"].tolist() == [1, 2, 3, 4]
    assert u1["running_n"].tolist() == [1, 2, 3, 4]
    # cents: 125, 125+250, +9999, +10
    assert u1["running_value_c"].tolist() == [125, 375, 10374, 10384]
    u2 = out[out["user_id"] == 2]
    assert u2["running_value_c"].tolist() == [1000, 1000]


def test_running_user_totals_ts_tie_orders_by_event_id(ray_session):
    import ray

    from deduplicatr_ray.stages.events import running_user_totals

    ev = _events(
        [
            (9, 1, 0.0, "click", 1.00),
            (2, 1, 0.0, "click", 2.00),  # same ts, lower id -> counted first
        ]
    )
    out = (
        running_user_totals(ray.data.from_arrow(ev))
        .to_pandas()
        .sort_values("running_n")
    )
    assert out["event_id"].tolist() == [2, 9]
    assert out["running_value_c"].tolist() == [200, 300]
