"""Watermark streaming window (stages/streaming.py): ordered-replay
parity with the batch tumbling aggregate, late-drop semantics on
crafted out-of-order streams, and the bounded-state invariant."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from recon_ray.stages.streaming import stream_tumbling_agg

H = 3_600_000_000  # one hour in us


def _ev(rows):
    """rows: (ts_hours, event_type, value) → events frame."""
    return pd.DataFrame(
        {
            "ts": pd.to_datetime(
                [int(h * H) for h, _t, _v in rows], unit="us"),
            "event_type": [t for _h, t, _v in rows],
            "value": [float(v) for _h, _t, v in rows],
        }
    )


def _collect(out):
    df = out["result"].to_pandas()
    return (
        df.sort_values(["window_start", "event_type"])
        .reset_index(drop=True)
    )


def test_ordered_replay_matches_batch_groupby(ray_session):
    rng = np.random.RandomState(11)
    hours = rng.uniform(0, 72, size=500)
    types = rng.choice(["click", "view", "buy"], size=500)
    vals = np.round(rng.uniform(0, 50, size=500), 2)
    df = _ev(list(zip(hours, types, vals)))
    out = stream_tumbling_agg(
        rd.from_pandas(df).repartition(5), window="6h", lateness="0s",
        n_partitions=4, ordered=True)
    got = _collect(out)
    assert out["n_late_dropped"] == 0

    want = (
        df.assign(window_start=df["ts"].dt.floor("6h"))
        .groupby(["window_start", "event_type"], as_index=False)
        .agg(n_events=("value", "size"), total_value=("value", "sum"))
        .sort_values(["window_start", "event_type"])
        .reset_index(drop=True)
    )
    assert list(got["n_events"]) == list(want["n_events"])
    assert np.allclose(got["total_value"], want["total_value"])
    assert list(got["window_start"]) == list(want["window_start"])


def test_late_event_dropped_without_lateness(ray_session):
    # feed order: t=1h, t=7h (watermark → 7h, window [0,6h) seals and
    # emits), then t=5h arrives for the SEALED window → dropped
    rows = [(1, "a", 10.0), (7, "a", 1.0), (5, "a", 100.0)]
    df = _ev(rows)
    out = stream_tumbling_agg(
        rd.from_pandas(df).repartition(3), window="6h", lateness="0s",
        n_partitions=1, ordered=False)
    got = _collect(out)
    assert out["n_late_dropped"] == 1
    w0 = got[got["window_start"] == pd.Timestamp(0)]
    assert int(w0["n_events"].iloc[0]) == 1  # only the t=1h event
    assert float(w0["total_value"].iloc[0]) == 10.0


def test_lateness_horizon_admits_disorder(ray_session):
    # same stream, lateness 3h: after t=7h the watermark is 4h < 6h,
    # window [0,6h) is still open → the t=5h event is admitted
    rows = [(1, "a", 10.0), (7, "a", 1.0), (5, "a", 100.0)]
    df = _ev(rows)
    out = stream_tumbling_agg(
        rd.from_pandas(df).repartition(3), window="6h", lateness="3h",
        n_partitions=1, ordered=False)
    got = _collect(out)
    assert out["n_late_dropped"] == 0
    w0 = got[got["window_start"] == pd.Timestamp(0)]
    assert int(w0["n_events"].iloc[0]) == 2
    assert float(w0["total_value"].iloc[0]) == 110.0


def test_state_stays_bounded_by_horizon(ray_session):
    # 100 sequential hourly windows, ordered feed, zero lateness: the
    # watermark tracks the stream head, so at most a couple of windows
    # are ever open per actor — state must NOT grow with stream length
    rows = [(h + 0.5, "a", 1.0) for h in range(100)]
    df = _ev(rows)
    out = stream_tumbling_agg(
        rd.from_pandas(df).repartition(10), window="1h", lateness="0s",
        n_partitions=1, ordered=True)
    got = _collect(out)
    assert len(got) == 100
    assert out["max_open_windows"] <= 3
    assert out["n_late_dropped"] == 0


def test_keys_partition_cleanly(ray_session):
    # many keys across 4 actors: every (window, key) aggregate appears
    # exactly once — the hash split never divides a key across actors
    rows = [(h % 5 + 0.1 * k, f"k{k}", 1.0)
            for h in range(5) for k in range(13)]
    df = _ev(rows)
    out = stream_tumbling_agg(
        rd.from_pandas(df).repartition(4), window="1h", lateness="0s",
        n_partitions=4, ordered=True)
    got = _collect(out)
    dup = got.duplicated(["window_start", "event_type"]).any()
    assert not dup
    assert int(got["n_events"].sum()) == len(rows)
