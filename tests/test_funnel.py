"""funnel — first-touch staged sequence matching; strictness and ordering
edges pinned against hand-computed truth."""

from __future__ import annotations

import pandas as pd
import ray.data as rd

from recon_ray.functions.insights import funnel

T = pd.Timestamp


def _ds(rows):
    return rd.from_pandas(
        pd.DataFrame(rows, columns=["user_id", "ts", "event_type"])
    ).repartition(3)


def test_funnel_strict_first_touch():
    rows = [
        # u1 converts fully: view < click < purchase
        (1, T("2024-01-01 00:00"), "view"),
        (1, T("2024-01-01 01:00"), "click"),
        (1, T("2024-01-01 02:00"), "purchase"),
        # u2: click BEFORE view only → stops at view
        (2, T("2024-01-02 01:00"), "click"),
        (2, T("2024-01-02 02:00"), "view"),
        # u3: click at EXACTLY the view ts → strict >, stops at view
        (3, T("2024-01-03 00:00"), "view"),
        (3, T("2024-01-03 00:00"), "click"),
        # u4: first-touch — purchase between first view and first click
        # does NOT count (purchase must follow the click)
        (4, T("2024-01-04 00:00"), "view"),
        (4, T("2024-01-04 00:30"), "purchase"),
        (4, T("2024-01-04 01:00"), "click"),
        # u5: never views → not even stage 0
        (5, T("2024-01-05 00:00"), "purchase"),
    ]
    out = funnel(_ds(rows), ["view", "click", "purchase"])
    assert out["stage"].tolist() == ["view", "click", "purchase"]
    # view: u1..u4; click-after-view: u1, u4; full chain: u1 only
    assert out["n_users"].tolist() == [4, 2, 1]


def test_funnel_second_event_rescues_chain():
    rows = [
        # first click precedes view, but a SECOND click follows it —
        # the chain anchors on the first click AFTER the first view
        (7, T("2024-02-01 00:00"), "click"),
        (7, T("2024-02-01 01:00"), "view"),
        (7, T("2024-02-01 02:00"), "click"),
        (7, T("2024-02-01 03:00"), "purchase"),
    ]
    out = funnel(_ds(rows), ["view", "click", "purchase"])
    assert out["n_users"].tolist() == [1, 1, 1]


def test_funnel_random_vs_sequential():
    """2000 random events, 60 users — distributed funnel must equal a
    plain per-user sequential scan."""
    import numpy as np

    rng = np.random.RandomState(5)
    n = 2000
    df = pd.DataFrame({
        "user_id": rng.randint(0, 60, n),
        "ts": pd.Timestamp("2024-03-01")
        + pd.to_timedelta(rng.randint(0, 10**6, n), unit="s"),
        "event_type": rng.choice(["view", "click", "purchase", "other"], n),
    })
    stages = ["view", "click", "purchase"]
    got = funnel(rd.from_pandas(df).repartition(7), stages)

    want = [0, 0, 0]
    for _, g in df.groupby("user_id"):
        cur = None
        for i, st in enumerate(stages):
            ev = g[g["event_type"] == st]
            nxt = ev["ts"].min() if cur is None else (
                ev.loc[ev["ts"] > cur, "ts"].min()
            )
            if pd.isna(nxt):
                break
            cur = nxt
            want[i] += 1
    assert got["n_users"].tolist() == want


def test_funnel_empty():
    ds = rd.from_pandas(
        pd.DataFrame({"user_id": pd.Series([], dtype="int64"),
                      "ts": pd.Series([], dtype="datetime64[us]"),
                      "event_type": pd.Series([], dtype="object")})
    )
    out = funnel(ds, ["view", "click"])
    assert out["n_users"].tolist() == [0, 0]
    assert out["stage_idx"].tolist() == [0, 1]
