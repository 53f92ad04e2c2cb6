"""grouped_quantiles and retention — crafted-edge pins (NaNs, 1-element
groups, cohort offsets, epoch-window boundaries)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from recon_ray.functions.insights import retention
from recon_ray.functions.sketches import grouped_quantiles

T = pd.Timestamp


def test_grouped_quantiles_disc_semantics():
    df = pd.DataFrame({
        "k": ["a"] * 4 + ["b"] * 1 + ["c"] * 3,
        "v": [4.0, 1.0, 3.0, 2.0,  9.0,  10.0, np.nan, 30.0],
    })
    out = grouped_quantiles(rd.from_pandas(df).repartition(3), "k", "v",
                            [0.5, 0.9])
    got = {(r.k, r.q): r.value for r in out.itertuples()}
    # quantile_disc: element at ceil(q*n)-1 of the sorted group
    assert got[("a", 0.5)] == 2.0   # n=4, rank ceil(2)-1=1 → sorted[1]
    assert got[("a", 0.9)] == 4.0   # rank ceil(3.6)-1=3
    assert got[("b", 0.5)] == 9.0   # singleton
    assert got[("c", 0.5)] == 10.0  # NaN dropped → n=2, rank 0
    assert got[("c", 0.9)] == 30.0
    assert len(out) == 6


def test_retention_offsets():
    wk = 7 * 86_400_000_000  # µs
    base = np.datetime64("2024-01-04T00:00:00", "us")  # inside some epoch week
    rows = [
        # u1 active in weeks 0, 0, 2 (relative to their first event)
        (1, base), (1, base + np.timedelta64(1, "D")),
        (1, base + np.timedelta64(15, "D")),
        # u2 first seen one week later, active that week only
        (2, base + np.timedelta64(7, "D")),
    ]
    df = pd.DataFrame(rows, columns=["user_id", "ts"])
    out = retention(rd.from_pandas(df).repartition(2))
    # epoch-anchored weeks: compute expected cohort indices directly
    c1 = int(base.astype("datetime64[us]").astype(np.int64) // wk)
    rec = {(r.cohort_idx, r.week_offset): r.n_users for r in out.itertuples()}
    # u1's two week-0 events collapse to one (distinct per period)
    assert rec[(c1, 0)] == 1
    assert sum(n for (c, k), n in rec.items() if c == c1 and k > 0) == 1
    # u2 forms its own cohort at offset 0
    assert sum(n for (c, k), n in rec.items() if c != c1 and k == 0) == 1
    assert out["n_users"].sum() == 3


def test_retention_random_vs_sequential():
    rng = np.random.RandomState(9)
    n = 1500
    df = pd.DataFrame({
        "user_id": rng.randint(0, 80, n),
        "ts": (np.datetime64("2024-02-01T00:00:00", "us")
               + rng.randint(0, 45 * 86_400, n).astype("timedelta64[s]")),
    })
    got = retention(rd.from_pandas(df).repartition(6))

    wk = 7 * 86_400_000_000
    p = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64) // wk
    sim: dict = {}
    tmp = pd.DataFrame({"u": df["user_id"], "p": p})
    for _, g in tmp.groupby("u"):
        c = g["p"].min()
        for k in sorted(set(g["p"] - c)):
            sim[(c, k)] = sim.get((c, k), 0) + 1
    want = (
        pd.DataFrame(
            [(c, k, v) for (c, k), v in sim.items()],
            columns=["cohort_idx", "week_offset", "n_users"],
        )
        .sort_values(["cohort_idx", "week_offset"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_retention_empty():
    ds = rd.from_pandas(pd.DataFrame({
        "user_id": pd.Series([], dtype="int64"),
        "ts": pd.Series([], dtype="datetime64[us]"),
    }))
    out = retention(ds)
    assert len(out) == 0
    assert list(out.columns) == ["cohort_idx", "week_offset", "n_users"]
