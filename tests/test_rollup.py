"""rollup_agg — grouping-sets parity against plain pandas per level."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from recon_ray.functions.relational import rollup_agg


def _fixture():
    rng = np.random.RandomState(4)
    return pd.DataFrame(
        {"a": rng.choice(["x", "y", "z"], 300),
         "b": rng.choice(["p", "q"], 300),
         "v": rng.randint(0, 100, 300)}
    )


def test_rollup_matches_pandas_levels():
    df = _fixture()
    got = rollup_agg(
        rd.from_pandas(df).repartition(5),
        ["a", "b"],
        {"v": ["sum", "count", "mean"]},
    )

    fine = df.groupby(["a", "b"], as_index=False).agg(
        v_sum=("v", "sum"), v_count=("v", "count"), v_mean=("v", "mean")
    )
    mid = df.groupby(["a"], as_index=False).agg(
        v_sum=("v", "sum"), v_count=("v", "count"), v_mean=("v", "mean")
    )
    mid["b"] = "__all__"
    top = pd.DataFrame(
        {"a": ["__all__"], "b": ["__all__"], "v_sum": [df["v"].sum()],
         "v_count": [len(df)], "v_mean": [df["v"].mean()]}
    )
    want = (
        pd.concat([fine, mid[fine.columns], top[fine.columns]],
                  ignore_index=True)
        .sort_values(["a", "b"], kind="mergesort")
        .reset_index(drop=True)
    )
    got = got[want.columns]
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_rollup_single_key():
    df = _fixture()
    got = rollup_agg(rd.from_pandas(df).repartition(3), ["b"],
                     {"v": ["min", "max"]})
    assert set(got["b"]) == {"p", "q", "__all__"}
    total = got[got["b"] == "__all__"].iloc[0]
    assert total["v_min"] == df["v"].min()
    assert total["v_max"] == df["v"].max()
