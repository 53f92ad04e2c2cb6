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


# ---------------------------------------------------------------------------
# approx_quantiles (KMV bottom-k) — determinism, layout invariance, error
# ---------------------------------------------------------------------------


def test_approx_quantiles_layout_invariant_and_accurate():
    from recon_ray.functions.sketches import approx_quantiles, exact_quantiles

    rng = np.random.RandomState(8)
    df = pd.DataFrame({"doc_id": np.arange(20000),
                       "v": rng.gamma(2.0, 10.0, 20000)})
    qs = [0.1, 0.5, 0.9]
    a = approx_quantiles(rd.from_pandas(df).repartition(3), ("v", "doc_id"), qs)
    b = approx_quantiles(rd.from_pandas(df).repartition(17), ("v", "doc_id"), qs)
    assert a == b  # layout-invariant, bit-exact
    exact = exact_quantiles(rd.from_pandas(df).repartition(5), "v", qs)
    for approx, ex, q in zip(a, exact, qs):
        # KMV with k=2048 on 20k rows: generous 10%-of-value tolerance
        assert abs(approx - ex) <= 0.1 * max(ex, 1.0), (q, approx, ex)


def test_approx_quantiles_small_input_is_exact():
    from recon_ray.functions.sketches import approx_quantiles

    df = pd.DataFrame({"doc_id": np.arange(100), "v": np.arange(100.0)})
    got = approx_quantiles(rd.from_pandas(df).repartition(4),
                           ("v", "doc_id"), [0.0, 0.5, 1.0])
    # n < k → the "sample" is the whole column → exact order statistics
    assert got == [0.0, 50.0, 99.0]


def test_approx_quantiles_empty():
    from recon_ray.functions.sketches import approx_quantiles

    ds = rd.from_pandas(pd.DataFrame({"v": pd.Series([], dtype="float64")}))
    got = approx_quantiles(ds, "v", [0.5])
    assert len(got) == 1 and np.isnan(got[0])


def test_cube_matches_pandas_all_subsets():
    from recon_ray.functions.relational import cube_agg

    df = _fixture()
    got = cube_agg(rd.from_pandas(df).repartition(4), ["a", "b"],
                   {"v": ["sum"]})
    # 4 grouping sets: (a,b), (a), (b), ()
    n_fine = df.groupby(["a", "b"]).ngroups
    assert len(got) == n_fine + df["a"].nunique() + df["b"].nunique() + 1
    b_only = got[(got["a"] == "__all__") & (got["b"] != "__all__")]
    want = df.groupby("b")["v"].sum()
    assert {r["b"]: r["v_sum"] for _, r in b_only.iterrows()} == want.to_dict()
    total = got[(got["a"] == "__all__") & (got["b"] == "__all__")]
    assert total["v_sum"].item() == df["v"].sum()


def test_rollup_numeric_key():
    from recon_ray.functions.relational import rollup_agg

    df = pd.DataFrame({"year": [2023, 2023, 2024], "v": [1, 2, 4]})
    got = rollup_agg(rd.from_pandas(df), ["year"], {"v": ["sum"]})
    as_map = {str(r["year"]): r["v_sum"] for _, r in got.iterrows()}
    assert as_map == {"2023": 3, "2024": 4, "__all__": 7}


def test_approx_quantiles_ignores_nans():
    from recon_ray.functions.sketches import approx_quantiles

    df = pd.DataFrame({"doc_id": np.arange(1000),
                       "v": np.arange(1000.0)})
    df.loc[df.index % 3 == 0, "v"] = np.nan
    got = approx_quantiles(rd.from_pandas(df).repartition(4),
                           ("v", "doc_id"), [0.5, 1.0])
    assert not any(np.isnan(got))
    assert got[1] == df["v"].max()


def test_grouping_sets_fuzz_vs_pandas():
    from recon_ray.functions.relational import grouping_sets_agg

    rng = np.random.RandomState(31)
    for trial in range(5):
        df = pd.DataFrame(
            {"a": rng.choice(["x", "y", "z", "w"], 200),
             "b": rng.choice(["p", "q", "r"], 200),
             "v": rng.randint(-50, 50, 200)}
        )
        sets = [("a", "b"), ("b",), ()]
        got = grouping_sets_agg(
            rd.from_pandas(df).repartition(4), ["a", "b"], sets,
            {"v": ["sum", "min", "max"]},
        )
        rows = set()
        fine = df.groupby(["a", "b"])["v"]
        for (a, b), g in fine:
            rows.add((a, b, g.sum(), g.min(), g.max()))
        for b, g in df.groupby("b")["v"]:
            rows.add(("__all__", b, g.sum(), g.min(), g.max()))
        rows.add(("__all__", "__all__", df["v"].sum(), df["v"].min(),
                  df["v"].max()))
        got_rows = {
            (r["a"], r["b"], r["v_sum"], r["v_min"], r["v_max"])
            for _, r in got.iterrows()
        }
        assert got_rows == rows, trial


def test_histogram_exact_and_layout_invariant():
    from recon_ray.functions.sketches import histogram

    rng = np.random.RandomState(41)
    df = pd.DataFrame({"v": rng.uniform(-10, 110, 5000)})
    df.loc[df.index % 100 == 0, "v"] = np.nan
    a = histogram(rd.from_pandas(df).repartition(3), "v", 0.0, 100.0, 10)
    b = histogram(rd.from_pandas(df).repartition(17), "v", 0.0, 100.0, 10)
    pd.testing.assert_frame_equal(a, b)
    v = df["v"].dropna().to_numpy()
    assert a["count"].sum() == len(v)
    assert a.loc[a["bin"] == -1, "count"].item() == (v < 0).sum()
    assert a.loc[a["bin"] == 10, "count"].item() == (v >= 100).sum()
    mid = a[(a["bin"] >= 0) & (a["bin"] < 10)]
    want = np.histogram(v[(v >= 0) & (v < 100)], bins=10,
                        range=(0, 100))[0]
    assert mid["count"].tolist() == want.tolist()
