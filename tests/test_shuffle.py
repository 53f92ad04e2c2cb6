"""deterministic_shuffle — the assigned order must be the exact rank of
the multiplicative hash (sequential argsort parity), a full permutation,
and invariant to block layout."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from recon_ray.functions.insights import _MIX_C, deterministic_shuffle


def _expected(ids: np.ndarray) -> pd.DataFrame:
    h = ids.astype(np.uint64) * np.uint64(_MIX_C)
    pos = np.empty(len(ids), np.int64)
    pos[np.argsort(h, kind="stable")] = np.arange(len(ids))
    return pd.DataFrame({"doc_id": ids, "shuffle_pos": pos})


@pytest.mark.parametrize("n_blocks", [1, 7])
def test_matches_sequential_rank_any_layout(n_blocks):
    # non-contiguous, non-sorted ids
    ids = np.array([5, 900001, 3, 42, 7_000_000_000, 88, 17, 2**40 + 9])
    ds = rd.from_pandas(pd.DataFrame({"doc_id": ids, "x": range(len(ids))}))
    got = (
        deterministic_shuffle(ds.repartition(n_blocks), "doc_id")
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    want = _expected(ids).sort_values("doc_id").reset_index(drop=True)
    assert got["shuffle_pos"].tolist() == want["shuffle_pos"].tolist()
    assert set(got.columns) == {"doc_id", "x", "shuffle_pos"}
    # payload column rode through untouched
    assert got.set_index("doc_id")["x"].to_dict() == {
        int(i): j for j, i in enumerate(ids)
    }


def test_is_permutation_and_spread():
    n = 3000
    ds = rd.from_pandas(pd.DataFrame({"doc_id": np.arange(n)})).repartition(5)
    got = deterministic_shuffle(ds, "doc_id").to_pandas()
    assert sorted(got["shuffle_pos"]) == list(range(n))
    # it actually shuffles: sequential ids land far apart
    bydoc = got.sort_values("doc_id")["shuffle_pos"].to_numpy()
    assert np.abs(np.diff(bydoc)).mean() > n / 10


def test_empty():
    ds = rd.from_pandas(pd.DataFrame({"doc_id": pd.Series([], dtype="int64")}))
    assert deterministic_shuffle(ds, "doc_id").count() == 0


def test_bad_buckets():
    ds = rd.from_pandas(pd.DataFrame({"doc_id": [1]}))
    with pytest.raises(ValueError):
        deterministic_shuffle(ds, "doc_id", n_buckets=100)


def test_bucketed_group_apply_strategies_agree(ray_session):
    """The task-based bucket exchange (strategy='tasks') and the Ray
    groupby path (strategy='ray') produce identical grouped results,
    including NULL keys and n_buckets=1."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from recon_ray.functions.relational import bucketed_group_apply

    rng = np.random.RandomState(3)
    df = pd.DataFrame({
        "k": rng.randint(0, 40, 500).astype("float64"),
        "v": rng.uniform(0, 10, 500),
    })
    df.loc[df.index % 17 == 0, "k"] = np.nan

    def fn(g):
        return (g.groupby("k", dropna=False, sort=False)["v"]
                .sum().rename("s").reset_index())

    outs = {}
    for strat, nb in (("tasks", 8), ("ray", 8), ("tasks", 1)):
        o = bucketed_group_apply(
            rd.from_pandas(df).repartition(4), "k", fn,
            n_buckets=nb, strategy=strat).to_pandas()
        outs[(strat, nb)] = (o.sort_values("k", na_position="last")
                             .reset_index(drop=True))
    base = outs[("ray", 8)]
    for key, o in outs.items():
        pd.testing.assert_frame_equal(o, base, check_like=True)


def test_grouped_agg_strategies_agree(ray_session):
    """grouped_agg through the task exchange equals the Ray Aggregate
    path bit-for-bit (sum/count/min/max/mean, NULL string keys)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from recon_ray.functions.relational import grouped_agg

    rng = np.random.RandomState(5)
    df = pd.DataFrame({
        "k": pd.Series(rng.choice(["a", "b", "c", None], 400),
                       dtype="object"),
        "v": rng.uniform(-5, 5, 400),
    })
    a = grouped_agg(rd.from_pandas(df).repartition(3), "k",
                    {"v": ["sum", "count", "min", "max", "mean"]},
                    strategy="tasks")
    b = grouped_agg(rd.from_pandas(df).repartition(3), "k",
                    {"v": ["sum", "count", "min", "max", "mean"]},
                    strategy="ray")
    key = lambda o: (o.assign(k=o["k"].fillna("\x7f"))  # noqa: E731
                     .sort_values("k").reset_index(drop=True))
    pd.testing.assert_frame_equal(key(a), key(b), check_like=True)
