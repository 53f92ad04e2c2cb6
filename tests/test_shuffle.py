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
