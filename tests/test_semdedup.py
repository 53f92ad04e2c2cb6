"""SemDeDup (cluster-then-greedy-cosine dedup) — planted-duplicate recall,
the greedy keep-lowest-id rule, and layout invariance."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from recon_ray.functions.dedup import semdedup

TAU = 0.99


def _fixture():
    rng = np.random.RandomState(7)
    base = rng.randn(40, 16)
    rows = [(i, base[i]) for i in range(40)]
    # near-exact copies of vectors 0..9 with higher ids
    for i in range(10):
        rows.append((40 + i, base[i] + rng.randn(16) * 1e-4))
    return pd.DataFrame(
        {"vec_id": [r[0] for r in rows],
         "embedding": [r[1].astype(np.float32) for r in rows]}
    )


def test_semdedup_drops_planted_copies_keeps_originals():
    df = _fixture()
    out = semdedup(rd.from_pandas(df).repartition(4), k=4, threshold=TAU)
    assert len(out) == len(df)
    planted = out[out.vec_id >= 40]
    assert not planted["keep"].any()
    # every original is ≥ TAU-distinct from the others → all kept
    assert out[out.vec_id < 40]["keep"].all()


def test_semdedup_matches_greedy_rule_per_cluster():
    df = _fixture()
    out = semdedup(rd.from_pandas(df).repartition(4), k=4, threshold=TAU)
    m = np.stack(df.sort_values("vec_id")["embedding"].to_numpy()).astype(
        np.float64
    )
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    sims = m @ m.T
    for _, g in out.groupby("cluster"):
        keep = g.set_index("vec_id")["keep"]
        kept_so_far: list[int] = []
        for i in sorted(g["vec_id"].to_numpy()):
            should = all(sims[i, j] < TAU for j in kept_so_far)
            assert bool(keep[i]) == should
            if should:
                kept_so_far.append(i)


def test_semdedup_layout_invariant():
    df = _fixture()
    a = semdedup(rd.from_pandas(df).repartition(4), k=4, threshold=TAU)
    b = semdedup(rd.from_pandas(df).repartition(9), k=4, threshold=TAU)
    pd.testing.assert_frame_equal(a, b)


def test_semdedup_threshold_above_one_keeps_all():
    df = _fixture()
    out = semdedup(rd.from_pandas(df).repartition(3), k=4, threshold=1.01)
    assert out["keep"].all()


def test_semdedup_empty():
    ds = rd.from_pandas(
        pd.DataFrame(
            {"vec_id": pd.Series([], dtype="int64"),
             "embedding": pd.Series([], dtype="object")}
        )
    )
    out = semdedup(ds, k=4)
    assert len(out) == 0


def test_semdedup_threshold_monotone():
    """A stricter (higher) threshold never keeps fewer points."""
    df = _fixture()
    low = semdedup(rd.from_pandas(df).repartition(4), k=4, threshold=0.9)
    high = semdedup(rd.from_pandas(df).repartition(4), k=4, threshold=0.999)
    assert high["keep"].sum() >= low["keep"].sum()
    # and every id kept at the low threshold is kept at the high one
    assert set(low.loc[low["keep"], "vec_id"]) <= set(
        high.loc[high["keep"], "vec_id"]
    )
