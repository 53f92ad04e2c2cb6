"""Incremental exact-cosine embedding index: two-shard ingest equals
batch keep-first dedup over the union; exact recall vs the index; part
pruning actually skips; idempotent replay."""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from recon_ray.functions.embedding_index import (
    embedding_index_ingest,
    embedding_index_init,
)


def _shards(seed: int = 7, dim: int = 24):
    rng = np.random.RandomState(seed)
    # 6 well-separated cluster centers; shard A = clusters 0-3,
    # shard B = clusters 2-5 plus near-copies of A vectors
    centers = rng.normal(size=(6, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)

    def around(c, n, scale=0.05):
        return c + rng.normal(scale=scale, size=(n, dim))

    a_mat = np.concatenate([around(centers[i], 50) for i in range(4)])
    a_ids = np.arange(len(a_mat), dtype=np.int64)
    b_fresh = np.concatenate([around(centers[i], 40) for i in (4, 5)])
    # near-copies of 10 specific A vectors (cosine ≈ 1)
    src = np.arange(0, 200, 20)
    b_dup = a_mat[src] + rng.normal(scale=1e-4, size=(len(src), dim))
    # a within-B twin pair
    t = around(centers[2], 1, scale=0.05)
    b_twins = np.concatenate([t, t + rng.normal(scale=1e-4,
                                                size=(1, dim))])
    b_mat = np.concatenate([b_fresh, b_dup, b_twins])
    b_ids = np.arange(1000, 1000 + len(b_mat), dtype=np.int64)
    return (a_ids, a_mat), (b_ids, b_mat), src


def _ds(ids, mat):
    return rd.from_pandas(pd.DataFrame(
        {"vec_id": ids, "embedding": list(mat)})).repartition(4)


def test_embedding_index_matches_batch(ray_session, tmp_path):
    from recon_ray.functions.dedup import (
        connected_components,
        embedding_neardup,
    )

    (a_ids, a_mat), (b_ids, b_mat), src = _shards()
    state = str(tmp_path / "eidx")
    embedding_index_init(state, threshold=0.995, rows_per_part=64)

    ra = embedding_index_ingest(state, _ds(a_ids, a_mat), "a")
    assert ra["n_new"] == 200 and ra["n_dup"] == 0  # A is all distinct
    rb = embedding_index_ingest(state, _ds(b_ids, b_mat), "b")
    assert rb["n_new"] == len(b_ids)
    # the 10 near-copies of A and 1 twin loser are duplicates
    assert rb["n_dup"] == 11
    # pruning touched a strict subset of the index parts
    ps = rb["prune_stats"]
    assert 0 < ps["parts_touched"] <= ps["parts_total"]

    # equality with batch keep-first over the union
    u_ids = np.concatenate([a_ids, b_ids])
    u_mat = np.concatenate([a_mat, b_mat])
    pairs = embedding_neardup(_ds(u_ids, u_mat), threshold=0.995)
    cc = connected_components(rd.from_pandas(pairs[["a", "b"]]))
    dup_batch = {int(r["doc_id"]) for _, r in cc.iterrows()
                 if r["doc_id"] != r["cluster"]}
    survivors_batch = set(u_ids.tolist()) - dup_batch
    survivors_incr = set(ra["novel_ids"]["vec_id"]) | set(
        rb["novel_ids"]["vec_id"])
    assert survivors_incr == survivors_batch

    # idempotent replay + manifest consistency
    rb2 = embedding_index_ingest(state, _ds(b_ids, b_mat), "b")
    assert rb2["replayed"]
    man = json.load(open(f"{state}/_manifest.json"))
    assert man["n_vecs"] == len(survivors_batch)
    assert sum(p["n"] for p in man["parts"]) == man["n_vecs"]


def test_embedding_index_threshold_mismatch(ray_session, tmp_path):
    state = str(tmp_path / "eidx2")
    embedding_index_init(state, threshold=0.99)
    embedding_index_init(state, threshold=0.99)
    with pytest.raises(ValueError):
        embedding_index_init(state, threshold=0.95)
