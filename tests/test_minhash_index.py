"""Incremental MinHash index (functions/minhash_index.py): two-shard
ingest must match keep-first batch dedup over the union; idempotent
replay; crash-safe manifest."""

from __future__ import annotations

import json
import random

import pandas as pd
import pytest
import ray.data as rd

from recon_ray.functions.minhash_index import (
    minhash_index_ingest,
    minhash_index_init,
)


def _corpus(seed: int = 5):
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(250)]
    base = [rng.choice(vocab) for _ in range(60)]

    def mutate(words, n):
        w = list(words)
        for _ in range(n):
            w[rng.randrange(len(w))] = rng.choice(vocab)
        return " ".join(w)

    # shard A: docs 0-9 distinct, 10-14 near-dups of base
    a_rows = []
    for i in range(10):
        a_rows.append((i, " ".join(rng.choice(vocab) for _ in range(60))))
    for i in range(10, 15):
        a_rows.append((i, mutate(base, 2)))
    # shard B: 20-22 fresh; 23-25 near-dups of base (dup vs INDEX);
    # 26-27 near-dups of each other (dup WITHIN batch)
    b_rows = []
    for i in range(20, 23):
        b_rows.append((i, " ".join(rng.choice(vocab) for _ in range(60))))
    for i in range(23, 26):
        b_rows.append((i, mutate(base, 2)))
    twin = [rng.choice(vocab) for _ in range(60)]
    b_rows.append((26, mutate(twin, 1)))
    b_rows.append((27, mutate(twin, 1)))
    return a_rows, b_rows


def test_incremental_matches_keep_first(ray_session, tmp_path):
    from recon_ray.functions.dedup import minhash_lsh_dedup

    a_rows, b_rows = _corpus()
    state = str(tmp_path / "idx")
    minhash_index_init(state, threshold=0.6)

    da = rd.from_pandas(pd.DataFrame(a_rows, columns=["doc_id", "text"])
                        ).repartition(2)
    ra = minhash_index_ingest(state, da, "shard-a")
    assert ra["n_new"] == 15
    # within shard A the base near-dups collapse keep-first to doc 10
    assert ra["n_novel"] == 11 and ra["n_dup"] == 4
    assert set(ra["novel_ids"]["doc_id"]) == set(range(11))

    db = rd.from_pandas(pd.DataFrame(b_rows, columns=["doc_id", "text"])
                        ).repartition(2)
    rb = minhash_index_ingest(state, db, "shard-b")
    assert rb["n_new"] == 8
    # 23-25 hit the index (cluster keeper = index doc 10); 27 loses to 26
    assert set(rb["novel_ids"]["doc_id"]) == {20, 21, 22, 26}
    assert rb["n_dup"] == 4

    # equality with batch keep-first over the union: survivors under
    # min-id batch dedup == docs the two ingests accepted
    union = rd.from_pandas(pd.DataFrame(a_rows + b_rows,
                                        columns=["doc_id", "text"]))
    batch = minhash_lsh_dedup(union.repartition(3), threshold=0.6)
    batch_survivors = {
        int(r["doc_id"]) for _, r in batch["clusters"].iterrows()
        if r["doc_id"] == r["cluster"]
    } | ({int(d) for d, _ in a_rows + b_rows}
         - set(batch["clusters"]["doc_id"]))
    incr_survivors = set(ra["novel_ids"]["doc_id"]) | set(
        rb["novel_ids"]["doc_id"])
    assert incr_survivors == batch_survivors

    # idempotent replay
    rb2 = minhash_index_ingest(state, db, "shard-b")
    assert rb2["replayed"] and rb2["n_novel"] == rb["n_novel"]
    man = json.load(open(f"{state}/_manifest.json"))
    assert man["n_docs"] == 15  # 11 + 4 accepted


def test_index_init_param_mismatch(ray_session, tmp_path):
    state = str(tmp_path / "idx2")
    minhash_index_init(state, threshold=0.6)
    minhash_index_init(state, threshold=0.6)  # idempotent
    with pytest.raises(ValueError):
        minhash_index_init(state, threshold=0.8)


def test_broadcast_and_shuffle_verify_agree(ray_session, tmp_path):
    """candidate_broadcast_limit=0 forces the distributed shuffle-join
    verify; the result must be bit-equal to the default broadcast-dict
    path at every ingest step (same contract as minhash_lsh_dedup's
    two paths)."""
    a_rows, b_rows = _corpus()
    outs = []
    for mode, limit in (("bcast", 1_000_000), ("shuffle", 0)):
        state = str(tmp_path / f"idx_{mode}")
        minhash_index_init(state, threshold=0.6)
        da = rd.from_pandas(pd.DataFrame(
            a_rows, columns=["doc_id", "text"])).repartition(2)
        db = rd.from_pandas(pd.DataFrame(
            b_rows, columns=["doc_id", "text"])).repartition(2)
        ra = minhash_index_ingest(state, da, "shard-a",
                                  candidate_broadcast_limit=limit)
        rb = minhash_index_ingest(state, db, "shard-b",
                                  candidate_broadcast_limit=limit)
        outs.append((ra, rb))
    for (x, y) in zip(outs[0], outs[1]):
        assert list(x["novel_ids"]["doc_id"]) == list(
            y["novel_ids"]["doc_id"])
        assert x["n_dup"] == y["n_dup"]
        pd.testing.assert_frame_equal(
            x["dup_pairs"].reset_index(drop=True),
            y["dup_pairs"].reset_index(drop=True))


def test_id_set_filter_null_ids(ray_session):
    """keep=False (the drop path) must RETAIN rows whose id is null —
    pc.is_in yields null for null input; without fill_null(False) the
    inverted mask stays null and Table.filter drops the row, silently
    losing null-id corpus rows (pandas ~isin keeps them)."""
    from recon_ray.functions.minhash_index import id_set_filter

    df = pd.DataFrame({
        "doc_id": pd.array([1, 2, None, 4], dtype="Int64"),
        "text": ["a", "b", "c", "d"],
    })
    ds = rd.from_pandas(df)
    kept = id_set_filter(ds, {2}, keep=False).to_pandas()
    # row with null id stays on the drop path
    assert sorted(kept["text"]) == ["a", "c", "d"]
    # keep=True: null-id rows are NOT members of the set
    only = id_set_filter(ds, {1, 4}, keep=True).to_pandas()
    assert sorted(only["text"]) == ["a", "d"]
