"""BPE vocabulary training — hand-computed merges, layout invariance,
encoder properties."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from recon_ray.functions.bpe import (
    EOW,
    bpe_encode_word,
    make_bpe_encoder,
    train_bpe,
)


def _ds(texts, parts=3):
    return rd.from_pandas(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    ).repartition(parts)


def test_train_bpe_hand_computed():
    # corpus: 'aa' ×4, 'ab' ×1. Word 'aa' = (a, a, </w>) → pairs
    # (a,a)=4 and (a,</w>)=4 tie; the deterministic tie-break picks the
    # lexicographically smaller pair ('</w>' < 'a'), so merge 1 is
    # ('a','</w>') and merge 2 is ('a','a</w>') with count 4.
    texts = ["aa aa", "aa aa ab"]
    res = train_bpe(_ds(texts), n_merges=2, min_pair_freq=2)
    assert res["merges"][0] == ("a", EOW)
    assert res["merges"][1] == ("a", "a" + EOW)
    assert res["n_words"] == 2  # distinct: aa, ab
    assert res["total_words"] == 5


def test_train_bpe_layout_invariant():
    rng = np.random.RandomState(6)
    vocab = ["spark", "sparkle", "sparse", "parse", "parquet", "park"]
    texts = [" ".join(rng.choice(vocab, rng.randint(3, 20)))
             for _ in range(120)]
    a = train_bpe(_ds(texts, parts=2), n_merges=30)
    b = train_bpe(_ds(texts, parts=11), n_merges=30)
    assert a["merges"] == b["merges"]
    assert a["total_words"] == b["total_words"]


def test_encoder_monotone_and_lossless():
    texts = ["the quick brown fox jumps over the lazy dog"] * 20
    res = train_bpe(_ds(texts), n_merges=50, min_pair_freq=1)
    ranks = {p: i for i, p in enumerate(res["merges"])}
    for w in ["quick", "lazy", "the", "unseenword"]:
        toks = bpe_encode_word(w, ranks)
        # lossless: concatenating tokens restores word + end marker
        assert "".join(toks) == w + EOW
        # merged encoding never longer than chars+1
        assert len(toks) <= len(w) + 1
    # trained words compress below the char baseline
    assert len(bpe_encode_word("quick", ranks)) < len("quick") + 1


def test_encoder_stage_counts():
    texts = ["aa ab aa", "ab ab"]
    res = train_bpe(_ds(texts, parts=1), n_merges=5, min_pair_freq=1)
    out = (
        _ds(texts, parts=2)
        .map_batches(make_bpe_encoder(res["merges"]), batch_format="pandas")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["n_words"].tolist() == [3, 2]
    ranks = {p: i for i, p in enumerate(res["merges"])}
    want0 = (2 * len(bpe_encode_word("aa", ranks))
             + len(bpe_encode_word("ab", ranks)))
    assert out["n_tokens"].iloc[0] == want0


def test_train_bpe_empty():
    ds = rd.from_pandas(
        pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                      "text": pd.Series([], dtype="object")})
    )
    res = train_bpe(ds)
    assert res == {"merges": [], "n_words": 0, "total_words": 0}
