"""Bigram LM scorer — hand-computed score, layout invariance, edge cases."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import ray.data as rd

from recon_ray.functions.lm import make_lm_scorer, train_bigram_lm


def _ds(texts, parts=3):
    return rd.from_pandas(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    ).repartition(parts)


def test_lm_hand_computed():
    # corpus: "a b" ×2, "a c" ×1 → uni: a=3, b=2... wait: tokens per doc
    texts = ["a b", "a b", "a c"]
    model = train_bigram_lm(_ds(texts, parts=1))
    assert model["uni"] == {"a": 3, "b": 2, "c": 1}
    assert model["bi"] == {("a", "b"): 2, ("a", "c"): 1}
    assert model["V"] == 3
    out = (
        _ds(texts, parts=2)
        .map_batches(make_lm_scorer(model, k=1.0), batch_format="pandas")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # doc 0: one bigram (a,b): ln((2+1)/(3+3)) = ln(0.5)
    assert out["lm_score"].iloc[0] == math.log(0.5)
    # doc 2: (a,c): ln((1+1)/(3+3)) = ln(1/3)
    assert abs(out["lm_score"].iloc[2] - math.log(2 / 6)) < 1e-15
    assert out["n_bigrams"].tolist() == [1, 1, 1]


def test_lm_layout_invariant():
    rng = np.random.RandomState(17)
    vocab = ["the", "cat", "sat", "on", "mat", "dog"]
    texts = [" ".join(rng.choice(vocab, rng.randint(2, 30)))
             for _ in range(80)]
    a = train_bigram_lm(_ds(texts, parts=2))
    b = train_bigram_lm(_ds(texts, parts=9))
    assert a == b


def test_lm_short_docs_score_zero():
    texts = ["single", "", "two words"]
    model = train_bigram_lm(_ds(texts, parts=1))
    out = (
        _ds(texts, parts=1)
        .map_batches(make_lm_scorer(model), batch_format="pandas")
        .to_pandas()
        .sort_values("doc_id")
    )
    assert out["lm_score"].iloc[0] == 0.0
    assert out["lm_score"].iloc[1] == 0.0
    assert out["n_bigrams"].tolist() == [0, 0, 1]
