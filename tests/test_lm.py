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


def test_curate_lm_gate():
    """The optional LM gate drops exactly the docs scoring below the
    threshold; lm_gate=None leaves the default path untouched."""
    from recon_ray.functions.lm import make_lm_scorer, train_bigram_lm
    from recon_ray.pipelines.curate import curate

    rng = np.random.RandomState(23)
    common = ["the", "cat", "sat", "on", "the", "mat"]
    rare = ["zx", "qv", "jj", "ww", "kk", "pp"]
    texts = [" ".join(rng.choice(common, 12)) for _ in range(30)]
    texts += [" ".join(rng.permutation(rare)) for _ in range(3)]
    # make every text distinct so exact-dedup keeps all
    texts = [f"{t} tail{i}" for i, t in enumerate(texts)]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts,
                       "lang": ["en"] * len(texts)})
    ds = rd.from_pandas(df).repartition(3)

    base = curate(ds, min_words=1, max_dup_word=1.1, drop_unknown_lang=False)
    n_base = base["curated"].count()
    assert n_base == len(texts)

    # expected survivors under the gate, computed with the same model
    model = train_bigram_lm(ds.select_columns(["doc_id", "text"]))
    scored = (
        ds.map_batches(make_lm_scorer(model), batch_format="pandas")
        .to_pandas()
    )
    thr = float(scored["lm_score"].quantile(0.2))
    want = set(scored.loc[scored["lm_score"] >= thr, "doc_id"])

    gated = curate(ds, min_words=1, max_dup_word=1.1, drop_unknown_lang=False, lm_gate=thr)
    got = set(gated["curated"].to_pandas()["doc_id"])
    assert got == want
    assert len(got) < n_base


def test_normalize_text_nfkc_and_whitespace():
    from recon_ray.functions.text import normalize_text

    df = pd.DataFrame(
        {"doc_id": [0, 1, 2],
         "text": ["  Hello\t\tWORLD \n", "ﬁne ﬀ", "already clean"]}
    )
    out = (
        normalize_text(rd.from_pandas(df))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["text_norm"].tolist() == ["hello world", "fine ff",
                                         "already clean"]
    assert out["norm_changed"].tolist() == [True, True, False]
