"""N-gram language-model quality scoring — the CCNet-style "score every
document under a corpus LM" curation signal (Wenzek et al. 2020 use
KenLM; here a bigram model with add-k smoothing, trained ON the corpus
itself or any reference corpus).

Scale shape:
- training = TWO distributed word/bigram counts (per-batch combiners +
  one key shuffle each, `relational.group_count`) — the only passes that
  touch the corpus;
- the count tables are vocabulary-sized; scoring broadcasts them once
  (`ray.put`, cached per worker process) and each doc's mean bigram
  log-likelihood is a vectorized lookup inside `map_batches`.

Scoring rule (deterministic, SQL-expressible — the query's DuckDB oracle
reproduces it exactly):  for each adjacent word pair (w1, w2),
    lp = ln( (c(w1,w2) + k) / (c1(w1) + k·V) )
with V = distinct unigram count; a doc's score is the MEAN lp over its
bigrams (docs with < 2 words score 0).
"""

from __future__ import annotations

import math
import re

import numpy as np
import pandas as pd

import ray

WORD_RE = re.compile(r"\w+", re.UNICODE)


def _tokens(text: str) -> list[str]:
    return [w.lower() for w in WORD_RE.findall(text)]


def train_bigram_lm(ds, text_col: str = "text") -> dict:
    """Count tables for the bigram model: {"uni": {w: c}, "bi": {(w1,w2):
    c}, "V": distinct unigrams}."""
    from recon_ray.functions.relational import group_count

    def unis(batch: pd.DataFrame) -> pd.DataFrame:
        out: list[str] = []
        for t in batch[text_col]:
            out.extend(_tokens(t))
        return pd.DataFrame({"w": out})

    def bis(batch: pd.DataFrame) -> pd.DataFrame:
        w1: list[str] = []
        w2: list[str] = []
        for t in batch[text_col]:
            ws = _tokens(t)
            w1.extend(ws[:-1])
            w2.extend(ws[1:])
        return pd.DataFrame({"w1": w1, "w2": w2})

    uni = group_count(ds.map_batches(unis, batch_format="pandas"), "w")
    bi = group_count(ds.map_batches(bis, batch_format="pandas"),
                     ["w1", "w2"])
    return {
        "uni": dict(zip(uni["w"], uni["count"].astype(int))),
        "bi": {
            (a, b): int(c)
            for a, b, c in zip(bi["w1"], bi["w2"], bi["count"])
        },
        "V": int(len(uni)),
    }


#: per-worker-process cache of the broadcast count tables
_PROCESS_LM: dict = {}


def make_lm_scorer(model_ref, k: float = 1.0, text_col: str = "text",
                   id_col: str = "doc_id"):
    """map_batches stage → (id, n_bigrams, lm_score): mean smoothed
    bigram log-likelihood per doc. ``model_ref`` is ``ray.put(model)``
    (or the model dict itself for local use)."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        if isinstance(model_ref, dict):
            model = model_ref
        else:
            key = ("lm", model_ref.hex())
            model = _PROCESS_LM.get(key)
            if model is None:
                model = _PROCESS_LM[key] = ray.get(model_ref)
        uni, bi, v = model["uni"], model["bi"], model["V"]
        n_bi = np.zeros(len(batch), np.int64)
        score = np.zeros(len(batch), np.float64)
        for j, t in enumerate(batch[text_col]):
            ws = _tokens(t)
            if len(ws) < 2:
                continue
            s = 0.0
            for a, b in zip(ws[:-1], ws[1:]):
                s += math.log(
                    (bi.get((a, b), 0) + k) / (uni.get(a, 0) + k * v)
                )
            n_bi[j] = len(ws) - 1
            score[j] = s / (len(ws) - 1)
        return pd.DataFrame(
            {id_col: batch[id_col].to_numpy(),
             "n_bigrams": n_bi, "lm_score": score}
        )

    return fn
