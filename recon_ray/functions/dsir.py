"""DSIR — Data Selection with Importance Resampling (Xie et al. 2023,
arXiv:2302.03169): score every raw document by how much more likely its
features are under a TARGET corpus distribution than under the raw
corpus distribution, then keep/resample by that weight. The published
method uses hashed n-gram features; here the features are unigram words
(the reference's ``\\w+`` token rule), which keeps the weight rule exactly
SQL-expressible so the driver oracle can replay it end-to-end.

Scale shape (mirrors functions/lm.py):
- training = TWO distributed word-count passes (per-batch combiners, one
  key shuffle each) — the only passes that touch the corpus; the target
  side additionally filters before counting (predicate pushed into the
  same pass);
- the count tables are vocabulary-sized; the log-ratio vector broadcasts
  once (``ray.put``, cached per worker process) and each doc's weight is
  a vectorized dict lookup + per-doc sum inside ``map_batches``.

Weight rule (add-1 smoothing over the RAW vocabulary V, deterministic):
    lr(w)       = ln((c_t(w) + 1) / (N_t + V)) - ln((c_r(w) + 1) / (N_r + V))
    weight(doc) = sum over the doc's word occurrences of lr(w)
Raw-corpus scoring means every scored word is in V; c_t is 0 for words
the target never saw.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

import ray

from recon_ray.functions.lm import _tokens


def train_dsir(raw_ds, target_filter, text_col: str = "text") -> dict:
    """Build the DSIR log-ratio table. ``target_filter`` is a vectorized
    pandas predicate ``batch -> bool mask`` selecting the target rows
    (e.g. ``lambda b: b["lang"] == "en"``); the target is counted from the
    SAME pass shape as the raw side, predicate pushed before tokenizing."""
    from recon_ray.functions.relational import group_count

    def words_of(pred):
        def stage(batch: pd.DataFrame) -> pd.DataFrame:
            if pred is not None:
                batch = batch[pred(batch)]
            out: list[str] = []
            for t in batch[text_col]:
                out.extend(_tokens(t))
            return pd.DataFrame({"w": out})

        return stage

    raw = group_count(
        raw_ds.map_batches(words_of(None), batch_format="pandas"), "w"
    )
    tgt = group_count(
        raw_ds.map_batches(words_of(target_filter), batch_format="pandas"),
        "w",
    )
    n_raw = int(raw["count"].sum()) if len(raw) else 0
    n_tgt = int(tgt["count"].sum()) if len(tgt) else 0
    v = int(len(raw))
    tmap = dict(zip(tgt["w"], tgt["count"].astype(int)))
    lr = {
        w: math.log((tmap.get(w, 0) + 1.0) / (n_tgt + v))
        - math.log((c + 1.0) / (n_raw + v))
        for w, c in zip(raw["w"], raw["count"].astype(int))
    }
    return {"lr": lr, "V": v, "n_raw": n_raw, "n_target": n_tgt}


#: per-worker-process cache of the broadcast log-ratio table
_PROCESS_DSIR: dict = {}


def make_dsir_scorer(model_ref, text_col: str = "text",
                     id_col: str = "doc_id"):
    """map_batches stage → (id, n_words, dsir_weight): per-doc summed
    log-ratio, rounded to 6 decimals (the oracle's rule). ``model_ref``
    is ``ray.put(model)`` (or the model dict itself for local use)."""

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        if isinstance(model_ref, ray.ObjectRef):
            # stable content key (lm.py's pattern) — id() can be reused
            # after GC and would silently serve a stale model
            key = ("dsir", model_ref.hex())
            lr = _PROCESS_DSIR.get(key)
            if lr is None:
                lr = _PROCESS_DSIR[key] = ray.get(model_ref)["lr"]
        else:
            lr = model_ref["lr"]
        ids, n_words, weights = [], [], []
        for i, t in zip(batch[id_col], batch[text_col]):
            ws = _tokens(t)
            ids.append(i)
            n_words.append(len(ws))
            # in-doc-order accumulation: deterministic float sum
            weights.append(round(sum(lr.get(w, 0.0) for w in ws), 6))
        return pd.DataFrame(
            {id_col: ids, "n_words": n_words, "dsir_weight": weights}
        )

    return score
