"""Similarity search over an embedding column (``list<float>``).

- ``knn_bruteforce``: exact cosine top-k — the query matrix broadcasts once
  (``ray.put``), each batch computes a numpy matmul block and emits its
  LOCAL top-k per query; the driver merges ≤ k×n_batches rows. No shuffle,
  no full materialization of the corpus.
- ``knn_lsh``: the scale path — random-hyperplane signatures bucket the
  corpus (groupby shuffle on small signature rows); queries search only
  matching buckets (multi-probe over Hamming-1 neighbors). Approximate;
  recall measured against brute force in tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def knn_bruteforce(
    emb_ds,
    queries: np.ndarray,
    k: int = 10,
    query_ids: list | None = None,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    round_scores: int = 6,
) -> pd.DataFrame:
    """(query_id, rank, vec_id, cosine) — exact, deterministic ties broken
    by (−cosine, vec_id)."""
    q = _normalize(np.asarray(queries, dtype=np.float64))
    q_ref = ray.put(q)
    qids = list(query_ids) if query_ids is not None else list(range(len(q)))

    def local_topk(batch: pd.DataFrame) -> pd.DataFrame:
        qm = ray.get(q_ref)
        m = _normalize(np.stack(batch[emb_col].to_numpy()).astype(np.float64))
        sims = qm @ m.T  # (n_q, n_batch)
        ids = batch[id_col].to_numpy()
        kk = min(k, sims.shape[1])
        out_q, out_id, out_s = [], [], []
        for qi in range(sims.shape[0]):
            idx = np.argpartition(-sims[qi], kk - 1)[:kk]
            out_q += [qi] * kk
            out_id += ids[idx].tolist()
            out_s += sims[qi, idx].tolist()
        return pd.DataFrame({"qi": out_q, id_col: out_id, "cosine": out_s})

    parts = emb_ds.map_batches(local_topk, batch_format="pandas").to_pandas()
    out = []
    for qi, g in parts.groupby("qi"):
        g = g.sort_values(["cosine", id_col], ascending=[False, True],
                          kind="mergesort").head(k)
        g = g.assign(rank=np.arange(1, len(g) + 1), query_id=qids[qi])
        out.append(g)
    df = pd.concat(out, ignore_index=True)
    df["cosine"] = df["cosine"].round(round_scores)
    return df[["query_id", "rank", id_col, "cosine"]].sort_values(
        ["query_id", "rank"]
    ).reset_index(drop=True)


def _rh_planes(dim: int, n_bits: int, seed: int = 99) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.normal(size=(n_bits, dim))


def _signature(m: np.ndarray, planes: np.ndarray) -> np.ndarray:
    bits = (m @ planes.T) > 0
    weights = (1 << np.arange(planes.shape[0])).astype(np.int64)
    return bits.astype(np.int64) @ weights


def knn_lsh(
    emb_ds,
    queries: np.ndarray,
    k: int = 10,
    n_bits: int = 8,
    n_tables: int = 4,
    query_ids: list | None = None,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    seed: int = 99,
    multiprobe: bool = True,
) -> pd.DataFrame:
    """Bucketed approximate top-k: ``n_tables`` independent hyperplane
    tables, each hashing the corpus into 2^n_bits buckets; a query scans
    the union of its buckets (plus Hamming-1 probes). Multiple tables is
    the standard recall lever for random-hyperplane LSH. At cluster scale
    the bucketed corpus is a Dataset partitioned by (table, signature);
    here buckets collect per-batch then concat driver-side."""
    q = _normalize(np.asarray(queries, dtype=np.float64))
    planes = [
        _rh_planes(q.shape[1], n_bits, seed + 7919 * t) for t in range(n_tables)
    ]
    planes_ref = ray.put(planes)
    qids = list(query_ids) if query_ids is not None else list(range(len(q)))

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        ps = ray.get(planes_ref)
        m = _normalize(np.stack(batch[emb_col].to_numpy()).astype(np.float64))
        out = {id_col: batch[id_col].values, emb_col: batch[emb_col].values}
        for t, p in enumerate(ps):
            out[f"bucket{t}"] = _signature(m, p)
        return pd.DataFrame(out)

    tagged = emb_ds.map_batches(tag, batch_format="pandas").to_pandas()
    by_bucket = [
        {b: g for b, g in tagged.groupby(f"bucket{t}")} for t in range(n_tables)
    ]
    q_sigs = [_signature(q, p) for p in planes]
    rows = []
    for qi in range(len(q)):
        cand = []
        for t in range(n_tables):
            probes = [int(q_sigs[t][qi])]
            if multiprobe:
                probes += [int(q_sigs[t][qi]) ^ (1 << b) for b in range(n_bits)]
            cand += [by_bucket[t][b] for b in probes if b in by_bucket[t]]
        if not cand:
            continue
        cdf = pd.concat(cand).drop_duplicates(id_col)
        m = _normalize(np.stack(cdf[emb_col].to_numpy()).astype(np.float64))
        sims = m @ q[qi]
        g = pd.DataFrame({id_col: cdf[id_col].values, "cosine": sims})
        g = g.sort_values(["cosine", id_col], ascending=[False, True],
                          kind="mergesort").head(k)
        g = g.assign(rank=np.arange(1, len(g) + 1), query_id=qids[qi])
        rows.append(g)
    if not rows:
        return pd.DataFrame(columns=["query_id", "rank", id_col, "cosine"])
    df = pd.concat(rows, ignore_index=True)
    df["cosine"] = df["cosine"].round(6)
    return df[["query_id", "rank", id_col, "cosine"]].sort_values(
        ["query_id", "rank"]
    ).reset_index(drop=True)


def knn_recall(approx: pd.DataFrame, exact: pd.DataFrame, id_col: str = "vec_id") -> float:
    """Mean per-query recall of approx vs exact neighbor sets."""
    recalls = []
    for qid, g in exact.groupby("query_id"):
        truth = set(g[id_col])
        got = set(approx.loc[approx["query_id"] == qid, id_col])
        recalls.append(len(truth & got) / len(truth) if truth else 1.0)
    return float(np.mean(recalls)) if recalls else 0.0
