"""Distributed model training for curation loops: a multinomial logistic
regression trained by full-batch gradient descent over a Ray Dataset — the
shape of every quality-classifier stage (CCNet / fastText-style filters) a
100-TB curation pipeline needs, built on the repo's deterministic-reduce
pattern.

Scale + determinism shape (same as functions/similarity.py kmeans):
- blocks materialize ONCE into the object store (`to_arrow_refs`); every
  GD iteration is then a round of plain Ray tasks over the same refs —
  no per-iteration Dataset-executor startup;
- each task returns a per-block partial gradient QUANTIZED per row to
  int64 (×2^40). Integer addition is exact and order-free, so the fitted
  weights are bit-identical under any block layout / completion order —
  and bit-identical to a single-process NumPy run of the same math
  (pinned in tests/test_ml.py);
- features are L2-row-normalized (+ a bias column of 1) so every per-row
  gradient component is bounded by 1 and int64 partial sums have ~2^22
  rows of headroom per cell.

The model rides back into the pipeline via ``predict_proba`` — a
broadcast-weights ``map_batches`` scorer (one `ray.put`, zero-copy reads),
the same pattern as `assign_clusters`.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray

_Q = float(2**40)


def _feats(df: pd.DataFrame, emb_col: str) -> np.ndarray:
    m = np.stack(df[emb_col].to_numpy()).astype(np.float64)
    m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    return np.hstack([m, np.ones((len(m), 1))])


def _softmax(z: np.ndarray) -> np.ndarray:
    z = z - z.max(axis=1, keepdims=True)
    e = np.exp(z)
    return e / e.sum(axis=1, keepdims=True)


def _grad_rows_quantized(x: np.ndarray, y: np.ndarray, w: np.ndarray,
                         n_classes: int):
    """Per-row quantized (k × d+1) gradient contributions + quantized loss.
    Quantizing per ROW (not per partial) makes the total sum independent
    of how rows are batched."""
    p = _softmax(x @ w.T)
    diff = p.copy()
    diff[np.arange(len(y)), y] -= 1.0  # (n, k), each |entry| ≤ 1
    # (k, d+1) int64 sum of per-row outer products, quantized per row:
    # einsum over pre-quantized per-row terms would round the PRODUCT, so
    # quantize the product itself row by row via the outer-product matmul
    gq = np.zeros((n_classes, x.shape[1]), np.int64)
    # process in chunks to bound the (chunk, k, d+1) intermediate
    step = 4096
    for i in range(0, len(x), step):
        outer = diff[i:i + step, :, None] * x[i:i + step, None, :]
        gq += np.rint(outer * _Q).astype(np.int64).sum(axis=0)
    ll = np.log(np.maximum(p[np.arange(len(y)), y], 1e-300))
    loss_q = int(np.rint(-ll * _Q).astype(np.int64).sum())
    correct = int((p.argmax(axis=1) == y).sum())
    return gq, loss_q, correct


@ray.remote
def _logreg_partial_task(block, w_ref, label_col, emb_col, n_classes):
    df = block.to_pandas()
    if len(df) == 0:
        return (None, 0, 0, 0)
    x = _feats(df, emb_col)
    y = df[label_col].to_numpy().astype(np.int64)
    gq, loss_q, correct = _grad_rows_quantized(x, y, w_ref, n_classes)
    return (gq, loss_q, correct, len(df))


def fit_logreg(
    ds,
    label_col: str = "label",
    emb_col: str = "embedding",
    n_classes: int | None = None,
    lr: float = 1.0,
    n_iter: int = 20,
    l2: float = 1e-4,
) -> dict:
    """Train a multinomial logistic regression over ``(emb_col,
    label_col)`` with deterministic full-batch GD. Returns ``{"weights":
    (k, d+1) ndarray, "loss": per-iter list, "accuracy": float, "n": int,
    "n_classes": k}``. Labels must be 0..k-1 integers."""
    refs = ds.to_arrow_refs()
    if n_classes is None:
        # one cheap pass for the label range (labels are small ints)
        maxes = ray.get([_label_max_task.remote(b, label_col) for b in refs])
        maxes = [m for m in maxes if m is not None]
        if not maxes:
            return {"weights": np.zeros((0, 0)), "loss": [],
                    "accuracy": 0.0, "n": 0, "n_classes": 0}
        n_classes = int(max(maxes)) + 1

    dim = None
    w = None
    losses: list[float] = []
    acc = 0.0
    n_total = 0
    for _ in range(n_iter + 1):  # + final stats-only pass
        if w is None:
            # probe the first non-empty block for the feature width
            for b in refs:
                t = ray.get(b)
                if t.num_rows:
                    # np.asarray handles list, ndarray AND Ray's
                    # TensorArrayElement (from_pandas tensor extension)
                    dim = np.asarray(t.to_pandas()[emb_col].iloc[0]).size + 1
                    break
            if dim is None:
                return {"weights": np.zeros((0, 0)), "loss": [],
                        "accuracy": 0.0, "n": 0, "n_classes": n_classes}
            w = np.zeros((n_classes, dim), np.float64)
        parts = ray.get(
            [_logreg_partial_task.remote(b, w, label_col, emb_col, n_classes)
             for b in refs]
        )
        gq = np.zeros((n_classes, dim), np.int64)
        loss_q = 0
        correct = 0
        n_total = 0
        for p_g, p_l, p_c, p_n in parts:
            if p_g is None:
                continue
            gq += p_g
            loss_q += p_l
            correct += p_c
            n_total += p_n
        if n_total == 0:
            return {"weights": w, "loss": [], "accuracy": 0.0, "n": 0,
                    "n_classes": n_classes}
        losses.append(loss_q / _Q / n_total)
        acc = correct / n_total
        if len(losses) == n_iter + 1:
            break  # stats-only pass: loss/accuracy describe returned w
        g = gq.astype(np.float64) / _Q / n_total
        w = w - lr * (g + l2 * w)
    return {"weights": w, "loss": losses, "accuracy": acc, "n": n_total,
            "n_classes": n_classes}


@ray.remote
def _label_max_task(block, label_col):
    df = block.to_pandas()
    if len(df) == 0:
        return None
    return int(df[label_col].max())


def predict_proba(ds, weights: np.ndarray, emb_col: str = "embedding"):
    """Broadcast-weights scorer: appends ``pred`` (argmax class) and
    ``prob`` (its probability). Lazy map_batches — at scale this is the
    filter pass that gates documents on classifier score."""
    ref = ray.put(np.asarray(weights, dtype=np.float64))

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        w = ray.get(ref)
        if len(batch) == 0:
            batch["pred"] = pd.Series(dtype="int64")
            batch["prob"] = pd.Series(dtype="float64")
            return batch
        p = _softmax(_feats(batch, emb_col) @ w.T)
        batch = batch.copy()
        batch["pred"] = p.argmax(axis=1).astype(np.int64)
        batch["prob"] = p.max(axis=1)
        return batch

    return ds.map_batches(f, batch_format="pandas")
