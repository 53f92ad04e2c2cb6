"""Insights — Ray Data ports of recon/insights.py over flat mention tables.

The reference zips gold and predicted examples positionally
(recon/insights.py:150); here both sides are keyed tables joined on
``(doc_id, start, end, label)`` via a tagged union + groupby — no ordering
assumption, shuffle-friendly (SURVEY §2.5 anti-join pattern).

- ``label_disparities``        ← get_label_disparities (recon/insights.py:47-71)
- ``top_label_disparities``    ← recon/insights.py:74-110 (dedupe flag
  collapses (a,b)/(b,a))
- ``top_prediction_errors``    ← recon/insights.py:113-236: FP spans whose
  (start,end) match a gold span report (gold_label→pred_label); unmatched
  FPs report (NOT_LABELED→pred_label); FNs whose (start,end) wasn't already
  seen as an FP report (gold_label→NOT_LABELED). Grouped by
  (text, true_label, pred_label), counted, sorted desc.
- ``hardest_docs``             ← get_hardest_examples (recon/insights.py:239-290):
  per-doc PRF f-score, penalized by error count / max-count, min-max
  normalized, sorted ascending (hardest first).
- ``sample_mentions_stratified`` ← sample_examples (recon/sample.py:47-94):
  shuffle + per-bucket cap + global cap.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Sum

NOT_LABELED = "NOT_LABELED"


def _distinct_text_label(mentions_ds, case_sensitive: bool = False):
    """Distinct (text_norm, label) pairs — partial unique per batch, then
    a groupby-first global dedup (the vocabulary table)."""

    def partial(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        if not case_sensitive:
            text = pc.utf8_lower(text)
        t = pa.table({"text": text, "label": batch.column("label")})
        return t.group_by(["text", "label"]).aggregate([])

    pairs = mentions_ds.select_columns(["text", "label"]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return pairs.groupby(["text", "label"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )


def label_disparities(
    mentions_ds, label1: str, label2: str, case_sensitive: bool = False
) -> set[str]:
    """Texts annotated with BOTH labels."""
    pairs = _distinct_text_label(mentions_ds, case_sensitive).to_pandas()
    t1 = set(pairs.loc[pairs["label"] == label1, "text"])
    t2 = set(pairs.loc[pairs["label"] == label2, "text"])
    return t1 & t2


def top_label_disparities(
    mentions_ds, case_sensitive: bool = False, dedupe: bool = False
) -> pd.DataFrame:
    """(label1, label2, count) for all label pairs sharing texts, desc."""
    pairs = _distinct_text_label(mentions_ds, case_sensitive).to_pandas()
    by_label: dict[str, set] = {
        l: set(g["text"]) for l, g in pairs.groupby("label")
    }
    rows = []
    labels = sorted(by_label)
    for l1 in labels:
        for l2 in labels:
            if l1 == l2:
                continue
            if dedupe and l1 > l2:
                continue
            n = len(by_label[l1] & by_label[l2])
            if n > 0:
                rows.append({"label1": l1, "label2": l2, "count": n})
    df = pd.DataFrame(rows, columns=["label1", "label2", "count"])
    return df.sort_values(
        ["count", "label1", "label2"], ascending=[False, True, True],
        kind="mergesort",
    ).reset_index(drop=True)


SPAN_KEY = ["doc_id", "start", "end"]


def _tag(ds, side: str):
    def add(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "side", pa.array([side] * batch.num_rows, pa.string())
        )

    return ds.select_columns(SPAN_KEY + ["text", "label"]).map_batches(
        add, batch_format="pyarrow", zero_copy_batch=True
    )


def _doc_errors(g: pd.DataFrame) -> pd.DataFrame:
    """Per-doc FP/FN analysis (one group = one doc_id), reference
    semantics from recon/insights.py:152-196."""
    gold = {
        (int(r.start), int(r.end), r.label): r.text
        for r in g[g["side"] == "gold"].itertuples()
    }
    pred = {
        (int(r.start), int(r.end), r.label): r.text
        for r in g[g["side"] == "pred"].itertuples()
    }
    fp = set(pred) - set(gold)
    fn = set(gold) - set(pred)
    out = []
    seen: set[tuple] = set()
    gold_by_offsets = {(s, e): (s, e, l) for (s, e, l) in gold}
    for s, e, plabel in sorted(fp):
        match = gold_by_offsets.get((s, e))
        if match:
            _, _, glabel = match
            out.append((gold[match], glabel, plabel))
        else:
            out.append((pred[(s, e, plabel)], NOT_LABELED, plabel))
        seen.add((s, e))
    for s, e, glabel in sorted(fn):
        if (s, e) not in seen:
            out.append((gold[(s, e, glabel)], glabel, NOT_LABELED))
    if not out:
        return pd.DataFrame(
            columns=["text", "true_label", "pred_label", "partial"]
        )
    df = pd.DataFrame(out, columns=["text", "true_label", "pred_label"])
    return df.groupby(
        ["text", "true_label", "pred_label"], as_index=False
    ).size().rename(columns={"size": "partial"})


def top_prediction_errors(
    pred_mentions, gold_mentions,
    exclude_fp: bool = False, exclude_fn: bool = False,
):
    """(text, true_label, pred_label, count) sorted desc — per-doc set
    diff inside map_groups, then a grouped count over error records."""
    union = _tag(pred_mentions, "pred").union(_tag(gold_mentions, "gold"))
    per_doc = union.groupby("doc_id").map_groups(
        _doc_errors, batch_format="pandas"
    )
    errors = per_doc.groupby(["text", "true_label", "pred_label"]).aggregate(
        Sum("partial", alias_name="count")
    )
    df = errors.to_pandas()
    if exclude_fp:  # FP-branch rows are exactly those with a real pred_label
        df = df[df["pred_label"] == NOT_LABELED]
    if exclude_fn:  # FN-branch rows are exactly those predicted NOT_LABELED
        df = df[df["pred_label"] != NOT_LABELED]
    df["count"] = df["count"].astype("int64")
    return df.sort_values(
        ["count", "text", "true_label", "pred_label"],
        ascending=[False, True, True, True], kind="mergesort",
    ).reset_index(drop=True)


def _doc_prf(g: pd.DataFrame) -> pd.DataFrame:
    gold = {
        (int(r.start), int(r.end), r.label)
        for r in g[g["side"] == "gold"].itertuples()
    }
    pred = {
        (int(r.start), int(r.end), r.label)
        for r in g[g["side"] == "pred"].itertuples()
    }
    tp = len(gold & pred)
    fp = len(pred - gold)
    fn = len(gold - pred)
    p = tp / (tp + fp) if tp + fp else 0.0
    r = tp / (tp + fn) if tp + fn else 0.0
    f = 2 * p * r / (p + r) if p + r else 0.0
    score = f if (gold and pred) else 1.0  # reference quirk: empty → 1.0
    return pd.DataFrame(
        {"doc_id": [g["doc_id"].iloc[0]], "count": [fp + fn], "score": [score]}
    )


def hardest_docs(
    pred_mentions, gold_mentions,
    score_count: bool = True, normalize_scores: bool = True,
) -> pd.DataFrame:
    """Per-doc difficulty ranking (hardest first)."""
    union = _tag(pred_mentions, "pred").union(_tag(gold_mentions, "gold"))
    per_doc = union.groupby("doc_id").map_groups(_doc_prf, batch_format="pandas")
    df = per_doc.to_pandas()
    if score_count and len(df):
        max_count = int(df["count"].max())
        if max_count > 0:
            df["score"] = df["score"] - df["count"] / max_count
        if normalize_scores:
            s = df["score"].to_numpy(dtype=np.float64)
            rng = np.ptp(s)
            df["score"] = (s - s.min()) / rng if rng else 0.0
    return df.sort_values(
        ["score", "count", "doc_id"], kind="mergesort"
    ).reset_index(drop=True)


def sample_mentions_stratified(
    mentions_ds,
    bucket_cols: list[str],
    top_k_per_bucket: int = 10,
    top_k: int = -1,
    seed: int = 0,
):
    """sample_examples port (recon/sample.py:47-94) with one upgrade: the
    reference's unseeded ``random.shuffle`` is replaced by a deterministic
    per-row pseudo-random sort key (hash of row identity ⊕ seed), so the
    sample is reproducible across runs and cluster layouts — no
    random_shuffle all-to-all needed, just per-group top-k."""

    def add_key(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        s = batch.column("start").to_numpy(zero_copy_only=False).astype(np.uint64)
        e = batch.column("end").to_numpy(zero_copy_only=False).astype(np.uint64)
        k = (
            d * np.uint64(0x9E3779B97F4A7C15)
            ^ (s + np.uint64(seed) * np.uint64(0xBF58476D1CE4E5B9))
            ^ (e * np.uint64(0x94D049BB133111EB))
        )
        # xorshift finalize for avalanche
        k ^= k >> np.uint64(31)
        k *= np.uint64(0x7FB5D329728EA185)
        k ^= k >> np.uint64(27)
        return batch.append_column("_sk", pa.array(k, pa.uint64()))

    keyed = mentions_ds.map_batches(
        add_key, batch_format="pyarrow", zero_copy_batch=True
    )
    capped = keyed.groupby(bucket_cols).map_groups(
        lambda g: g.sort_values("_sk", kind="mergesort").head(top_k_per_bucket),
        batch_format="pandas",
    )
    if top_k > 0:
        capped = capped.sort("_sk").limit(top_k)
    return capped.drop_columns(["_sk"])
