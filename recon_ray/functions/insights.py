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
    """Distinct (text_norm, label) pairs — partial unique per batch, then a
    bucketed global dedup (one vectorized call per hash bucket; a per-
    distinct-pair callback would cost ~1 ms × vocabulary size)."""
    from recon_ray.functions.relational import bucketed_group_apply

    def partial(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        if not case_sensitive:
            text = pc.utf8_lower(text)
        t = pa.table({"text": text, "label": batch.column("label")})
        return t.group_by(["text", "label"]).aggregate([])

    pairs = mentions_ds.select_columns(["text", "label"]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return bucketed_group_apply(
        pairs, ["text", "label"],
        lambda g: g.drop_duplicates(["text", "label"]),
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


N_ERROR_BUCKETS = 64


def _with_bucket(ds):
    """hash(doc_id) bucket column — a per-group Python callback costs ~1 ms
    per group (see canonicalize.py), so the FP/FN logic runs once per
    BUCKET of docs, fully vectorized, instead of once per doc."""

    def add(t: pa.Table) -> pa.Table:
        # N_ERROR_BUCKETS is a power of two, so the modulo is a
        # bit-mask (pyarrow has no modulo kernel)
        b = pc.cast(pc.bit_wise_and(
            pc.cast(t.column("doc_id"), pa.uint64()),
            pa.scalar(N_ERROR_BUCKETS - 1, pa.uint64())), pa.int64())
        return t.append_column("bucket", b)

    return ds.map_batches(add, batch_format="pyarrow",
                          zero_copy_batch=True)


def _bucket_errors(
    g: pd.DataFrame, exclude_fp: bool = False, exclude_fn: bool = False
) -> pd.DataFrame:
    """Vectorized FP/FN analysis for every doc in one bucket — reference
    semantics from recon/insights.py:152-196 via three merges:

    - outer-merge pred/gold span sets on (doc,start,end,label): left-only
      rows are FPs, right-only rows are FNs;
    - FPs join gold on (doc,start,end): a hit reports (gold_text,
      gold_label → pred_label) [offset collisions resolved to the min gold
      label, deterministic], a miss reports (pred_text, NOT_LABELED →
      pred_label);
    - FNs anti-join the FP offsets per doc ('seen' rule), the rest report
      (gold_text, gold_label → NOT_LABELED).

    ``exclude_fp`` skips the WHOLE FP branch including the 'seen' offset
    suppression (recon/insights.py:163 guards the branch that also does
    seen.add), so FNs at offsets that had a mislabeled FP are still
    reported; ``exclude_fn`` skips the FN branch."""
    k = ["doc_id", "start", "end", "label"]
    pred = g[g["side"] == "pred"][k + ["text"]].drop_duplicates(k)
    gold = g[g["side"] == "gold"][k + ["text"]].drop_duplicates(k)
    m = pred.merge(gold, on=k, how="outer", indicator=True,
                   suffixes=("_p", "_g"))
    fp = m[m["_merge"] == "left_only"].rename(columns={"text_p": "ptext"})
    fn = m[m["_merge"] == "right_only"].rename(columns={"text_g": "gtext"})
    off = ["doc_id", "start", "end"]
    if exclude_fp:
        errors = pd.DataFrame(columns=["text", "true_label", "pred_label"])
    else:
        gold_off = (
            gold.sort_values(k, kind="mergesort").drop_duplicates(off)
            .rename(columns={"label": "glabel", "text": "gtext"})
        )
        fpm = fp.merge(gold_off, on=off, how="left")
        matched = fpm["glabel"].notna()
        errors = pd.DataFrame(
            {
                "text": np.where(matched, fpm["gtext"], fpm["ptext"]),
                "true_label": np.where(matched, fpm["glabel"], NOT_LABELED),
                "pred_label": fpm["label"].values,
            }
        )
    if len(fn) and not exclude_fn:
        if exclude_fp:
            fn_keep = fn  # no FP branch ran → no 'seen' offsets to suppress
        else:
            seen = fp[off].drop_duplicates()
            fnm = fn.merge(seen, on=off, how="left", indicator="seen_fp")
            fn_keep = fnm[fnm["seen_fp"] == "left_only"]
        errors = pd.concat(
            [
                errors,
                pd.DataFrame(
                    {
                        "text": fn_keep["gtext"].values,
                        "true_label": fn_keep["label"].values,
                        "pred_label": NOT_LABELED,
                    }
                ),
            ],
            ignore_index=True,
        )
    if not len(errors):
        return pd.DataFrame(
            columns=["text", "true_label", "pred_label", "partial"]
        )
    return errors.groupby(
        ["text", "true_label", "pred_label"], as_index=False
    ).size().rename(columns={"size": "partial"})


def top_prediction_errors(
    pred_mentions, gold_mentions,
    exclude_fp: bool = False, exclude_fn: bool = False,
):
    """(text, true_label, pred_label, count) sorted desc — bucketed
    vectorized FP/FN diff, then a grouped count over error records.
    The exclude flags thread INTO the per-bucket kernel because they change
    the 'seen' suppression semantics, not just the output filter."""
    from functools import partial

    union = _tag(pred_mentions, "pred").union(_tag(gold_mentions, "gold"))
    per_bucket = _with_bucket(union).groupby("bucket").map_groups(
        partial(_bucket_errors, exclude_fp=exclude_fp, exclude_fn=exclude_fn),
        batch_format="pandas",
    )
    errors = per_bucket.groupby(["text", "true_label", "pred_label"]).aggregate(
        Sum("partial", alias_name="count")
    )
    df = errors.to_pandas()
    if "count" not in df.columns:  # no errors at all → empty result frame
        return pd.DataFrame(
            columns=["text", "true_label", "pred_label", "count"]
        ).astype({"count": "int64"})
    df["count"] = df["count"].astype("int64")
    return df.sort_values(
        ["count", "text", "true_label", "pred_label"],
        ascending=[False, True, True, True], kind="mergesort",
    ).reset_index(drop=True)


def _bucket_prf(g: pd.DataFrame) -> pd.DataFrame:
    """Per-doc tp/fp/fn for every doc in one bucket, via one outer merge +
    grouped counts (no per-doc Python)."""
    k = ["doc_id", "start", "end", "label"]
    pred = g[g["side"] == "pred"][k].drop_duplicates(k)
    gold = g[g["side"] == "gold"][k].drop_duplicates(k)
    m = pred.merge(gold, on=k, how="outer", indicator=True)
    counts = (
        m.groupby(["doc_id", "_merge"], observed=True)
        .size()
        .unstack(fill_value=0)
        .reindex(columns=["both", "left_only", "right_only"], fill_value=0)
        .reset_index()
    )
    tp = counts["both"].to_numpy(dtype=np.float64)
    fp = counts["left_only"].to_numpy(dtype=np.float64)
    fn = counts["right_only"].to_numpy(dtype=np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        p = np.where(tp + fp > 0, tp / (tp + fp), 0.0)
        r = np.where(tp + fn > 0, tp / (tp + fn), 0.0)
        f = np.where(p + r > 0, 2 * p * r / (p + r), 0.0)
    # reference quirk (recon/insights.py:268): score = 1.0 unless BOTH
    # sides are non-empty
    has_pred = (tp + fp) > 0
    has_gold = (tp + fn) > 0
    score = np.where(has_pred & has_gold, f, 1.0)
    return pd.DataFrame(
        {
            "doc_id": counts["doc_id"].values,
            "count": (fp + fn).astype("int64"),
            "score": score,
        }
    )


def hardest_docs(
    pred_mentions, gold_mentions,
    score_count: bool = True, normalize_scores: bool = True,
) -> pd.DataFrame:
    """Per-doc difficulty ranking (hardest first)."""
    union = _tag(pred_mentions, "pred").union(_tag(gold_mentions, "gold"))
    per_doc = _with_bucket(union).groupby("bucket").map_groups(
        _bucket_prf, batch_format="pandas"
    )
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


_MIX_C = 0x9E3779B97F4A7C15  # golden-ratio multiplier (odd)


def mixture_sample(ds, key_col: str, rates: dict, id_col: str = "doc_id"):
    """Deterministic mixture sampling — the domain/language-mixing step of
    training-corpus composition: keep each row of group k with probability
    ``rates[k]``, decided by a pure function of the row id (multiplicative
    hash vs a per-group threshold), NOT an RNG. No shuffle, no state, the
    same rows survive on any cluster layout or rerun, and the rule is
    exactly SQL-expressible (id·C mod 2⁶⁴ < ⌊rate·2⁶⁴⌋ — uint64 wraparound
    IS the modulus). Rows whose key has no configured rate drop. Pure map
    stage: composes with any pipeline at zero shuffle cost.

    Reference tie-in: the reference's sampling (recon/sample.py) is an
    unseeded random.shuffle; this is the distributed-reproducible form."""
    thresholds = {k: int(float(r) * (1 << 64)) for k, r in rates.items()}
    # rate ≥ 1.0 → threshold ≥ 2^64 → every row passes (kept exact, no
    # uint64 overflow); rates < 1.0 compare in exact uint64 space
    keep_all = frozenset(k for k, t in thresholds.items() if t >= (1 << 64))
    thr_u64 = {
        k: np.uint64(t) for k, t in thresholds.items() if t < (1 << 64)
    }

    def pick(t: pa.Table) -> pa.Table:
        ids = (t.column(id_col).to_numpy(zero_copy_only=False)
               .astype(np.uint64))
        h = ids * np.uint64(_MIX_C)  # wraps mod 2^64
        keys = pd.Series(t.column(key_col).to_pandas())
        keep = keys.isin(keep_all).to_numpy()
        m = keys.map(thr_u64)
        has = m.notna().to_numpy()
        if has.any():
            tvals = np.fromiter(
                (int(x) for x in m[has]), dtype=np.uint64, count=int(has.sum())
            )
            keep[has] = h[has] < tvals
        return t.filter(pa.array(keep))

    return ds.map_batches(pick, batch_format="pyarrow",
                          zero_copy_batch=True)


def assign_split(ds, fractions: dict, id_col: str = "doc_id",
                 split_col: str = "split"):
    """Deterministic train/val/test assignment — every row gets a split
    label from its id's multiplicative u64 hash against cumulative
    fraction thresholds (first bucket whose cumulative share exceeds the
    hash). Pure map stage: no RNG, no shuffle, layout/rerun-invariant,
    and membership survives corpus growth (a doc's split never changes
    when other docs are added — the property an eval holdout needs).
    Exactly SQL-expressible as a CASE over id·C mod 2⁶⁴ thresholds.

    ``fractions``: ordered {label: fraction}; must sum to ≤ 1.0, the
    remainder (if any) falls into the LAST label."""
    labels = list(fractions)
    if not labels:
        raise ValueError("fractions must be non-empty")
    cum, thresholds = 0.0, []
    for lb in labels[:-1]:
        cum += float(fractions[lb])
        thresholds.append(np.uint64(min(int(cum * (1 << 64)), (1 << 64) - 1)))

    def tag(t: pa.Table) -> pa.Table:
        ids = (t.column(id_col).to_numpy(zero_copy_only=False)
               .astype(np.uint64))
        h = ids * np.uint64(_MIX_C)  # wraps mod 2^64
        idx = np.zeros(t.num_rows, dtype=np.int64)
        for thr in thresholds:
            idx += (h >= thr).astype(np.int64)
        lab = pa.array(np.array(labels, dtype=object)[idx], pa.string())
        return t.append_column(split_col, lab)

    return ds.map_batches(tag, batch_format="pyarrow",
                          zero_copy_batch=True)


def weighted_bernoulli_sample(ds, weight_col: str, cap: int,
                              id_col: str = "doc_id"):
    """Deterministic probability-proportional-to-size sampling: a row is
    kept iff ``(id·C mod 2⁶⁴) mod cap < weight`` — inclusion probability
    ``min(max(weight,0),cap)/cap`` per row, decided by the same
    multiplicative u64 hash as ``assign_split``, so the sample is
    layout/rerun-invariant, growth-stable (a row's fate never changes
    when other rows arrive), needs no RNG state, and is exactly
    SQL-replicable in HUGEINT arithmetic (unlike Efraimidis–Spirakis
    keys, whose ``u^(1/w)`` transcendentals can't be replayed
    bit-exactly across engines). Pure map stage: no shuffle.

    The modulo draw has bias ≤ cap/2⁶⁴ versus a perfect uniform — for
    any practical cap (≤ 2³²) that is < 1e-9 and the DOCUMENTED
    trade-off for exact cross-engine replay."""
    if cap <= 0:
        raise ValueError("cap must be positive")

    def keep(t: pa.Table) -> pa.Table:
        ids = (t.column(id_col).to_numpy(zero_copy_only=False)
               .astype(np.uint64))
        draw = (ids * np.uint64(_MIX_C)) % np.uint64(cap)
        w = np.maximum(
            t.column(weight_col).to_numpy(zero_copy_only=False)
            .astype(np.int64), 0
        ).astype(np.uint64)
        return t.filter(pa.array(draw < w))

    return ds.map_batches(keep, batch_format="pyarrow",
                          zero_copy_batch=True)


def deterministic_shuffle(ds, id_col: str = "doc_id", n_buckets: int = 256,
                          pos_col: str = "shuffle_pos"):
    """Deterministic global shuffle — the training-order pass of corpus
    prep. Every row gets ``pos_col`` = its rank under the u64
    multiplicative hash h(id) = id·C mod 2⁶⁴ (C odd ⇒ bijection ⇒ with
    unique ids the order is a total permutation), so the "shuffled" order
    is a pure function of the data: reproducible across reruns, cluster
    sizes, and block layouts — unlike ``Dataset.random_shuffle``, whose
    output depends on the run. Exactly SQL-expressible
    (row_number() OVER (ORDER BY id·C mod 2⁶⁴)).

    Two passes, neither driver-heavy:
    1. per-bucket histogram (bucket = top log2(n_buckets) bits of h — a
       RANGE partition of hash space, so bucket order = hash order):
       combiner counts, driver prefix-sums n_buckets ints.
    2. one hash shuffle on bucket id; inside each shuffle group rows sort
       by h and positions are offset[bucket] + within-bucket cumcount —
       vectorized, bounded Python callbacks.

    Requires ``id_col`` unique (duplicate ids would tie on h; ties break
    by input order, which is not layout-stable)."""
    from recon_ray.functions.relational import bucketed_group_apply, group_count

    shift = np.uint64(64 - int(np.log2(n_buckets)))
    if (1 << (64 - int(shift))) != n_buckets:
        raise ValueError("n_buckets must be a power of two")

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[id_col].to_numpy().astype(np.uint64)
        h = ids * np.uint64(_MIX_C)
        return batch.assign(
            __h=h, __dbucket=(h >> shift).astype(np.int64)
        )

    tagged = ds.map_batches(tag, batch_format="pandas")
    hist = group_count(
        tagged.select_columns(["__dbucket"]), "__dbucket", alias="n"
    ).sort_values("__dbucket")
    offsets = np.zeros(n_buckets, np.int64)
    if len(hist):
        counts = np.zeros(n_buckets, np.int64)
        counts[hist["__dbucket"].to_numpy()] = hist["n"].to_numpy()
        offsets[1:] = np.cumsum(counts)[:-1]

    def assign(g: pd.DataFrame) -> pd.DataFrame:
        # the shuffle group may hold several logical buckets (internal
        # hash collisions); sorting by h orders within each — bucket is
        # h's high bits, so (bucket, h) order == h order
        g = g.sort_values("__h", kind="mergesort")
        b = g["__dbucket"].to_numpy()
        pos = offsets[b] + g.groupby("__dbucket", sort=False).cumcount().to_numpy()
        return g.drop(columns=["__h", "__dbucket"]).assign(**{pos_col: pos})

    return bucketed_group_apply(tagged, "__dbucket", assign)


def funnel(ds, stages: list, user_col: str = "user_id", ts_col: str = "ts",
           type_col: str = "event_type") -> pd.DataFrame:
    """Conversion funnel with first-touch semantics: a user reaches stage i
    iff they have a ``stages[i]`` event STRICTLY after their first
    qualifying ``stages[i-1]`` event (stage 0 = first event of that type).
    Returns (stage_idx, stage, n_users) — one row per stage.

    Shape: ONE hash shuffle on the user key (every user's events land in
    one bucket), then the whole stage chain runs vectorized inside each
    bucket (merge + groupby-min per stage, no per-user Python); buckets
    emit per-stage partial counts that sum on the driver (n_buckets ×
    n_stages ints). Ordered sequence matching is exactly what a plain
    groupby can't express — this is the sessionization pattern
    (pipelines/queries.q_events_sessions) generalized to staged chains."""
    from recon_ray.functions.relational import bucketed_group_apply

    stages = list(stages)

    def bucket_fn(g: pd.DataFrame) -> pd.DataFrame:
        counts = []
        cur = None  # Series: user -> first qualifying ts at current stage
        for i, st in enumerate(stages):
            ev = g[g[type_col] == st][[user_col, ts_col]]
            if cur is None:
                cur = ev.groupby(user_col)[ts_col].min()
            else:
                m = ev.merge(
                    cur.rename("__prev"), left_on=user_col, right_index=True
                ).reset_index(drop=True)
                m = m[m[ts_col] > m["__prev"]]
                cur = m.groupby(user_col)[ts_col].min()
            counts.append(len(cur))
        return pd.DataFrame(
            {"stage_idx": np.arange(len(stages), dtype=np.int64),
             "n_users": np.asarray(counts, np.int64)}
        )

    parts = bucketed_group_apply(
        ds.select_columns([user_col, ts_col, type_col]), user_col, bucket_fn
    ).to_pandas()
    out = (
        parts.groupby("stage_idx", sort=True)["n_users"].sum().reset_index()
        if len(parts)
        else pd.DataFrame({"stage_idx": np.arange(len(stages), dtype=np.int64),
                           "n_users": np.zeros(len(stages), np.int64)})
    )
    full = pd.DataFrame({"stage_idx": np.arange(len(stages), dtype=np.int64)})
    out = full.merge(out, on="stage_idx", how="left").fillna({"n_users": 0})
    out["stage"] = [stages[i] for i in out["stage_idx"]]
    out["n_users"] = out["n_users"].astype("int64")
    return out[["stage_idx", "stage", "n_users"]]


def retention(ds, user_col: str = "user_id", ts_col: str = "ts",
              period_days: int = 7) -> pd.DataFrame:
    """Cohort retention: users grouped by their first-activity period
    (fixed-width ``period_days`` windows anchored at the Unix epoch — no
    calendar-week convention to disagree on), counted once per (cohort,
    offset) they were active in. Returns
    (cohort_idx, week_offset, n_users), all int64 — exact on any engine.

    Same distribution shape as :func:`funnel`: ONE hash shuffle on the
    user key, per-bucket vectorized resolution (period index → per-user
    min → distinct (user, period) — all numpy/pandas kernels), buckets
    emit per-(cohort, offset) partial counts that sum on the driver."""
    from recon_ray.functions.relational import bucketed_group_apply

    period_us = np.int64(period_days) * 86_400_000_000

    def bucket_fn(g: pd.DataFrame) -> pd.DataFrame:
        p = (
            g[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
            // period_us
        )
        g = pd.DataFrame({user_col: g[user_col].to_numpy(), "__p": p})
        first = g.groupby(user_col)["__p"].min()
        pairs = g.drop_duplicates()
        m = pairs.merge(
            first.rename("__c"), left_on=user_col, right_index=True
        ).reset_index(drop=True)
        m["__k"] = m["__p"] - m["__c"]
        part = m.groupby(["__c", "__k"]).size().rename("n").reset_index()
        return part.rename(columns={"__c": "cohort_idx",
                                    "__k": "week_offset"})

    parts = bucketed_group_apply(
        ds.select_columns([user_col, ts_col]), user_col, bucket_fn
    ).to_pandas()
    if parts.empty:
        return pd.DataFrame({"cohort_idx": pd.Series(dtype="int64"),
                             "week_offset": pd.Series(dtype="int64"),
                             "n_users": pd.Series(dtype="int64")})
    out = (
        parts.groupby(["cohort_idx", "week_offset"], sort=True)["n"]
        .sum().rename("n_users").reset_index()
    )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


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


def association_pairs(ds, basket_col: str, item_col: str,
                      min_support: int = 2, k: int = 30) -> pd.DataFrame:
    """Market-basket association mining over (basket, item) rows: for
    every unordered item pair {a < b}, support = baskets containing
    both, plus lift = support·N / (count(a)·count(b)) — the classic
    co-occurrence signal ("repos that import numpy also import pandas").

    Scale shape: distinct (basket, item) pairs ride ONE hash shuffle on
    the basket; each bucket emits its baskets' pairs vectorized (a
    merge per bucket, pairs bounded by Σ C(basket_size, 2) — basket
    size, not corpus size, is the quadratic knob, as in every a-priori
    pass); pair partial-counts merge like any combiner groupby. Item
    counts and N are combiner passes; lift resolves at 6 dp on the
    driver over the (pairs ≥ min_support)-sized table."""
    from recon_ray.functions.relational import (
        bucketed_group_apply, distinct,
    )

    bi = distinct(ds, [basket_col, item_col]).materialize()
    n_baskets = int(
        distinct(bi.select_columns([basket_col]), [basket_col]).count()
    )  # bucketed exact distinct: basket ids never collect on the driver

    item_counts = (
        bi.map_batches(
            lambda b: b[item_col].value_counts().rename("c")
            .rename_axis(item_col).reset_index(),
            batch_format="pandas",
        ).to_pandas().groupby(item_col)["c"].sum()
    )

    def pairs_bucket(g: pd.DataFrame) -> pd.DataFrame:
        m = g.merge(g, on=basket_col)
        m = m[m[f"{item_col}_x"] < m[f"{item_col}_y"]]
        out = pd.DataFrame({"a": m[f"{item_col}_x"],
                            "b": m[f"{item_col}_y"]})
        return out.groupby(["a", "b"], as_index=False).size()

    parts = bucketed_group_apply(bi, basket_col, pairs_bucket).to_pandas()
    if parts.empty:
        return pd.DataFrame({"a": [], "b": [], "support": [], "lift": []})
    sup = parts.groupby(["a", "b"], as_index=False)["size"].sum()
    sup = sup.rename(columns={"size": "support"})
    sup = sup[sup["support"] >= min_support]
    ca = sup["a"].map(item_counts).to_numpy(np.int64)
    cb = sup["b"].map(item_counts).to_numpy(np.int64)
    sup["lift"] = np.round(
        sup["support"].to_numpy(np.int64) * float(n_baskets) / (ca * cb), 6)
    sup["support"] = sup["support"].astype("int64")
    return (
        sup.sort_values(["support", "a", "b"],
                        ascending=[False, True, True])
        .head(k).reset_index(drop=True)
    )
