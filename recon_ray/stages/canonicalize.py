"""Canonicalization — exact dedup of triples on normalized keys, the
analogue of the reference's content-addressed ``ExampleStore`` dedup
(recon/store.py:39-47) re-expressed as a combiner + shuffle:

1. **partial pre-aggregation** inside ``map_batches`` (one row per distinct
   triple key per batch) — this is the skew absorber: a mega-repo's hot key
   collapses to one tiny partial row per batch before anything moves, so
   the all-to-all groupby only shuffles pre-reduced rows (SURVEY §4.2
   "salting mega-repos": with a combiner, hot keys arrive pre-shrunk; the
   explicit salted path for combiner-less aggs lives in
   recon_ray/functions/relational.py:salted_group_count);
2. **global groupby merge** on the key columns;
3. **sorted materialize** by (subj, pred, obj) — the graph's storage order.

Provenance rule (matches reference_extractor.canonicalize): keep the
lexicographically smallest (repo, path) occurrence; count all occurrences
as ``n_mentions``.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

KEY_COLS = ["subj", "pred", "obj", "subj_type", "obj_type"]
PROV_COLS = ["repo", "path", "commit", "content_sha256", "extractor"]


def partial_canonicalize(batch: pa.Table) -> pa.Table:
    """Per-batch combiner: dedup + count + min-provenance."""
    df = batch.to_pandas()
    if "n_mentions" not in df.columns:
        df["n_mentions"] = 1
    df = df.sort_values(["repo", "path"], kind="mergesort")
    g = df.groupby(KEY_COLS, sort=False, as_index=False)
    agg = {c: "first" for c in PROV_COLS}
    agg["n_mentions"] = "sum"
    out = g.agg(agg)
    return pa.Table.from_pandas(
        out[KEY_COLS + ["n_mentions"] + PROV_COLS], preserve_index=False
    )


def _merge_group(g: pd.DataFrame) -> pd.DataFrame:
    g = g.sort_values(["repo", "path"], kind="mergesort")
    first = g.iloc[0].copy()
    first["n_mentions"] = int(g["n_mentions"].sum())
    return first.to_frame().T


def canonicalize(triples_ds, sort: bool = True):
    """Dataset of raw triples → canonical deduped Dataset.

    The groupby shuffle sees only partial rows (≤ distinct-keys-per-batch),
    then merges per key; finally a global sort by (subj,pred,obj).
    """
    partial = triples_ds.map_batches(
        partial_canonicalize, batch_format="pyarrow", zero_copy_batch=True
    )
    merged = partial.groupby(KEY_COLS).map_groups(
        _merge_group, batch_format="pandas"
    )

    def _fix_types(batch: pa.Table) -> pa.Table:
        # map_groups via pandas can widen ints to object; pin the schema
        idx = batch.column_names.index("n_mentions")
        return batch.set_column(
            idx, "n_mentions", batch.column("n_mentions").cast(pa.int64())
        )

    merged = merged.map_batches(_fix_types, batch_format="pyarrow")
    if sort:
        merged = merged.sort(["subj", "pred", "obj"])
    return merged
