"""Canonicalization — exact dedup of triples on normalized keys, the
analogue of the reference's content-addressed ``ExampleStore`` dedup
(recon/store.py:39-47) re-expressed as a combiner + shuffle:

1. **partial pre-aggregation** inside ``map_batches`` (one row per distinct
   triple key per batch) — this is the skew absorber: a mega-repo's hot key
   collapses to one tiny partial row per batch before anything moves, so
   the all-to-all groupby only shuffles pre-reduced rows (SURVEY §4.2;
   the explicit salted path for combiner-less aggs lives in
   recon_ray/functions/relational.py:salted_group_count);
2. **global groupby merge** on the key columns using ONLY built-in
   vectorized aggregates (Sum + Min) — a per-group Python callback
   (map_groups) costs ~1 ms per group and collapses at 10^5+ distinct
   triples, so provenance is packed into a single \\x00-separated string
   whose lexicographic Min equals the (repo, path) tuple-min the
   sequential oracle computes;
3. **sorted materialize** by (subj, pred, obj) — the graph's storage order.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

KEY_COLS = ["subj", "pred", "obj", "subj_type", "obj_type"]
PROV_COLS = ["repo", "path", "commit", "content_sha256", "extractor"]
_SEP = "\x00"  # sorts before every printable char → string min == tuple min


def _pack_prov(batch: pa.Table) -> pa.Array:
    packed = batch.column(PROV_COLS[0]).cast(pa.string())
    for c in PROV_COLS[1:]:
        packed = pc.binary_join_element_wise(
            packed, batch.column(c).cast(pa.string()), _SEP
        )
    return packed


def partial_canonicalize(batch: pa.Table) -> pa.Table:
    """Per-batch combiner: dedup + count + min-provenance (all Arrow)."""
    t = pa.table(
        {
            **{c: batch.column(c) for c in KEY_COLS},
            "prov": _pack_prov(batch),
            "n_mentions": batch.column("n_mentions")
            if "n_mentions" in batch.column_names
            else pa.array([1] * batch.num_rows, pa.int64()),
        }
    )
    g = t.group_by(KEY_COLS).aggregate([("n_mentions", "sum"), ("prov", "min")])
    return g.rename_columns(KEY_COLS + ["n_mentions", "prov"])


def _unpack(batch: pa.Table) -> pa.Table:
    parts = pc.split_pattern(batch.column("prov"), _SEP)
    cols = {c: batch.column(c) for c in KEY_COLS}
    cols["n_mentions"] = batch.column("n_mentions").cast(pa.int64())
    for i, c in enumerate(PROV_COLS):
        cols[c] = pc.list_element(parts, i)
    return pa.table(cols)


N_BUCKETS = 64


def _add_bucket(batch: pa.Table) -> pa.Table:
    import pandas as pd

    key = batch.column("subj").to_pandas()
    for c in KEY_COLS[1:]:
        key = key + _SEP + batch.column(c).to_pandas()
    h = pd.util.hash_pandas_object(key, index=False).to_numpy()
    return batch.append_column(
        "bucket", pa.array((h % N_BUCKETS).astype("int64"), pa.int64())
    )


def _merge_bucket(g) -> "object":
    # one call per BUCKET (bounded at N_BUCKETS), body fully vectorized
    agg = g.groupby(KEY_COLS, sort=False, as_index=False).agg(
        n_mentions=("n_mentions", "sum"), prov=("prov", "min")
    )
    return agg


def canonicalize(triples_ds, sort: bool = True):
    """Dataset of raw (or pre-canonicalized) triples → canonical deduped
    Dataset.

    Two-phase hash aggregation: (1) per-batch combiner (one row per
    distinct key per batch — the skew absorber); (2) partition the partial
    rows into N_BUCKETS hash buckets and merge each bucket with ONE
    vectorized pandas aggregation — Ray's groupby on five string keys is
    sort-based and costs several seconds at 10^6 partial rows, while the
    bucketed merge shuffles the same rows but aggregates vectorized."""
    partial = triples_ds.map_batches(
        partial_canonicalize, batch_format="pyarrow", zero_copy_batch=True
    ).map_batches(_add_bucket, batch_format="pyarrow", zero_copy_batch=True)
    # explicit barrier on the SMALL combiner output: fusing the all-to-all
    # merge/sort into the same streaming DAG as the heavy extraction stages
    # makes the executor juggle both across the barrier and, at low CPU
    # counts, collapses into spill-thrash (measured at 8 cpus: merge 22s
    # fused vs 5s on a materialized input; sorted write 157s vs ~70s).
    # The partial rows are ≤ distinct-keys-per-batch by construction, so
    # pinning them costs ~rows(canonical) of object store, not rows(corpus).
    partial = partial.materialize()
    merged = partial.groupby("bucket").map_groups(
        _merge_bucket, batch_format="pandas"
    )
    out = merged.map_batches(_unpack, batch_format="pyarrow", zero_copy_batch=True)
    if sort:
        out = out.sort(["subj", "pred", "obj"])
    return out
