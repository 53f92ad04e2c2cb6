"""Explode the per-doc ``mentions`` list column into a flat mentions table
(one row per span, doc provenance carried along) — the layout the wide
stats/insights shuffles key on (SURVEY §2.6). Stateless, zero-copy-in.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from recon_ray.ops.mentions_io import doc_index, mentions_parts

MENTIONS_FLAT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.uint64()),
        ("repo", pa.string()),
        ("path", pa.string()),
        ("commit", pa.string()),
        ("content_sha256", pa.string()),
        ("lang", pa.string()),
        ("text", pa.string()),
        ("start", pa.int32()),
        ("end", pa.int32()),
        ("label", pa.string()),
        ("source", pa.string()),
    ]
)


def explode_mentions_batch(batch: pa.Table) -> pa.Table:
    lengths, text, start, end, label, source = mentions_parts(batch)
    didx = doc_index(lengths)
    take = pa.array(didx, pa.int64())
    cols = {}
    for col in ["doc_id", "repo", "path", "commit", "content_sha256", "lang"]:
        cols[col] = batch.column(col).combine_chunks().take(take)
    cols["text"] = pa.array(text, pa.string())
    cols["start"] = pa.array(start.astype(np.int32), pa.int32())
    cols["end"] = pa.array(end.astype(np.int32), pa.int32())
    cols["label"] = pa.array(label, pa.string())
    cols["source"] = pa.array(source, pa.string())
    return pa.table(cols).cast(MENTIONS_FLAT_SCHEMA)


def explode_mentions(docs_ds):
    return docs_ds.map_batches(
        explode_mentions_batch, batch_format="pyarrow", zero_copy_batch=True
    )
