"""BIO-tagged token source — the analogue of ``Dataset.from_hf_dataset``
(recon/dataset.py:494-526): rows of (tokens: list<string>, tags:
list<string> BIO) → docs with char-offset mentions.

Reconstruction: text = " ".join(tokens); a ``B-X`` opens a span, ``I-X``
extends it, anything else closes it — the standard BIO decode.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from recon_ray.hashing import stable_u64
from recon_ray.ops.mentions_io import mentions_list_array


def decode_bio_row(tokens: list[str], tags: list[str]) -> tuple[str, list[tuple]]:
    text = " ".join(tokens)
    offsets = []
    pos = 0
    for t in tokens:
        offsets.append((pos, pos + len(t)))
        pos += len(t) + 1
    spans: list[tuple] = []
    cur_label, cur_start, cur_end = None, 0, 0
    for (s, e), tag in zip(offsets, tags):
        if tag.startswith("B-"):
            if cur_label is not None:
                spans.append((text[cur_start:cur_end], cur_start, cur_end, cur_label))
            cur_label, cur_start, cur_end = tag[2:], s, e
        elif tag.startswith("I-") and cur_label == tag[2:]:
            cur_end = e
        else:
            if cur_label is not None:
                spans.append((text[cur_start:cur_end], cur_start, cur_end, cur_label))
            cur_label = None
    if cur_label is not None:
        spans.append((text[cur_start:cur_end], cur_start, cur_end, cur_label))
    return text, spans


def bio_to_docs_batch(batch: pa.Table) -> pa.Table:
    """map_batches kernel: (tokens, tags) → (doc_id, text, mentions)."""
    toks = batch.column("tokens").to_pylist()
    tags = batch.column("tags").to_pylist()
    texts, lengths, flat = [], np.zeros(len(toks), dtype=np.int64), []
    for i, (tk, tg) in enumerate(zip(toks, tags)):
        text, spans = decode_bio_row(tk, tg)
        texts.append(text)
        lengths[i] = len(spans)
        flat += spans
    mentions = mentions_list_array(
        lengths,
        np.array([s[0] for s in flat], dtype=object),
        np.array([s[1] for s in flat], dtype=np.int64),
        np.array([s[2] for s in flat], dtype=np.int64),
        np.array([s[3] for s in flat], dtype=object),
        np.array(["bio" for _ in flat], dtype=object),
    )
    doc_ids = np.array([stable_u64(t) for t in texts], dtype=np.uint64)
    t = pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.uint64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    return t.append_column("mentions", mentions)


def read_bio_dataset(ds):
    """Dataset with (tokens, tags) list columns → docs Dataset."""
    return ds.map_batches(
        bio_to_docs_batch, batch_format="pyarrow", zero_copy_batch=True
    )
