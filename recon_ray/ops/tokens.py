"""Tokenization — the deterministic-regex analogue of the reference's
``add_tokens`` operation (recon/tokenization.py:7-49, exercised by
recon/tests/test_tokenization.py).

Split reference-style into a shared PREPROCESSOR + an operation, mirroring
``@operation("recon.add_tokens.v1", pre=["recon.spacy.v1"])``:

- ``recon_ray.tokenize.v1`` (preprocessor, provides ``tokens``): appends
  list<struct{text, start, end, id}> per doc. Because the derived column
  rides the Dataset, a chain of ops declaring this ``pre`` tokenizes ONCE
  (the reference caches preprocessor outputs per example hash).
- ``recon_ray.add_tokens.v1`` (op, pre=tokenize): char→token alignment
  for every mention span — ``token_start`` = index of the token starting
  exactly at span.start, ``token_end`` = index of the token ending exactly
  at span.end (the ``use_spacy_token_ends=False`` convention,
  recon/tokenization.py:40-46) — and DROPS any doc whose spans can't all
  align (the reference op returns None → EXAMPLE_REMOVED; here the doc row
  filters out and the lineage tracker counts the removal).

The tokenizer is ``\\w+|[^\\w\\s]`` (word runs, else single punctuation) —
local and prefix-stable, so a span cut at a token boundary never changes
the tokens before it; this is what makes the alignment SQL-checkable
(token_start = count of tokens in content[:start]).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from recon_ray.ops import op, preprocessor
from recon_ray.ops.mentions_io import mentions_parts

TOKEN_PATTERN = r"\w+|[^\w\s]"
TOKEN_RE = re.compile(TOKEN_PATTERN, re.UNICODE)

TOKEN_TYPE = pa.struct(
    [
        ("text", pa.string()),
        ("start", pa.int32()),
        ("end", pa.int32()),
        ("id", pa.int32()),
    ]
)

ALIGN_TYPE = pa.struct(
    [("token_start", pa.int32()), ("token_end", pa.int32())]
)


def tokenize(text: str) -> tuple[list[str], np.ndarray, np.ndarray]:
    """(texts, starts, ends) for one document."""
    tx, st, en = [], [], []
    for m in TOKEN_RE.finditer(text):
        tx.append(m.group())
        st.append(m.start())
        en.append(m.end())
    return tx, np.asarray(st, dtype=np.int64), np.asarray(en, dtype=np.int64)


def _list_array(offlens, child: pa.StructArray) -> pa.ListArray:
    offsets = np.zeros(len(offlens) + 1, dtype=np.int32)
    np.cumsum(offlens, out=offsets[1:])
    return pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), child)


@preprocessor("recon_ray.tokenize.v1", provides="tokens")
def tokenize_batch(batch: pa.Table) -> pa.Table:
    """Append the ``tokens`` column (requires ``content``)."""
    contents = batch.column("content").to_pylist()
    lens: list[int] = []
    flat_tx: list[str] = []
    flat_st: list[np.ndarray] = []
    flat_en: list[np.ndarray] = []
    for c in contents:
        tx, st, en = tokenize(c)
        lens.append(len(tx))
        flat_tx.extend(tx)
        flat_st.append(st)
        flat_en.append(en)
    st_all = (
        np.concatenate(flat_st) if flat_st else np.array([], dtype=np.int64)
    )
    en_all = (
        np.concatenate(flat_en) if flat_en else np.array([], dtype=np.int64)
    )
    id_all = (
        np.concatenate([np.arange(n, dtype=np.int64) for n in lens])
        if lens
        else np.array([], dtype=np.int64)
    )
    child = pa.StructArray.from_arrays(
        [
            pa.array(flat_tx, pa.string()),
            pa.array(st_all.astype(np.int32), pa.int32()),
            pa.array(en_all.astype(np.int32), pa.int32()),
            pa.array(id_all.astype(np.int32), pa.int32()),
        ],
        names=["text", "start", "end", "id"],
    )
    return batch.append_column("tokens", _list_array(lens, child))


def _tokens_parts(batch: pa.Table):
    arr = batch.column("tokens")
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    lens = arr.value_lengths().fill_null(0).to_numpy(zero_copy_only=False)
    child = arr.flatten()
    st = child.field("start").to_numpy(zero_copy_only=False).astype(np.int64)
    en = child.field("end").to_numpy(zero_copy_only=False).astype(np.int64)
    return lens.astype(np.int64), st, en


@op("recon_ray.add_tokens.v1", kind="filter", pre=("recon_ray.tokenize.v1",))
def add_tokens(batch: pa.Table) -> pa.Table:
    """Requires ``mentions`` (+ the ``tokens`` column from the tokenize
    preprocessor — derived automatically); appends ``mention_tokens``
    (list of {token_start, token_end} parallel to the doc's mentions) and
    drops docs with any unalignable mention."""
    lengths, _text, start, end, _label, _source = mentions_parts(batch)
    t_lens, t_st, t_en = _tokens_parts(batch)
    t_offsets = np.zeros(len(t_lens) + 1, dtype=np.int64)
    np.cumsum(t_lens, out=t_offsets[1:])
    n_docs = batch.num_rows
    n_flat = int(lengths.sum())
    keep_doc = np.ones(n_docs, dtype=bool)
    ts_flat = np.zeros(n_flat, dtype=np.int64)
    te_flat = np.zeros(n_flat, dtype=np.int64)
    pos = 0
    for i in range(n_docs):
        n_m = int(lengths[i])
        if n_m == 0:
            continue
        st_np = t_st[t_offsets[i] : t_offsets[i + 1]]
        en_np = t_en[t_offsets[i] : t_offsets[i + 1]]
        ms = start[pos : pos + n_m]
        me = end[pos : pos + n_m]
        if len(st_np) == 0:
            keep_doc[i] = False
            pos += n_m
            continue
        ts = np.searchsorted(st_np, ms)
        te = np.searchsorted(en_np, me)
        ts_c = np.clip(ts, 0, len(st_np) - 1)
        te_c = np.clip(te, 0, len(en_np) - 1)
        ok = (
            (ts < len(st_np))
            & (st_np[ts_c] == ms)
            & (te < len(en_np))
            & (en_np[te_c] == me)
        )
        if not ok.all():
            keep_doc[i] = False
        ts_flat[pos : pos + n_m] = ts_c
        te_flat[pos : pos + n_m] = te_c
        pos += n_m

    filtered = batch.filter(pa.array(keep_doc))
    m_keep = np.repeat(keep_doc, lengths)
    align_child = pa.StructArray.from_arrays(
        [
            pa.array(ts_flat[m_keep].astype(np.int32), pa.int32()),
            pa.array(te_flat[m_keep].astype(np.int32), pa.int32()),
        ],
        names=["token_start", "token_end"],
    )
    align_col = _list_array(
        [int(n) for n in lengths[keep_doc]], align_child
    )
    return filtered.append_column("mention_tokens", align_col)
