"""Tokenization — the deterministic-regex analogue of the reference's
``add_tokens`` operation (recon/tokenization.py:7-49, exercised by
recon/tests/test_tokenization.py).

The reference tokenizes with spaCy; the SEMANTICS ported here are
tokenizer-agnostic and are what downstream consumers rely on:

- a ``tokens`` column: list<struct{text, start, end, id}> per doc;
- char→token alignment for every mention span: ``token_start`` = index of
  the token starting exactly at span.start, ``token_end`` = index of the
  token ending exactly at span.end (the ``use_spacy_token_ends=False``
  convention, recon/tokenization.py:40-46);
- an example whose spans can't all be aligned is DROPPED (the reference
  op returns None → EXAMPLE_REMOVED; here the doc row filters out of the
  batch and the lineage tracker counts the removal).

The tokenizer is ``\\w+|[^\\w\\s]`` (word runs, else single punctuation) —
local and prefix-stable, so a span cut at a token boundary never changes
the tokens before it; this is what makes the alignment SQL-checkable
(token_start = count of tokens in content[:start]).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from recon_ray.ops import op
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


def _list_array(offlens: list[int], child: pa.StructArray) -> pa.ListArray:
    offsets = np.zeros(len(offlens) + 1, dtype=np.int32)
    np.cumsum(offlens, out=offsets[1:])
    return pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), child)


@op("recon_ray.add_tokens.v1", kind="filter")
def add_tokens(batch: pa.Table) -> pa.Table:
    """Requires ``content`` + ``mentions``; appends ``tokens`` and
    ``mention_tokens`` (list of {token_start, token_end} parallel to the
    doc's mentions) and drops docs with any unalignable mention."""
    contents = batch.column("content").to_pylist()
    lengths, _text, start, end, _label, _source = mentions_parts(batch)
    n_docs = len(contents)
    n_flat = int(lengths.sum())
    keep_doc = np.ones(n_docs, dtype=bool)
    ts_flat = np.zeros(n_flat, dtype=np.int64)
    te_flat = np.zeros(n_flat, dtype=np.int64)
    toks: list[tuple[list[str], np.ndarray, np.ndarray]] = []
    pos = 0
    for i, c in enumerate(contents):
        tx, st_np, en_np = tokenize(c)
        toks.append((tx, st_np, en_np))
        n_m = int(lengths[i])
        if n_m == 0:
            continue
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
    kept = np.flatnonzero(keep_doc)
    # tokens column (kept docs)
    tok_lens = [len(toks[i][0]) for i in kept]
    flat_tx: list[str] = []
    for i in kept:
        flat_tx.extend(toks[i][0])
    flat_st = (
        np.concatenate([toks[i][1] for i in kept])
        if len(kept)
        else np.array([], dtype=np.int64)
    )
    flat_en = (
        np.concatenate([toks[i][2] for i in kept])
        if len(kept)
        else np.array([], dtype=np.int64)
    )
    flat_id = np.concatenate(
        [np.arange(n, dtype=np.int64) for n in tok_lens]
    ) if tok_lens else np.array([], dtype=np.int64)
    tok_child = pa.StructArray.from_arrays(
        [
            pa.array(flat_tx, pa.string()),
            pa.array(flat_st.astype(np.int32), pa.int32()),
            pa.array(flat_en.astype(np.int32), pa.int32()),
            pa.array(flat_id.astype(np.int32), pa.int32()),
        ],
        names=["text", "start", "end", "id"],
    )
    tokens_col = _list_array(tok_lens, tok_child)
    # mention_tokens column, parallel to the kept docs' mentions
    m_keep = np.repeat(keep_doc, lengths)
    align_child = pa.StructArray.from_arrays(
        [
            pa.array(ts_flat[m_keep].astype(np.int32), pa.int32()),
            pa.array(te_flat[m_keep].astype(np.int32), pa.int32()),
        ],
        names=["token_start", "token_end"],
    )
    align_col = _list_array([int(n) for n in lengths[keep_doc]], align_child)
    return filtered.append_column("tokens", tokens_col).append_column(
        "mention_tokens", align_col
    )
