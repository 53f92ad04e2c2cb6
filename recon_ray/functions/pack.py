"""Sequence packing — the LLM-training-prep operator that concatenates
documents into fixed-token-budget training sequences (the "pack to context
length" step every pre-training pipeline runs between curation and
tokenized-shard writing).

Semantics (deterministic, partition-parallel):

- every doc lands in bucket ``doc_id % n_buckets`` — a *portable* partition
  function (an SQL oracle can recompute it; at cluster scale n_buckets is
  sized to cores × nodes so buckets pack fully in parallel, and the modulo
  spreads contiguous doc_id runs evenly);
- within a bucket docs are ordered by ``doc_id`` and greedily packed: a doc
  joins the current pack while the pack's running token total stays ≤
  ``max_tokens``, else it starts a new pack (``seq_id`` increments). A doc
  longer than the budget occupies a pack of its own — never split, exactly
  like sequence-packing with document boundaries respected.

Token counts are the whitespace-token semantics of
``functions.text.token_counts`` (ORACLE_DOC_TOKENS parity).

Scale shape: one vectorized tag pass (token counts + bucket, Arrow), then a
``groupby(bucket)`` shuffle where each bucket packs in ONE vectorized
callback — the greedy loop iterates once per emitted *pack* (a searchsorted
over the bucket's token cumsum), not once per doc, so a bucket of a million
docs at a 4k budget costs ~thousands of O(log n) steps. No stage ever sees
more than one bucket; nothing materializes on the driver.

Reference tie-in: the reference has no packing (it never leaves span space),
but its ``Example``-stream order preservation (recon/operations.py:233-258)
is what makes deterministic by-doc_id packing the faithful analogue of
"pack the corpus in corpus order".
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _tag_tokens_bucket(n_buckets: int):
    def tag(batch: pa.Table) -> pa.Table:
        if "n_tokens" in batch.column_names:
            # upstream already counted (e.g. the curation pipeline) — reuse
            n_tokens = batch.column("n_tokens").to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
        else:
            texts = batch.column("text").to_pylist()
            n_tokens = np.fromiter(
                (0 if not t.strip() else len(t.strip().split()) for t in texts),
                dtype=np.int64, count=len(texts),
            )
        doc_id = batch.column("doc_id")
        ids = doc_id.to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": doc_id,
                "bucket": pa.array(ids % n_buckets, pa.int64()),
                "n_tokens": pa.array(n_tokens, pa.int64()),
            }
        )

    return tag


def _pack_bucket(max_tokens: int):
    def pack(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id", kind="mergesort").reset_index(drop=True)
        tok = g["n_tokens"].to_numpy(dtype=np.int64)
        acc = np.cumsum(tok)
        seq = np.zeros(len(g), dtype=np.int64)
        i, sid, base = 0, 0, 0
        while i < len(tok):
            # first index whose running-sum-from-pack-start exceeds budget;
            # always take ≥1 doc (oversized docs get a singleton pack)
            j = int(np.searchsorted(acc, base + max_tokens, side="right"))
            j = max(j, i + 1)
            seq[i:j] = sid
            sid += 1
            base = int(acc[j - 1])
            i = j
        return g.assign(seq_id=seq)

    return pack


def pack_sequences(ds, max_tokens: int = 512, n_buckets: int = 16):
    """(doc_id, bucket, n_tokens, seq_id) — ``(bucket, seq_id)`` is the
    training-sequence key; downstream writers concat texts per key.

    ``ds`` is the documents Dataset (doc_id:int64, text:string, ...).
    """
    tagged = ds.map_batches(
        _tag_tokens_bucket(n_buckets),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return tagged.groupby("bucket").map_groups(
        _pack_bucket(max_tokens), batch_format="pandas"
    )


def pack_texts(ds, max_tokens: int = 512, n_buckets: int = 16,
               sep: str = "\n\n"):
    """Tokenizer-ready training sequences: one row per pack with the
    member texts concatenated in doc_id order — what a tokenizing shard
    writer consumes. Emits (bucket, seq_id, seq_text, n_docs,
    pack_tokens); same greedy assignment as ``pack_sequences``, and the
    concat happens INSIDE the bucket callback (texts ride the one pack
    shuffle, never a second join)."""

    def tag(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        if "n_tokens" in batch.column_names:
            n_tokens = batch.column("n_tokens").to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
        else:
            n_tokens = np.fromiter(
                (0 if not t.strip() else len(t.strip().split()) for t in texts),
                dtype=np.int64, count=len(texts),
            )
        ids = batch.column("doc_id").to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "bucket": pa.array(ids % n_buckets, pa.int64()),
                "n_tokens": pa.array(n_tokens, pa.int64()),
                "text": batch.column("text"),
            }
        )

    greedy = _pack_bucket(max_tokens)

    def pack_concat(g: pd.DataFrame) -> pd.DataFrame:
        assigned = greedy(g)
        out = (
            assigned.groupby(["bucket", "seq_id"], sort=True)
            .agg(
                seq_text=("text", sep.join),
                n_docs=("doc_id", "size"),
                pack_tokens=("n_tokens", "sum"),
            )
            .reset_index()
        )
        return out

    tagged = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
    return tagged.groupby("bucket").map_groups(
        pack_concat, batch_format="pandas"
    )


def pack_stats(packed_ds) -> pd.DataFrame:
    """Per-pack rollup (bucket, seq_id, n_docs, pack_tokens) — the shard
    manifest a tokenizing writer would record. Small result (≈ corpus
    tokens / max_tokens rows); computed as a distributed grouped aggregate."""
    from ray.data.aggregate import Count, Sum

    out = (
        packed_ds.groupby(["bucket", "seq_id"])
        .aggregate(Count(alias_name="n_docs"),
                   Sum("n_tokens", alias_name="pack_tokens"))
        .to_pandas()
    )
    return out.sort_values(["bucket", "seq_id"]).reset_index(drop=True)
