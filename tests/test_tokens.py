"""add_tokens semantics — port of the reference's tokenization contract
(recon/tokenization.py:7-49, recon/tests/test_tokenization.py): token
offsets, char→token span alignment, and drop-the-example on misalignment
with a lineage record."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray
import ray.data as rd

from recon_ray.ops import OPS, LineageTracker
from recon_ray.ops.mentions_io import mentions_list_array
from recon_ray.ops.tokens import TOKEN_RE, tokenize


def _docs_table() -> pa.Table:
    contents = ["def foo(): bar()", "hello world"]
    # doc 0: aligned mentions ("foo" span, and the two-token "def foo" span)
    # doc 1: mention starting mid-token ("ello") → whole doc drops
    lengths = np.array([2, 1], dtype=np.int64)
    text = np.array(["foo", "def foo", "ello"], dtype=object)
    start = np.array([4, 0, 1], dtype=np.int64)
    end = np.array([7, 7, 5], dtype=np.int64)
    label = np.array(["CALL", "DEF", "IDENT"], dtype=object)
    source = np.array(["t", "t", "t"], dtype=object)
    mentions = mentions_list_array(lengths, text, start, end, label, source)
    return pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "content": pa.array(contents, pa.string()),
            "mentions": mentions,
        }
    )


def test_tokenize_offsets():
    tx, st, en = tokenize("def foo(): bar()")
    assert tx == ["def", "foo", "(", ")", ":", "bar", "(", ")"]
    assert st.tolist() == [0, 4, 7, 8, 9, 11, 14, 15]
    assert en.tolist() == [3, 7, 8, 9, 10, 14, 15, 16]


def test_add_tokens_alignment_and_misalignment_drop():
    tracker = LineageTracker.remote()
    ds = rd.from_arrow(_docs_table())
    out = OPS["recon_ray.add_tokens.v1"].apply(ds, tracker=tracker).to_pandas()
    # doc 1 dropped (misaligned mention), doc 0 kept
    assert out["doc_id"].tolist() == [0]
    toks = out["tokens"].iloc[0]
    assert [t["text"] for t in toks] == [
        "def", "foo", "(", ")", ":", "bar", "(", ")"
    ]
    assert [t["id"] for t in toks] == list(range(8))
    align = out["mention_tokens"].iloc[0]
    # "foo" → token 1..1 ; "def foo" → tokens 0..1
    assert [(a["token_start"], a["token_end"]) for a in align] == [(1, 1), (0, 1)]
    # the worker's tracker.add.remote is fire-and-forget — poll until the
    # record lands (distinct actor mailboxes give no cross-caller ordering)
    import time

    rec = None
    for _ in range(100):
        summary = ray.get(tracker.summary.remote())
        recs = [s for s in summary if s["name"] == "recon_ray.add_tokens.v1"]
        if recs:
            rec = recs[0]
            break
        time.sleep(0.1)
    assert rec is not None and rec["removed"] == 1


def test_preprocessor_shared_and_factory():
    """pre=[...] framework: the tokenize preprocessor's column is derived
    once and shared down the chain (ensure() no-ops when present); op
    factories create configured ops; the entry-point plugin loader is a
    safe no-op when nothing is installed."""
    import pyarrow.compute as pc

    from recon_ray.ops import (
        OPS,
        PREPROCESSORS,
        Op,
        load_entry_point_plugins,
        make_op,
        op_factory,
    )

    assert "recon_ray.tokenize.v1" in PREPROCESSORS
    assert OPS["recon_ray.add_tokens.v1"].pre == ("recon_ray.tokenize.v1",)

    @op_factory("recon_ray.min_tokens_filter")
    def min_tokens_filter(n_min: int = 2) -> Op:
        def kernel(batch: pa.Table) -> pa.Table:
            arr = batch.column("tokens")
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            keep = pc.greater_equal(arr.value_lengths(), pa.scalar(n_min))
            return batch.filter(keep)

        return Op(
            name=f"recon_ray.min_tokens_filter[{n_min}].v1",
            fn=kernel,
            kind="filter",
            pre=("recon_ray.tokenize.v1",),
        )

    flt = make_op("recon_ray.min_tokens_filter", n_min=4)
    assert flt.name in OPS

    ds = rd.from_arrow(_docs_table())
    chained = OPS["recon_ray.add_tokens.v1"].apply(ds)
    # tokens column already rides the chain → the second ensure() no-ops
    out = flt.apply(chained).to_pandas()
    assert out["doc_id"].tolist() == [0]  # 8 tokens ≥ 4 (doc 1 already dropped)
    # filter everything with a high threshold
    strict = make_op("recon_ray.min_tokens_filter", n_min=100)
    assert strict.apply(OPS["recon_ray.add_tokens.v1"].apply(ds)).count() == 0

    assert load_entry_point_plugins("recon_ray.no_such_group") == 0


def test_empty_content_doc_with_mentions_drops():
    lengths = np.array([1], dtype=np.int64)
    mentions = mentions_list_array(
        lengths,
        np.array(["x"], dtype=object),
        np.array([0], dtype=np.int64),
        np.array([1], dtype=np.int64),
        np.array(["IDENT"], dtype=object),
        np.array(["t"], dtype=object),
    )
    t = pa.table(
        {
            "doc_id": pa.array([0], pa.int64()),
            "content": pa.array([""], pa.string()),
            "mentions": mentions,
        }
    )
    out = OPS["recon_ray.add_tokens.v1"].apply(rd.from_arrow(t)).to_pandas()
    assert len(out) == 0


def test_no_mentions_doc_keeps_tokens():
    mentions = mentions_list_array(
        np.array([0], dtype=np.int64),
        np.array([], dtype=object),
        np.array([], dtype=np.int64),
        np.array([], dtype=np.int64),
        np.array([], dtype=object),
        np.array([], dtype=object),
    )
    t = pa.table(
        {
            "doc_id": pa.array([7], pa.int64()),
            "content": pa.array(["a b"], pa.string()),
            "mentions": mentions,
        }
    )
    out = OPS["recon_ray.add_tokens.v1"].apply(rd.from_arrow(t)).to_pandas()
    assert out["doc_id"].tolist() == [7]
    assert [tok["text"] for tok in out["tokens"].iloc[0]] == ["a", "b"]
    assert list(out["mention_tokens"].iloc[0]) == []
