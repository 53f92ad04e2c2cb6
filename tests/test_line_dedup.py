"""Corpus-wide exact line dedup (C4-style keep-first) — parity against a
sequential single-pass scan, layout invariance, and edge cases."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from recon_ray.functions.dedup import line_dedup


def _sequential(docs: list[tuple[int, str]]) -> pd.DataFrame:
    seen: set[str] = set()
    rows = []
    for did, t in docs:
        lines = t.split("\n")
        kept = []
        for ln in lines:
            if ln in seen:
                continue
            seen.add(ln)
            kept.append(ln)
        rows.append((did, len(lines), len(kept), "\n".join(kept)))
    return pd.DataFrame(
        rows, columns=["doc_id", "n_lines", "n_kept", "text_clean"]
    )


def _run(docs, n_parts: int) -> pd.DataFrame:
    df = pd.DataFrame(docs, columns=["doc_id", "text"])
    out = line_dedup(rd.from_pandas(df).repartition(n_parts)).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def test_line_dedup_random_vs_sequential():
    rng = np.random.RandomState(3)
    vocab = [
        "alpha beta", "gamma delta", "x y z", "hello world",
        "dup line here", "another", "q w e r t", "zz top",
    ]
    docs = [
        (did, "\n".join(rng.choice(vocab, rng.randint(1, 12))))
        for did in range(200)
    ]
    got = _run(docs, 5)
    want = _sequential(docs)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # every distinct line survives exactly once corpus-wide
    assert int(got["n_kept"].sum()) == len(
        {ln for _, t in docs for ln in t.split("\n")}
    )


def test_line_dedup_layout_invariant():
    rng = np.random.RandomState(11)
    vocab = ["a b", "c d", "e f", "g h"]
    docs = [
        (did, "\n".join(rng.choice(vocab, rng.randint(1, 6))))
        for did in range(60)
    ]
    a = _run(docs, 1)
    b = _run(docs, 9)
    pd.testing.assert_frame_equal(a, b)


def test_line_dedup_all_unique_is_identity():
    docs = [(i, f"only line {i}\nsecond {i}") for i in range(20)]
    got = _run(docs, 3)
    assert (got["n_kept"] == got["n_lines"]).all()
    assert got["text_clean"].tolist() == [t for _, t in docs]


def test_line_dedup_doc_fully_erased():
    docs = [(1, "same\nsame"), (2, "same")]
    got = _run(docs, 1)
    # doc 1 keeps the first occurrence only; doc 2's copy is erased
    assert got.loc[got.doc_id == 1, "text_clean"].item() == "same"
    assert got.loc[got.doc_id == 2, "text_clean"].item() == ""
    assert got.loc[got.doc_id == 2, "n_kept"].item() == 0


def test_line_dedup_empty_input():
    ds = rd.from_pandas(
        pd.DataFrame(
            {"doc_id": pd.Series([], dtype="int64"),
             "text": pd.Series([], dtype="object")}
        )
    )
    out = line_dedup(ds).to_pandas()
    assert len(out) == 0


def test_line_dedup_multichar_separator_literal():
    """Multi-char separators are literal, never regex ('||' would be a
    regex alternation)."""
    docs = [(1, "a||b||a"), (2, "b||c")]
    df = pd.DataFrame(docs, columns=["doc_id", "text"])
    out = (
        line_dedup(rd.from_pandas(df), sep="||")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # corpus-wide firsts: doc1 keeps a, b (second a is a within-corpus dup);
    # doc2's b is a dup, keeps c
    assert out["text_clean"].tolist() == ["a||b", "c"]
    assert out["n_lines"].tolist() == [3, 2]
    assert out["n_kept"].tolist() == [2, 1]


def test_line_dedup_idempotent_on_nonempty_output():
    """Re-running line_dedup on its own cleaned output removes nothing —
    for docs that still have content. (Fully-erased docs become "", and
    those empty lines ARE mutual duplicates on a second pass, so the
    fixpoint property is stated over the non-empty survivors.)"""
    rng = np.random.RandomState(19)
    vocab = ["l1", "l2", "l3", "l4"]
    docs = [
        (did, "\n".join(rng.choice(vocab, rng.randint(1, 5))))
        for did in range(40)
    ]
    first = _run(docs, 4)
    nonempty = first[first["text_clean"] != ""]
    assert len(nonempty) > 0
    second = _run(
        list(zip(nonempty["doc_id"], nonempty["text_clean"])), 3
    )
    assert (second["n_kept"] == second["n_lines"]).all()
    assert second["text_clean"].tolist() == nonempty["text_clean"].tolist()
