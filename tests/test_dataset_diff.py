"""dataset_diff — content-addressed version diff (added/removed/changed)."""

from __future__ import annotations

import pandas as pd
import ray.data as rd

from recon_ray.functions.relational import dataset_diff


def _run(a: pd.DataFrame, b: pd.DataFrame, parts=(3, 5)) -> pd.DataFrame:
    out = dataset_diff(
        rd.from_pandas(a).repartition(parts[0]),
        rd.from_pandas(b).repartition(parts[1]),
    ).to_pandas()
    if out.empty:  # an all-empty Ray result carries no pandas columns
        return out
    return out.sort_values("doc_id").reset_index(drop=True)


def test_diff_statuses():
    a = pd.DataFrame(
        {"doc_id": [1, 2, 3, 4], "text": ["aa", "bb", "cc", "dd"]}
    )
    b = pd.DataFrame(
        {"doc_id": [2, 3, 4, 5], "text": ["bb", "CC", "dd", "ee"]}
    )
    out = _run(a, b)
    assert out.values.tolist() == [
        [1, "removed"], [3, "changed"], [5, "added"]
    ]


def test_diff_identical_is_empty():
    a = pd.DataFrame({"doc_id": range(50), "text": [f"t{i}" for i in range(50)]})
    out = _run(a, a.copy())
    assert len(out) == 0


def test_diff_multi_content_cols():
    a = pd.DataFrame({"doc_id": [1, 2], "text": ["x", "y"], "lang": ["en", "de"]})
    b = pd.DataFrame({"doc_id": [1, 2], "text": ["x", "y"], "lang": ["en", "fr"]})
    out = (
        dataset_diff(rd.from_pandas(a), rd.from_pandas(b),
                     content_cols=["text", "lang"])
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out.values.tolist() == [[2, "changed"]]


def test_diff_layout_invariant():
    a = pd.DataFrame({"doc_id": range(200), "text": [f"t{i}" for i in range(200)]})
    b = pd.DataFrame(
        {"doc_id": range(100, 300),
         "text": [f"t{i}" if i % 2 else f"u{i}" for i in range(100, 300)]}
    )
    x = _run(a, b, parts=(1, 1))
    y = _run(a, b, parts=(9, 4))
    pd.testing.assert_frame_equal(x, y)


def test_diff_fuzz_vs_pandas():
    """Randomized parity against a pandas outer-merge reference."""
    import numpy as np

    rng = np.random.RandomState(21)
    for trial in range(10):
        ids_a = rng.choice(300, rng.randint(1, 120), replace=False)
        ids_b = rng.choice(300, rng.randint(1, 120), replace=False)
        a = pd.DataFrame(
            {"doc_id": ids_a,
             "text": [f"t{rng.randint(0, 5)}" for _ in ids_a]}
        )
        b = pd.DataFrame(
            {"doc_id": ids_b,
             "text": [f"t{rng.randint(0, 5)}" for _ in ids_b]}
        )
        got = _run(a, b, parts=(2, 3))

        m = a.merge(b, on="doc_id", how="outer", suffixes=("_a", "_b"),
                    indicator=True)
        want = []
        for _, r in m.iterrows():
            if r["_merge"] == "right_only":
                want.append((r["doc_id"], "added"))
            elif r["_merge"] == "left_only":
                want.append((r["doc_id"], "removed"))
            elif r["text_a"] != r["text_b"]:
                want.append((r["doc_id"], "changed"))
        want = sorted(want)
        assert [tuple(x) for x in got.values.tolist()] == want, trial
