"""Golden numeric pins (FIXTURES.md §6 contract) — exact constants recorded
from the deterministic sf-unit corpus (120 files, seed 42), in the style of
the reference's golden stats tests (tests/test_stats.py:16-41). A change
here means the corpus generator, detector spec, or correction chain
changed semantics — bump deliberately."""

from __future__ import annotations

import collections

# re-pinned 2026-08-17 (corpus v2): oversized files now use the
# language-appropriate generator, so large js/go files contribute js/go
# mentions instead of Python ones
GOLDEN = {
    "n_mentions": 29405,
    "labels": {"CALL": 8915, "IDENT": 7865, "IMPORT": 7363, "DEF": 5262},
    "n_canonical": 1108,
    "preds": {
        "imports": 54,
        "imports_module": 339,
        "defines": 286,
        "calls": 222,
        "calls_unresolved": 207,
    },
}


def test_golden_mention_counts(gold_extraction):
    labels = collections.Counter(m["label"] for m in gold_extraction["mentions"])
    assert sum(labels.values()) == GOLDEN["n_mentions"]
    assert dict(labels) == GOLDEN["labels"]


def test_golden_canonical_counts(gold_extraction):
    assert len(gold_extraction["canonical"]) == GOLDEN["n_canonical"]
    preds = collections.Counter(t["pred"] for t in gold_extraction["canonical"])
    for k, v in GOLDEN["preds"].items():
        assert preds[k] == v, (k, preds[k])


def test_golden_hash_stability():
    """Key-hash determinism across processes (the commit-hash pin of
    tests/test_dataset.py:18)."""
    from recon_ray.hashing import combine_u64, sha256_hex, stable_u64

    assert stable_u64("org0/megarepo", "src/mod0.py", "x" * 40) == stable_u64(
        "org0/megarepo", "src/mod0.py", "x" * 40
    )
    assert sha256_hex("") == (
        "e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855"
    )
    assert combine_u64([2**63, 2**63]) == 0  # wraps mod 2^64
    assert combine_u64([1, 2, 3]) == combine_u64([3, 2, 1])  # order-insensitive
