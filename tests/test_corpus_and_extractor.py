"""Corpus generator determinism + reference-extractor invariants."""

from __future__ import annotations

import collections

from recon_ray import spec
from recon_ray import reference_extractor as rx
from recon_ray.corpusgen import generate_corpus


def test_corpus_deterministic():
    a = generate_corpus(80, seed=42)
    b = generate_corpus(80, seed=42)
    assert a.equals(b)
    c = generate_corpus(80, seed=43)
    assert not a.equals(c)


def test_corpus_shape(unit_corpus_table):
    t = unit_corpus_table
    assert t.column_names == ["repo", "path", "commit", "lang", "content"]
    assert t.num_rows == 120
    repos = collections.Counter(t.column("repo").to_pylist())
    # mega-repo skew: ~30% of rows
    assert repos["org0/megarepo"] >= 0.25 * t.num_rows
    langs = set(t.column("lang").to_pylist())
    assert langs <= {"python", "javascript", "go"}
    contents = t.column("content").to_pylist()
    assert any(len(c) >= 256 * 1024 for c in contents), "needs oversized files"
    assert any(len(c) == 0 or c.startswith("#") for c in contents), "needs no-mention files"


def test_extractor_outputs(gold_extraction):
    labels = collections.Counter(m["label"] for m in gold_extraction["mentions"])
    assert set(labels) <= set(spec.LABELS)
    assert labels["IMPORT"] > 0 and labels["DEF"] > 0 and labels["CALL"] > 0
    preds = collections.Counter(t["pred"] for t in gold_extraction["canonical"])
    for p in ["imports", "imports_module", "defines", "calls", "calls_unresolved"]:
        assert preds[p] > 0, p
    # canonical is sorted and unique on (subj,pred,obj,...)
    keys = [
        (t["subj"], t["pred"], t["obj"], t["subj_type"], t["obj_type"])
        for t in gold_extraction["canonical"]
    ]
    assert keys == sorted(keys)
    assert len(keys) == len(set(keys))


def test_no_keyword_calls_survive(gold_extraction):
    """fix_annotations must delete keyword call false-positives."""
    kws = {k.lower() for k in spec.CALL_KEYWORDS}
    for m in gold_extraction["mentions"]:
        if m["label"] == "CALL":
            assert m["text"].lower() not in kws
    # but the raw detector DOES produce them (the op is load-bearing)
    raw_kw = 0
    for row in generate_corpus(40, seed=42).to_pylist():
        for m in rx.detect_mentions(row["content"], row["lang"]):
            if m.label == "call" and m.text.strip().lower() in kws:
                raw_kw += 1
    assert raw_kw > 0


def test_call_spans_trailing_space_stripped(gold_extraction):
    for m in gold_extraction["mentions"]:
        assert m["text"] == m["text"].strip()
        assert m["end"] - m["start"] == len(m["text"])


def test_def_only_scan_equals_full_chain(unit_corpus_table):
    """SymbolScanner's DEF-only invariant: DEF spans survive the correction
    chain unchanged (see stages/detect.py docstring)."""
    rows = unit_corpus_table.to_pylist()
    full = rx.build_symbol_dict(rows)
    fast = spec.SymbolDict()
    for row in rows:
        module = spec.module_of(row["path"])
        for m in rx.detect_mentions(row["content"], row["lang"]):
            if m.label == "def":
                fast.add(row["repo"], module, spec.def_name(m.text))
    assert full.by_repo == fast.by_repo


def test_sha256_invariant(gold_extraction, unit_corpus_table):
    import hashlib

    by_key = {
        (r["repo"], r["path"]): r["content"]
        for r in unit_corpus_table.to_pylist()
    }
    for t in gold_extraction["canonical"][:200]:
        content = by_key[(t["repo"], t["path"])]
        assert t["content_sha256"] == hashlib.sha256(content.encode()).hexdigest()
