"""Span-operation semantics — ports of the reference's correction/validation
test contract (tests/test_validation.py:37-105, tests/test_corrections.py)
re-expressed over Mentions, run against BOTH engines: the sequential kernels
(reference_extractor) and the vectorized batch kernels (ops/spans) via a
one-batch pyarrow table.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from recon_ray import reference_extractor as rx
from recon_ray.ops.mentions_io import mentions_list_array, mentions_parts
from recon_ray.ops.spans import (
    filter_overlaps,
    fix_annotations,
    rename_labels,
    strip_annotations,
    upcase_labels,
)
from recon_ray.spec import Mention


def batch_of(span_lists):
    """list of lists of (text,start,end,label) → one-column-per-doc table."""
    lengths = np.array([len(s) for s in span_lists], dtype=np.int64)
    flat = [m for doc in span_lists for m in doc]
    mentions = mentions_list_array(
        lengths,
        np.array([m[0] for m in flat], dtype=object),
        np.array([m[1] for m in flat], dtype=np.int64),
        np.array([m[2] for m in flat], dtype=np.int64),
        np.array([m[3] for m in flat], dtype=object),
        np.array(["t" for _ in flat], dtype=object),
    )
    t = pa.table({"doc_id": pa.array(range(len(span_lists)), pa.uint64())})
    return t.append_column("mentions", mentions)


def spans_out(batch, doc=0):
    lengths, text, start, end, label, _ = mentions_parts(batch)
    lo = int(lengths[:doc].sum())
    hi = lo + int(lengths[doc])
    return [(int(start[i]), int(end[i]), label[i]) for i in range(lo, hi)]


# --- filter_overlaps: the reference's 10-case table (tests/test_validation.py:49-105)
OVERLAP_CASES = [
    ([(0, 5), (6, 10)], [(0, 5), (6, 10)]),
    ([(0, 5), (5, 10)], [(0, 5), (5, 10)]),
    ([(0, 5), (4, 10)], [(4, 10)]),
    ([(0, 5), (0, 5)], [(0, 5)]),
    ([(0, 5), (4, 11), (6, 20)], [(0, 5), (6, 20)]),
    ([(0, 5), (4, 7), (10, 20)], [(0, 5), (10, 20)]),
    ([(1368, 1374), (1368, 1376)], [(1368, 1376)]),
    (
        [(12, 33), (769, 779), (769, 787), (806, 811)],
        [(12, 33), (769, 787), (806, 811)],
    ),
    (
        [(189, 209), (317, 362), (345, 354), (364, 368)],
        [(189, 209), (317, 362), (364, 368)],
    ),
    ([(445, 502), (461, 473), (474, 489)], [(445, 502)]),
]


@pytest.mark.parametrize("spans,expected", OVERLAP_CASES)
def test_filter_overlaps_reference_table_sequential(spans, expected):
    ms = [Mention("x" * (e - s), s, e, "ENTITY") for s, e in spans]
    out = rx.filter_overlaps(ms)
    assert [(m.start, m.end) for m in out] == expected


@pytest.mark.parametrize("spans,expected", OVERLAP_CASES)
def test_filter_overlaps_reference_table_batch(spans, expected):
    b = batch_of([[("x" * (e - s), s, e, "ENTITY") for s, e in spans]])
    out = filter_overlaps(b)
    assert [(s, e) for s, e, _l in spans_out(out)] == expected


def test_filter_overlaps_multiple_docs_batch():
    docs = [
        [("x" * (e - s), s, e, "ENTITY") for s, e in spans]
        for spans, _ in OVERLAP_CASES
    ]
    out = filter_overlaps(batch_of(docs))
    for d, (_, expected) in enumerate(OVERLAP_CASES):
        assert [(s, e) for s, e, _l in spans_out(out, d)] == expected


# --- strip_annotations: the reference golden (tests/test_corrections.py:56-78)
def test_strip_annotations_reference_golden():
    docs = [[("- entity", 11, 19, "ENTITY"), ("entity.", 34, 41, "ENTITY")]]
    out = strip_annotations(batch_of(docs))
    assert spans_out(out) == [(13, 19, "ENTITY"), (34, 40, "ENTITY")]
    ms = [Mention("- entity", 11, 19, "ENTITY"), Mention("entity.", 34, 41, "ENTITY")]
    seq = rx.strip_annotations(ms)
    assert [(m.start, m.end, m.text) for m in seq] == [
        (13, 19, "entity"),
        (34, 40, "entity"),
    ]


def test_strip_annotations_trailing_space_quirk():
    """Reference elif quirk: a span that starts AND ends with ' ' (the last
    strip char) only gets its leading side stripped in the pass."""
    ms = [Mention(" foo ", 10, 15, "ENTITY")]
    seq = rx.strip_annotations(ms)
    assert (seq[0].text, seq[0].start, seq[0].end) == ("foo ", 11, 15)
    out = strip_annotations(batch_of([[(" foo ", 10, 15, "ENTITY")]]))
    _, text, start, end, _, _ = mentions_parts(out)
    assert (text[0], int(start[0]), int(end[0])) == ("foo ", 11, 15)


def test_strip_annotations_mixed_boundaries():
    cases = [("foo ", "foo"), (" foo", "foo"), ("-foo.", "foo"), ("..x!", "..x!")]
    # "!" is not a strip char... it IS in the set; recompute: "..x!" → iter "."
    # startswith "." → lstrip all → "x!"; iter "!" → endswith → rstrip → "x"
    cases[-1] = ("..x!", "x")
    for raw, want in cases:
        seq = rx.strip_annotations([Mention(raw, 100, 100 + len(raw), "E")])
        assert seq[0].text == want, raw
        out = strip_annotations(batch_of([[(raw, 100, 100 + len(raw), "E")]]))
        _, text, start, end, _, _ = mentions_parts(out)
        assert text[0] == want
        assert int(end[0]) - int(start[0]) == len(want)


def test_strip_annotations_all_strip_chars_dropped():
    out = strip_annotations(batch_of([[("---", 0, 3, "E"), ("ok", 5, 7, "E")]]))
    assert spans_out(out) == [(5, 7, "E")]


# --- upcase / rename / fix
def test_upcase_and_rename():
    b = batch_of([[("foo", 0, 3, "import_from"), ("bar", 5, 8, "call")]])
    b = upcase_labels(b)
    b = rename_labels(b, label_map={"IMPORT_FROM": "IMPORT"})
    assert [l for _, _, l in spans_out(b)] == ["IMPORT", "CALL"]


def test_fix_annotations_delete_and_relabel():
    b = batch_of(
        [[("if", 0, 2, "CALL"), ("model", 5, 10, "SKILL"), ("keep", 12, 16, "CALL")]]
    )
    out = fix_annotations(
        b,
        corrections=[("if", ["CALL"], None), ("Model", ["ANY"], "JOB_ROLE")],
    )
    assert spans_out(out) == [(5, 10, "JOB_ROLE"), (12, 16, "CALL")]


def test_fix_annotations_case_sensitive():
    b = batch_of([[("If", 0, 2, "CALL")]])
    out = fix_annotations(b, corrections=[("if", ["CALL"], None)], case_sensitive=True)
    assert spans_out(out) == [(0, 2, "CALL")]
    out2 = fix_annotations(b, corrections=[("if", ["CALL"], None)])
    assert spans_out(out2, 0) == []


def test_fix_annotations_from_label_mismatch_keeps():
    b = batch_of([[("if", 0, 2, "IDENT")]])
    out = fix_annotations(b, corrections=[("if", ["CALL"], None)])
    assert spans_out(out) == [(0, 2, "IDENT")]


# --- corrections_from_dict shorthand (reference recon/corrections.py:98-139,
# exercised by tests/test_corrections.py::test_fix_annotations)
def test_corrections_from_dict_forms():
    from recon_ray.ops.spans import corrections_from_dict

    got = corrections_from_dict({
        "united states": "GPE",          # str → from ANY
        "model": None,                   # None → delete from ANY
        "London": ("LOC", "GPE"),        # (str, to)
        "paris": (["LOC", "ORG"], "GPE"),  # (list, to)
    })
    assert got == [
        ("united states", ["ANY"], "GPE"),
        ("model", ["ANY"], None),
        ("London", ["LOC"], "GPE"),
        ("paris", ["LOC", "ORG"], "GPE"),
    ]
    with pytest.raises(ValueError):
        corrections_from_dict({"x": 42})


def test_fix_annotations_accepts_dict_shorthand():
    # the reference's test_fix_annotations scenario: relabel
    # 'software development engineer' to JOB_ROLE, delete 'model'
    b = batch_of([
        [("model", 36, 41, "SKILL")],
        [("model", 32, 37, "JOB_ROLE")],
        [("Software Development Engineer", 21, 50, "SKILL")],
        [("SOFTWARE DEVELOPMENT ENGINEER", 22, 51, "JOB_ROLE")],
    ])
    out = fix_annotations(
        b,
        corrections={"software development engineer": "JOB_ROLE",
                     "model": None},
    )
    assert spans_out(out, 0) == []
    assert spans_out(out, 1) == []
    assert spans_out(out, 2) == [(21, 50, "JOB_ROLE")]
    assert spans_out(out, 3) == [(22, 51, "JOB_ROLE")]


def test_fix_annotations_dryrun_reports_without_mutating():
    from recon_ray.ops.spans import fix_annotations_dryrun

    b = batch_of([
        [("if", 0, 2, "CALL"), ("model", 5, 10, "SKILL"),
         ("keep", 12, 16, "CALL")],
    ])
    corr = [("if", ["CALL"], None), ("Model", ["ANY"], "JOB_ROLE")]
    # dryrun=True returns the batch unchanged (reference contract)
    out = fix_annotations(b, corrections=corr, dryrun=True)
    assert spans_out(out) == [(0, 2, "CALL"), (5, 10, "SKILL"),
                              (12, 16, "CALL")]
    rep = fix_annotations_dryrun(b, corrections=corr).to_pylist()
    assert [(r["action"], r["text"]) for r in rep] == [
        ("delete", "if"), ("relabel", "model")]
    assert rep[0]["message"] == "Deleting span: if"
    assert rep[1]["message"] == (
        "Correction span: model from labels: ['ANY'] to label: JOB_ROLE")
    assert rep[1]["from_label"] == "SKILL"
    assert rep[1]["to_label"] == "JOB_ROLE"


def test_fix_annotations_dryrun_empty_when_no_match():
    from recon_ray.ops.spans import fix_annotations_dryrun

    b = batch_of([[("zz", 0, 2, "CALL")]])
    rep = fix_annotations_dryrun(b, corrections=[("if", ["CALL"], None)])
    assert rep.num_rows == 0
    assert rep.column_names == [
        "doc_index", "action", "text", "from_label", "to_label", "message"]


# --- property-style: batch kernels == sequential kernels on generated corpus
def test_batch_kernels_match_sequential_on_corpus(unit_corpus_table):
    import random

    rng = random.Random(7)
    rows = unit_corpus_table.to_pylist()
    sample = rng.sample(rows, 30)
    docs_raw = [rx.detect_mentions(r["content"], r["lang"]) for r in sample]

    b = batch_of(
        [[(m.text, m.start, m.end, m.label) for m in doc] for doc in docs_raw]
    )
    for kernel in (upcase_labels, rename_labels, strip_annotations,
                   filter_overlaps, fix_annotations):
        b = kernel(b)

    for d, doc in enumerate(docs_raw):
        seq = rx.correct_mentions([Mention(m.text, m.start, m.end, m.label) for m in doc])
        assert spans_out(b, d) == [(m.start, m.end, m.label) for m in seq]
